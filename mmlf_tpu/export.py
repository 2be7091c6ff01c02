"""AOT export of the inference program for deployment (TPU-native extension).

``python -m mmlf_tpu.export CKPT_DIR ARTIFACT --height 512 --width 512``
packages the checkpoint's full eval program — BN-folded forward (optionally
the 70-member shift ensemble) plus head posteriors — as ONE serialized
StableHLO artifact via ``jax.export``, together with the weights and a meta
record.  The reference has no deployment story at all (its inference is the
eager torch validate loop, reference mmlf/validate/cli.py:249-331); this is
the piece a production user needs: the artifact is loadable WITHOUT the
model source, carries StableHLO's serialization compatibility guarantees,
and can be lowered for platforms the exporting host doesn't have (export on
a CPU dev box, serve on TPU).

Loading: ``fn, meta = load_exported(path)``; ``fn(h, v, i, d)`` returns the
model's output dict for scenes of the exported height/width.
"""

from __future__ import annotations

import json
import sys

import click
import numpy as np
import jax
from jax import export as jex


MAGIC = b'MMLFEXP1'


def build_inference(output_dir: str, val_ensamble: bool = False,
                    val_disp_min: float = -3.5, val_disp_max: float = 3.5,
                    val_disp_step: float = 0.1, members: bool = False,
                    u8: bool = False, calibration: dict | None = None,
                    tiled: int = 0):
    """(fn(variables, h, v, i, d) -> output dict, variables, meta dict).

    Mirrors the validate CLI's model reconstruction: stored hyper-parameters
    win, BatchNorm is folded into the convolutions for eval
    (validate/cli.py), and ``val_ensamble`` wraps the scanned ESE.

    ``u8=True`` builds the low-transfer ingest variant: the stacks arrive as
    RAW uint8 view bytes (4× less host→device traffic than float32) and the
    program normalizes (/255) AND applies the ``train_shift`` re-centering
    on device — the signature grows a trailing f32 scalar,
    ``fn(variables, h, v, i, d, shift)``.  Normalize-then-shift equals the
    host path's shift-of-normalized views exactly (both are linear).

    ``calibration`` is the JSON payload written by the validate CLI's
    ``--val_save_calibration`` (validate/calibrate.py): its ESE guard
    scores land in the artifact meta (served via /healthz), and its
    ``member_offsets``, when present, are baked into the ensemble program
    (min-logvar selection + mixture posterior run recalibrated).
    """
    from .config import Config
    from .models import FeedForward
    from .validate.cli import load_model_state

    variables, kwargs = load_model_state(output_dir)
    kwargs.update({'val_disp_min': val_disp_min,
                   'val_disp_max': val_disp_max})
    cfg = Config.from_dict(kwargs)
    if cfg.model_inn:
        if val_ensamble:
            # ValueError, not click.UsageError: this is a library function
            # (serve.InferenceEngine calls it too); the CLI re-wraps it
            raise ValueError('val_ensamble does not apply to an '
                             'INN checkpoint (validate/cli.py rule)')
        from .models.inn import INN
        model = INN.from_config(cfg)
    else:
        if not cfg.model_no_batchnorm and not cfg.model_unet:
            from .utils.fold_bn import fold_batchnorm
            variables = fold_batchnorm(variables)
            cfg = Config.from_dict({**cfg.to_dict(),
                                    'model_no_batchnorm': True})
        model = FeedForward.from_config(cfg)

    member_offsets = None
    if calibration and calibration.get('member_offsets') is not None:
        if not val_ensamble:
            raise ValueError('calibration member_offsets only apply to an '
                             'ensemble export (--val_ensamble)')
        member_offsets = np.asarray(calibration['member_offsets'],
                                    np.float32)

    def core(variables, h, v, i, d):
        if val_ensamble:
            from .models.ensemble import ensemble_forward
            out = ensemble_forward(
                lambda vv, *a: model.apply(vv, *a), variables, h, v, i, d,
                disp_min=val_disp_min, disp_max=val_disp_max,
                disp_step=val_disp_step,
                member_offsets=member_offsets,
                # the artifact must run on any platform — no Pallas
                posterior_impl='scan')
            if not members:      # (K, b, H, W) stacks are the bulky part
                out.pop('means', None)
                out.pop('logvars', None)
        else:
            out = model.apply(variables, h, v, i, d)
        return {k: v for k, v in out.items() if v is not None}

    halo = sdim = None
    if tiled:
        # shape-polymorphic tiled program (validate/tiling.py): a lax.scan
        # over a runtime tile-position table stitches interior tiles into
        # canvas-sized buffers — exact wherever the halo covers the
        # receptive field, so ONE exported artifact serves ANY scene shape
        # (canvas = scene padded up to a tile multiple; VERDICT r3 item 4)
        from .validate.tiling import receptive_radius, tiled_forward_device
        if cfg.model_inn:
            raise ValueError('tiled export does not support the INN '
                             '(per-image outputs cannot be stitched)')
        halo = receptive_radius(cfg.model_ksize, cfg.model_in_blocks,
                                cfg.model_out_blocks)
        if val_ensamble:   # the member shift reaches ceil(disp)+1 further
            halo += int(np.ceil(max(abs(val_disp_min),
                                    abs(val_disp_max)))) + 1
        core_full = core

        def core(variables, h, v, i, d, pos):
            return tiled_forward_device(core_full, variables,
                                        (h, v, i, d), tiled, halo, pos=pos)

    if u8:
        import jax.numpy as jnp
        from .ops.shift import shift_lf

        def fwd(variables, h, v, i, d, *rest):
            # rest = (pos, shift) when tiled else (shift,)
            shift = rest[-1]
            h, v, i, d = (x.astype(jnp.float32) / 255.0
                          for x in (h, v, i, d))
            # the re-centering shift rolls the whole canvas BEFORE tiling
            # (the halo absorbs the wrap except at the true image border,
            # the same boundary class the margin mask already excludes)
            h, v, i, d = shift_lf(h, v, i, d, shift)
            return core(variables, h, v, i, d, *rest[:-1])
    else:
        fwd = core

    meta = {'config': cfg.to_dict(), 'val_ensamble': val_ensamble,
            'val_disp_min': val_disp_min, 'val_disp_max': val_disp_max,
            'val_disp_step': val_disp_step, 'members': members,
            'views': cfg.model_views, 'u8': u8}
    if tiled:
        # the serving side needs the spatial-dim index per output key to
        # crop canvas-stitched buffers back to the true scene size
        from .validate.tiling import probe_sdim
        import jax.numpy as jnp
        cs = max(2, -(-(tiled + 2 * halo) // tiled)) * tiled
        dummy = [jax.ShapeDtypeStruct((1, cfg.model_views, cs, cs, 3),
                                      jnp.float32)] * 4
        sdim = probe_sdim(core_full, variables, dummy, tiled, halo)
        meta.update(tiled=tiled, halo=halo,
                    sdim={k: v for k, v in sdim.items() if v is not None})
    if val_ensamble:
        # /healthz surfaces this: an ensemble whose logvar calibration was
        # never checked is a known silent-failure surface (calibrate.py)
        meta['calibration'] = None if calibration is None else {
            'rank_corr': calibration.get('rank_corr'),
            'bare_mse': calibration.get('bare_mse'),
            'ese_mse': calibration.get('ese_mse'),
            'calibrated': calibration.get('calibrated'),
            'recalibrated': member_offsets is not None,
        }
    return fwd, variables, meta


def export_inference(output_dir: str, height: int, width: int,
                     val_ensamble: bool = False,
                     val_disp_min: float = -3.5, val_disp_max: float = 3.5,
                     val_disp_step: float = 0.1, members: bool = False,
                     platforms=('tpu', 'cpu'), batch: int = 1,
                     u8: bool = False, calibration: dict | None = None,
                     tiled: int = 0) -> bytes:
    """Serialize the full inference program for ``(batch, views, H, W, 3)``
    scenes into a self-contained artifact (weights + StableHLO + meta).

    ``u8=True`` artifacts ingest raw uint8 views plus a trailing f32
    ``shift`` scalar (see ``build_inference``).  ``calibration`` is the
    validate CLI's ``--val_save_calibration`` payload (report into meta,
    member offsets baked into the ensemble program).

    ``tiled > 0`` exports the SHAPE-POLYMORPHIC tiled program instead:
    the stacks are lowered with symbolic canvas dims ``(tiled*s1,
    tiled*s2)`` plus an ``(s1*s2, 6)`` tile-position table, so one
    artifact serves any scene shape — the loader refines the StableHLO to
    the concrete canvas at call time (``height``/``width`` are ignored,
    ``batch`` must be 1)."""
    if tiled and batch != 1:
        raise ValueError('tiled export supports batch=1 only (scenes of '
                         'different shapes cannot batch anyway)')
    fwd, variables, meta = build_inference(
        output_dir, val_ensamble, val_disp_min, val_disp_max, val_disp_step,
        members, u8=u8, calibration=calibration, tiled=tiled)
    n = meta['views']
    var_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), variables)
    if tiled:
        # minimum canvas: the halo window must fit (s*tiled >= tiled+2*halo)
        smin = max(2, -(-(tiled + 2 * meta['halo']) // tiled))
        s1, s2 = jex.symbolic_shape(
            's1, s2', constraints=[f's1 >= {smin}', f's2 >= {smin}'])
        stack = jax.ShapeDtypeStruct((1, n, tiled * s1, tiled * s2, 3),
                                     np.uint8 if u8 else np.float32)
        extra = (jax.ShapeDtypeStruct((s1 * s2, 6), np.int32),)
    else:
        stack = jax.ShapeDtypeStruct((batch, n, height, width, 3),
                                     np.uint8 if u8 else np.float32)
        extra = ()
    if u8:
        extra = extra + (jax.ShapeDtypeStruct((), np.float32),)
    exported = jex.export(jax.jit(fwd), platforms=list(platforms))(
        var_shapes, stack, stack, stack, stack, *extra)

    from flax import serialization
    meta = dict(meta, batch=1 if tiled else batch,
                platforms=list(platforms),
                **({} if tiled else {'height': height, 'width': width}))
    meta_b = json.dumps(meta).encode()
    var_b = serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, variables))
    exp_b = exported.serialize()
    head = np.array([len(meta_b), len(var_b), len(exp_b)],
                    dtype='<u8').tobytes()
    return MAGIC + head + meta_b + var_b + exp_b


def load_exported(path_or_bytes):
    """Load an artifact; returns ``(fn, meta)`` with
    ``fn(h, v, i, d) -> output dict`` jitted for the current backend.

    Needs only jax+flax — not this package's model code."""
    blob = path_or_bytes
    if not isinstance(blob, (bytes, bytearray)):
        with open(blob, 'rb') as f:
            blob = f.read()
    if blob[:len(MAGIC)] != MAGIC:
        raise ValueError('not an mmlf_tpu export artifact')
    off = len(MAGIC)
    ln, lv, le = np.frombuffer(blob[off:off + 24], dtype='<u8')
    off += 24
    meta = json.loads(blob[off:off + int(ln)])
    off += int(ln)
    from flax import serialization
    variables = serialization.msgpack_restore(blob[off:off + int(lv)])
    off += int(lv)
    exported = jex.deserialize(blob[off:off + int(le)])

    # keep the weights a runtime argument (device-resident), NOT a closure:
    # closed-over numpy arrays would be baked into the lowered program as
    # constants, doubling memory and slowing the compile
    variables = jax.device_put(variables)
    call = jax.jit(exported.call)
    return (lambda *stacks: call(variables, *stacks)), meta


@click.command()
@click.argument('output_dir', type=click.Path(exists=True))
@click.argument('artifact', type=click.Path())
@click.option('--height', default=512, help='Scene height the program is '
              'specialized to')
@click.option('--width', default=512, help='Scene width')
@click.option('--batch', default=1, help='Scenes per call')
@click.option('--val_ensamble', is_flag=True, help='Export the shift '
              'ensemble (ESE) program')
@click.option('--val_disp_min', default=-3.5)
@click.option('--val_disp_max', default=3.5)
@click.option('--val_disp_step', default=0.1)
@click.option('--members', is_flag=True,
              help='Keep the per-member mean/logvar stacks in the ESE '
                   'output (large)')
@click.option('--u8', is_flag=True,
              help='Low-transfer ingest: the artifact takes RAW uint8 view '
                   'stacks plus a runtime f32 shift scalar, and normalizes '
                   '+ re-centers on device (4x less host-to-device traffic)')
@click.option('--calibration', default=None,
              type=click.Path(exists=True, dir_okay=False),
              help='ESE calibration JSON from the validate CLI\'s '
                   '--val_save_calibration: the guard scores land in the '
                   'artifact meta (served via /healthz) and fitted member '
                   'offsets are baked into the ensemble program')
@click.option('--tiled', default=0, type=int,
              help='Shape-polymorphic export: tile the scene with this '
                   'interior tile size over a symbolic canvas, so ONE '
                   'artifact serves any scene shape (--height/--width are '
                   'ignored; exact wherever the halo covers the receptive '
                   'field — the non-ensemble heads everywhere, the '
                   'ensemble up to the margin-masked border band)')
@click.option('--platforms', default='tpu,cpu',
              help='Comma-separated lowering platforms')
@click.option('--jax_cache', default='', envvar='MMLF_JAX_CACHE',
              help='Persistent XLA compilation-cache directory, '
                   'also via $MMLF_JAX_CACHE')
def main(output_dir, artifact, height, width, batch, val_ensamble,
         val_disp_min, val_disp_max, val_disp_step, members, u8,
         calibration, tiled, platforms, jax_cache):
    """Export a checkpoint's inference program as a serving artifact."""
    if jax_cache:
        from .utils.jaxcache import enable_compilation_cache
        enable_compilation_cache(jax_cache)
    cal = None
    if calibration:
        with open(calibration) as f:
            cal = json.load(f)
    try:
        blob = export_inference(
            output_dir, height, width, val_ensamble=val_ensamble,
            val_disp_min=val_disp_min, val_disp_max=val_disp_max,
            val_disp_step=val_disp_step, members=members, u8=u8,
            platforms=tuple(p.strip() for p in platforms.split(',')
                            if p.strip()),
            batch=batch, calibration=cal, tiled=tiled)
    except ValueError as e:
        raise click.UsageError(str(e))
    with open(artifact, 'wb') as f:
        f.write(blob)
    shape = (f'any shape, tile {tiled}' if tiled
             else f'{height}x{width}')
    print(f'wrote {artifact} ({len(blob) / 1e6:.1f} MB, '
          f'{shape}, platforms={platforms})')


if __name__ == '__main__':
    sys.exit(main())
