"""Tiled inference must be exactly the full-image forward."""

import numpy as np
import jax
import jax.numpy as jnp

from mmlf_tpu.config import Config
from mmlf_tpu.models import FeedForward
from mmlf_tpu.validate.tiling import (make_tiled_forward, receptive_radius,
                                      tiled_forward)


def test_receptive_radius():
    # default config: 11 blocks × 2 convs × (k-1)=1 → 22
    assert receptive_radius(2, 3, 8) == 22


def test_tiled_matches_full_uncert():
    cfg = Config(model_chs=6, model_in_blocks=1, model_out_blocks=2,
                 model_uncert=True).finalize()
    model = FeedForward.from_config(cfg)
    rng = np.random.default_rng(0)
    stacks = [jnp.asarray(rng.random((1, 9, 96, 96, 3), dtype=np.float32))
              for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(0), *stacks)

    full = model.apply(variables, *stacks)
    tiled = make_tiled_forward(model, tile=32)(variables, *stacks)

    np.testing.assert_allclose(tiled['mean'], np.asarray(full['mean']),
                               atol=1e-5)
    np.testing.assert_allclose(tiled['logvar'], np.asarray(full['logvar']),
                               atol=1e-5)
    np.testing.assert_allclose(tiled['posterior'],
                               np.asarray(full['posterior']), atol=1e-5)


def test_tiled_handles_non_divisible_sizes():
    cfg = Config(model_chs=4, model_in_blocks=1, model_out_blocks=1).finalize()
    model = FeedForward.from_config(cfg)
    rng = np.random.default_rng(1)
    stacks = [jnp.asarray(rng.random((1, 9, 72, 88, 3), dtype=np.float32))
              for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(0), *stacks)

    full = model.apply(variables, *stacks)
    halo = receptive_radius(2, 1, 1)
    fn = jax.jit(lambda v, *s: model.apply(v, *s))
    tiled = tiled_forward(fn, variables, stacks, tile=32, halo=halo)
    assert tiled['mean'].shape == (1, 72, 88)
    np.testing.assert_allclose(tiled['mean'], np.asarray(full['mean']),
                               atol=1e-5)


def test_device_tiled_forward_matches_full():
    """Device-side tiled forward (one jitted program, scan + stitch) must
    equal the whole-scene forward exactly."""
    import jax
    import jax.numpy as jnp
    from mmlf_tpu.config import Config
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.validate.tiling import (receptive_radius,
                                          tiled_forward_device)

    cfg = Config(model_chs=6, model_in_blocks=1, model_out_blocks=2,
                 model_uncert=True).finalize()
    model = FeedForward.from_config(cfg)
    rng = np.random.default_rng(0)
    stacks = [jnp.asarray(rng.random((1, 9, 96, 96, 3), dtype=np.float32))
              for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(0), *stacks)
    apply_fn = lambda v, *s: model.apply(v, *s)

    want = jax.jit(apply_fn)(variables, *stacks)
    halo = receptive_radius(cfg.model_ksize, cfg.model_in_blocks,
                            cfg.model_out_blocks)
    got = jax.jit(lambda v, *s: tiled_forward_device(
        apply_fn, v, s, 32, halo))(variables, *stacks)

    for k in ('mean', 'logvar', 'posterior'):
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]), atol=1e-5,
                                   err_msg=f'{k} diverges')
    assert got['scores'] is None


def test_validate_cli_tile_flag(tmp_path):
    """--val_tile through the full validate CLI gives the same metrics as
    the whole-scene path."""
    import os
    import jax
    import jax.numpy as jnp
    import optax
    from mmlf_tpu.config import Config
    from mmlf_tpu.data.synth import generate_dataset
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.train.checkpoint import save_checkpoint
    from mmlf_tpu.train.loop import init_state
    from mmlf_tpu.validate.cli import run_validation

    data = str(tmp_path / 'data')
    out = str(tmp_path / 'out')
    os.makedirs(out)
    generate_dataset(data, scenes=1, size=128, seed=0)

    cfg = Config(model_chs=6, model_in_blocks=1, model_out_blocks=2,
                 model_uncert=True).finalize()
    model = FeedForward.from_config(cfg)
    tx = optax.scale_by_adam()
    state = init_state(cfg, model, tx, [jnp.zeros((1, 9, 32, 32, 3))] * 4)
    save_checkpoint(out, {'params': state.params,
                          'batch_stats': state.batch_stats},
                    cfg.to_dict(), None, 0, None)

    full = run_validation(out, data)
    tiled = run_validation(out, data, val_tile=64)
    for k in ('mse', 'badpix', 'kld'):
        assert abs(full[k] - tiled[k]) < 1e-4, (k, full[k], tiled[k])


def test_device_tiled_forward_ensemble_members():
    """Ensemble outputs under tiling: member-major (K, b, H, W) stacks are
    stitched on their own spatial dims (code-review r2 finding: --val_tile
    with --val_ensamble crashed on the member axis)."""
    from mmlf_tpu.models.ensemble import ensemble_forward
    from mmlf_tpu.validate.tiling import (receptive_radius,
                                          tiled_forward_device)

    cfg = Config(model_chs=4, model_in_blocks=1, model_out_blocks=1,
                 model_uncert=True).finalize()
    model = FeedForward.from_config(cfg)
    rng = np.random.default_rng(3)
    stacks = [jnp.asarray(rng.random((1, 9, 96, 96, 3), dtype=np.float32))
              for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(0), *stacks)

    ens = lambda v, *s: ensemble_forward(
        lambda vv, *a: model.apply(vv, *a), v, *s,
        disp_min=-0.3, disp_max=0.3, disp_step=0.2)

    want = jax.jit(ens)(variables, *stacks)
    halo = receptive_radius(2, 1, 1) + 2       # + ensemble shift reach
    got = jax.jit(lambda v, *s: tiled_forward_device(
        ens, v, s, 32, halo))(variables, *stacks)

    assert got['means'].shape == np.asarray(want['means']).shape
    # interior equality (the circular shift wraps inside the tile halo at
    # tile borders instead of the image border — boundary-band deviation,
    # same class the margin-15 mask excludes)
    sl = (slice(None), slice(None), slice(8, -8), slice(8, -8))
    np.testing.assert_allclose(np.asarray(got['means'])[sl],
                               np.asarray(want['means'])[sl], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got['mean'])[:, 8:-8, 8:-8],
        np.asarray(want['mean'])[:, 8:-8, 8:-8], atol=1e-4)


def test_validate_cli_tile_flag_ensemble(tmp_path):
    """--val_tile + --val_ensamble through the validate CLI (used to crash
    before spatial-dim detection in the stitcher)."""
    import os
    import optax
    from mmlf_tpu.data.synth import generate_dataset
    from mmlf_tpu.train.checkpoint import save_checkpoint
    from mmlf_tpu.train.loop import init_state
    from mmlf_tpu.validate.cli import run_validation

    data = str(tmp_path / 'data')
    out = str(tmp_path / 'out')
    os.makedirs(out)
    generate_dataset(data, scenes=1, size=128, seed=0)

    cfg = Config(model_chs=4, model_in_blocks=1, model_out_blocks=1,
                 model_uncert=True, val_ensamble=True,
                 val_disp_min=-0.3, val_disp_max=0.3,
                 val_disp_step=0.2).finalize()
    model = FeedForward.from_config(cfg)
    tx = optax.scale_by_adam()
    state = init_state(cfg, model, tx, [jnp.zeros((1, 9, 32, 32, 3))] * 4)
    save_checkpoint(out, {'params': state.params,
                          'batch_stats': state.batch_stats},
                    cfg.to_dict(), None, 0, None)

    m = run_validation(out, data, val_ensamble=True, val_tile=64,
                       val_disp_min=-0.3, val_disp_max=0.3,
                       val_disp_step=0.2)
    for k in ('mse', 'badpix', 'kld', 'nll'):
        assert np.isfinite(m[k]), k


def test_canonical_canvas_positions_exact():
    """Canvas-padded tiled forward with a traced position table is exactly
    the direct forward on the true scene (VERDICT r2 item 8: one compiled
    program per canonical canvas, positions passed as a jit argument)."""
    from mmlf_tpu.validate.tiling import (crop_outputs, probe_sdim,
                                          tile_positions,
                                          tiled_forward_device)

    cfg = Config(model_chs=4, model_in_blocks=1, model_out_blocks=1,
                 model_uncert=True).finalize()
    model = FeedForward.from_config(cfg)
    halo = receptive_radius(2, 1, 1)
    tile = 32
    rng = np.random.default_rng(5)

    apply_fn = lambda v, *s: model.apply(v, *s)
    fwd = jax.jit(lambda v, s0, s1, s2, s3, pos: tiled_forward_device(
        apply_fn, v, (s0, s1, s2, s3), tile, halo, pos=pos))

    variables = None
    compiled = []
    # two different TRUE sizes sharing the 96x128 canvas
    for ht, wt in ((90, 110), (96, 128)):
        hc = -(-ht // tile) * tile
        wc = -(-wt // tile) * tile
        assert (hc, wc) == (96, 128)
        stacks = [jnp.asarray(rng.random((1, 9, ht, wt, 3),
                                         dtype=np.float32))
                  for _ in range(4)]
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), *stacks)
        full = model.apply(variables, *stacks)

        pads = [(0, 0), (0, 0), (0, hc - ht), (0, wc - wt), (0, 0)]
        padded = [jnp.pad(s, pads) for s in stacks]
        pos = tile_positions(ht, wt, tile, halo,
                             pad_to=(hc // tile) * (wc // tile))
        out = fwd(variables, *padded, jnp.asarray(pos))
        sdim = probe_sdim(apply_fn, variables, padded, tile, halo)
        out = crop_outputs(out, sdim, ht, wt)

        np.testing.assert_allclose(np.asarray(out['mean']),
                                   np.asarray(full['mean']), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out['logvar']),
                                   np.asarray(full['logvar']), atol=1e-5)
        compiled.append(fwd._cache_size() if hasattr(fwd, '_cache_size')
                        else None)
    # same canvas -> the jitted tiled forward compiled exactly once
    if compiled[-1] is not None:
        assert compiled[-1] == 1
