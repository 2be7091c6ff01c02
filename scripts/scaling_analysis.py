"""Multi-chip scaling analysis from the compiled SPMD program.

No multi-chip slice is reachable from this environment (single tunneled
v5e chip), so this quantifies the data-parallel scaling story the honest
way that IS available: compile the REAL sharded train step (full flagship
config) over an n-device mesh, extract every collective XLA inserted from
the optimized HLO (op kind + element type + byte volume), and project
step-time overhead against v5e ICI bandwidth.  The numbers land in
docs/SCALING.md.

The collective volume of a data-parallel step is batch-size independent
(one gradient/BN-stat all-reduce of parameter/stat size), so the
projection holds for any per-chip batch; compute time per chip is the
measured single-chip step (bench.py / docs/STATUS.md).

Run: python scripts/scaling_analysis.py [n_devices] [--space | --ese]
  (default)  data-parallel train step over an n-device 'data' mesh
  --space    spatially-sharded 512² scene inference (conv halo exchanges)
  --ese      member-sharded 70-member shift ensemble (validation)
"""

import os
import re
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARGS = [a for a in sys.argv[1:] if not a.startswith('--')]
SPACE = '--space' in sys.argv[1:]
ESE = '--ese' in sys.argv[1:]
N = int(ARGS[0]) if ARGS else 8

import jax  # noqa: E402

# the env sitecustomize pins jax_platforms to 'axon,cpu' at CONFIG level,
# which outranks JAX_PLATFORMS — counter it before any backend init, or
# this script hangs trying to claim the (single-tenant) TPU relay
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', N)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from mmlf_tpu.config import Config  # noqa: E402
from mmlf_tpu.models import FeedForward  # noqa: E402
from mmlf_tpu.parallel.mesh import make_mesh, batch_sharding, replicated  # noqa: E402
from mmlf_tpu.train.loop import init_state, make_train_step  # noqa: E402

DTYPE_BYTES = {'f64': 8, 'f32': 4, 'bf16': 2, 'f16': 2, 'u64': 8, 's64': 8,
               'u32': 4, 's32': 4, 'u16': 2, 's16': 2, 'u8': 1, 's8': 1,
               'pred': 1}
COLLECTIVES = ('all-reduce', 'all-gather', 'reduce-scatter',
               'collective-permute', 'all-to-all')

# v5e ICI: 2-D torus, ~45 GB/s per link per direction, 4 neighbor links
# per chip (scaling-book figures).  A ring/tree all-reduce of G bytes
# moves ~2G per chip; with r rings usable for a 1-D data axis on the
# torus, time ~= 2G / (r * W_link).  We use r=2 (both directions of one
# torus dimension) as the conservative single-axis figure.
ICI_LINK_GBPS = 45.0e9
ALLREDUCE_BW = 2 * ICI_LINK_GBPS  # effective bytes/s divisor for 2G


def shape_bytes(type_str: str) -> int:
    """Sum byte sizes of every `dtype[d0,d1,...]` in an HLO type string."""
    total = 0
    for dt, dims in re.findall(r'(\w+)\[([\d,]*)\]', type_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def collect(hlo_text: str):
    """(kind -> [(bytes, line_head)]) for every collective in the HLO.

    Sync collectives: the instruction type IS the result (a tuple for
    variadic/fused ops) — sum every tensor in it.  Async ``*-start``
    variants type as (operand(s), result(s), contexts): summing would
    double-count operand+result, so take the largest single tensor —
    exact for the pairwise (G,G) all-reduce-start and (G/N, G)
    all-gather-start shapes, conservative-low only for variadic starts.
    """
    out = {}
    for line in hlo_text.splitlines():
        m = re.match(r'\s*(?:ROOT\s+)?%?[\w.-]+\s*=\s*(.+?)\s+([\w-]+)\(',
                     line)
        if not m:
            continue
        type_str, op = m.groups()
        # fusions wrap collectives only in rare cases; match plain ops
        kind = next((c for c in COLLECTIVES if op == c or
                     op.startswith(c + '-start')), None)
        if kind:
            if op.endswith('-start'):
                sizes = [shape_bytes(f'{dt}[{dims}]') for dt, dims in
                         re.findall(r'(\w+)\[([\d,]*)\]', type_str)]
                nbytes = max(sizes) if sizes else 0
            else:
                nbytes = shape_bytes(type_str)
            out.setdefault(kind, []).append(
                (nbytes, line.strip()[:110]))
    return out


def report(hlo: str) -> float:
    """Print the per-chip collective table from optimized HLO; MB/step."""
    colls = collect(hlo)
    total = 0
    for kind, items in sorted(colls.items()):
        b = sum(x for x, _ in items)
        total += b
        print(f'  {kind:20s} x{len(items):3d}  {b / 1e6:8.2f} MB/step')
        for sz, head in sorted(items, reverse=True)[:3]:
            print(f'      {sz / 1e6:8.2f} MB  {head}')
    print(f'  {"TOTAL":20s}       {total / 1e6:8.2f} MB/step')
    return total


def main_space():
    """Spatially-sharded full-scene inference (--mesh_space analogue):
    collective volume of the halo exchanges XLA inserts for the conv
    trunk when a 512x512 scene's H axis is sharded over ``space``."""
    from mmlf_tpu.parallel.mesh import spatial_sharding
    from mmlf_tpu.validate.cli import make_scene_eval

    cfg = Config(model_chs=70, model_in_blocks=3, model_out_blocks=8,
                 model_uncert=True, bf16=True).finalize()
    model = FeedForward.from_config(cfg)
    mesh = make_mesh(n_data=1, n_space=N, devices=jax.devices()[:N])

    size = 512
    stacks = [jnp.zeros((1, 9, size, size, 3))] * 4
    variables = model.init(jax.random.PRNGKey(0), *stacks)
    variables = jax.device_put(variables, replicated(mesh))
    sh = spatial_sharding(mesh, h_axis=2)
    stacks = [jax.device_put(s, sh) for s in stacks]
    gt = jax.device_put(jnp.zeros((1, size, size)),
                        spatial_sharding(mesh, h_axis=1))
    mpi = jax.device_put(jnp.zeros((1, 12, size, size, 5)),
                         spatial_sharding(mesh, h_axis=2))

    scene_eval = make_scene_eval(model, cfg, {'model_uncert': True},
                                 val_ensamble=False, val_disp_min=-3.5,
                                 val_disp_max=3.5, val_disp_step=0.1,
                                 val_loss_margin=11)
    hlo = scene_eval.lower(variables, *stacks, gt, mpi) \
                    .compile().as_text()
    print(f'space mesh: {mesh.shape}, scene {size}x{size}, UPR fwd+metrics')
    total = report(hlo)
    t_comm = 2 * total / ALLREDUCE_BW
    print(f'\n  halo/comm time ~= {t_comm * 1e3:.2f} ms/scene '
          f'(vs single-chip 512² fwd ~57 ms)')


def main_ese():
    """Member-sharded shift ensemble (ESE validation): collective volume
    of the 70-member scan split over the mesh — psum of the mixture
    posterior + all-gathers for min-logvar selection and member dumps."""
    from mmlf_tpu.models.ensemble import ensemble_forward_sharded

    cfg = Config(model_chs=70, model_in_blocks=3, model_out_blocks=8,
                 model_uncert=True, bf16=True).finalize()
    model = FeedForward.from_config(cfg)
    mesh = make_mesh(n_data=N, devices=jax.devices()[:N])

    size = 128  # spatial extent scales every collective linearly; the
    # per-pixel byte counts below are what matter (512² = 16x these)
    stacks = [jnp.zeros((1, 9, size, size, 3))] * 4
    variables = model.init(jax.random.PRNGKey(0), *stacks)
    variables = jax.device_put(variables, replicated(mesh))

    ens = jax.jit(lambda v, *s: ensemble_forward_sharded(
        lambda vv, *a: model.apply(vv, *a), v, *s,
        -3.5, 3.5, 0.1, mesh=mesh))
    hlo = ens.lower(variables, *stacks).compile().as_text()
    print(f'ESE member-sharded over {N} devices, 70 members, '
          f'scene {size}x{size}')
    total = report(hlo)
    t_comm = 2 * total / ALLREDUCE_BW
    print(f'\n  comm ~= {t_comm * 1e3:.2f} ms/scene at {size}² '
          f'(x{(512 // size) ** 2} for 512²); compute/chip drops ~{N}x')


def main():
    import tempfile

    from mmlf_tpu.data.hci4d import HCI4D
    from mmlf_tpu.data.pipeline import DevicePipeline
    from mmlf_tpu.data.synth import generate_dataset

    mesh = make_mesh(n_data=N, devices=jax.devices()[:N])
    cfg = Config(model_chs=70, model_in_blocks=3, model_out_blocks=8,
                 model_uncert=True, train_ps=96, train_bs=N,
                 train_lr=1e-3, train_warm_start=True, bf16=True,
                 train_max_downscale=1,
                 ).finalize()
    model = FeedForward.from_config(cfg)
    tx = optax.scale_by_adam()
    state = init_state(cfg, model, tx, [jnp.zeros((1, 9, 96, 96, 3))] * 4)
    state = jax.device_put(state, replicated(mesh))

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))
    grad_bytes = 4 * n_params

    # the REAL sharded production program: replicated packed cache,
    # index-only sharded batch, in-step gather + augment (same path the
    # driver's dryrun_multichip executes)
    data_dir = os.path.join(tempfile.gettempdir(), 'mmlf_dryrun_data160')
    if not os.path.exists(os.path.join(data_dir, 'scene_00')):
        generate_dataset(data_dir, scenes=2, size=160, seed=0)
    pipe = DevicePipeline(HCI4D(data_dir, cache=True), cfg, seed=0,
                          sharding=replicated(mesh))
    batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh)),
        pipe.sample_batch(cfg.train_bs))

    step = make_train_step(cfg, model, tx, use_cache=True, mesh=mesh)
    lowered = jax.jit(step).lower(state, batch, pipe.cache)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    print(f'mesh: {mesh.shape}, params: {n_params:,} '
          f'({grad_bytes / 1e6:.1f} MB fp32 grads)')
    total = report(hlo)

    t_comm = 2 * total / ALLREDUCE_BW
    print(f'\nprojection (v5e ICI, ring all-reduce over one torus axis):')
    print(f'  comm time/step ~= 2*{total / 1e6:.1f} MB / {ALLREDUCE_BW / 1e9:.0f} GB/s '
          f'= {t_comm * 1e3:.2f} ms (N-independent for ring)')
    for step_ms in (340.0, 253.0):
        eff = step_ms / (step_ms + t_comm * 1e3)
        print(f'  vs {step_ms:.0f} ms/chip step: scaling efficiency '
              f'{eff * 100:.2f}% at any N on one torus axis')


if __name__ == '__main__':
    main_ese() if ESE else main_space() if SPACE else main()
