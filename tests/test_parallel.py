"""Multi-device tests on the virtual 8-device CPU mesh: data-parallel
training through the full train() loop, sharded-vs-single equivalence, and
spatially-sharded full-scene inference."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmlf_tpu.config import Config
from mmlf_tpu.data.synth import generate_dataset
from mmlf_tpu.models import FeedForward
from mmlf_tpu.parallel.mesh import (batch_sharding, make_mesh, replicated,
                                    spatial_sharding)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


@pytest.fixture(scope='module')
def data_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp('par')
    train_dir = str(root / 'train')
    val_dir = str(root / 'val')
    generate_dataset(train_dir, scenes=2, size=64, seed=0)
    generate_dataset(val_dir, scenes=1, size=64, seed=3)
    return train_dir, val_dir


def _mesh_cfg(data_dirs, tmp_path, name, **kw):
    train_dir, val_dir = data_dirs
    out = str(tmp_path / name)
    os.makedirs(out)
    base = dict(
        train_trainset=train_dir, train_valset=val_dir,
        train_bs=16, train_ps=32, train_lr=1e-3, train_max_downscale=1,
        val_interval=3, val_loss_margin=5, train_steps=1,
        model_chs=6, model_in_blocks=1, model_out_blocks=2,
    )
    base.update(kw)
    return Config(**base).finalize(), out


def test_train_loop_on_8_device_mesh(data_dirs, tmp_path):
    """The full train() path with bs divisible by the mesh: device cache
    replicated, batch sharded, gradients psum'd by XLA."""
    from mmlf_tpu.train.loop import train

    cfg, out = _mesh_cfg(data_dirs, tmp_path, 'mesh_run',
                         train_bs=16, train_steps=3)
    state = train(cfg, out, progress=False)
    assert int(state.step) == 3
    log = open(os.path.join(out, 'log.csv')).read().splitlines()
    losses = [float(l.split(',')[1]) for l in log[1:]]
    assert all(np.isfinite(losses))


def test_mesh_data_divisibility_uses_mesh_size(data_dirs, tmp_path):
    """The batch-divisibility gate must test against --mesh_data, not the
    local device count: bs=6 / mesh_data=2 runs SHARDED on 8 devices
    (6 % 8 != 0), and bs=8 / mesh_data=3 falls back to single-device
    instead of crashing the (8,...) device_put over 3 shards."""
    from mmlf_tpu.train.loop import train

    cfg, out = _mesh_cfg(data_dirs, tmp_path, 'm2', train_bs=6, mesh_data=2)
    state = train(cfg, out, progress=False)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 2

    cfg, out = _mesh_cfg(data_dirs, tmp_path, 'm3', train_bs=8, mesh_data=3)
    state = train(cfg, out, progress=False)   # pre-fix: device_put crash
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 1


def test_sharded_step_matches_single_device(data_dirs):
    """Loss and gradients on the 8-device mesh must equal the single-device
    run (global-batch semantics; XLA inserts the gradient psum).

    Gradients — not post-Adam params — are compared: Adam's first step is
    ~lr·sign(m̂), so float-reassociation noise on near-zero gradients flips
    entire parameter entries by 2·lr without any real divergence.
    """
    from mmlf_tpu.data import HCI4D
    from mmlf_tpu.data.pipeline import DevicePipeline, augment_batch, \
        gather_windows, window_size
    from mmlf_tpu.losses import masked_l1
    from mmlf_tpu.ops.masks import create_mask_margin

    train_dir, _ = data_dirs
    cfg = Config(train_bs=8, train_ps=32, train_lr=1e-2,
                 train_max_downscale=1, model_chs=6, model_in_blocks=1,
                 model_out_blocks=2, model_no_batchnorm=True).finalize()
    ds = HCI4D(train_dir, cache=True)
    pipe = DevicePipeline(ds, cfg, seed=0)
    model = FeedForward.from_config(cfg)

    batch = pipe.sample_batch(8)
    variables = model.init(jax.random.PRNGKey(0),
                           *[jnp.zeros((1, 9, 32, 32, 3))] * 4)

    @jax.jit
    def loss_and_grads(params, b):
        def loss_fn(p):
            win = gather_windows(pipe.cache, b, window_size(cfg.train_ps))
            h, v, i, d, gt, mpi, mask = augment_batch(win, cfg.train_ps)
            mask = mask * create_mask_margin(mask.shape[-2:], 11)
            out = model.apply({'params': p}, h, v, i, d)
            return masked_l1(out, gt, mask)
        return jax.value_and_grad(loss_fn)(params)

    loss_1, g_1 = loss_and_grads(variables['params'], batch)

    mesh = make_mesh(8)
    params_rep = jax.device_put(variables['params'], replicated(mesh))
    batch_sh = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    loss_8, g_8 = loss_and_grads(params_rep, batch_sh)

    assert float(loss_1) == pytest.approx(float(loss_8), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_1),
                    jax.tree_util.tree_leaves(g_8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_sharded_ensemble_matches_serial(data_dirs):
    """70-member ESE with members sharded over the 8-device mesh must equal
    the serial single-device scan (min-logvar select + mixture posterior)."""
    from mmlf_tpu.models.ensemble import (ensemble_forward,
                                          ensemble_forward_sharded)

    cfg = Config(model_chs=6, model_in_blocks=1, model_out_blocks=2,
                 model_uncert=True).finalize()
    model = FeedForward.from_config(cfg)
    rng = np.random.default_rng(1)
    stacks = [jnp.asarray(rng.random((1, 9, 32, 32, 3), dtype=np.float32))
              for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(0), *stacks)
    apply_fn = lambda v, *s: model.apply(v, *s)

    want = jax.jit(lambda v, *s: ensemble_forward(
        apply_fn, v, *s, cfg.val_disp_min, cfg.val_disp_max,
        cfg.val_disp_step, posterior_impl='scan'))(variables, *stacks)

    mesh = make_mesh(8)
    got = jax.jit(lambda v, *s: ensemble_forward_sharded(
        apply_fn, v, *s, cfg.val_disp_min, cfg.val_disp_max,
        cfg.val_disp_step, mesh=mesh))(variables, *stacks)

    for key in ('mean', 'logvar', 'means', 'logvars', 'posterior'):
        a, g = np.asarray(want[key]), np.asarray(got[key])
        if key == 'logvars':   # padded dummies carry +inf, slice real ones
            g = g[:a.shape[0]]
        np.testing.assert_allclose(g, a, atol=1e-5, rtol=1e-5,
                                   err_msg=f'{key} diverges')


def test_spatially_sharded_inference_matches(data_dirs):
    """Full-scene forward with H sharded over the 'space' axis: XLA's SPMD
    partitioner handles conv halo exchange; output must match unsharded."""
    train_dir, _ = data_dirs
    cfg = Config(model_chs=6, model_in_blocks=1, model_out_blocks=2,
                 model_uncert=True).finalize()
    model = FeedForward.from_config(cfg)
    rng = np.random.default_rng(0)
    stacks = [jnp.asarray(rng.random((1, 9, 64, 64, 3), dtype=np.float32))
              for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(0), *stacks)

    fwd = jax.jit(lambda v, *s: model.apply(v, *s)['mean'])
    want = np.asarray(fwd(variables, *stacks))

    mesh = make_mesh(n_data=1, n_space=8)
    sh = spatial_sharding(mesh, h_axis=2)
    sharded = [jax.device_put(s, sh) for s in stacks]
    v_rep = jax.device_put(variables, replicated(mesh))
    got = np.asarray(fwd(v_rep, *sharded))

    np.testing.assert_allclose(got, want, atol=1e-5)

def test_validate_cli_mesh_space(data_dirs, tmp_path):
    """--mesh_space through the full validate CLI (scene spatially sharded
    over 8 devices) matches the single-device metrics."""
    import optax
    from mmlf_tpu.train.checkpoint import save_checkpoint
    from mmlf_tpu.train.loop import init_state
    from mmlf_tpu.validate.cli import run_validation

    train_dir, _ = data_dirs
    out = str(tmp_path / 'out')
    os.makedirs(out)
    cfg = Config(model_chs=6, model_in_blocks=1, model_out_blocks=2,
                 model_uncert=True).finalize()
    model = FeedForward.from_config(cfg)
    tx = optax.scale_by_adam()
    state = init_state(cfg, model, tx, [jnp.zeros((1, 9, 32, 32, 3))] * 4)
    save_checkpoint(out, {'params': state.params,
                          'batch_stats': state.batch_stats},
                    cfg.to_dict(), None, 0, None)

    single = run_validation(out, train_dir, val_loss_margin=5)
    sharded = run_validation(out, train_dir, val_loss_margin=5,
                             mesh_space=8)
    # kld tolerance: sharded reductions reassociate the fp32 sums
    for k, tol in (('mse', 1e-4), ('badpix', 1e-4), ('kld', 2e-3)):
        assert abs(single[k] - sharded[k]) < tol, (k, single[k], sharded[k])


def test_sharded_pallas_gather_matches_xla(data_dirs):
    """The shard_mapped Pallas DMA gather (interpret mode on the CPU mesh)
    must bit-match the XLA fallback gather for the same batch (VERDICT r2
    item 4: the flagship input path now runs per-device on a mesh)."""
    from mmlf_tpu.data.hci4d import HCI4D
    from mmlf_tpu.data.pipeline import DevicePipeline, window_size
    from mmlf_tpu.ops.pallas.window_gather import (sharded_window_gather,
                                                   xla_window_gather)

    train_dir, _ = data_dirs
    cfg = Config(train_trainset=train_dir, train_bs=16, train_ps=32,
                 train_max_downscale=1).finalize()
    mesh = make_mesh(8)
    pipe = DevicePipeline(HCI4D(train_dir, cache=True), cfg, seed=0,
                          sharding=replicated(mesh))
    batch = pipe.sample_batch(16)
    batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    win = window_size(cfg.train_ps)
    cache = pipe.cache

    ref = jax.jit(lambda c, b: xla_window_gather(
        c.img, c.aux, c.mpi, b.scene, b.factor - 1, b.ws_y, b.ws_x,
        win))(cache, batch)
    got = jax.jit(lambda c, b: sharded_window_gather(
        c.img, c.aux, c.mpi, b.scene, b.factor - 1, b.ws_y, b.ws_x,
        win, mesh=mesh, interpret=True))(cache, batch)

    for r, g, name in zip(ref, got, ('img', 'aux', 'mpi')):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                      err_msg=name)
    # outputs carry the data sharding (per-device local gathers)
    assert got[0].sharding.is_equivalent_to(
        batch_sharding(mesh), got[0].ndim)


def test_sharded_pallas_trunk_matches_single_device():
    """FeedForward(pallas_trunk=True) on the 8-device mesh (shard_mapped
    canvas kernel, interpret mode) must match the unsharded run: loss,
    gradients, and the psum'd global BatchNorm statistics."""
    from mmlf_tpu.ops.pallas.conv_block import set_trunk_mesh

    cfg = Config(model_chs=6, model_views=3, model_in_blocks=1,
                 model_out_blocks=2, model_uncert=True,
                 pallas_trunk=True).finalize()
    model = FeedForward.from_config(cfg)
    rng = np.random.default_rng(0)
    stacks = [jnp.asarray(rng.random((8, 3, 24, 24, 3), dtype=np.float32))
              for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(1), *stacks)

    def loss(params, stats, h, v, i, d):
        out, mut = model.apply(
            {'params': params, 'batch_stats': stats}, h, v, i, d,
            train=True, mutable=['batch_stats'])
        return (jnp.mean(jnp.abs(out['mean']))
                + 0.1 * jnp.mean(out['logvar'])), mut['batch_stats']

    grad_fn = jax.jit(jax.value_and_grad(loss, has_aux=True))
    (l_ref, st_ref), g_ref = grad_fn(variables['params'],
                                     variables['batch_stats'], *stacks)

    mesh = make_mesh(8)
    set_trunk_mesh(mesh)
    try:
        sh = batch_sharding(mesh)
        sharded = [jax.device_put(s, sh) for s in stacks]
        v_rep = jax.device_put(variables, replicated(mesh))
        (l_sh, st_sh), g_sh = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(
                v_rep['params'], v_rep['batch_stats'], *sharded)
    finally:
        set_trunk_mesh(None)

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(st_ref),
            jax.tree_util.tree_leaves_with_path(st_sh)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f'stats {kp}')
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_sh)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=1e-6,
                                   err_msg=f'grad {kp}')


def test_sharded_ensemble_need_members_false():
    """need_members=False must drop the member dumps but keep selection
    and mixture posterior identical."""
    from mmlf_tpu.models.ensemble import ensemble_forward_sharded

    cfg = Config(model_chs=6, model_in_blocks=1, model_out_blocks=2,
                 model_uncert=True).finalize()
    model = FeedForward.from_config(cfg)
    rng = np.random.default_rng(2)
    stacks = [jnp.asarray(rng.random((1, 9, 32, 32, 3), dtype=np.float32))
              for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(0), *stacks)
    apply_fn = lambda v, *s: model.apply(v, *s)

    mesh = make_mesh(8)
    full = jax.jit(lambda v, *s: ensemble_forward_sharded(
        apply_fn, v, *s, -3.5, 3.5, 1.0, mesh=mesh))(variables, *stacks)
    slim = jax.jit(lambda v, *s: ensemble_forward_sharded(
        apply_fn, v, *s, -3.5, 3.5, 1.0, mesh=mesh,
        need_members=False))(variables, *stacks)

    assert slim['means'] is None and slim['logvars'] is None
    for key in ('mean', 'logvar', 'posterior'):
        np.testing.assert_allclose(np.asarray(slim[key]),
                                   np.asarray(full[key]),
                                   atol=1e-6, rtol=1e-6, err_msg=key)


def test_validate_cli_mesh_ensemble(tmp_path):
    """--mesh_ensemble end-to-end: run_validation with the member-sharded
    ensemble must reproduce the serial --val_ensamble metrics."""
    from mmlf_tpu.data.synth import generate_dataset
    from mmlf_tpu.train.loop import train
    from mmlf_tpu.validate.cli import run_validation

    train_dir = str(tmp_path / 'train')
    val_dir = str(tmp_path / 'val')
    generate_dataset(train_dir, scenes=1, size=64, seed=0)
    generate_dataset(val_dir, scenes=1, size=64, seed=5)
    out = str(tmp_path / 'run')
    os.makedirs(out, exist_ok=True)
    cfg = Config(
        train_trainset=train_dir, train_valset=val_dir,
        train_bs=2, train_ps=32, train_lr=1e-3, train_max_downscale=1,
        val_interval=2, train_steps=2, model_chs=6, model_in_blocks=1,
        model_out_blocks=2, model_uncert=True, val_loss_margin=5,
    ).finalize()
    train(cfg, out, progress=False)

    common = dict(val_loss_margin=5, val_ensamble=True, val_disp_step=1.0)
    serial = run_validation(out, val_dir, **common)
    sharded = run_validation(out, val_dir, mesh_ensemble=8, **common)
    for k in ('mse', 'badpix', 'kld', 'kld_mm', 'kld_um', 'nll'):
        np.testing.assert_allclose(sharded[k], serial[k],
                                   atol=1e-5, rtol=1e-4, err_msg=k)

    import click
    with pytest.raises(click.UsageError):
        run_validation(out, val_dir, mesh_ensemble=8, mesh_space=8,
                       **common)
    with pytest.raises(click.UsageError):
        run_validation(out, val_dir, mesh_ensemble=8, val_loss_margin=5)
