"""End-to-end training integration tests on a synthetic mini-dataset."""

import os

import numpy as np
import pytest

from mmlf_tpu.config import Config
from mmlf_tpu.data.synth import generate_dataset
from mmlf_tpu.train.loop import train


@pytest.fixture(scope='module')
def data_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp('ds')
    train_dir = str(root / 'train')
    val_dir = str(root / 'val')
    generate_dataset(train_dir, scenes=2, size=64, seed=0)
    generate_dataset(val_dir, scenes=1, size=64, seed=7)
    return train_dir, val_dir


def _cfg(data_dirs, **kw):
    train_dir, val_dir = data_dirs
    base = dict(
        train_trainset=train_dir, train_valset=val_dir,
        train_bs=4, train_ps=32, train_lr=1e-3,
        train_max_downscale=1,       # 64px scenes can't downscale further
        val_interval=2, val_loss_margin=5, train_steps=4,
        model_chs=8, model_in_blocks=1, model_out_blocks=2,
    )
    base.update(kw)
    return Config(**base).finalize()


@pytest.mark.parametrize('head', ['base', 'uncert', 'discrete'])
def test_train_heads_run_and_log(data_dirs, tmp_path, head):
    out = str(tmp_path / head)
    os.makedirs(out)
    cfg = _cfg(data_dirs,
               model_uncert=(head == 'uncert'),
               model_discrete=(head == 'discrete'))
    state = train(cfg, out, progress=False)
    assert int(state.step) == 4

    log = open(os.path.join(out, 'log.csv')).read().splitlines()
    assert log[0].startswith('   iter')
    assert len(log) == 5   # header + 4 steps
    # losses are finite
    losses = [float(l.split(',')[1]) for l in log[1:]]
    assert all(np.isfinite(losses))

    # checkpoint written with config inside
    assert os.path.exists(os.path.join(out, 'checkpoint.msgpack'))
    import json
    hyper = json.load(open(os.path.join(out, 'hyper_parameters.json')))
    assert hyper['model_uncert'] == (head == 'uncert')

    # validation artifacts written
    assert os.path.exists(os.path.join(out, 'ours', 'disp_maps'))


def test_train_multimodal_loss(data_dirs, tmp_path):
    out = str(tmp_path / 'mm')
    os.makedirs(out)
    cfg = _cfg(data_dirs, model_uncert=True, train_loss_multimodal=True)
    state = train(cfg, out, progress=False)
    assert int(state.step) == 4


def test_logvar_warmup_semantics():
    """--train_logvar_warmup N: at step 0 the UPR training loss is EXACTLY
    masked L1; at step >= N it equals the unwarmed reference loss; the
    default (0) ignores the step entirely."""
    import jax.numpy as jnp
    from mmlf_tpu import losses
    from mmlf_tpu.train.loop import compute_loss

    rng = np.random.default_rng(3)
    out = {'mean': rng.normal(size=(2, 8, 8)).astype(np.float32),
           'logvar': rng.normal(size=(2, 8, 8)).astype(np.float32)}
    gt = rng.normal(size=(2, 8, 8)).astype(np.float32)
    mask = np.ones((2, 8, 8), np.int32)

    cfg = Config(model_uncert=True, train_logvar_warmup=100).finalize()
    args = (gt, None, None, mask, None)

    at0 = float(compute_loss(cfg, out, *args, step=jnp.int32(0)))
    assert at0 == pytest.approx(
        float(losses.masked_l1(out, gt, mask)), rel=1e-6)

    full = float(losses.improved_uncertainty_l1(out, gt, mask))
    at_n = float(compute_loss(cfg, out, *args, step=jnp.int32(100)))
    assert at_n == pytest.approx(full, rel=1e-6)

    # mid-ramp: strictly between neither endpoint's logvar scaling
    at_half = float(compute_loss(cfg, out, *args, step=jnp.int32(50)))
    half = {'mean': out['mean'], 'logvar': out['logvar'] * 0.5}
    assert at_half == pytest.approx(
        float(losses.improved_uncertainty_l1(half, gt, mask)), rel=1e-6)

    cfg_off = Config(model_uncert=True).finalize()
    off = float(compute_loss(cfg_off, out, *args, step=jnp.int32(0)))
    assert off == pytest.approx(full, rel=1e-6)


def test_logvar_warmup_trains(data_dirs, tmp_path):
    """End-to-end: the warmup flag threads through the jitted step (the
    coupling weight comes from the traced state.step, not a retrace)."""
    out = str(tmp_path / 'lvw')
    os.makedirs(out)
    cfg = _cfg(data_dirs, model_uncert=True, train_logvar_warmup=3)
    state = train(cfg, out, progress=False)
    assert int(state.step) == 4
    log = open(os.path.join(out, 'log.csv')).read().splitlines()
    losses_ = [float(l.split(',')[1]) for l in log[1:]]
    assert all(np.isfinite(losses_))


def test_resume_restores_step_and_params(data_dirs, tmp_path):
    out = str(tmp_path / 'resume')
    os.makedirs(out)
    cfg = _cfg(data_dirs, train_steps=3)
    state1 = train(cfg, out, progress=False)

    cfg2 = _cfg(data_dirs, train_steps=5, train_resume=True)
    state2 = train(cfg2, out, progress=False)
    assert int(state2.step) == 5

    # resumed log appended, not truncated.  The COMPLETED first run's
    # final state is persisted post-increment at train_steps (round-5
    # completion save), so resuming it is replay-free: 3..4, not the old
    # last-val-boundary replay from 2
    log = open(os.path.join(out, 'log.csv')).read().splitlines()
    iters = [int(l.split(',')[0]) for l in log[1:]]
    assert iters == [0, 1, 2, 3, 4]


def test_sigterm_checkpoints_and_resumes(data_dirs, tmp_path):
    """Graceful preemption: SIGTERM mid-run finishes the in-flight step,
    writes the rolling checkpoint at the current iteration and returns
    cleanly; --train_resume continues from there."""
    import signal
    import threading
    from mmlf_tpu.train.checkpoint import load_checkpoint_raw

    out = str(tmp_path / 'term')
    os.makedirs(out)
    # val_interval high enough that only step 0's val checkpoint exists —
    # the SIGTERM save must advance past it
    cfg = _cfg(data_dirs, train_steps=100000, val_interval=1000000)

    import time as _time
    stop = threading.Event()

    def fire():
        # wait until train() has installed its handler (startup/compile can
        # take many seconds), give it a moment to run a few steps, then
        # deliver the signal
        deadline = _time.time() + 120
        while (_time.time() < deadline and not stop.is_set()
               and signal.getsignal(signal.SIGTERM) is signal.SIG_DFL):
            _time.sleep(0.05)
        if stop.is_set():
            return
        _time.sleep(1.0)
        # train() may have raised meanwhile and restored SIG_DFL — raising
        # then would kill the pytest process instead of reporting
        if stop.is_set() or \
                signal.getsignal(signal.SIGTERM) is signal.SIG_DFL:
            return
        signal.raise_signal(signal.SIGTERM)

    t = threading.Thread(target=fire)
    t.start()
    try:
        state = train(cfg, out, progress=False)
    finally:
        stop.set()
        t.join()

    _, meta, _ = load_checkpoint_raw(out)
    n = int(meta['iteration'])
    assert 1 <= n < 100000
    assert int(state.step) == n
    # the handler was restored
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL

    cfg2 = _cfg(data_dirs, train_steps=n + 2, train_resume=True,
                val_interval=1000000)
    state2 = train(cfg2, out, progress=False)
    assert int(state2.step) == n + 2


def test_checkpoint_template_roundtrip(tmp_path):
    """save → load_checkpoint restores tuple-typed optimizer state into
    the template's types (the raw msgpack tree alone turns tuples into
    index-keyed dicts), and the decode-once path (load_checkpoint_raw +
    restore_from_raw) agrees with it."""
    from mmlf_tpu.train.checkpoint import (load_checkpoint,
                                           load_checkpoint_raw,
                                           restore_from_raw,
                                           save_checkpoint)

    tree = {'params': {'w': np.arange(6, dtype=np.float32).reshape(2, 3)},
            'opt_state': (np.float32(0.9), {'mu': np.ones(3, np.float32)})}
    out = str(tmp_path)
    save_checkpoint(out, tree, {'model_chs': 8}, epoch=1, iteration=7,
                    loss=0.5)

    template = {'params': {'w': np.zeros((2, 3), np.float32)},
                'opt_state': (np.float32(0), {'mu': np.zeros(3, np.float32)})}
    restored, meta, hyper = load_checkpoint(out, template)
    assert isinstance(restored['opt_state'], tuple)
    np.testing.assert_array_equal(restored['params']['w'],
                                  tree['params']['w'])
    np.testing.assert_array_equal(restored['opt_state'][1]['mu'],
                                  tree['opt_state'][1]['mu'])
    assert meta['iteration'] == 7 and hyper['model_chs'] == 8

    raw, meta2, _ = load_checkpoint_raw(out)
    raw['__meta__'] = meta2
    restored2, meta3 = restore_from_raw(raw, template)
    assert isinstance(restored2['opt_state'], tuple)
    np.testing.assert_array_equal(restored2['params']['w'],
                                  restored['params']['w'])
    assert meta3['iteration'] == 7


def test_resume_does_not_replay_rng_stream(data_dirs, tmp_path, monkeypatch):
    """A resumed run must draw a FRESH deterministic sample stream (seed
    mixed from train_seed and the checkpoint iteration), not replay steps
    0..N — the reference's DataLoader likewise reshuffles on restart.
    SeedSequence mixing (not addition) so a resumed seed-11 run never
    collides with an independent seed-13 run."""
    import mmlf_tpu.train.loop as loop_mod

    seen = []
    orig = loop_mod.DevicePipeline

    class Recording(orig):
        def __init__(self, *a, **kw):
            seen.append(kw.get('seed'))
            super().__init__(*a, **kw)

    monkeypatch.setattr(loop_mod, 'DevicePipeline', Recording)

    out = str(tmp_path / 'rngresume')
    os.makedirs(out)
    cfg = _cfg(data_dirs, train_steps=3, train_seed=11)
    train(cfg, out, progress=False)     # completion save stamps i=3
    cfg2 = _cfg(data_dirs, train_steps=5, train_seed=11, train_resume=True)
    train(cfg2, out, progress=False)
    assert seen[0] == 11          # fresh run: the configured seed
    expect = int(np.random.SeedSequence([11, 3]).generate_state(1)[0])
    assert seen[1] == expect      # resumed: mixed(seed, stored iteration)
    assert seen[1] != 11 + 2      # NOT additive (collision-prone)


def test_nan_guard_fails_before_checkpoint(data_dirs, tmp_path, monkeypatch):
    """--train_nan_guard must raise BEFORE the val-step checkpoint can
    persist the poisoned state (this ordering is why the guard keeps the
    log readback synchronous, loop.py log_lag)."""
    import mmlf_tpu.train.loop as loop_mod

    orig = loop_mod.make_train_step

    def poisoned(*a, **kw):
        step = orig(*a, **kw)
        if kw.get('bn_train', True):
            def bad_step(state, batch, cache):
                state, loss = step(state, batch, cache)
                return state, loss * np.float32('nan')
            return bad_step
        return step

    monkeypatch.setattr(loop_mod, 'make_train_step', poisoned)
    out = str(tmp_path / 'nan')
    os.makedirs(out)
    cfg = _cfg(data_dirs, train_steps=3, train_nan_guard=True)
    with pytest.raises(FloatingPointError, match='step 0'):
        train(cfg, out, progress=False)
    # NaN at step 0 fires before the step-0 validation/checkpoint block
    assert not os.path.exists(os.path.join(out, 'checkpoint.msgpack'))


def test_profiler_trace_flushed_on_short_run(data_dirs, tmp_path):
    """--train_profile starts tracing at step 10; a run shorter than the
    step-15 stop must still flush the trace on exit."""
    out = str(tmp_path / 'prof')
    os.makedirs(out)
    cfg = _cfg(data_dirs, train_steps=12, train_profile=True)
    train(cfg, out, progress=False)
    prof = os.path.join(out, 'profile')
    assert os.path.isdir(prof)
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(prof) for f in fs]
    assert files, 'profiler trace was not written'


def test_train_loss_decreases_base(data_dirs, tmp_path):
    """On the synthetic scenes a small model must make progress."""
    out = str(tmp_path / 'learn')
    os.makedirs(out)
    cfg = _cfg(data_dirs, train_steps=30, train_bs=8, train_lr=3e-3,
               val_interval=30, train_no_data_augment=True)
    train(cfg, out, progress=False)
    log = open(os.path.join(out, 'log.csv')).read().splitlines()
    losses = [float(l.split(',')[1]) for l in log[1:]]
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_grad_accumulation_matches_full_batch(tmp_path):
    """accum=2 (two microbatches) equals the full-batch step exactly for
    mean losses with full masks (no BN: stats semantics differ by design)."""
    import jax
    import jax.numpy as jnp
    import optax
    from mmlf_tpu.config import Config
    from mmlf_tpu.data import HCI4D
    from mmlf_tpu.data.pipeline import DevicePipeline
    from mmlf_tpu.data.synth import generate_dataset
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.train.loop import init_state, make_train_step

    root = str(tmp_path / 'accum')
    generate_dataset(root, scenes=1, size=128, seed=0)
    base = dict(train_trainset=root, train_bs=4, train_ps=32,
                train_lr=1e-2, train_max_downscale=1, model_chs=6,
                model_in_blocks=1, model_out_blocks=2,
                model_no_batchnorm=True, train_no_data_augment=True)
    cfg1 = Config(**base).finalize()
    cfg2 = Config(**base, train_accum=2).finalize()

    ds = HCI4D(root, cache=True)
    pipe = DevicePipeline(ds, cfg1, seed=0)
    batch = pipe.sample_batch(4)

    model = FeedForward.from_config(cfg1)
    # identity transform: the param delta IS -lr * grad, so this compares
    # raw gradients (Adam's first step is ~sign(g) and amplifies float
    # reassociation noise on near-zero grads)
    tx = optax.identity()
    state = init_state(cfg1, model, tx, [jnp.zeros((1, 9, 32, 32, 3))] * 4)

    s1, l1 = make_train_step(cfg1, model, tx, use_cache=True)(
        state, batch, pipe.cache)
    state = init_state(cfg1, model, tx, [jnp.zeros((1, 9, 32, 32, 3))] * 4)
    s2, l2 = make_train_step(cfg2, model, tx, use_cache=True)(
        state, batch, pipe.cache)

    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-4)


def test_accum_exact_matches_full_batch_with_unequal_masks(tmp_path):
    """--train_accum_exact: count-weighted accumulation equals the
    single-batch global masked mean even when per-chunk mask counts
    differ; the default uniform averaging deviates there (the
    accum_mean_probe's forced worst case, pinned on CPU)."""
    import jax
    import jax.numpy as jnp
    import optax
    from mmlf_tpu.config import Config
    from mmlf_tpu.data import HCI4D
    from mmlf_tpu.data.pipeline import DevicePipeline
    from mmlf_tpu.data.synth import generate_dataset
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.train.loop import init_state, make_train_step

    root = str(tmp_path / 'accumx')
    generate_dataset(root, scenes=1, size=128, seed=0)

    ds = HCI4D(root, cache=True)
    # invalidate a vertical stripe of the scene mask so random windows
    # carry very different valid-pixel counts across accumulation chunks
    s = ds.data[0]
    mask = np.asarray(s[7]).copy()
    mask[:, : mask.shape[1] * 3 // 4] = 0
    ds.data[0] = s[:7] + (mask,) + s[8:]

    base = dict(train_trainset=root, train_bs=4, train_ps=32,
                train_lr=1e-2, train_max_downscale=1, model_chs=6,
                model_in_blocks=1, model_out_blocks=2, model_uncert=True,
                model_no_batchnorm=True, train_no_data_augment=True)
    cfg1 = Config(**base).finalize()
    cfg_u = Config(**base, train_accum=2).finalize()
    cfg_x = Config(**base, train_accum=2, train_accum_exact=True).finalize()

    # seed chosen so the two accumulation chunks see unequal NONZERO
    # valid-pixel counts (90 vs 100) under the punched mask
    pipe = DevicePipeline(ds, cfg1, seed=4)
    batch = pipe.sample_batch(4)

    model = FeedForward.from_config(cfg1)
    tx = optax.identity()          # param delta == -lr * grad

    def run(cfg):
        state = init_state(cfg1, model, tx,
                           [jnp.zeros((1, 9, 32, 32, 3))] * 4)
        s, l = make_train_step(cfg, model, tx, use_cache=True)(
            state, batch, pipe.cache)
        return float(l), np.concatenate(
            [np.ravel(x) for x in jax.tree_util.tree_leaves(s.params)])

    l_full, p_full = run(cfg1)
    l_uni, p_uni = run(cfg_u)
    l_ex, p_ex = run(cfg_x)

    # exact mode reproduces the full-batch masked mean...
    assert l_ex == pytest.approx(l_full, rel=1e-5)
    np.testing.assert_allclose(p_ex, p_full, atol=1e-6, rtol=1e-4)
    # ...while uniform averaging measurably deviates on these masks
    assert abs(l_uni - l_full) > 10 * max(abs(l_ex - l_full), 1e-9)


def test_accum_exact_rejects_two_count_losses(tmp_path):
    from mmlf_tpu.config import Config
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.train.loop import make_train_step
    import optax
    base = dict(train_trainset='.', train_bs=4, train_ps=32,
                model_chs=6, model_in_blocks=1, model_out_blocks=2,
                train_accum=2, train_accum_exact=True, model_uncert=True)
    cfg = Config(**base, train_loss_padding=3.5).finalize()
    with pytest.raises(ValueError, match='train_loss_padding'):
        make_train_step(cfg, FeedForward.from_config(cfg),
                        optax.identity())


def test_model_saver_surfaces_async_write_errors(tmp_path, monkeypatch):
    """A failed background checkpoint write must not kill the writer
    silently: the error surfaces on the training thread at the next save
    (code-review r2 finding)."""
    import time as _time
    import pytest
    from mmlf_tpu.train import checkpoint as C

    calls = {'n': 0}

    def boom(*a, **k):
        calls['n'] += 1
        raise OSError('disk full')

    monkeypatch.setattr(C, '_write_checkpoint', boom)
    saver = C.ModelSaver()
    saver(str(tmp_path), {'params': {}}, {}, 0, 1, 0.5)
    for _ in range(100):                      # wait for the worker attempt
        if calls['n']:
            break
        _time.sleep(0.05)
    with pytest.raises(RuntimeError, match='async checkpoint write failed'):
        for _ in range(100):
            saver(str(tmp_path), {'params': {}}, {}, 0, 2, 0.4)
            _time.sleep(0.02)

    # the writer thread survived the failure and close() drains cleanly
    monkeypatch.setattr(C, '_write_checkpoint', lambda *a, **k: None)
    saver(str(tmp_path), {'params': {}}, {}, 0, 3, 0.3)
    saver.close()


def test_train_unet_smoke(data_dirs, tmp_path):
    """--model_unet trains end-to-end (VERDICT r2 weak #5: the U-Net path
    was eval-proven only).  U-Net needs 2^(depth-1)-divisible patches; use
    depth-5 default with ps=32."""
    out = str(tmp_path / 'unet')
    os.makedirs(out)
    cfg = _cfg(data_dirs, model_unet=True, model_uncert=True, train_steps=2,
               val_interval=2)
    state = train(cfg, out, progress=False)
    assert int(state.step) == 2
    log = open(os.path.join(out, 'log.csv')).read().splitlines()
    losses = [float(l.split(',')[1]) for l in log[1:]]
    assert all(np.isfinite(losses))
    # the U-Net's FusedBatchNorm stats actually updated during training
    leaves = [np.asarray(x) for x in
              __import__('jax').tree_util.tree_leaves(
                  state.batch_stats['out_net'])]
    assert any(np.abs(l).max() > 0 for l in leaves if l.size)


def test_train_cross_smoke(data_dirs, tmp_path):
    """--model_cross trains the 2-stream (h+v only) variant end-to-end;
    the pipeline still emits 4 stacks and the model ignores i/d
    (reference feed_forward.py:81-84, 263-267: steps halve to 2*views*3)."""
    out = str(tmp_path / 'cross')
    os.makedirs(out)
    cfg = _cfg(data_dirs, model_cross=True, model_discrete=True,
               train_steps=2, val_interval=2)
    assert cfg.steps == 54
    state = train(cfg, out, progress=False)
    assert int(state.step) == 2
    # only the hv stream net exists
    assert 'in_net_hv' in state.params and 'in_net_id' not in state.params


def test_train_strongest_and_eval_mode_smoke(data_dirs, tmp_path):
    """--train_loss_strongest picks the max-alpha MPI plane as GT
    (reference train/cli.py:190-192) and --train_eval_mode freezes BN
    stats from --train_eval_mode_start on (reference :227-231)."""
    out = str(tmp_path / 'strongest')
    os.makedirs(out)
    cfg = _cfg(data_dirs, train_loss_strongest=True, train_eval_mode=True,
               train_eval_mode_start=2, train_steps=4, val_interval=4)
    state = train(cfg, out, progress=False)
    assert int(state.step) == 4
    log = open(os.path.join(out, 'log.csv')).read().splitlines()
    losses = [float(l.split(',')[1]) for l in log[1:]]
    assert all(np.isfinite(losses))


def test_log_time_elapsed_semantics(data_dirs, tmp_path):
    """time_elapsed is measured between row EMITS (when the step's loss
    readback resolves, i.e. the step verifiably executed) — not between
    dispatches, which on an async backend would log ~ms enqueue times for
    multi-second device steps.  Row 0 keeps the reference's quirk of
    printing the absolute unix time (reference train/cli.py:184)."""
    out = str(tmp_path / 'timing')
    os.makedirs(out)
    cfg = _cfg(data_dirs, train_steps=5, val_interval=4)
    train(cfg, out, progress=False)
    rows = open(os.path.join(out, 'log.csv')).read().splitlines()[1:]
    dts = [float(r.split(',')[5]) for r in rows]
    assert len(dts) == 5
    assert dts[0] > 1e9                      # unix-time quirk
    assert all(0.0 <= dt < 1e6 for dt in dts[1:])


def test_train_accum_with_augmentation_smoke(data_dirs, tmp_path):
    """The README bs=512 recipe path: gradient accumulation with the
    device-cache input pipeline and augmentation ON — exercises the
    per-chunk stratified rotations (DevicePipeline._stratified_rot), the
    host-side parity guard, and gather_augment(parity=True) inside the
    accumulation scan."""
    out = str(tmp_path / 'accum_aug')
    os.makedirs(out)
    cfg = _cfg(data_dirs, train_accum=2, train_steps=2, val_interval=2,
               model_uncert=True)
    state = train(cfg, out, progress=False)
    assert int(state.step) == 2
    log = open(os.path.join(out, 'log.csv')).read().splitlines()
    losses = [float(l.split(',')[1]) for l in log[1:]]
    assert all(np.isfinite(losses))


def test_check_rot_parity_guard():
    """The host-side guard must reject batches violating the stratified
    contract (which would silently de-sync stacks from targets in-step)."""
    from mmlf_tpu.data.pipeline import check_rot_parity
    check_rot_parity(np.array([0, 2, 1, 3]), accum=1)
    check_rot_parity(np.array([0, 1, 2, 3]), accum=2)  # per-chunk halves
    with pytest.raises(ValueError):
        check_rot_parity(np.array([1, 2, 0, 3]), accum=1)
    with pytest.raises(ValueError):
        check_rot_parity(np.array([0, 2, 1, 3]), accum=2)
