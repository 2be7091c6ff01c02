"""Input-pipeline tests: host window extraction, device cache gather,
augmentation equivalence, remat."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmlf_tpu.config import Config
from mmlf_tpu.data import HCI4D
from mmlf_tpu.data.pipeline import (AugParams, DeviceBatch, DevicePipeline,
                                    TrainPipeline, augment_batch,
                                    gather_windows, window_size)
from mmlf_tpu.data.synth import generate_dataset


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('pipe'))
    # 128px so the ps=32 window (56px) also fits at downscale factor 2
    generate_dataset(root, scenes=2, size=128, seed=0)
    return HCI4D(root, cache=True)


def _cfg(**kw):
    base = dict(train_ps=32, train_max_downscale=1, train_shift=0.5)
    base.update(kw)
    return Config(**base).finalize()


def test_host_pipeline_shapes(dataset):
    cfg = _cfg()
    pipe = TrainPipeline(dataset, cfg, seed=0)
    batch = pipe.sample_batch(3)
    win = window_size(32)
    max_off = win - 32 - 8 - 5
    assert batch.h.shape == (3, 9, win, win, 3)
    assert batch.mpi.shape == (3, 12, win, win, 5)
    assert batch.gt.shape == (3, win, win)
    assert batch.aug.y_off.min() >= 0 and batch.aug.y_off.max() <= max_off


def test_device_gather_matches_numpy(dataset):
    cfg = _cfg(train_max_downscale=2)
    pipe = DevicePipeline(dataset, cfg, seed=0)
    win = pipe.win
    b = 2
    db = DeviceBatch(
        scene=np.array([0, 1], np.int32),
        factor=np.array([1, 2], np.int32),
        ws_y=np.array([8, 0], np.int32),
        ws_x=np.array([16, 0], np.int32),
        aug=AugParams(
            shift=np.zeros(b, np.float32),
            y_off=np.zeros(b, np.int32), x_off=np.zeros(b, np.int32),
            rot_k=np.zeros(b, np.int32),
            color=np.broadcast_to(np.eye(3, dtype=np.float32),
                                  (b, 3, 3)).copy(),
            brightness=np.ones(b, np.float32),
            contrast=np.ones(b, np.float32)))

    out = gather_windows(pipe.cache, db, win)

    for s, (sc, f, wy, wx) in enumerate(zip(db.scene, db.factor,
                                            db.ws_y, db.ws_x)):
        scene = pipe.scenes[sc]
        rows = (wy + np.arange(win)) * f
        cols = (wx + np.arange(win)) * f
        np.testing.assert_allclose(
            np.asarray(out.h)[s], scene['h'][:, rows][:, :, cols],
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out.v)[s], scene['v'][:, rows][:, :, cols],
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out.d)[s], scene['d'][:, rows][:, :, cols],
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out.gt)[s],
            scene['gt'][rows][:, cols] / f, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out.mpi)[s][..., 4],
            scene['mpi'][:, rows][:, :, cols][..., 4] / f, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(out.mask)[s], scene['mask'][rows][:, cols])


def test_sampled_positions_respect_alignment(dataset):
    """DevicePipeline window starts obey the DMA tile contract (rows 8-,
    cols 16-aligned) and offsets keep the crop + wrap guard in-window."""
    cfg = _cfg(train_max_downscale=2)
    pipe = DevicePipeline(dataset, cfg, seed=7)
    db = pipe.sample_batch(64)
    assert (np.asarray(db.ws_y) % 8 == 0).all()
    assert (np.asarray(db.ws_x) % 16 == 0).all()
    max_off = pipe.win - cfg.train_ps - 8 - 5
    for off in (db.aug.y_off, db.aug.x_off):
        assert off.min() >= 0 and off.max() <= max_off
    # windows stay inside each level
    for s, f, wy, wx in zip(db.scene, db.factor, db.ws_y, db.ws_x):
        hf = (pipe.scene_shape[0] + f - 1) // f
        assert 0 <= wy <= hf - pipe.win
        assert 0 <= wx <= hf - pipe.win


def test_device_gather_feeds_augment(dataset):
    """gather_windows output must drop straight into augment_batch."""
    cfg = _cfg()
    pipe = DevicePipeline(dataset, cfg, seed=3)
    db = pipe.sample_batch(4)
    win_batch = gather_windows(pipe.cache, db, pipe.win)
    h, v, i, d, gt, mpi, mask = augment_batch(win_batch, cfg.train_ps)
    assert h.shape == (4, 9, 32, 32, 3)
    assert gt.shape == (4, 32, 32)
    assert np.isfinite(np.asarray(h)).all()


def test_static_shift_applied_once_at_cache(dataset):
    """The cached scenes carry Shift(train_shift); GT must be corrected."""
    cfg = _cfg(train_shift=1.0)
    pipe = TrainPipeline(dataset, cfg, seed=0)
    raw_gt = dataset[0][5]
    np.testing.assert_allclose(pipe.scenes[0]['gt'], raw_gt - 1.0,
                               atol=1e-6)


def test_remat_model_matches_plain(dataset):
    from mmlf_tpu.models import FeedForward
    cfg_a = Config(model_chs=6, model_in_blocks=1, model_out_blocks=2,
                   model_uncert=True).finalize()
    cfg_b = Config(model_chs=6, model_in_blocks=1, model_out_blocks=2,
                   model_uncert=True, remat=True).finalize()
    rng = np.random.default_rng(0)
    stacks = [jnp.asarray(rng.random((2, 9, 16, 16, 3), dtype=np.float32))
              for _ in range(4)]
    m_a = FeedForward.from_config(cfg_a)
    m_b = FeedForward.from_config(cfg_b)
    va = m_a.init(jax.random.PRNGKey(0), *stacks)
    out_a = m_a.apply(va, *stacks)
    out_b = m_b.apply(va, *stacks)   # same params tree
    np.testing.assert_allclose(np.asarray(out_a['mean']),
                               np.asarray(out_b['mean']), atol=1e-6)

    # gradients also agree
    def loss(m, v):
        return jnp.sum(m.apply(v, *stacks)['mean'] ** 2)
    ga = jax.grad(lambda v: loss(m_a, v))(va)
    gb = jax.grad(lambda v: loss(m_b, v))(va)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_seeded_augmentation_ignores_global_random(dataset):
    """--train_seed must pin ALL augmentation params.  The color matrix
    used to be drawn from the global `random` module (OS-seeded per
    process), so identically-seeded runs diverged across processes."""
    import random as _random

    cfg = _cfg()
    pipe1 = DevicePipeline(dataset, cfg, seed=7)
    _random.seed(111)
    b1 = pipe1.sample_batch(4)
    pipe2 = DevicePipeline(dataset, cfg, seed=7)
    _random.seed(222)
    b2 = pipe2.sample_batch(4)
    for field in AugParams._fields:
        assert np.array_equal(np.asarray(getattr(b1.aug, field)),
                              np.asarray(getattr(b2.aug, field))), field
