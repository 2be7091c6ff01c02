"""Oracle tests for the LR schedule and target preparation.

The reference implements both inline in its train loop
(mmlf/train/cli.py:190-241): the LR schedule as *stateful* param-group
mutation (warm-start sets lr while i <= 1000; cooling overrides once
i >= cooling), the targets as strongest-mode MPI gather + margin mask +
loss-padding masks.  These tests pin our pure-function equivalents
(`train/loop.py: lr_schedule, prepare_targets`) against a line-faithful
host-side simulation of the reference loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmlf_tpu.config import Config
from mmlf_tpu.ops.codecs import mpi_to_weights, reg_to_class
from mmlf_tpu.ops.masks import create_mask_margin
from mmlf_tpu.train.loop import lr_schedule, prepare_targets


def _reference_lr_sequence(lr0, warm_start, cooling, n):
    """Simulate the reference's stateful param-group updates
    (reference mmlf/train/cli.py:233-241): lr persists between steps and
    each block overwrites it in order."""
    lr = lr0  # Adam is constructed with lr=train_lr (reference :117)
    out = []
    for i in range(n):
        if warm_start and i <= 1000:
            lr = lr0 * float(i) / 1000.0
        if cooling > 0 and i >= cooling:
            lr = lr0 / (10.0 ** (i / cooling - 1.0))
        out.append(lr)
    return np.array(out)


@pytest.mark.parametrize('warm_start,cooling', [
    (False, 0),       # constant lr
    (True, 0),        # ramp then flat
    (False, 1200),    # flat then decay
    (True, 1500),     # ramp, flat, decay
    (True, 800),      # cooling kicks in INSIDE the warm-start window:
])                    # the reference's ordering lets cooling win
def test_lr_schedule_matches_reference_stateful_loop(warm_start, cooling):
    n = 2001
    cfg = Config(train_lr=1e-3, train_warm_start=warm_start,
                 train_cooling=cooling).finalize()
    ours = jax.vmap(lambda s: lr_schedule(cfg, s))(jnp.arange(n))
    ref = _reference_lr_sequence(1e-3, warm_start, cooling, n)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-5)


def test_lr_schedule_warm_start_edges():
    cfg = Config(train_lr=1e-2, train_warm_start=True).finalize()
    assert float(lr_schedule(cfg, jnp.int32(0))) == 0.0
    np.testing.assert_allclose(float(lr_schedule(cfg, jnp.int32(1000))),
                               1e-2, rtol=1e-6)
    np.testing.assert_allclose(float(lr_schedule(cfg, jnp.int32(1001))),
                               1e-2, rtol=1e-6)


def _mpi(b=1, k=3, h=16, w=16, seed=0):
    """(b, K, H, W, 5) RGB-alpha-disparity MPI with random alphas."""
    rng = np.random.default_rng(seed)
    mpi = rng.uniform(size=(b, k, h, w, 5)).astype(np.float32)
    mpi[..., 4] = rng.uniform(-3.0, 3.0, size=(b, k, h, w))
    return jnp.asarray(mpi)


def test_prepare_targets_strongest_mode_gathers_argmax_alpha_plane():
    cfg = Config(train_loss_strongest=True).finalize()
    mpi = _mpi(b=2, k=4)
    gt_in = jnp.zeros(mpi.shape[:1] + mpi.shape[2:4])
    mask = jnp.ones_like(gt_in)

    gt, _, _, _, _ = prepare_targets(cfg, gt_in, mpi, mask)

    m = np.asarray(mpi)
    inds = np.argmax(m[..., 3], axis=1)                       # (b, h, w)
    expect = np.take_along_axis(m[..., 4], inds[:, None], axis=1)[:, 0]
    np.testing.assert_array_equal(np.asarray(gt), expect)


def test_prepare_targets_margin_mask():
    # the reference multiplies the dataset mask by a margin-11 frame
    # (mmlf/train/cli.py:194) regardless of head
    cfg = Config().finalize()
    h = w = 32
    gt = jnp.zeros((1, h, w))
    mask_in = jnp.ones((1, h, w))
    _, _, _, mask, _ = prepare_targets(cfg, gt, _mpi(h=h, w=w), mask_in)
    expect = np.asarray(create_mask_margin((h, w), 11))[None]
    np.testing.assert_array_equal(np.asarray(mask), expect)
    # and respects an already-zero dataset mask
    mask_in = mask_in.at[0, 16, 16].set(0)
    _, _, _, mask, _ = prepare_targets(cfg, gt, _mpi(h=h, w=w), mask_in)
    assert int(np.asarray(mask)[0, 16, 16]) == 0


def test_prepare_targets_loss_padding_unimodal():
    cfg = Config(train_loss_padding=1.5).finalize()
    gt = jnp.asarray(np.linspace(-3, 3, 64, dtype=np.float32)
                     .reshape(1, 8, 8))
    _, _, _, _, mask_padding = prepare_targets(
        cfg, gt, _mpi(h=8, w=8), jnp.ones((1, 8, 8)))
    expect = (np.abs(np.asarray(gt)) < 1.5).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(mask_padding), expect)


def test_prepare_targets_loss_padding_multimodal_zeroes_alpha():
    # multimodal: alphas of planes whose |disparity| >= padding are zeroed
    # in the MPI itself (reference mmlf/train/cli.py:219-220)
    cfg = Config(train_loss_padding=1.0, train_loss_multimodal=True,
                 model_uncert=True).finalize()
    mpi_in = _mpi(k=3, h=8, w=8)
    _, mpi, _, _, mask_padding = prepare_targets(
        cfg, jnp.zeros((1, 8, 8)), mpi_in, jnp.ones((1, 8, 8)))
    assert mask_padding is None
    m_in, m_out = np.asarray(mpi_in), np.asarray(mpi)
    keep = np.abs(m_in[..., 4]) < 1.0
    np.testing.assert_allclose(m_out[..., 3], m_in[..., 3] * keep)
    # every other channel untouched
    np.testing.assert_array_equal(m_out[..., :3], m_in[..., :3])
    np.testing.assert_array_equal(m_out[..., 4], m_in[..., 4])


def test_prepare_targets_discrete_wiring():
    # discrete + multimodal -> mpi_to_weights; discrete alone -> reg_to_class
    # over cfg.steps bins (reference mmlf/train/cli.py:196-207)
    gt = jnp.asarray(np.random.default_rng(0)
                     .uniform(-3, 3, (1, 8, 8)).astype(np.float32))
    mpi = _mpi(h=8, w=8)
    mask = jnp.ones((1, 8, 8))

    cfg = Config(model_discrete=True).finalize()
    _, _, gt_classes, _, _ = prepare_targets(cfg, gt, mpi, mask)
    expect = reg_to_class(gt, cfg.val_disp_min, cfg.val_disp_max, cfg.steps)
    # channel-last bins here (TPU layout); the reference uses (b, n, h, w)
    assert gt_classes.shape == (1, 8, 8, cfg.steps)
    np.testing.assert_array_equal(np.asarray(gt_classes),
                                  np.asarray(expect))

    cfg = Config(model_discrete=True, train_loss_multimodal=True).finalize()
    _, _, gt_classes, _, _ = prepare_targets(cfg, gt, mpi, mask)
    expect = mpi_to_weights(mpi, cfg.val_disp_min, cfg.val_disp_max,
                            cfg.steps)
    np.testing.assert_array_equal(np.asarray(gt_classes),
                                  np.asarray(expect))

    # cross halves the bin count (steps = 2*views*3)
    cfg = Config(model_discrete=True, model_cross=True).finalize()
    _, _, gt_classes, _, _ = prepare_targets(cfg, gt, mpi, mask)
    assert gt_classes.shape == (1, 8, 8, 54)


def test_prepare_targets_base_head_no_classes():
    cfg = Config().finalize()
    _, _, gt_classes, _, mask_padding = prepare_targets(
        cfg, jnp.zeros((1, 8, 8)), _mpi(h=8, w=8), jnp.ones((1, 8, 8)))
    assert gt_classes is None and mask_padding is None
