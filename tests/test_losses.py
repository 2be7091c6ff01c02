"""Loss library tests against hand-computed values and the reference torch
implementation (oracle)."""

import sys

import numpy as np
import pytest

from mmlf_tpu import losses


def _out(mean, logvar=None, scores=None):
    return {'mean': mean, 'logvar': logvar, 'scores': scores}


def test_masked_l1_hand():
    mean = np.array([[[1.0, 2.0], [3.0, 4.0]]], np.float32)
    target = np.zeros_like(mean)
    mask = np.array([[[1, 0], [1, 0]]], np.int32)
    # (|1| + |3|) / 2 = 2
    assert float(losses.masked_l1(_out(mean), target, mask)) == pytest.approx(2.0)


def test_masked_l1_empty_mask_is_zero():
    mean = np.ones((1, 2, 2), np.float32)
    mask = np.zeros((1, 2, 2), np.int32)
    assert float(losses.masked_l1(_out(mean), mean * 0, mask)) == 0.0


def test_masked_mse_and_badpix_hand():
    mean = np.array([[[0.0, 0.5], [0.05, 1.0]]], np.float32)
    target = np.zeros_like(mean)
    mask = np.ones_like(mean, np.int32)
    assert float(losses.masked_mse(_out(mean), target, mask)) == \
        pytest.approx((0.25 + 0.0025 + 1.0) / 4)
    # badpix(0.07): 0.5 and 1.0 exceed, 0.0 and 0.05 do not
    assert float(losses.masked_badpix(_out(mean), target, mask)) == \
        pytest.approx(0.5)


def test_uncertainty_l1_hand():
    mean = np.full((1, 1, 1), 2.0, np.float32)
    logvar = np.full((1, 1, 1), 0.5, np.float32)
    target = np.zeros_like(mean)
    mask = np.ones_like(mean, np.int32)
    expect = np.exp(-0.5) * 2.0 + 0.5
    assert float(losses.uncertainty_l1(_out(mean, logvar), target, mask)) == \
        pytest.approx(expect, rel=1e-5)


def test_cross_entropy_matches_naive():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    target = rng.uniform(size=(2, 4, 4, 6)).astype(np.float32)
    mask = (rng.uniform(size=(2, 4, 4)) > 0.3).astype(np.int32)

    got = float(losses.masked_cross_entropy(_out(None, scores=scores),
                                            target, mask))
    # naive reference formula: -log(exp(sum(relu(s)*t)) / sum(exp(relu(s))))
    s = np.maximum(scores, 0)
    naive = -np.log(np.exp((s * target).sum(-1)) / np.exp(s).sum(-1))
    expect = (naive * mask).sum() / mask.sum()
    assert got == pytest.approx(expect, rel=1e-5)


def test_cross_entropy_stable_at_large_logits():
    """The log-space form must not overflow where exp(logit) does (~88.7
    in fp32) — the stability the docstring promises over the reference's
    exp/exp formulation."""
    scores = np.zeros((1, 2, 2, 4), np.float32)
    scores[..., 0] = 500.0                     # exp(500) = inf in fp32
    target = np.zeros_like(scores)
    target[..., 0] = 1.0                       # correct class
    mask = np.ones((1, 2, 2), np.int32)
    got = float(losses.masked_cross_entropy(_out(None, scores=scores),
                                            target, mask))
    # lse([500,0,0,0]) - 500 ≈ 0 up to exp(-500) terms
    assert np.isfinite(got) and got == pytest.approx(0.0, abs=1e-5)


def test_multi_masked_l1_matches_singleplane_l1():
    """A 1-plane MPI with alpha=1 must reduce to plain masked L1."""
    rng = np.random.default_rng(1)
    mean = rng.normal(size=(2, 6, 6)).astype(np.float32)
    gt = rng.normal(size=(2, 6, 6)).astype(np.float32)
    mask = np.ones((2, 6, 6), np.int32)
    mpi = np.zeros((2, 1, 6, 6, 5), np.float32)
    mpi[:, 0, :, :, 3] = 1.0
    mpi[:, 0, :, :, 4] = gt
    a = float(losses.multi_masked_l1(_out(mean), mpi, mask))
    b = float(losses.masked_l1(_out(mean), gt, mask))
    assert a == pytest.approx(b, rel=1e-6)


def test_stubs_raise():
    with pytest.raises(NotImplementedError):
        losses.multi_masked_mse(None, None, None)
    with pytest.raises(NotImplementedError):
        losses.multi_uncertainty_mse(None, None, None)


# --------------------------------------------------------------------------
# oracle comparison against the reference torch losses
# --------------------------------------------------------------------------

def _torch_losses():
    torch = pytest.importorskip('torch')
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    from mmlf.model import loss as tloss
    return torch, tloss


def test_improved_uncertainty_l1_vs_reference():
    torch, tloss = _torch_losses()
    rng = np.random.default_rng(2)
    mean = rng.normal(size=(2, 8, 8)).astype(np.float32)
    logvar = rng.normal(size=(2, 8, 8)).astype(np.float32) * 0.5
    target = rng.normal(size=(2, 8, 8)).astype(np.float32)
    mask = (rng.uniform(size=(2, 8, 8)) > 0.2).astype(np.int32)
    mask_padding = (rng.uniform(size=(2, 8, 8)) > 0.3).astype(np.int32)

    ours = float(losses.improved_uncertainty_l1(
        _out(mean, logvar), target, mask, mask_padding))

    t = lambda x: torch.from_numpy(x)
    ref = tloss.ImprovedUncertaintyL1Loss()(
        {'mean': t(mean), 'logvar': t(logvar)}, t(target),
        t(mask), t(mask_padding.astype(np.float32)))
    assert ours == pytest.approx(float(ref), rel=1e-4)

    # and without padding mask
    ours2 = float(losses.improved_uncertainty_l1(
        _out(mean, logvar), target, mask))
    ref2 = tloss.ImprovedUncertaintyL1Loss()(
        {'mean': t(mean), 'logvar': t(logvar)}, t(target), t(mask))
    assert ours2 == pytest.approx(float(ref2), rel=1e-4)


def test_improved_multi_uncertainty_l1_vs_reference():
    torch, tloss = _torch_losses()
    rng = np.random.default_rng(3)
    b, k, h, w = 2, 3, 8, 8
    mean = rng.normal(size=(b, h, w)).astype(np.float32)
    logvar = rng.normal(size=(b, h, w)).astype(np.float32) * 0.5
    mask = (rng.uniform(size=(b, h, w)) > 0.2).astype(np.int32)

    mpi = np.zeros((b, k, h, w, 5), np.float32)
    mpi[..., 3] = rng.uniform(size=(b, k, h, w)) * \
        (rng.uniform(size=(b, k, h, w)) > 0.3)   # some all-zero alpha pixels
    mpi[..., 4] = rng.normal(size=(b, k, h, w))

    ours = float(losses.improved_multi_uncertainty_l1(
        _out(mean, logvar), mpi, mask))

    # reference takes MPI as (b, k, 5, h, w)
    t = lambda x: torch.from_numpy(x)
    tmpi = t(np.ascontiguousarray(np.transpose(mpi, (0, 1, 4, 2, 3))))
    ref = tloss.ImprovedMultiUncertaintyL1Loss()(
        {'mean': t(mean), 'logvar': t(logvar)}, tmpi, t(mask))
    assert ours == pytest.approx(float(ref), rel=1e-4)


def test_multi_uncertainty_l1_vs_reference(capsys):
    torch, tloss = _torch_losses()
    rng = np.random.default_rng(4)
    b, k, h, w = 1, 2, 6, 6
    mean = rng.normal(size=(b, h, w)).astype(np.float32)
    logvar = rng.normal(size=(b, h, w)).astype(np.float32) * 0.5
    mask = np.ones((b, h, w), np.int32)
    mpi = rng.uniform(size=(b, k, h, w, 5)).astype(np.float32)

    ours = float(losses.multi_uncertainty_l1(_out(mean, logvar), mpi, mask))
    t = lambda x: torch.from_numpy(x)
    tmpi = t(np.ascontiguousarray(np.transpose(mpi, (0, 1, 4, 2, 3))))
    ref = tloss.MultiUncertaintyL1Loss()(
        {'mean': t(mean), 'logvar': t(logvar)}, tmpi, t(mask))
    capsys.readouterr()  # swallow the reference's debug print
    assert ours == pytest.approx(float(ref), rel=1e-4)


def test_logvar_anchor_hand_and_gradients():
    """Anchor = masked mean (logvar - log|err|)^2; zero at the calibrated
    point; no gradient to the mean head through the detached target."""
    import jax
    import jax.numpy as jnp
    mean = np.array([[[1.0, 2.0], [3.0, 4.0]]], np.float32)
    target = np.zeros_like(mean)
    mask = np.ones((1, 2, 2), np.int32)

    # calibrated: logvar = log|err| -> anchor 0
    lv_cal = np.log(np.abs(mean - target))
    a0 = losses.logvar_anchor(_out(mean, lv_cal), target, None, mask)
    assert float(a0) == pytest.approx(0.0, abs=1e-10)

    # hand value: logvar 0 everywhere -> mean of log(err)^2
    lv0 = np.zeros_like(mean)
    expect = float(np.mean(np.log(np.abs(mean)) ** 2))
    a1 = losses.logvar_anchor(_out(mean, lv0), target, None, mask)
    assert float(a1) == pytest.approx(expect, rel=1e-6)

    # the anchor's gradient wrt the MEAN is exactly zero (detached target)
    g = jax.grad(lambda m: losses.logvar_anchor(
        _out(m, jnp.asarray(lv0)), target, None, mask))(jnp.asarray(mean))
    assert float(jnp.max(jnp.abs(g))) == 0.0

    # mask_padding excludes out-of-range pixels
    mp = np.array([[[1, 1], [0, 0]]], np.int32)
    a2 = losses.logvar_anchor(_out(mean, lv0), target, None, mask,
                              mask_padding=mp)
    expect2 = float(np.mean(np.log(np.abs(mean[0, 0])) ** 2))
    assert float(a2) == pytest.approx(expect2, rel=1e-6)


def test_logvar_anchor_multimodal_weighted_error():
    mean = np.full((1, 2, 2), 1.0, np.float32)
    # two planes: d=0 (w=.5) and d=2 (w=.5) -> weighted |err| = 1.0
    mpi = np.zeros((1, 2, 2, 2, 5), np.float32)
    mpi[:, 0, ..., 3] = 0.5
    mpi[:, 0, ..., 4] = 0.0
    mpi[:, 1, ..., 3] = 0.5
    mpi[:, 1, ..., 4] = 2.0
    mask = np.ones((1, 2, 2), np.int32)
    lv0 = np.zeros_like(mean)
    # log(1.0) = 0 -> anchor 0 at logvar 0
    a = losses.logvar_anchor(_out(mean, lv0), None, mpi, mask,
                             multimodal=True)
    assert float(a) == pytest.approx(0.0, abs=1e-9)
