"""EPI-Shift parity tests.

The oracle below re-implements the *documented* reference semantics
(mmlf/data/hci4d.py:894-990) directly in numpy: per-view modf decomposition
and the concat-based circular shift.  Our vectorized gather implementation
must match it bit-for-bit (up to float associativity).
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from mmlf_tpu.ops import shift as shift_ops


def _cat_roll(x, s, axis):
    """The reference's concat trick: cat([x[-s:], x[:-s]], axis)."""
    idx_hi = [slice(None)] * x.ndim
    idx_lo = [slice(None)] * x.ndim
    idx_hi[axis] = slice(-s, None) if s != 0 else slice(None)
    idx_lo[axis] = slice(None, -s) if s != 0 else slice(0, 0)
    return np.concatenate([x[tuple(idx_hi)], x[tuple(idx_lo)]], axis)


def _oracle_roll_lerp(x, s, axis):
    alpha, s0 = math.modf(s)
    alpha = abs(alpha)
    s1 = s0 + math.copysign(1.0, s0)
    return _cat_roll(x, int(s0), axis) * (1.0 - alpha) + \
        _cat_roll(x, int(s1), axis) * alpha


def _oracle_shift(h, v, i, d, disp):
    """Reference Shift transform semantics on (n, H, W, C) stacks."""
    h, v, i, d = h.copy(), v.copy(), i.copy(), d.copy()
    n = h.shape[0]
    c = n // 2
    for k in range(n):
        s = disp * (k - c)
        h[k] = _oracle_roll_lerp(h[k], s, axis=1)    # along W
        i[k] = _oracle_roll_lerp(i[k], s, axis=1)
        d[k] = _oracle_roll_lerp(d[k], s, axis=1)
    for k in range(n):
        s = disp * (k - c)
        v[k] = _oracle_roll_lerp(v[k], s, axis=0)    # along H
        i[k] = _oracle_roll_lerp(i[k], -s, axis=0)
        d[k] = _oracle_roll_lerp(d[k], s, axis=0)
    return h, v, i, d


def _rand_stacks(rng, n=5, hh=12, ww=16):
    return [rng.random((n, hh, ww, 3), dtype=np.float32) for _ in range(4)]


@pytest.mark.parametrize('disp', [0.0, 1.0, -1.0, 0.5, -0.5, 2.5, -2.5,
                                  0.3, -0.3, 1.7, -1.7, 3.0])
def test_shift_matches_reference_semantics(disp):
    rng = np.random.default_rng(0)
    h, v, i, d = _rand_stacks(rng)
    oh, ov, oi, od = _oracle_shift(h, v, i, d, disp)
    jh, jv, ji, jd = shift_ops.shift_lf(h, v, i, d, disp)
    np.testing.assert_allclose(np.asarray(jh), oh, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jv), ov, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ji), oi, rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(jd), od, rtol=0, atol=2e-6)


def test_modf_signed_zero():
    """s = -0.3: trunc gives -0.0, so shift1 must be -1 (not +1)."""
    alpha, s0, s1 = shift_ops.modf_shift_components(np.float32(-0.3))
    assert float(alpha) == pytest.approx(0.3, abs=1e-7)
    assert int(s0) == 0
    assert int(s1) == -1

    alpha, s0, s1 = shift_ops.modf_shift_components(np.float32(0.3))
    assert int(s1) == 1


def test_shift_traced_disp_matches_static():
    """The ensemble path traces disp; must equal the eager static result."""
    import jax
    rng = np.random.default_rng(1)
    h, v, i, d = _rand_stacks(rng)

    fn = jax.jit(lambda dd: shift_ops.shift_lf(h, v, i, d, dd))
    for disp in [0.0, -1.3, 2.5]:
        traced = fn(jnp.float32(disp))
        static = shift_ops.shift_lf(h, v, i, d, disp)
        for t, s in zip(traced, static):
            np.testing.assert_allclose(np.asarray(t), np.asarray(s), atol=1e-6)


def test_integer_shift_roundtrip():
    """Integer shifts are exact circular rolls, so +d then -d is identity.

    (Fractional shifts lerp between rolls, so their round trip is a small
    blur by construction — only integer shifts invert exactly.)
    """
    rng = np.random.default_rng(2)
    h, v, i, d = _rand_stacks(rng, n=5, hh=32, ww=32)
    fwd = shift_ops.integer_shift_lf(h, v, i, d, 2)
    back = shift_ops.integer_shift_lf(*[np.asarray(x) for x in fwd], -2)
    for orig, rec in zip([h, v, i, d], back):
        np.testing.assert_allclose(np.asarray(rec), orig, atol=1e-6)


def test_shift_sample_corrects_gt_and_mpi():
    rng = np.random.default_rng(3)
    h, v, i, d = _rand_stacks(rng)
    gt = rng.random((12, 16), dtype=np.float32)
    mpi = rng.random((2, 12, 16, 5), dtype=np.float32)
    _, _, _, _, gt2, mpi2 = shift_ops.shift_sample(
        jnp.asarray(h), jnp.asarray(v), jnp.asarray(i), jnp.asarray(d),
        jnp.asarray(gt), jnp.asarray(mpi), 0.7)
    np.testing.assert_allclose(np.asarray(gt2), gt - 0.7, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mpi2)[..., 4], mpi[..., 4] - 0.7,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(mpi2)[..., :4], mpi[..., :4])
