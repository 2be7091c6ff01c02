"""EPI-Shift: sub-pixel re-centering of light-field view stacks.

This is the core preprocessing primitive of the whole pipeline: shifting every
view of a stack by ``disp * (view_index - center)`` pixels re-centres the
light field on disparity ``disp``.  It feeds training augmentation, the static
``train_shift``, and the 70-member shift ensemble (ESE).

Semantics match the reference transform bit-for-bit
(reference: mmlf/data/hci4d.py:894-990):

  * the fractional shift is decomposed with ``math.modf`` semantics —
    ``shift0 = trunc(s)``, ``alpha = |s - shift0|``,
    ``shift1 = shift0 + copysign(1, shift0)`` (note: ``copysign`` acts on the
    *signed zero* of ``trunc``, so ``s = -0.3`` gives ``shift1 = -1`` while
    ``s = +0.3`` gives ``shift1 = +1``);
  * each view is the lerp of two *circular* rolls:
    ``(1-alpha) * roll(x, shift0) + alpha * roll(x, shift1)`` — the
    reference's ``cat([x[-s:], x[:-s]])`` concat trick is exactly
    ``np.roll(x, s)`` for every integer ``s`` including 0
    (``x[-0:]`` is the whole array);
  * horizontal views roll along W, vertical along H; the increasing diagonal
    rolls along W by ``+s`` and along H by ``-s``; the decreasing diagonal
    rolls by ``+s`` along both axes;
  * ground truth and the MPI disparity channel are corrected by ``-disp``.

TPU-first design: instead of a Python loop over views doing two concats each
(reference), all views are shifted with a single ``take_along_axis`` gather
pair, and ``disp`` may be a *traced* value — so the ESE ensemble can be a
single ``lax.scan`` over the disparity grid, compiled once.
"""

from __future__ import annotations

import jax.numpy as jnp


def modf_shift_components(s):
    """Decompose shifts ``s`` into (alpha, shift0, shift1) with modf semantics.

    Works on scalars or arrays, traced or concrete.  Returns float alpha and
    int32 shifts.
    """
    s = jnp.asarray(s, dtype=jnp.float32)
    s0 = jnp.trunc(s)
    alpha = jnp.abs(s - s0)
    # copysign on the signed zero of trunc reproduces math.copysign(1., -0.)
    s1 = s0 + jnp.copysign(jnp.float32(1.0), s0)
    return alpha, s0.astype(jnp.int32), s1.astype(jnp.int32)


def roll_lerp(x, shift, axis: int):
    """Circular-roll ``x`` by a (possibly fractional, possibly traced) shift.

    ``(1-alpha) * roll(x, s0, axis) + alpha * roll(x, s1, axis)``.
    """
    alpha, s0, s1 = modf_shift_components(shift)
    return (1.0 - alpha) * jnp.roll(x, s0, axis) + \
        alpha * jnp.roll(x, s1, axis)


def view_offsets(n: int) -> jnp.ndarray:
    """Per-view offsets ``i - n//2`` for an ``n``-view stack."""
    return jnp.arange(n, dtype=jnp.float32) - float(n // 2)


def roll_lerp_views(stack, shifts, axis: int):
    """Shift every view of a stack by its own fractional amount in one gather.

    :param stack: ``(..., n, H, W, C)`` view stack (view axis must be -4)
    :param shifts: ``(n,)`` per-view shift amounts (traced OK)
    :param axis: roll axis, ``-3`` (H) or ``-2`` (W)
    """
    if axis not in (-2, -3):
        raise ValueError('axis must be -2 (W) or -3 (H)')
    alpha, s0, s1 = modf_shift_components(shifts)

    length = stack.shape[axis]
    pos = jnp.arange(length, dtype=jnp.int32)
    # roll(x, s)[j] == x[(j - s) mod L]
    idx0 = jnp.mod(pos[None, :] - s0[:, None], length)   # (n, L)
    idx1 = jnp.mod(pos[None, :] - s1[:, None], length)

    # reshape (n, L) to broadcast against (..., n, H, W, C)
    if axis == -2:   # roll along W: index shape (n, 1, L, 1)
        idx0 = idx0[:, None, :, None]
        idx1 = idx1[:, None, :, None]
    else:            # roll along H: index shape (n, L, 1, 1)
        idx0 = idx0[:, :, None, None]
        idx1 = idx1[:, :, None, None]
    a = alpha[:, None, None, None]

    # take_along_axis requires equal ranks: pad leading (batch) dims
    lead = (1,) * (stack.ndim - 4)
    idx0 = idx0.reshape(lead + idx0.shape)
    idx1 = idx1.reshape(lead + idx1.shape)

    g0 = jnp.take_along_axis(stack, idx0, axis=axis)
    g1 = jnp.take_along_axis(stack, idx1, axis=axis)
    return (1.0 - a) * g0 + a * g1


def shift_lf(h_views, v_views, i_views, d_views, disp):
    """EPI-Shift all four cross-hair view stacks by disparity ``disp``.

    Stacks are ``(..., n, H, W, C)``; ``disp`` is a scalar (traced OK).
    Returns the four shifted stacks.  Callers must also correct ground truth
    (``gt - disp``) and the MPI disparity channel; see ``shift_sample``.
    """
    n = h_views.shape[-4]
    s = disp * view_offsets(n)

    h_out = roll_lerp_views(h_views, s, axis=-2)
    v_out = roll_lerp_views(v_views, s, axis=-3)
    i_out = roll_lerp_views(i_views, s, axis=-2)
    i_out = roll_lerp_views(i_out, -s, axis=-3)
    d_out = roll_lerp_views(d_views, s, axis=-2)
    d_out = roll_lerp_views(d_out, s, axis=-3)
    return h_out, v_out, i_out, d_out


def integer_shift_lf(h_views, v_views, i_views, d_views, disp: int):
    """Integer-disparity variant (reference mmlf/data/hci4d.py:821-891)."""
    return shift_lf(h_views, v_views, i_views, d_views, float(int(disp)))


def shift_sample(h_views, v_views, i_views, d_views, gt, mpi, disp):
    """Shift a full sample: the four stacks plus GT / MPI disparity correction.

    :param gt: ``(..., H, W)`` ground-truth disparity
    :param mpi: ``(..., K, H, W, 5)`` multi-plane image (disparity at [..., 4])
    """
    h_out, v_out, i_out, d_out = shift_lf(
        h_views, v_views, i_views, d_views, disp)
    gt = gt - disp
    mpi = mpi.at[..., 4].add(-disp)
    return h_out, v_out, i_out, d_out, gt, mpi
