"""Matmul-domain training augmentation on packed windows (TPU-native).

Semantically identical to the per-sample chain in ``data/pipeline.py``
(``augment_sample``: sub-pixel EPI-Shift → crop → RandomRotate →
RedistColor → Brightness → Contrast — itself the reference chain
mmlf/train/cli.py:72-92), but reformulated for the TPU memory system.

Why: the natural formulations are hostile to TPU tiling —
``take_along_axis`` roll-lerps lower to scalarized gathers, and a
``vmap(lax.switch)`` rotation executes *all four* branches per sample.
Measured on v5e these made augmentation ~45 ms of a 267 ms bs=64 step.

How (all ops batch-level, no vmap):

  * windows stay in the gather's packed layout ``(B, Q=36, ·, ·)`` with
    Q = stack(4) × view(9) and rgb folded into lanes ``x*3+c``;
  * the per-(stack, view) sub-pixel roll-lerp is a banded matrix, so both
    shifts become batched **MXU matmuls** ``R ⊗ X`` — rows first, then
    (after one explicit spatial transpose) the column shift is a row
    matmul too.  The crop folds into the same matrices (output rows = ps),
    brightness folds in as a scalar factor;
  * RandomRotate's stack/view relabel is a per-sample permutation of Q —
    a **one-hot matmul** over the 36-dim (36 small-M GEMMs beat 2304
    scalarized row gathers);
  * the rotation's spatial part reduces to one transpose-select plus
    per-sample row/lane flips (reverses fuse into the surrounding
    elementwise pass in XLA);
  * color mix / contrast are elementwise epilogues fused into the final
    unpack.

The lerp matrices hold exactly two non-zeros per row, so the matmul
reproduces ``(1-α)·x₀ + α·x₁`` exactly in fp32 (zero terms are exact);
equivalence to the legacy path is asserted in tests/test_augment2.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.shift import modf_shift_components

# per-stack shift signs along H (rows) and W (cols): h, v, i, d
# (reference hci4d.py EPI-Shift: h rolls W; v rolls H; i rolls W and -H;
#  d rolls W and H)
ROW_SIGN = np.array([0.0, 1.0, -1.0, 1.0], np.float32)
COL_SIGN = np.array([1.0, 0.0, 1.0, 1.0], np.float32)

N_STACKS = 4
EXTRA_HALF = 8      # crop starts at off + EXTRA//2 (see pipeline.augment_sample)


def _relabel_table(n_views: int) -> np.ndarray:
    """``q_in[k, q_out]``: which input (stack, view) lands in each output
    slot after k 90° rotations (reference ``_rot90_sample``:
    h,v,i,d ← v, flipv(h), d, flipv(i), iterated)."""
    cur = [(s, False) for s in range(N_STACKS)]
    maps = [list(cur)]
    for _ in range(3):
        h, v, i, d = cur
        cur = [v, (h[0], not h[1]), d, (i[0], not i[1])]
        maps.append(list(cur))
    qin = np.zeros((4, N_STACKS * n_views), np.int32)
    for k in range(4):
        for s_out in range(N_STACKS):
            src, fv = maps[k][s_out]
            for v_ in range(n_views):
                v_in = n_views - 1 - v_ if fv else v_
                qin[k, s_out * n_views + v_] = src * n_views + v_in
    return qin


def _shift_matrix(amt, start, ps: int, win: int, dtype, rev=None):
    """Banded roll-lerp + crop operator ``(B, Q, ps, win)``.

    ``out[y] = (1-α)·x[(start+y-s0) mod win] + α·x[(start+y-s1) mod win]``
    — the circular roll-lerp of ops/shift.py restricted to the crop rows.
    The source index is computed on the small ``(B, Q, ps)`` tensor and
    the band materialized as one equality over the 4-D shape, keeping the
    integer mod off the full ``(B, Q, ps, win)`` operand.

    ``rev`` (B,) bool reverses the OUTPUT row order per sample — this is
    how RandomRotate's spatial flips are folded into the shift matmuls for
    free (index math on the small tensor) instead of running flip+select
    passes over the full windows afterwards.
    """
    alpha, s0, s1 = modf_shift_components(amt)          # (B, Q)
    idx = jnp.arange(ps, dtype=jnp.int32)
    if rev is None:
        idx = idx[None, :]                                       # (1, ps)
    else:
        idx = jnp.where(rev[:, None], ps - 1 - idx[None, :],
                        idx[None, :])                            # (B, ps)
    y_out = start[:, None, None].astype(jnp.int32) + idx[:, None, :]
    y_in = jnp.arange(win, dtype=jnp.int32)

    def band(s):
        t = jnp.mod(y_out - s[:, :, None], win)                  # (B, Q, ps)
        return y_in[None, None, None, :] == t[..., None]

    a = alpha[:, :, None, None].astype(jnp.float32)
    r = (1.0 - a) * band(s0) + a * band(s1)
    return r.astype(dtype)


def _spatial_T(x, ps: int):
    """Transpose the (rows, lanes=x*3+c) spatial layout: (y, 3x+c)→(x, 3y+c)."""
    b, q = x.shape[:2]
    return x.reshape(b, q, ps, ps, 3).swapaxes(2, 3).reshape(
        b, q, ps, ps * 3)


def augment_packed(img, aug, ps: int, views: int,
                   parity_split: bool = False, fold: bool = False):
    """Augment packed image windows ``(B, win, win, CI)`` → four view
    stacks ``(B, views, ps, ps, 3)`` fp32 (or, with ``fold=True``, four
    model-layout stacks ``(B, ps, ps, views*3)``).

    ``aug`` is pipeline.AugParams (host-sampled).  See module docstring.

    ``parity_split=True`` asserts the host-side contract that the first
    ``B//2`` samples carry EVEN rot_k (0/2) and the rest ODD (1/3)
    (DevicePipeline stratified sampling).  The rotation's per-sample
    transpose then becomes ONE static half-batch transpose instead of a
    both-branches-materialized ``jnp.where``.

    ``fold=True`` is the TPU training path: the rotation relabel, color
    mix and brightness combine into ONE per-sample ``(4n·3, n·3)``-class
    matrix and a single einsum emits the stacks directly in the model's
    folded channel order (view*3+color — FeedForward._fold) — no
    intermediate with a 3-element minor dim is ever materialized (the
    (8,128) tiling pads a 3-lane tensor 42×; the naive unpack + model
    re-fold cost ~25 ms/step at bs=128 on v5e).
    """
    b, win = img.shape[0], img.shape[1]
    q = N_STACKS * views
    dtype = img.dtype
    offs = jnp.arange(views, dtype=jnp.float32) - float(views // 2)

    # packed lanes (q*3+c) → (B, Q, win, win*3)
    x0 = img[..., :q * 3].reshape(b, win, win, q, 3)
    x0 = jnp.transpose(x0, (0, 3, 1, 2, 4)).reshape(b, q, win, win * 3)

    # per-(sample, stack, view) shift amounts (original stack identities —
    # the shift precedes the rotation, like the reference chain)
    s_amt = aug.shift[:, None, None] * offs[None, None, :]       # (B, 4?, n)
    row_amt = (s_amt * ROW_SIGN[None, :, None]).reshape(b, q)
    col_amt = (s_amt * COL_SIGN[None, :, None]).reshape(b, q)

    y0 = (aug.y_off + EXTRA_HALF).astype(jnp.int32)
    x0_off = (aug.x_off + EXTRA_HALF).astype(jnp.int32)

    hp = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None

    # RandomRotate's flips fold into the shift matrices as per-sample
    # output-row reversals (see the k-case analysis: lane-spatial flip ↔
    # R1's output rows, row flip ↔ R2's) — the post-hoc flip+select
    # passes of the naive formulation disappear entirely
    k1 = aug.rot_k
    rev1 = (k1 == 2) | (k1 == 3)      # flip of the R1-produced (lane) axis
    rev2 = (k1 == 1) | (k1 == 2)      # flip of the R2-produced (row) axis

    # rows: H-shift + row crop (+ folded flip)
    r1 = _shift_matrix(row_amt, y0, ps, win, dtype, rev=rev1)
    x1 = jnp.einsum('bqyY,bqYl->bqyl', r1, x0, precision=hp)

    # transpose, then cols become rows: W-shift + col crop (+ folded flip)
    x1t = x1.reshape(b, q, ps, win, 3).swapaxes(2, 3).reshape(
        b, q, win, ps * 3)
    r2 = _shift_matrix(col_amt, x0_off, ps, win, dtype, rev=rev2)
    x2 = jnp.einsum('bqyY,bqYl->bqyl', r2, x1t, precision=hp)
    # x2 is (B, Q, ps, ps*3) in TRANSPOSED spatial orientation (x, y*3+c)

    # rotation 2/2 (spatial): the remaining per-sample transpose.  The
    # data is in TRANSPOSED orientation and the net rotation map is
    # (folded flips) ∘ Tᵏ⁺¹ — odd k needs NO transpose
    def transpose_step(xq):
        if parity_split:
            # host contract: rot_k[:B//2] even, rot_k[B//2:] odd — one
            # static half-batch transpose, no select
            b2 = b // 2
            return jnp.concatenate(
                [_spatial_T(xq[:b2], ps), xq[b2:]], axis=0)
        k = aug.rot_k[:, None, None, None]
        return jnp.where((k % 2) == 1, xq, _spatial_T(xq, ps))

    qin = jnp.asarray(_relabel_table(views))[aug.rot_k]          # (B, Q)
    n3 = views * 3

    if fold:
        # one fused contraction: rotation relabel ⊗ color mix (+ folded
        # brightness) as a per-sample (Q·3, Q, 3) operator, output
        # directly in the model's folded (B, ps, ps, stack·view·color)
        # lane order — the only big pass over the windows in the tail
        z2 = transpose_step(x2).reshape(b, q, ps, ps, 3)
        perm = jax.nn.one_hot(qin, q, dtype=jnp.float32)         # (B, P, Q)
        m = perm[:, :, None, :, None] * aug.color[:, None, :, None, :]
        m = m * aug.brightness[:, None, None, None, None]
        m = m.reshape(b, q * 3, q, 3)                     # P = (p, d)
        out = jnp.einsum('bqyxc,bPqc->byxP', z2.astype(jnp.float32), m,
                         precision=jax.lax.Precision.HIGHEST)
        pivot = jnp.mean(out[..., :n3], axis=(1, 2, 3)) * \
            (1.0 - aug.contrast)                                 # (B,)
        out = out * aug.contrast[:, None, None, None] + \
            pivot[:, None, None, None]
        return tuple(out[..., s * n3:(s + 1) * n3]
                     for s in range(N_STACKS))

    # rotation 1/2: stack/view relabel as a one-hot matmul over Q
    perm = jax.nn.one_hot(qin, q, dtype=dtype)                   # (B, Qo, Qi)
    x3 = jnp.einsum('bpq,bqyl->bpyl', perm, x2, precision=hp)
    x6 = transpose_step(x3).reshape(b, q, ps, ps, 3)

    # color mix + brightness (elementwise epilogue; fp32 from here)
    x6 = x6.astype(jnp.float32)
    x7 = jnp.einsum('bqyxc,bdc->bqyxd', x6, aug.color,
                    precision=jax.lax.Precision.HIGHEST)
    x7 = x7 * aug.brightness[:, None, None, None, None]

    # contrast pivots on the (mixed, brightened) h-stack mean
    pivot = jnp.mean(x7[:, :views], axis=(1, 2, 3, 4)) * \
        (1.0 - aug.contrast)                                     # (B,)
    x8 = x7 * aug.contrast[:, None, None, None, None] + \
        pivot[:, None, None, None, None]

    x8 = x8.reshape(b, N_STACKS, views, ps, ps, 3)
    return x8[:, 0], x8[:, 1], x8[:, 2], x8[:, 3]


def _rot_spatial(x, k, ps: int, parity_split: bool = False):
    """flips ∘ Tᵗ rotation of (B, ps, ps, C) maps (normal orientation).

    With ``parity_split`` (rot_k[:B//2] even / rest odd, see
    augment_packed) the transpose-select becomes a static half-batch
    transpose; the flips stay as selects (cheap at these channel counts).
    """
    if parity_split:
        b2 = x.shape[0] // 2
        out = jnp.concatenate([x[:b2], x[b2:].swapaxes(1, 2)], axis=0)
    else:
        xt = x.swapaxes(1, 2)
        out = jnp.where((k % 2)[:, None, None, None] == 1, xt, x)
    frow = ((k == 1) | (k == 2))[:, None, None, None]
    flane = ((k == 2) | (k == 3))[:, None, None, None]
    out = jnp.where(frow, jnp.flip(out, axis=1), out)
    return jnp.where(flane, jnp.flip(out, axis=2), out)


def augment_targets(aux, mpi, aug, ps: int, planes: int, with_mpi: bool,
                    parity_split: bool = False):
    """gt / mask / MPI side of the chain: scalar shift correction, crop,
    rotation (mask deliberately NOT rotated — reference quirk)."""
    b, win = aux.shape[0], aux.shape[1]
    aux = aux.reshape(b, win, win, -1)
    y0 = (aug.y_off + EXTRA_HALF).astype(jnp.int32)
    x0 = (aug.x_off + EXTRA_HALF).astype(jnp.int32)

    def crop(a):   # (B, win, win, C) → (B, ps, ps, C)
        return jax.vmap(
            lambda s, yy, xx: jax.lax.dynamic_slice(
                s, (yy, xx, 0), (ps, ps, s.shape[-1])))(a, y0, x0)

    gtm = crop(aux[..., :2])
    gt = gtm[..., 0] - aug.shift[:, None, None]
    mask = gtm[..., 1].astype(jnp.int32)
    gt = _rot_spatial(gt[..., None], aug.rot_k, ps, parity_split)[..., 0]

    if not with_mpi:
        mpi_out = jnp.zeros((b, planes, ps, ps, 5), jnp.float32)
        return gt, mpi_out, mask

    mpi = mpi.reshape(b, win, win, -1)
    # disparity channels sit at lanes k*5+4
    ch = jnp.arange(mpi.shape[-1]) % 5 == 4
    ch = ch & (jnp.arange(mpi.shape[-1]) < planes * 5)
    mpi = mpi - aug.shift[:, None, None, None] * ch.astype(mpi.dtype)
    mpi = crop(mpi)
    mpi = _rot_spatial(mpi, aug.rot_k, ps, parity_split)
    mpi = mpi[..., :planes * 5].reshape(b, ps, ps, planes, 5)
    return gt, jnp.transpose(mpi, (0, 3, 1, 2, 4)), mask
