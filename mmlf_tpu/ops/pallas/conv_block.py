"""Fused double-conv trunk block in a transposed canvas layout (Pallas).

The FeedForward trunk (reference mmlf/model/feed_forward.py:86-92) is a
chain of ``conv(k=2, pad=1) -> ReLU -> conv(k=2, pad=0) -> BN -> ReLU``
blocks.  Two structural facts make XLA's direct convolution slow for it on
TPU (measured, scripts/convperf_probe.py + scripts/bwd_gap_probe.py):

  * at chs=70 the out_net's 280 channels sit on the MXU's 128-wide LANE
    dimension: 280 pads to 384 — a naive 73% ceiling (117.7 TF/s vs
    168.6 at 256 channels for the bare chain);
  * (a second conjecture — that the reference's pad-(1,1)/(0,0) spatial
    oscillation 96 -> 97 -> 96 costs extra — was REFUTED by round 3's
    scripts/padshape_probe.py: oscillating and shape-preserving chains
    time identically on v5e.)

This kernel targets the first: activations live per-image as ``(C, M)``
canvases — channels on SUBLANES (280 -> 288, 97%), row-major pixels of a
zero-ringed ``(H+2) x (W+2)`` canvas on LANES (stride ``S = W+2``).  A
k=2 conv is then ONE ``(Cout, 4*Cinp) @ (4*Cinp, T)`` GEMM per pixel tile
with taps at static lane offsets ``{0, 1, S, S+1}``; the previous block's
BatchNorm affine + ReLU + ring mask fold into the input stage.  The
custom VJP reuses the same canvas convs (dgrad of a k=2 conv is a k=2
conv with the spatially flipped, in/out-swapped kernel, K = 4*Cout =
1120 -> 1152, 97%) and accumulates weight gradients across the grid in
VMEM scratch.

Residual policy: the VJP saves ONLY the block input xc (which is the
previous block's y2 — canvases chain, so the trunk stores one activation
per block).  The conv1 output y1 is never written to HBM: the forward
keeps it in the VMEM ring, and the backward RECOMPUTES each y1 tile from
xc with one extra GEMM per chunk (5 instead of 4 backward GEMMs, ~+17%
backward MXU work for ~1/3 less forward HBM write traffic and ~45% less
residual memory — without this the chs=70 bs=128 trunk OOMs the v5e's
16 GB HBM, measured).

Memory shape: the v5e grants a Pallas kernel only ~16 MB of scoped VMEM
(measured: a whole-canvas formulation OOMs at 33 MB), so the kernel walks
the canvas in TILE-lane chunks with a two-slot ring buffer carrying the
conv1 (resp. dy1) tile across grid steps — the canvas margins are one
TILE wide so chunk k's taps live entirely in chunks {k-1, k, k+1}, which
arrive as clamped-index block inputs.  Per-step VMEM is a few MB.

BatchNorm statistics: the forward also emits masked per-channel
``sum(y2)`` / ``sum(y2^2)`` so the (XLA-side) FusedBatchNorm math stays
exactly the flax convention — see models/pallas_trunk.py.

Training-path only: eval/ensemble use the XLA path (BN folds into the
conv weights there, utils/fold_bn.py).

Round-3 verdict (scripts/pallas_trunk_bench.py, scripts/innet_probe.py):
the kernel measures 117-128 TF/s device on the out_net vs ~140 for the
XLA module — it is VMEM-shuffle-bound (the dx=1 taps are lane-offset
reads of the canvas), and XLA's direct conv beats its own naive lane-
padding roof, so the occupancy advantage does not materialize.  The XLA
path is the training default; ``--pallas_trunk`` remains available,
equivalence- and mesh-tested.

Multi-device: with a >1-device mesh registered via ``set_trunk_mesh``,
both passes run per device under ``shard_map`` on the local batch shard;
the BN partial sums (forward) and the parameter cotangents (backward)
are ``psum``-ed over the ``data`` axis inside the op, reproducing the
global-BN / summed-wgrad semantics XLA SPMD gives the plain conv path
(equivalence-tested on the 8-device CPU mesh, tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256          # pixel-lane chunk; also the canvas margin width
FWD_OFFS = ((0, 0), (0, 1), (1, 0), (1, 1))      # k=2 taps, row-major

# Active device mesh for multi-chip trunk sharding (set by train/loop.py /
# __graft_entry__ BEFORE the train step traces).  When a >1-device mesh is
# active, the pallas_call runs per device under ``shard_map`` on the local
# batch shard, with the BatchNorm partial sums (fwd) and weight/bias/affine
# gradients (bwd) ``psum``-ed over the ``data`` axis — the same global-BN /
# summed-wgrad semantics XLA SPMD gives the plain conv path.
_MESH = None


def set_trunk_mesh(mesh) -> None:
    """Register the mesh the next trace should shard over (None = off)."""
    global _MESH
    _MESH = mesh


def _active_mesh():
    if _MESH is not None and _MESH.devices.size > 1:
        return _MESH
    return None


def canvas_dims(h: int, w: int):
    """(S, P, Mc, M) for an ``h x w`` image on the zero-ringed canvas.

    Lane layout: [TILE margin | Mc data chunks | TILE margin]; pixel
    (i, j) of the (H+2)x(W+2) ring-padded image sits at lane
    ``TILE + i*S + j``.  The margins absorb every tap offset (|o| <=
    S+1 <= TILE) so chunk k only ever reads chunks k-1..k+1.
    """
    s = w + 2
    assert s + 1 <= TILE, f'image too wide for TILE={TILE}'
    p = (h + 2) * s
    mc = -(-p // TILE) * TILE
    return s, p, mc, TILE + mc + TILE


def to_canvas(x_nhwc, m: int):
    """(B, H, W, C) -> (B, C, M): interior at (1..H, 1..W), stride W+2."""
    b, h, w, c = x_nhwc.shape
    s, p, mc, m_ = canvas_dims(h, w)
    assert m_ == m, (m_, m)
    xp = jnp.pad(x_nhwc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = jnp.transpose(xp.reshape(b, p, c), (0, 2, 1))
    return jnp.pad(xp, ((0, 0), (0, 0), (TILE, m - TILE - p)))


def from_canvas(xc, h: int, w: int):
    """(B, C, M) -> (B, H, W, C) interior."""
    b, c, m = xc.shape
    s, p, _, m_ = canvas_dims(h, w)
    assert m_ == m
    xp = xc[:, :, TILE:TILE + p].reshape(b, c, h + 2, s)
    return jnp.transpose(xp[:, :, 1:h + 1, 1:w + 1], (0, 2, 3, 1))


def interior_mask(h: int, w: int, dtype=jnp.bfloat16):
    """(1, M) canvas mask: 1 on the true image interior, 0 on ring/pad."""
    s, p, mc, m = canvas_dims(h, w)
    idx = np.arange(m) - TILE
    iy, ix = idx // s, idx % s
    mask = ((idx >= 0) & (idx < p) & (iy >= 1) & (iy <= h)
            & (ix >= 1) & (ix <= w))
    return jnp.asarray(mask[None, :], dtype)


def _pad16(c: int) -> int:
    return -(-c // 16) * 16


def pack_weights(w_hwio):
    """(2,2,Cin,Cout) HWIO -> packed ``(Cout, 4*pad16(Cin))`` GEMM lhs.

    Tap block j follows FWD_OFFS row-major order; K is zero-padded to the
    16-sublane granule per tap so the rhs tap writes stay tile-aligned.
    """
    k1, k2, cin, cout = w_hwio.shape
    assert (k1, k2) == (2, 2)
    cinp = _pad16(cin)
    w = jnp.transpose(w_hwio.reshape(4, cin, cout), (2, 0, 1))
    w = jnp.pad(w, ((0, 0), (0, 0), (0, cinp - cin)))
    return w.reshape(cout, 4 * cinp)


def pack_weights_dgrad(w_hwio):
    """Packed lhs of the dgrad conv of ``w``: maps Cout-cotangents to
    Cin-cotangents.  dgrad of a k=2 conv is a k=2 conv with the spatially
    FLIPPED, in/out-swapped kernel; packing the flipped kernel lets the
    dgrad GEMM loops use the canonical FWD_OFFS tap order.
    """
    w = jnp.flip(w_hwio, axis=(0, 1))
    w = jnp.swapaxes(w, 2, 3)                    # (2,2,Cout,Cin)
    return pack_weights(w)


def _zero_rhs_pad(rhs, c, cp):
    if c == cp:
        return
    for j in range(4):
        rhs[j * cp + c:(j + 1) * cp, :] = jnp.zeros((cp - c, TILE),
                                                    rhs.dtype)


def _fwd_kernel(s, cin, cout, relu_in, affine_in,
                xc_ref, xn_ref, si_ref, ti_ref, mc_ref, mn_ref,
                w1_ref, b1_ref, w2_ref, b2_ref,
                y2_ref, ps_ref, pss_ref,
                ring, rhs1, rhs2, st_scr):
    """Forward of one block, one (image, chunk) grid step.

    z  = mask * [relu]([si * x + ti])      (previous block's BN+ReLU)
    y1 = relu(W1 @ taps(z) + b1)           conv pad (1,1); VMEM ring ONLY
    y2 = W2 @ taps(y1) + b2                conv pad (0,0), interior offset
    ps/pss = masked per-channel sum / sum² of y2 (BatchNorm stats).
    """
    cinp = _pad16(cin)
    coutp = _pad16(cout)
    b = pl.program_id(0)
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    slot = k % 2

    @pl.when((b == 0) & (k == 0))
    def _():
        st_scr[:] = jnp.zeros_like(st_scr)
        _zero_rhs_pad(rhs1, cin, cinp)
        _zero_rhs_pad(rhs2, cout, coutp)

    margin = (k == 0) | (k == nk - 1)

    @pl.when(margin)
    def _():
        zero = jnp.zeros((cout, TILE), ring.dtype)
        ring[slot] = zero
        y2_ref[0] = zero.astype(y2_ref.dtype)

    @pl.when(~margin)
    def _():
        def z_of(x_ref, m_ref):
            x = x_ref[0]
            if affine_in:
                x = x * si_ref[:].astype(x.dtype) \
                    + ti_ref[:].astype(x.dtype)
            if relu_in:
                x = jnp.maximum(x, 0)
            return x * m_ref[:].astype(x.dtype)

        zcat = jnp.concatenate([z_of(xc_ref, mc_ref),
                                z_of(xn_ref, mn_ref)], axis=1)
        for j, (dy, dx) in enumerate(FWD_OFFS):
            o = dy * s + dx
            rhs1[j * cinp:j * cinp + cin, :] = zcat[:, o:o + TILE]
        acc = jnp.dot(w1_ref[:], rhs1[:],
                      preferred_element_type=jnp.float32)
        y1 = jnp.maximum(acc + b1_ref[:], 0.0).astype(ring.dtype)
        ring[slot] = y1

        # conv2 taps: offsets {-S-1, -S, -1, 0} -> read [prev | cur] ring
        y1cat = jnp.concatenate([ring[1 - slot], y1], axis=1)
        for j, (dy, dx) in enumerate(FWD_OFFS):
            o = TILE + dy * s + dx - s - 1
            rhs2[j * coutp:j * coutp + cout, :] = y1cat[:, o:o + TILE]
        acc2 = jnp.dot(w2_ref[:], rhs2[:],
                       preferred_element_type=jnp.float32)
        acc2 = acc2 + b2_ref[:]
        y2_ref[0] = acc2.astype(y2_ref.dtype)
        mk = mc_ref[:].astype(jnp.float32)
        st_scr[:, 0:1] += jnp.sum(acc2 * mk, axis=1, keepdims=True)
        st_scr[:, 1:2] += jnp.sum(acc2 * acc2 * mk, axis=1, keepdims=True)

    @pl.when((b == pl.num_programs(0) - 1) & (k == nk - 1))
    def _():
        ps_ref[:] = st_scr[:, 0:1]
        pss_ref[:] = st_scr[:, 1:2]


def _bwd_kernel(s, cin, cout, relu_in, affine_in,
                xc_ref, xn_ref, si_ref, ti_ref, mc_ref, mn_ref,
                y2c_ref, y2n_ref, dy2c_ref, dy2n_ref,
                dps_ref, dpss_ref, w1f_ref, b1_ref, w1dg_ref, w2dg_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dsi_ref, dti_ref,
                ring, y1r, rhs, rhsw1, rhsw2,
                dw1_acc, dw2_acc, vin_acc, vout_acc):
    """Backward of one block, one (image, chunk) grid step.

    y1 is RECOMPUTED from the xc residual (one extra GEMM, reusing the
    rhsw1 tap load that dW1 needs anyway) and ring-carried like the
    forward; g2 = dy2 + mask*(dps + 2*y2*dpss); dy1 = relu'(y1) *
    dgrad-conv2(g2) (ring-carried); dz = dgrad-conv1(dy1); plus
    dW1/dW2/db/daffine accumulated in scratch across the whole grid and
    emitted at the last step.  Residuals: x and y2 only.
    """
    cinp = _pad16(cin)
    coutp = _pad16(cout)
    b = pl.program_id(0)
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    slot = k % 2

    @pl.when((b == 0) & (k == 0))
    def _():
        dw1_acc[:] = jnp.zeros_like(dw1_acc)
        dw2_acc[:] = jnp.zeros_like(dw2_acc)
        vin_acc[:] = jnp.zeros_like(vin_acc)
        vout_acc[:] = jnp.zeros_like(vout_acc)
        _zero_rhs_pad(rhs, cout, coutp)
        _zero_rhs_pad(rhsw1, cin, cinp)
        _zero_rhs_pad(rhsw2, cout, coutp)

    margin = (k == 0) | (k == nk - 1)

    @pl.when(margin)
    def _():
        zero = jnp.zeros((cout, TILE), ring.dtype)
        ring[slot] = zero
        y1r[slot] = zero
        dx_ref[0] = jnp.zeros((cin, TILE), dx_ref.dtype)

    @pl.when(~margin)
    def _():
        f32 = jnp.float32

        # recompute y1 (exactly the forward's math): taps(z) -> rhsw1,
        # which the dW1 GEMM below reuses
        def z_of(x_ref, m_ref):
            x = x_ref[0]
            if affine_in:
                x = x * si_ref[:].astype(x.dtype) \
                    + ti_ref[:].astype(x.dtype)
            if relu_in:
                x = jnp.maximum(x, 0)
            return x * m_ref[:].astype(x.dtype)

        zcat = jnp.concatenate([z_of(xc_ref, mc_ref),
                                z_of(xn_ref, mn_ref)], axis=1)
        for j, (dy, dx) in enumerate(FWD_OFFS):
            o = dy * s + dx
            rhsw1[j * cinp:j * cinp + cin, :] = zcat[:, o:o + TILE]
        acc1 = jnp.dot(w1f_ref[:], rhsw1[:], preferred_element_type=f32)
        y1 = jnp.maximum(acc1 + b1_ref[:], 0.0).astype(y1r.dtype)
        y1r[slot] = y1

        def g2_of(dy2_ref, y2_ref, m_ref):
            y2 = y2_ref[0].astype(f32)
            mk = m_ref[:].astype(f32)
            return dy2_ref[0].astype(f32) + mk * (
                dps_ref[:] + 2.0 * y2 * dpss_ref[:])

        g2c = g2_of(dy2c_ref, y2c_ref, mc_ref)
        g2cat = jnp.concatenate(
            [g2c, g2_of(dy2n_ref, y2n_ref, mn_ref)],
            axis=1).astype(ring.dtype)
        vout_acc[:, 1:2] += jnp.sum(g2c, axis=1, keepdims=True)  # db2

        # dy1 = relu'(y1) * dgrad-conv2(g2): canonical taps {0,1,S,S+1}
        for j, (dy, dx) in enumerate(FWD_OFFS):
            o = dy * s + dx
            rhs[j * coutp:j * coutp + cout, :] = g2cat[:, o:o + TILE]
        acc = jnp.dot(w2dg_ref[:], rhs[:], preferred_element_type=f32)
        dy1 = jnp.where(y1.astype(f32) > 0.0, acc, 0.0)
        ring[slot] = dy1.astype(ring.dtype)
        vout_acc[:, 0:1] += jnp.sum(dy1, axis=1, keepdims=True)  # db1

        # dW2 += g2_tile @ taps(y1)^T; y1 taps {-S-1..0} -> [prev | cur]
        y1cat = jnp.concatenate([y1r[1 - slot], y1], axis=1)
        for j, (dy, dx) in enumerate(FWD_OFFS):
            o = TILE + dy * s + dx - s - 1
            rhsw2[j * coutp:j * coutp + cout, :] = y1cat[:, o:o + TILE]
        dw2_acc[:] += jax.lax.dot_general(
            g2c.astype(rhsw2.dtype), rhsw2[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

        # dz = dgrad-conv1(dy1): taps {-S-1, -S, -1, 0} -> [prev | cur]
        dy1cat = jnp.concatenate([ring[1 - slot],
                                  dy1.astype(ring.dtype)], axis=1)
        for j, (dy, dx) in enumerate(FWD_OFFS):
            o = TILE + dy * s + dx - s - 1
            rhs[j * coutp:j * coutp + cout, :] = dy1cat[:, o:o + TILE]
        dz = jnp.dot(w1dg_ref[:], rhs[:], preferred_element_type=f32)

        # dW1 += dy1_tile @ taps(z)^T (rhsw1 still holds taps(z))
        dw1_acc[:] += jax.lax.dot_general(
            dy1.astype(rhsw1.dtype), rhsw1[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

        # input-stage backward: mask, relu', affine
        mk = mc_ref[:].astype(f32)
        dz = dz * mk
        xt = xc_ref[0].astype(f32)
        if relu_in:
            pre_t = xt * si_ref[:] + ti_ref[:] if affine_in else xt
            dz = jnp.where(pre_t > 0.0, dz, 0.0)
        if affine_in:
            vin_acc[:, 0:1] += jnp.sum(dz * xt, axis=1, keepdims=True)
            vin_acc[:, 1:2] += jnp.sum(dz, axis=1, keepdims=True)
            dx = dz * si_ref[:]
        else:
            dx = dz
        dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when((b == pl.num_programs(0) - 1) & (k == nk - 1))
    def _():
        dw1_ref[:] = dw1_acc[:]
        dw2_ref[:] = dw2_acc[:]
        dsi_ref[:] = vin_acc[:, 0:1]
        dti_ref[:] = vin_acc[:, 1:2]
        db1_ref[:] = vout_acc[:, 0:1]
        db2_ref[:] = vout_acc[:, 1:2]


def _col(v):
    return v.reshape(-1, 1).astype(jnp.float32)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, k: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _chunk_spec(c, n_chunks, shift=0):
    """(1, c, TILE) chunk of a (B, c, M) canvas at chunk index k+shift
    (clamped — margin chunks only ever read themselves)."""
    def index(b, k):
        if shift == 0:
            return (b, 0, k)
        return (b, 0, jnp.clip(k + shift, 0, n_chunks - 1))
    return pl.BlockSpec((1, c, TILE), index, memory_space=pltpu.VMEM)


def _mask_spec(n_chunks, shift=0):
    def index(b, k):
        if shift == 0:
            return (0, k)
        return (0, jnp.clip(k + shift, 0, n_chunks - 1))
    return pl.BlockSpec((1, TILE), index, memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_double_conv(xc, si, ti, w1, b1, w2, b2,
                      h, w, relu_in, affine_in, interpret):
    """Fused trunk block on ``(B, Cin, M)`` canvases.

    :param xc: input canvas (the previous block's raw y2, or the chain
        entry — ring content is ignored, the input stage masks)
    :param si, ti: per-Cin-channel input affine (the previous block's
        BatchNorm scale/shift; pass ones/zeros with ``affine_in=False``
        at the chain entry)
    :param w1, b1, w2, b2: HWIO conv params; conv2 maps Cout -> Cout
    :returns: ``(y2c, ps, pss)`` — pre-BN output canvas (ring unmasked,
        margins zero) and masked per-channel fp32 sum / sum-of-squares
        for the BatchNorm stats.
    """
    return _fwd(xc, si, ti, w1, b1, w2, b2,
                h, w, relu_in, affine_in, interpret)


def _fwd(xc, si, ti, w1, b1, w2, b2, h, w, relu_in, affine_in, interpret):
    b, cin, m = xc.shape
    s, p, mc, m_ = canvas_dims(h, w)
    assert m == m_, (m, m_)
    cout = w1.shape[-1]
    assert w2.shape[2] == cout and w2.shape[-1] == cout \
        and w1.shape[2] == cin
    n_chunks = m // TILE
    dt = xc.dtype

    w1p = pack_weights(w1).astype(dt)
    w2p = pack_weights(w2).astype(dt)
    mask = interior_mask(h, w, dt)

    kernel = functools.partial(_fwd_kernel, s, cin, cout,
                               relu_in, affine_in)

    def call(xc_, si_, ti_, mk_, w1_, b1_, w2_, b2_):
        b_ = xc_.shape[0]         # LOCAL batch under shard_map
        return pl.pallas_call(
            kernel,
            grid=(b_, n_chunks),
            in_specs=[
                _chunk_spec(cin, n_chunks), _chunk_spec(cin, n_chunks, +1),
                _const_spec((cin, 1)), _const_spec((cin, 1)),
                _mask_spec(n_chunks), _mask_spec(n_chunks, +1),
                _const_spec(w1p.shape), _const_spec((cout, 1)),
                _const_spec(w2p.shape), _const_spec((cout, 1)),
            ],
            out_specs=(_chunk_spec(cout, n_chunks),
                       _const_spec((cout, 1)), _const_spec((cout, 1))),
            out_shape=(
                jax.ShapeDtypeStruct((b_, cout, m), dt),
                jax.ShapeDtypeStruct((cout, 1), jnp.float32),
                jax.ShapeDtypeStruct((cout, 1), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, cout, TILE), dt),         # y1 ring
                pltpu.VMEM((4 * _pad16(cin), TILE), dt),
                pltpu.VMEM((4 * _pad16(cout), TILE), dt),
                pltpu.VMEM((cout, 2), jnp.float32),      # stats accumulator
            ],
            interpret=interpret,
        )(xc_, xc_, si_, ti_, mk_, mk_, w1_, b1_, w2_, b2_)

    args = (xc, _col(si), _col(ti), mask, w1p, _col(b1), w2p, _col(b2))
    mesh = _active_mesh()
    if mesh is not None and b % mesh.devices.size != 0:
        mesh = None      # unshardable batch (init dummies, bs=1 eval)
    if mesh is None:
        y2, ps, pss = call(*args)
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def local(xc_, si_, ti_, mk_, w1_, b1_, w2_, b2_):
            y2_, ps_, pss_ = call(xc_, si_, ti_, mk_, w1_, b1_,
                                  w2_, b2_)
            # global-BN semantics: stats sum over the full batch
            return (y2_, jax.lax.psum(ps_, 'data'),
                    jax.lax.psum(pss_, 'data'))

        y2, ps, pss = shard_map(
            local, mesh=mesh,
            in_specs=(P('data'),) + (P(),) * 7,
            out_specs=(P('data'), P(), P()),
            check_vma=False)(*args)
    return y2, ps[:, 0], pss[:, 0]


def _fused_fwd_rule(xc, si, ti, w1, b1, w2, b2,
                    h, w, relu_in, affine_in, interpret):
    y2, ps, pss = _fwd(xc, si, ti, w1, b1, w2, b2,
                       h, w, relu_in, affine_in, interpret)
    res = (xc, si, ti, w1, b1, w2, y2)
    return (y2, ps, pss), res


def _fused_bwd_rule(h, w, relu_in, affine_in, interpret, res, cts):
    xc, si, ti, w1, b1, w2, y2 = res
    dy2, dps, dpss = cts
    b, cin, m = xc.shape
    s, p, mc, _ = canvas_dims(h, w)
    cout = w1.shape[-1]
    cinp, coutp = _pad16(cin), _pad16(cout)
    n_chunks = m // TILE
    dt = xc.dtype

    w1f = pack_weights(w1).astype(dt)            # (cout, 4*cinp)
    w1dg = pack_weights_dgrad(w1).astype(dt)     # (cin,  4*coutp)
    w2dg = pack_weights_dgrad(w2).astype(dt)     # (cout, 4*coutp)
    mask = interior_mask(h, w, dt)

    kernel = functools.partial(_bwd_kernel, s, cin, cout,
                               relu_in, affine_in)

    def call(xc_, si_, ti_, mk_, y2_, dy2_, dps_, dpss_,
             w1f_, b1_, w1_, w2_):
        b_ = xc_.shape[0]         # LOCAL batch under shard_map
        return pl.pallas_call(
            kernel,
            grid=(b_, n_chunks),
            in_specs=[
                _chunk_spec(cin, n_chunks), _chunk_spec(cin, n_chunks, +1),
                _const_spec((cin, 1)), _const_spec((cin, 1)),
                _mask_spec(n_chunks), _mask_spec(n_chunks, +1),
                _chunk_spec(cout, n_chunks),
                _chunk_spec(cout, n_chunks, +1),
                _chunk_spec(cout, n_chunks),
                _chunk_spec(cout, n_chunks, +1),
                _const_spec((cout, 1)), _const_spec((cout, 1)),
                _const_spec(w1f.shape), _const_spec((cout, 1)),
                _const_spec(w1dg.shape), _const_spec(w2dg.shape),
            ],
            out_specs=(_chunk_spec(cin, n_chunks),
                       _const_spec((cout, 4 * cinp)),
                       _const_spec((cout, 1)),
                       _const_spec((cout, 4 * coutp)),
                       _const_spec((cout, 1)),
                       _const_spec((cin, 1)), _const_spec((cin, 1))),
            out_shape=(
                jax.ShapeDtypeStruct((b_, cin, m), dt),
                jax.ShapeDtypeStruct((cout, 4 * cinp), jnp.float32),
                jax.ShapeDtypeStruct((cout, 1), jnp.float32),
                jax.ShapeDtypeStruct((cout, 4 * coutp), jnp.float32),
                jax.ShapeDtypeStruct((cout, 1), jnp.float32),
                jax.ShapeDtypeStruct((cin, 1), jnp.float32),
                jax.ShapeDtypeStruct((cin, 1), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, cout, TILE), dt),             # dy1 ring
                pltpu.VMEM((2, cout, TILE), dt),             # y1 ring
                pltpu.VMEM((4 * coutp, TILE), dt),           # rhs dgrad
                pltpu.VMEM((4 * cinp, TILE), dt),            # rhsw1
                pltpu.VMEM((4 * coutp, TILE), dt),           # rhsw2
                pltpu.VMEM((cout, 4 * cinp), jnp.float32),   # dW1 acc
                pltpu.VMEM((cout, 4 * coutp), jnp.float32),  # dW2 acc
                pltpu.VMEM((cin, 2), jnp.float32),           # dsi/dti
                pltpu.VMEM((cout, 2), jnp.float32),          # db1/db2
            ],
            interpret=interpret,
        )(xc_, xc_, si_, ti_, mk_, mk_,
          y2_, y2_, dy2_, dy2_,
          dps_, dpss_, w1f_, b1_, w1_, w2_)

    args = (xc, _col(si), _col(ti), mask, y2, dy2,
            _col(dps), _col(dpss), w1f, _col(b1), w1dg, w2dg)
    mesh = _active_mesh()
    if mesh is not None and b % mesh.devices.size != 0:
        mesh = None      # unshardable batch (matches the forward)
    if mesh is None:
        outs = call(*args)
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def local(*a):
            dx_, dw1_, db1_, dw2_, db2_, dsi_, dti_ = call(*a)
            # parameter cotangents sum over the full (sharded) batch
            dw1_, db1_, dw2_, db2_, dsi_, dti_ = jax.lax.psum(
                (dw1_, db1_, dw2_, db2_, dsi_, dti_), 'data')
            return dx_, dw1_, db1_, dw2_, db2_, dsi_, dti_

        outs = shard_map(
            local, mesh=mesh,
            in_specs=(P('data'), P(), P(), P(), P('data'), P('data'),
                      P(), P(), P(), P(), P(), P()),
            out_specs=(P('data'),) + (P(),) * 6,
            check_vma=False)(*args)
    dx, dw1p, db1, dw2p, db2, dsi, dti = outs

    def unpack_dw(dwp, cin_, cinp_):
        dw = dwp.reshape(cout, 4, cinp_)[:, :, :cin_]
        return jnp.transpose(dw, (1, 2, 0)).reshape(2, 2, cin_, cout)

    dw1 = unpack_dw(dw1p, cin, cinp).astype(w1.dtype)
    dw2 = unpack_dw(dw2p, cout, coutp).astype(w2.dtype)
    return (dx, dsi[:, 0].astype(si.dtype), dti[:, 0].astype(ti.dtype),
            dw1, db1[:, 0], dw2, db2[:, 0])


fused_double_conv.defvjp(_fused_fwd_rule, _fused_bwd_rule)
