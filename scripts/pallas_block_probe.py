"""Probe: fused double-conv block as a Pallas kernel in the transposed
(channel-sublane, pixel-lane) canvas layout — the chs=70 perf attack
(VERDICT r2 item 1a).

Why this layout: XLA's direct conv at C=280 runs at 117.7 TF/s vs 168.6
at C=256 (scripts/convperf_probe.py) — exactly the 280->384 output-LANE
padding ratio.  Putting channels on SUBLANES (280 -> 288, 97%) and pixels
on lanes removes that ceiling; the k=2 conv becomes ONE (Cout, 4*Cinp) @
(4*Cinp, T) GEMM per pixel tile with taps gathered from a zero-ringed
row-major canvas (stride S = W+2), intermediates staying in VMEM.

Run CPU check:  python scripts/pallas_block_probe.py check
Run TPU bench:  python scripts/pallas_block_probe.py bench
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAD = 128          # zero margin before the canvas (negative-tap reads)
TRAIL = 128         # zero margin after (past-end tap reads); >= S+1
TILE = 512          # pixel-lane tile of the GEMMs


def canvas_dims(h, w):
    s = w + 2
    p = (h + 2) * s
    mc = -(-p // TILE) * TILE
    return s, p, mc, LEAD + mc + TRAIL


def to_canvas(x_nhwc, m):
    """(B, H, W, C) -> (B, C, M) zero-ringed row-major canvas (data at
    interior (1..H, 1..W), stride S=W+2, lane offset LEAD)."""
    b, h, w, c = x_nhwc.shape
    s, p, mc, m_ = canvas_dims(h, w)
    assert m_ == m
    xp = jnp.pad(x_nhwc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(b, p, c)
    xp = jnp.transpose(xp, (0, 2, 1))
    return jnp.pad(xp, ((0, 0), (0, 0), (LEAD, m - LEAD - p)))


def from_canvas(xc, h, w):
    """(B, C, M) canvas -> (B, H, W, C) interior."""
    b, c, m = xc.shape
    s, p, mc, m_ = canvas_dims(h, w)
    xp = xc[:, :, LEAD:LEAD + p].reshape(b, c, h + 2, s)
    xp = xp[:, :, 1:h + 1, 1:w + 1]
    return jnp.transpose(xp, (0, 2, 3, 1))


def pack_weights(w_hwio, cinp):
    """(2, 2, Cin, Cout) HWIO -> (Cout, 4*cinp) with zero K-padding.

    Tap j = (dy, dx) in row-major order matches the canvas offsets
    {0, 1, S, S+1} used by the kernel."""
    k1, k2, cin, cout = w_hwio.shape
    assert (k1, k2) == (2, 2)
    w = jnp.transpose(w_hwio.reshape(4, cin, cout), (2, 0, 1))  # (Cout,4,Cin)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, cinp - cin)))
    return w.reshape(cout, 4 * cinp)


def _block_kernel(s, n_tiles, cin, cinp, relu_out,
                  x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  y1_ref, y2_ref, rhs):
    """One fused block per image: y1 = relu(conv1_pad11(x)),
    y2 = conv2_pad00(y1) (placed back at the interior offset), optionally
    relu'd.  conv1 output lives entirely in y1_ref (VMEM) — no HBM trip."""
    cout = y1_ref.shape[1]

    # zero the K-padding rows of the tap buffer once; w is zero there too,
    # but uninitialized VMEM could hold NaNs and 0*NaN = NaN
    for j in range(4):
        @pl.when(pl.program_id(0) == 0)
        def _(j=j):
            rhs[j * cinp + cin:(j + 1) * cinp, :] = jnp.zeros(
                (cinp - cin, rhs.shape[1]), rhs.dtype)

    # margins of y1 must read as zero for conv2's negative-offset taps
    y1_ref[0, :, 0:LEAD] = jnp.zeros((cout, LEAD), y1_ref.dtype)
    y1_ref[0, :, y1_ref.shape[2] - TRAIL:] = jnp.zeros((cout, TRAIL),
                                                       y1_ref.dtype)

    # conv1: pad (1,1) -> output pixel (i,j) at canvas index i*S+j reads
    # x taps {0, 1, S, S+1}
    for t in range(n_tiles):
        base = LEAD + t * TILE
        for j, off in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            o = off[0] * s + off[1]
            rhs[j * cinp:j * cinp + cin, :] = \
                x_ref[0, :, base + o:base + o + TILE]
        acc = jnp.dot(w1_ref[:], rhs[:], preferred_element_type=jnp.float32)
        y1 = jnp.maximum(acc + b1_ref[:], 0.0)
        y1_ref[0, :, base:base + TILE] = y1.astype(y1_ref.dtype)

    # conv2: pad (0,0), output re-placed at interior offset (1,1) ->
    # taps {-S-1, -S, -1, 0}
    for t in range(n_tiles):
        base = LEAD + t * TILE
        for j, off in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            o = off[0] * s + off[1] - s - 1
            rhs[j * cinp:j * cinp + cin, :] = \
                y1_ref[0, :, base + o:base + o + TILE]
        acc = jnp.dot(w2_ref[:], rhs[:], preferred_element_type=jnp.float32)
        y2 = acc + b2_ref[:]
        if relu_out:
            y2 = jnp.maximum(y2, 0.0)
        y2_ref[0, :, base:base + TILE] = y2.astype(y2_ref.dtype)


def fused_block(xc, w1, b1, w2, b2, h, w, relu_out=True, interpret=False):
    """xc: (B, C, M) canvas bf16; w1/w2: (2,2,Cin,Cout) HWIO; returns
    (y1c, y2c) canvases.  y2 is NOT masked — the consumer masks."""
    b, cin, m = xc.shape
    s, p, mc, m_ = canvas_dims(h, w)
    assert m == m_
    cinp = -(-cin // 16) * 16
    cout = w1.shape[-1]
    n_tiles = mc // TILE

    w1p = pack_weights(w1, cinp).astype(xc.dtype)
    w2p = pack_weights(w2, -(-cout // 16) * 16).astype(xc.dtype)
    b1c = b1.reshape(cout, 1).astype(jnp.float32)
    b2c = b2.reshape(w2.shape[-1], 1).astype(jnp.float32)

    kernel = partial(_block_kernel, s, n_tiles, cin, cinp, relu_out)
    y1, y2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, cin, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1p.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b1c.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2p.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2c.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, cout, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2.shape[-1], m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, cout, m), xc.dtype),
            jax.ShapeDtypeStruct((b, w2.shape[-1], m), xc.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((4 * cinp, TILE), xc.dtype)],
        interpret=interpret,
    )(xc, w1p, b1c, w2p, b2c)
    return y1, y2


def xla_block(x, w1, b1, w2, b2, relu_out=True):
    """Reference semantics: conv pad(1,1) -> relu -> conv pad(0,0)."""
    y = jax.lax.conv_general_dilated(
        x, w1, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b1
    y = jax.nn.relu(y)
    y = jax.lax.conv_general_dilated(
        y, w2, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b2
    return jax.nn.relu(y) if relu_out else y


def make_params(rng, n_blocks, c, dtype):
    ws = []
    for i in range(n_blocks):
        w1 = rng.standard_normal((2, 2, c, c)) / np.sqrt(4 * c)
        w2 = rng.standard_normal((2, 2, c, c)) / np.sqrt(4 * c)
        b1 = rng.standard_normal(c) * 0.1
        b2 = rng.standard_normal(c) * 0.1
        ws.append(tuple(jnp.asarray(a, dtype) for a in (w1, b1, w2, b2)))
    return ws


def chain_pallas(params, xc, h, w, interpret=False):
    # mask between blocks: zero the ring so the next conv1's pad ring
    # semantics hold (garbage lives outside the interior)
    b, c, m = xc.shape
    s, p, mc, _ = canvas_dims(h, w)
    idx = np.arange(m) - LEAD
    iy, ix = idx // s, idx % s
    mask = ((idx >= 0) & (idx < p) & (iy >= 1) & (iy <= h)
            & (ix >= 1) & (ix <= w))
    maskc = jnp.asarray(mask[None, :], xc.dtype)
    for i, (w1, b1, w2, b2) in enumerate(params):
        _, y2 = fused_block(xc, w1, b1, w2, b2, h, w, interpret=interpret)
        xc = y2 * maskc
    return xc


def chain_xla(params, x):
    for w1, b1, w2, b2 in params:
        x = xla_block(x, w1, b1, w2, b2)
    return x


def check():
    rng = np.random.default_rng(0)
    h, w, c, b = 13, 17, 24, 2
    params = make_params(rng, 2, c, jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)) * 0.5, jnp.float32)
    s, p, mc, m = canvas_dims(h, w)
    xc = to_canvas(x, m)
    got = from_canvas(chain_pallas(params, xc, h, w, interpret=True), h, w)
    want = chain_xla(params, x)
    d = float(jnp.abs(got - want).max())
    print(f'max |pallas - xla| = {d:.2e}')
    assert d < 1e-4
    print('CHECK OK')


def bench():
    import functools

    def sync(r):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0]
                                  .ravel()[:1]))

    def timeit(fn, *args, n=10, name='', flops=None):
        r = fn(*args)
        sync(r)
        for _ in range(2):
            sync(fn(*args))
        t0 = time.time()
        for _ in range(n):
            r = fn(*args)
            sync(r)
        dt = (time.time() - t0) / n * 1000
        extra = f'  {flops / dt * 1e-9:7.1f} TF/s' if flops else ''
        print(f'{name:46s} {dt:8.2f} ms{extra}', flush=True)
        return dt

    print(f'device: {jax.devices()[0]}', flush=True)
    rng = np.random.default_rng(0)
    for c, b in ((280, 64), (256, 64)):
        h = w = 96
        n_blocks = 7
        params = make_params(rng, n_blocks, c, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((b, h, w, c)) * 0.3,
                        jnp.bfloat16)
        s, p, mc, m = canvas_dims(h, w)
        fl = n_blocks * 2 * b * h * w * 4 * c * c * 2
        print(f'--- C={c} bs={b} {n_blocks} blocks (14 convs) bf16, '
              f'canvas M={m} ---', flush=True)

        # params must be jit ARGUMENTS: closing over ~9 MB of weights
        # embeds them as HLO constants and the remote compile service
        # hangs on the oversized request (verify-skill gotcha, observed)
        xj = jax.jit(chain_xla)
        timeit(xj, params, x, name='XLA direct conv chain', flops=fl)

        xc = jax.jit(lambda x: to_canvas(x, m))(x)
        pj = jax.jit(lambda p, xc: chain_pallas(p, xc, h, w))
        timeit(pj, params, xc,
               name='pallas fused blocks (canvas resident)', flops=fl)

        e2e = jax.jit(lambda p, x: from_canvas(
            chain_pallas(p, to_canvas(x, m), h, w), h, w))
        timeit(e2e, params, x, name='pallas incl. canvas transposes',
               flops=fl)


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'bench':
        bench()
    else:
        check()
