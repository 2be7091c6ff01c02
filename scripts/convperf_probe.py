"""Round-3 probe: why is the chs=70 (280-ch out_net) trunk slow, and which
formulation of the k=2 conv is fastest on the MXU?

Hypotheses (VERDICT r2 items 1-2):
  H1  lane padding: N=280 output channels pad to 3x128=384 lanes (73%),
      while chs=64's 256 tiles exactly -> ~1.37x waste on the dominant
      out_net GEMMs.
  H2  a transposed matmul (channels on the SUBLANE dim, pixels on lanes)
      sidesteps the 128-lane granularity: 280 is a multiple of 8.
  H3  Winograd F(2x2,2x2) cuts real FLOPs 16/9 = 1.78x for k=2 convs.

Run on the real chip:  python scripts/convperf_probe.py
"""
import time
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(x.ravel()[:1]))


def timeit(fn, *args, n=10, name='', flops=None):
    for _ in range(3):
        r = fn(*args)
    sync(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    dt = (time.time() - t0) / n * 1000
    extra = f'  {flops / dt * 1e-9:7.1f} TF/s(real)' if flops else ''
    print(f'{name:52s} {dt:8.2f} ms{extra}', flush=True)
    return dt


B, PS = 64, 96
N_CONV = 14      # the 7 280-ch out_net blocks = 14 convs


def ref_conv(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), list(pad), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def stack_direct(ws, x):
    for j, w in enumerate(ws):
        pad = ((1, 0), (1, 0)) if j % 2 == 0 else ((0, 1), (0, 1))
        x = jax.nn.relu(ref_conv(x, w, pad))
    return jnp.sum(x.astype(jnp.float32))


def im2col(x, pad):
    """NHWC k=2 im2col -> (B, H, W, 4C) with the given shape-preserving pad."""
    (ph1, ph2), (pw1, pw2) = pad
    xp = jnp.pad(x, ((0, 0), (ph1, ph2), (pw1, pw2), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    return jnp.concatenate([
        xp[:, 0:h, 0:w], xp[:, 0:h, 1:w + 1],
        xp[:, 1:h + 1, 0:w], xp[:, 1:h + 1, 1:w + 1]], axis=-1)


def stack_matmul_nhwc(ws, x):
    """im2col + (BHW, 4C) @ (4C, C): channels on LANES (like XLA direct)."""
    b, h, w, c = x.shape
    for j, wk in enumerate(ws):
        pad = ((1, 0), (1, 0)) if j % 2 == 0 else ((0, 1), (0, 1))
        cin = x.shape[-1]
        patches = im2col(x, pad).reshape(b * h * w, 4 * cin)
        wm = wk.reshape(4 * cin, -1)      # HWIO k=2 -> (4Cin, Cout)
        x = jax.nn.relu(patches @ wm).reshape(b, h, w, -1)
    return jnp.sum(x.astype(jnp.float32))


def stack_matmul_chw(ws, x):
    """Transposed: activations (C, B*H*W); GEMM (Cout,4Cin)@(4Cin,pixels).

    Channels live on the SUBLANE-tiled dim (8-granular: 280 = 35*8 exact),
    pixels on the 128-lane dim.
    """
    b, h, w, c = x.shape
    xt = jnp.transpose(x, (3, 0, 1, 2))            # (C, B, H, W)
    for j, wk in enumerate(ws):
        pad = ((1, 0), (1, 0)) if j % 2 == 0 else ((0, 1), (0, 1))
        (ph1, ph2), (pw1, pw2) = pad
        cin = xt.shape[0]
        xp = jnp.pad(xt, ((0, 0), (0, 0), (ph1, ph2), (pw1, pw2)))
        taps = jnp.concatenate([
            xp[:, :, 0:h, 0:w], xp[:, :, 0:h, 1:w + 1],
            xp[:, :, 1:h + 1, 0:w], xp[:, :, 1:h + 1, 1:w + 1]], axis=0)
        taps = taps.reshape(4 * cin, b * h * w)
        wm = wk.reshape(4 * cin, -1).T             # (Cout, 4Cin)
        xt = jax.nn.relu(wm @ taps).reshape(-1, b, h, w)
    return jnp.sum(xt.astype(jnp.float32))


# ---- Winograd F(2x2, 2x2): 9 GEMMs instead of 16 ----------------------------

def wino_rows(xp, T):
    d0 = xp[:, 0:2 * T:2]
    d1 = xp[:, 1:2 * T + 1:2]
    d2 = xp[:, 2:2 * T + 2:2]
    return (d1, d0 - d1, d2 - d1)


def winograd_conv2x2(x, w, pad):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    (p1h, p2h), (p1w, p2w) = pad
    oh = h + p1h + p2h - 1
    ow = wd + p1w + p2w - 1
    th, tw = -(-oh // 2), -(-ow // 2)
    xp = jnp.pad(x, ((0, 0), (p1h, 2 * th + 1 - (h + p1h)),
                     (p1w, 2 * tw + 1 - (wd + p1w)), (0, 0)))
    rows = wino_rows(xp, th)
    v = []
    for r in rows:
        r = jnp.swapaxes(r, 1, 2)
        cols = wino_rows(r, tw)
        v.append([jnp.swapaxes(c, 1, 2) for c in cols])
    V = jnp.stack([v[a][b_] for a in range(3) for b_ in range(3)])
    rowsU = [w[0] + w[1], w[0], w[1]]
    U = []
    for ru in rowsU:
        U += [ru[0] + ru[1], ru[0], ru[1]]
    U = jnp.stack(U)
    M = jnp.einsum('pbtuc,pcd->pbtud', V, U)
    M = M.reshape(3, 3, b, th, tw, cout)
    r0 = M[0] + M[1]
    r1 = M[0] + M[2]
    y = jnp.stack([jnp.stack([r0[0] + r0[1], r0[0] + r0[2]], 3),
                   jnp.stack([r1[0] + r1[1], r1[0] + r1[2]], 3)], 2)
    y = y.reshape(b, 2 * th, 2 * tw, cout)
    return y[:, :oh, :ow]


def stack_wino(ws, x):
    for j, w in enumerate(ws):
        pad = ((1, 0), (1, 0)) if j % 2 == 0 else ((0, 1), (0, 1))
        x = jax.nn.relu(winograd_conv2x2(x, w, pad))
    return jnp.sum(x.astype(jnp.float32))


def bench_family(C, dtype, n_conv=N_CONV):
    print(f'--- C={C} {dtype.__name__} (x{n_conv} convs, B={B}, {PS}^2) ---',
          flush=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, PS, PS, C)) * 0.1, dtype)
    ws = [jnp.asarray(np.random.default_rng(i).standard_normal(
        (2, 2, C, C)) * (1.0 / np.sqrt(4 * C)), dtype) for i in range(n_conv)]
    fl = n_conv * B * PS * PS * 4 * C * C * 2

    timeit(jax.jit(stack_direct), ws, x, name=f'direct conv fwd', flops=fl)
    timeit(jax.jit(stack_matmul_nhwc), ws, x,
           name=f'im2col matmul (C on lanes) fwd', flops=fl)
    timeit(jax.jit(stack_matmul_chw), ws, x,
           name=f'transposed matmul (C on sublanes) fwd', flops=fl)
    timeit(jax.jit(stack_wino), ws, x, name=f'winograd fwd', flops=fl)

    timeit(jax.jit(lambda ws, x: jax.grad(stack_direct)(ws, x)[0][0]), ws, x,
           name='direct fwd+bwd', flops=3 * fl)
    timeit(jax.jit(lambda ws, x: jax.grad(stack_matmul_chw)(ws, x)[0][0]),
           ws, x, name='transposed matmul fwd+bwd', flops=3 * fl)
    timeit(jax.jit(lambda ws, x: jax.grad(stack_wino)(ws, x)[0][0]), ws, x,
           name='winograd fwd+bwd', flops=3 * fl)


def main():
    print(f'device: {jax.devices()[0]}', flush=True)
    # correctness of the exotic forms vs direct (small, fp32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 13, 17, 8)), jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((2, 2, 8, 8)) * 0.2, jnp.float32)
          for _ in range(2)]
    # TPU matmuls/convs run at bf16-ish default precision; Winograd's add/sub
    # transforms amplify that, so verify algorithms at HIGHEST precision.
    with jax.default_matmul_precision('highest'):
        a = jax.jit(stack_direct)(ws, x)
        for f, nm in ((stack_matmul_nhwc, 'im2col'),
                      (stack_matmul_chw, 'chw'), (stack_wino, 'wino')):
            d = abs(float(jax.jit(f)(ws, x)) - float(a))
            print(f'correctness {nm}: |delta| = {d:.2e}', flush=True)
            assert d < 1e-2, nm

    for C in (256, 280):
        bench_family(C, jnp.bfloat16)
    bench_family(280, jnp.float32, n_conv=4)


if __name__ == '__main__':
    main()
