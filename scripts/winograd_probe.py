"""Prototype Winograd F(2x2, 2x2) conv in pure XLA; verify + bench vs lax.conv.

1D algorithm (derived for correlation y_i = g0*d_i + g1*d_{i+1}):
  m0 = d1*(g0+g1); m1 = (d0-d1)*g0; m2 = (d2-d1)*g1
  y0 = m0 + m1;  y1 = m0 + m2
i.e. B^T d = [d1, d0-d1, d2-d1], G g = [g0+g1, g0, g1], A^T = [[1,1,0],[1,0,1]]
2D is the nesting; 9 multiplies (GEMMs over channels) vs 16.
"""
import time, sys
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(x.ravel()[:1]))

def timeit(fn, *args, n=10, name='', flops=None):
    for _ in range(2): r = fn(*args)
    sync(r)
    t0 = time.time()
    for _ in range(n): r = fn(*args)
    sync(r)
    dt = (time.time()-t0)/n*1000
    extra = f'  {flops/dt*1e-9:7.1f} TF/s(real)' if flops else ''
    print(f'{name:44s} {dt:8.2f} ms{extra}', flush=True)
    return dt

def wino_transform_d(xp, T):
    """xp (B, L, W, C) padded rows; returns 3 row-combos at stride 2, T tiles."""
    d0 = xp[:, 0:2*T:2]
    d1 = xp[:, 1:2*T+1:2]
    d2 = xp[:, 2:2*T+2:2]
    return (d1, d0 - d1, d2 - d1)

def winograd_conv2x2(x, w, pad):
    """NHWC conv, 2x2 kernel, padding ((p1h,p2h),(p1w,p2w)) stride 1."""
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    (p1h, p2h), (p1w, p2w) = pad
    oh = h + p1h + p2h - 1
    ow = wd + p1w + p2w - 1
    th, tw = -(-oh // 2), -(-ow // 2)
    # pad input so rows 0..2T+1 exist
    xp = jnp.pad(x, ((0, 0), (p1h, 2*th + 1 - (h + p1h)),
                     (p1w, 2*tw + 1 - (wd + p1w)), (0, 0)))
    rows = wino_transform_d(xp, th)                       # 3 x (B,th,W',C)
    v = []
    for r in rows:
        r = jnp.swapaxes(r, 1, 2)                          # (B, W', th, C)
        cols = wino_transform_d(r, tw)                     # 3 x (B,tw,th,C)
        v.append([jnp.swapaxes(c, 1, 2) for c in cols])    # (B,th,tw,C)
    V = jnp.stack([v[a][b_] for a in range(3) for b_ in range(3)])  # (9,B,th,tw,C)

    # U = (G w G^T): G g = [g0+g1, g0, g1]
    g = [w[0], w[1]]                                       # rows: (2, Cin, Cout) each (2,cin,cout)? w (2,2,cin,cout)
    def gmix(a, b_):
        return a + b_
    rowsU = [w[0] + w[1], w[0], w[1]]                      # (2?, ...) each (2, cin, cout)
    U = []
    for ru in rowsU:
        U += [ru[0] + ru[1], ru[0], ru[1]]                 # cols combos
    U = jnp.stack(U)                                       # (9, Cin, Cout)

    M = jnp.einsum('pbtuc,pcd->pbtud', V, U)               # 9 GEMMs
    M = M.reshape(3, 3, b, th, tw, cout)
    # inverse: A^T = [[1,1,0],[1,0,1]] both axes
    r0 = M[0] + M[1]
    r1 = M[0] + M[2]
    y00 = r0[0] + r0[1]
    y01 = r0[0] + r0[2]
    y10 = r1[0] + r1[1]
    y11 = r1[0] + r1[2]
    y = jnp.stack([jnp.stack([y00, y01], 3), jnp.stack([y10, y11], 3)], 2)
    # y (b, th, 2, tw, 2, cout) -> (b, 2th, 2tw, cout)
    y = y.reshape(b, 2*th, 2*tw, cout)
    return y[:, :oh, :ow]

def ref_conv(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), list(pad), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

# correctness (CPU-sized on TPU ok)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((2, 13, 17, 8), dtype=np.float32))
w = jnp.asarray(rng.standard_normal((2, 2, 8, 5), dtype=np.float32))
for pad in (((1, 0), (1, 0)), ((0, 0), (0, 0)), ((1, 1), (1, 1))):
    a = np.asarray(jax.jit(partial(ref_conv, pad=pad))(x, w))
    b_ = np.asarray(jax.jit(partial(winograd_conv2x2, pad=pad))(x, w))
    print(f'pad {pad}: max err {np.abs(a - b_).max():.2e}', flush=True)

# bench at out_net size
B, PS, C = 64, 96, 256
x = jnp.ones((B, PS, PS, C), jnp.bfloat16)
ws = [jnp.full((2, 2, C, C), 0.01, jnp.bfloat16) for _ in range(16)]
PADS = [((1, 0), (1, 0)), ((0, 1), (0, 1))]

def stack_ref(ws, x):
    for j, w in enumerate(ws):
        x = jax.nn.relu(ref_conv(x, w, PADS[j % 2]))
    return jnp.sum(x.astype(jnp.float32))

def stack_wino(ws, x):
    for j, w in enumerate(ws):
        x = jax.nn.relu(winograd_conv2x2(x, w, PADS[j % 2]))
    return jnp.sum(x.astype(jnp.float32))

fl = 16*B*PS*PS*4*C*C*2
timeit(jax.jit(stack_ref), ws, x, name='direct conv x16 fwd', flops=fl)
timeit(jax.jit(stack_wino), ws, x, name='winograd conv x16 fwd', flops=fl)
timeit(jax.jit(lambda ws, x: jax.grad(stack_ref)(ws, x)[0][0]), ws, x,
       name='direct x16 fwd+bwd', flops=3*fl)
timeit(jax.jit(lambda ws, x: jax.grad(stack_wino)(ws, x)[0][0]), ws, x,
       name='winograd x16 fwd+bwd', flops=3*fl)
