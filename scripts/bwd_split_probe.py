"""Round-5 probe (VERDICT r4 item 6): where does the conv BACKWARD go at
chs=70, and can any reformulation of dgrad/wgrad beat XLA's?

Round 3 established: full model ~140 TF/s vs the bare 14-conv chain's 167,
backward ~2.6x forward, and every alternative FORWARD formulation loses to
XLA's direct conv (scripts/convperf_probe.py).  The backward was never
decomposed: XLA's autodiff emits a dgrad conv (dy * flipped/IO-swapped
kernel) and a wgrad conv (x * dy reduced over batch+space) per conv — this
probe times them separately and races the one family of alternatives the
refuted list doesn't cover:

  * wgrad as an explicit im2col GEMM  (4Cin, B*H*W) @ (B*H*W, Cout) — the
    K-huge reduction GEMM, candidate for better MXU tiling than XLA's
    native wgrad at the 280-channel misalignment;
  * dgrad as an explicit flipped-kernel direct conv in NHWC (what XLA
    should emit — measures whether autodiff's version leaves anything on
    the table);
  * both in one measurement per width C in {256, 280} so the lane-padding
    penalty of 280 is visible per-part.

Run on the real chip:  python scripts/bwd_split_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

B, PS, N_CONV = 128, 96, 14


def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def timeit(fn, *args, n=10, name='', flops=None):
    for _ in range(2):
        r = fn(*args)
    sync(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    dt = (time.time() - t0) / n * 1000
    extra = f'  {flops / dt * 1e-9:7.1f} TF/s(real)' if flops else ''
    print(f'{name:56s} {dt:8.2f} ms{extra}', flush=True)
    return dt


def conv(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), list(pad), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def pad_of(j):
    return ((1, 0), (1, 0)) if j % 2 == 0 else ((0, 1), (0, 1))


def chain(ws, x):
    for j, w in enumerate(ws):
        x = jax.nn.relu(conv(x, w, pad_of(j)))
    return jnp.sum(x.astype(jnp.float32))


def im2col(x, pad):
    (ph1, ph2), (pw1, pw2) = pad
    xp = jnp.pad(x, ((0, 0), (ph1, ph2), (pw1, pw2), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    return jnp.concatenate([
        xp[:, 0:h, 0:w], xp[:, 0:h, 1:w + 1],
        xp[:, 1:h + 1, 0:w], xp[:, 1:h + 1, 1:w + 1]], axis=-1)


# ---- isolated per-part programs (REPS independent (x, dy) pairs) ----------

def xla_wgrad(xs, dys, w0):
    """XLA's own wgrad: vjp of the conv w.r.t. the kernel only."""
    outs = []
    for x, dy in zip(xs, dys):
        _, vjp = jax.vjp(lambda w: conv(x, w, pad_of(0)), w0)
        outs.append(vjp(dy)[0])
    return jnp.stack(outs)


def gemm_wgrad(xs, dys, w0):
    """wgrad as ONE K-huge GEMM per pair: (4C, BHW) @ (BHW, C)."""
    c = xs[0].shape[-1]
    outs = []
    for x, dy in zip(xs, dys):
        p = im2col(x, pad_of(0)).reshape(-1, 4 * c)      # (BHW, 4C)
        g = p.T @ dy.reshape(-1, dy.shape[-1])           # (4C, C)
        outs.append(g.reshape(2, 2, c, -1))
    return jnp.stack(outs)


def xla_dgrad(xs, dys, w0):
    outs = []
    for x, dy in zip(xs, dys):
        _, vjp = jax.vjp(lambda xx: conv(xx, w0, pad_of(0)), x)
        outs.append(vjp(dy)[0])
    return jnp.stack(outs)


def manual_dgrad(xs, dys, w0):
    """dgrad as an explicit direct conv: dy * (spatially flipped,
    IO-swapped kernel), with the transpose of pad ((1,0),(1,0)) -> pad
    ((0,1),(0,1)) for a shape-preserving k=2 conv."""
    wt = jnp.transpose(w0[::-1, ::-1], (0, 1, 3, 2))
    outs = []
    for dy in dys:
        outs.append(conv(dy, wt, ((0, 1), (0, 1))))
    return jnp.stack(outs)


def bench_chain(C):
    """Chain decomposition by autodiff DCE: grad wrt x keeps only the
    dgrad column; grad wrt (ws, x) adds the wgrads."""
    dt = jnp.bfloat16
    print(f'--- chain: C={C} bf16, B={B}, {PS}^2, x{N_CONV} convs ---',
          flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, PS, PS, C)) * 0.1, dt)
    ws = [jnp.asarray(rng.standard_normal((2, 2, C, C)) / np.sqrt(4 * C), dt)
          for _ in range(N_CONV)]
    fl = N_CONV * B * PS * PS * 4 * C * C * 2

    t_fwd = timeit(jax.jit(chain), ws, x, name='chain fwd', flops=fl)
    t_dg = timeit(jax.jit(jax.grad(chain, argnums=1)), ws, x,
                  name='chain fwd + dgrad (wgrad DCEd)', flops=2 * fl)
    t_full = timeit(jax.jit(jax.grad(chain, argnums=(0, 1))), ws, x,
                    name='chain fwd + dgrad + wgrad', flops=3 * fl)
    print(f'  => by subtraction: dgrad {t_dg - t_fwd:.2f} ms, '
          f'wgrad {t_full - t_dg:.2f} ms, fwd {t_fwd:.2f} ms', flush=True)


def bench_isolated(C, reps=2, b=64):
    """Isolated dgrad/wgrad formulation races at a smaller batch (the
    full-size fp32 im2col of the first attempt materialized a 5.3 GB
    patch tensor and OOMed the 16 GB chip — correctness now runs at a
    tiny shape, races at B=64 x 2 reps, ~1.3 GB live)."""
    dt = jnp.bfloat16
    print(f'--- isolated parts: C={C} bf16, B={b}, {PS}^2, x{reps} ---',
          flush=True)
    rng = np.random.default_rng(1)

    # correctness at a tiny shape (fp32, highest precision)
    tx = [jnp.asarray(rng.standard_normal((2, 24, 24, C)), jnp.float32)]
    tdy = [jnp.asarray(rng.standard_normal((2, 24, 24, C)), jnp.float32)]
    tw = jnp.asarray(rng.standard_normal((2, 2, C, C)) / np.sqrt(4 * C),
                     jnp.float32)
    with jax.default_matmul_precision('highest'):
        a = jax.jit(xla_wgrad)(tx, tdy, tw)
        g = jax.jit(gemm_wgrad)(tx, tdy, tw)
        d = float(jnp.max(jnp.abs(a - g)) / (jnp.max(jnp.abs(a)) + 1e-9))
        print(f'  gemm_wgrad vs xla_wgrad rel|delta| = {d:.2e}', flush=True)
        assert d < 1e-3
        a = jax.jit(xla_dgrad)(tx, tdy, tw)
        g = jax.jit(manual_dgrad)(tx, tdy, tw)
        d = float(jnp.max(jnp.abs(a - g)) / (jnp.max(jnp.abs(a)) + 1e-9))
        print(f'  manual_dgrad vs xla_dgrad rel|delta| = {d:.2e}',
              flush=True)
        assert d < 1e-3

    xs = [jnp.asarray(rng.standard_normal((b, PS, PS, C)) * 0.1, dt)
          for _ in range(reps)]
    # pad_of(0) totals 1 per axis for k=2 => shape-preserving: dy is (PS, PS)
    dys = [jnp.asarray(rng.standard_normal((b, PS, PS, C)) * 0.1, dt)
           for _ in range(reps)]
    w0 = jnp.asarray(rng.standard_normal((2, 2, C, C)) / np.sqrt(4 * C), dt)
    flp = reps * b * PS * PS * 4 * C * C * 2

    timeit(jax.jit(xla_wgrad), xs, dys, w0, name='isolated wgrad (XLA vjp)',
           flops=flp)
    timeit(jax.jit(gemm_wgrad), xs, dys, w0,
           name='isolated wgrad (im2col GEMM, K=BHW)', flops=flp)
    timeit(jax.jit(xla_dgrad), xs, dys, w0,
           name='isolated dgrad (XLA vjp)', flops=flp)
    timeit(jax.jit(manual_dgrad), xs, dys, w0,
           name='isolated dgrad (manual flipped conv)', flops=flp)


def main():
    import gc
    print(f'device: {jax.devices()[0]}', flush=True)
    # the headline numbers first (both widths), then the formulation races
    for C in (280, 256):
        bench_chain(C)
        gc.collect()
    for C in (280, 256):
        bench_isolated(C)
        gc.collect()


if __name__ == '__main__':
    main()
