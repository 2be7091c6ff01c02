"""Round-3 probe: the out_net's pad-oscillation penalty (96->97->96).

bench-convention FLOPs (bench.conv_flops_per_patch) put the model's
out_net at ~135 TF/s device while the bare shape-preserving 14-conv chain
runs 167 TF/s — the gap is the (1,1)/(0,0) pad pattern and/or BN.  This
probe times, at B=128 C=280 bf16 with EXACT per-conv flop accounting:

  chain osc      conv pad(1,1) -> relu -> conv pad(0,0) -> BN-affine+relu
                 (the model's pattern, intermediates 97x97)
  chain even     conv pad(1,2) -> relu -> conv pad(0,-1): identical math
                 (negative pad drops the garbage column), intermediates
                 98x98 — checked numerically against `osc`
  chain same     conv pad 'same' k=2 both (different math, the known-fast
                 reference point)
  outnet module  the real OutNet (flax, FusedBatchNorm)

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/padshape_probe.py [B]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = 96
C = 280
BLOCKS = 7
DT = jnp.bfloat16


def sync(r):
    leaf = [l for l in jax.tree_util.tree_leaves(r)
            if hasattr(l, 'ravel')][0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, n=8, name='', flops=None):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*args))
    dt = (time.time() - t0) / n * 1000
    extra = f'  {flops / dt * 1e-9:7.1f} TF/s' if flops else ''
    print(f'{name:34s} {dt:9.2f} ms{extra}', flush=True)
    return dt


def conv(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), list(pad),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def bn_affine(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    s = scale * jax.lax.rsqrt(var + 1e-5)
    t = bias - mean * s
    return x * s.astype(x.dtype) + t.astype(x.dtype)


def make_params(rng, blocks=BLOCKS):
    out = []
    for _ in range(blocks):
        out.append(tuple(jnp.asarray(a, jnp.float32) for a in (
            rng.standard_normal((2, 2, C, C)) / np.sqrt(4 * C),
            rng.standard_normal(C) * 0.1,
            rng.standard_normal((2, 2, C, C)) / np.sqrt(4 * C),
            rng.standard_normal(C) * 0.1,
            np.abs(rng.standard_normal(C)) * 0.1 + 1.0,
            rng.standard_normal(C) * 0.1,
        )))
    return out


def chain(pads, params, x, use_bn=True):
    p1, p2 = pads
    for (w1, b1, w2, b2, g, be) in params:
        x = jax.nn.relu(conv(x, w1, p1) + b1.astype(x.dtype))
        x = conv(x, w2, p2) + b2.astype(x.dtype)
        x = bn_affine(x, g, be) if use_bn else x
        x = jax.nn.relu(x)
    return x


PADS = {
    'osc': (((1, 1), (1, 1)), ((0, 0), (0, 0))),
    'even': (((1, 2), (1, 2)), ((0, -1), (0, -1))),
    'same': (((0, 1), (0, 1)), ((0, 1), (0, 1))),
}


def main():
    print(f'device: {jax.devices()[0]}  B={B}', flush=True)
    rng = np.random.default_rng(0)
    params = make_params(rng)
    x = jnp.asarray(rng.standard_normal((B, H, H, C)) * 0.1, DT)

    # equivalence: even == osc exactly (the dropped column is the only
    # difference and it never reaches the output)
    a = chain(PADS['osc'], params[:2], x).astype(jnp.float32)
    bb = chain(PADS['even'], params[:2], x).astype(jnp.float32)
    print(f'check even==osc  max|d| = {float(jnp.max(jnp.abs(a - bb))):.3e}',
          flush=True)

    # exact fwd+bwd flops: conv1 emits h1^2 (osc: 97, even: 98, same: 96),
    # conv2 emits 96^2; fwd+bwd = 3x fwd per conv
    def fl(h1):
        per_block = 3 * 2 * 4 * C * C * (h1 * h1 + H * H)
        return B * BLOCKS * per_block

    FLOPS = {'osc': fl(97), 'even': fl(98), 'same': fl(96)}
    USEFUL = fl(97)   # the model's useful work, for cross-comparison

    for name, pads in PADS.items():
        def loss(params, x, pads=pads):
            return jnp.sum(chain(pads, params, x).astype(jnp.float32))
        g = jax.jit(jax.grad(loss))
        dt = timeit(lambda: g(params, x), name=f'chain {name} f+b',
                    flops=FLOPS[name])
        print(f'{"":34s} {"":9s}    {USEFUL / dt * 1e-9:7.1f} TF/s useful',
              flush=True)

    # no-BN variant of the oscillating chain (isolate BN cost)
    def loss_nobn(params, x):
        return jnp.sum(chain(PADS['osc'], params, x,
                             use_bn=False).astype(jnp.float32))
    timeit(jax.jit(jax.grad(loss_nobn)), params, x,
           name='chain osc no-bn f+b', flops=FLOPS['osc'])

    # the real OutNet module, bench-convention flops
    from mmlf_tpu.models.feed_forward import OutNet
    onet = OutNet(8, C, 2, 2, True, 0.1, dtype=DT)
    v = onet.init(jax.random.PRNGKey(0), x.astype(jnp.float32), True)
    # last block projects at conv1 (ConvBlock(features=out_chs))
    fl_o = B * 3 * 2 * 4 * (C * C * 7 * (97 * 97 + 96 * 96)
                            + C * 2 * 97 * 97 + 2 * 2 * 96 * 96)

    def loss_o(p, x):
        out, _ = onet.apply({'params': p, 'batch_stats': v['batch_stats']},
                            x, True, mutable=['batch_stats'])
        return jnp.sum(out.astype(jnp.float32))
    timeit(jax.jit(jax.grad(loss_o)), v['params'], x,
           name='OutNet module f+b', flops=fl_o)


if __name__ == '__main__':
    main()
