"""Round-3 probe: why is the REAL model's backward ~2x less efficient than
the bare conv chain?  (step_ablation: fwd+bwd 247 ms at chs=70 bs=64 =
~74 TF/s, vs convperf_probe's 167 TF/s for the bare 14-conv chain.)

Adds features one at a time to the bare chain and measures fwd+bwd:
  bare        14 convs, bias, relu (the convperf baseline, real pads)
  +bn         FusedBatchNorm after every second conv (training mode)
  +flaxbn     same but flax nn.BatchNorm (fp32 promote) for comparison
  outnet      the actual OutNet module (block0 takes 4*chs input)
  innet       the 4-stream in_net (27ch -> chs, oriented kernels)
  model       full FeedForward fwd+bwd with the UPR loss

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bwd_gap_probe.py
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')


def sync(r):
    leaf = [l for l in jax.tree_util.tree_leaves(r)
            if hasattr(l, 'ravel')][0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, n=8, name='', flops=None):
    r = fn(*args)
    sync(r)
    sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
        sync(r)
    dt = (time.time() - t0) / n * 1000
    extra = f'  {flops / dt * 1e-9:7.1f} TF/s' if flops else ''
    print(f'{name:40s} {dt:9.2f} ms{extra}', flush=True)
    return dt


B, H = 64, 96
C = 280


def conv(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), list(pad), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def bn_affine(x, scale, bias):
    """FusedBatchNorm training-mode math (stats from the batch)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    s = scale * jax.lax.rsqrt(var + 1e-5)
    t = bias - mean * s
    return x * s.astype(x.dtype) + t.astype(x.dtype)


def chain(params, x, mode):
    for i, (w1, b1, w2, b2, g, be) in enumerate(params):
        x = jax.nn.relu(conv(x, w1, ((1, 1), (1, 1))) + b1)
        x = conv(x, w2, ((0, 0), (0, 0))) + b2
        if mode == 'bn':
            x = bn_affine(x, g, be)
        elif mode == 'flaxbn':
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.var(xf, axis=(0, 1, 2))
            x = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * g + be
                 ).astype(x.dtype)
        x = jax.nn.relu(x)
    return jnp.sum(x.astype(jnp.float32))


def bare_family():
    rng = np.random.default_rng(0)
    params = []
    for i in range(7):
        params.append(tuple(jnp.asarray(a, jnp.bfloat16) for a in (
            rng.standard_normal((2, 2, C, C)) / np.sqrt(4 * C),
            rng.standard_normal(C) * 0.1,
            rng.standard_normal((2, 2, C, C)) / np.sqrt(4 * C),
            rng.standard_normal(C) * 0.1,
            np.abs(rng.standard_normal(C)) + 0.5,
            rng.standard_normal(C) * 0.1,
        )))
    x = jnp.asarray(rng.standard_normal((B, H, H, C)) * 0.3, jnp.bfloat16)
    fl = 3 * 7 * 2 * B * H * H * 4 * C * C * 2
    for mode in ('bare', 'bn', 'flaxbn'):
        g = jax.jit(jax.grad(partial(chain, mode=mode), argnums=1))
        timeit(lambda x, g=g: g(params, x), x, name=f'chain {mode} f+b',
               flops=fl)


def module_family():
    import optax
    from mmlf_tpu.config import Config
    from mmlf_tpu.models import FeedForward
    from mmlf_tpu.models.feed_forward import OutNet, StreamNet

    cfg = Config(model_uncert=True, model_chs=70, bf16=True).finalize()
    rng = np.random.default_rng(1)

    # OutNet alone
    out_net = OutNet(8, 280, 2, 2, True, 0.1, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, H, H, 280)) * 0.3, jnp.float32)
    v = out_net.init(jax.random.PRNGKey(0), x, True)

    def loss_o(params, x):
        out, _ = out_net.apply(
            {'params': params, 'batch_stats': v['batch_stats']}, x, True,
            mutable=['batch_stats'])
        return jnp.sum(out.astype(jnp.float32))
    # block0 conv1 is 1120-in (4 equivalent convs); 7.25 eq blocks of 2
    fl_o = 3 * (2 * 7 + 1 + 4) * B * H * H * 4 * 280 * 280 * 2
    timeit(jax.jit(jax.grad(loss_o)), v['params'], x,
           name='OutNet module f+b', flops=fl_o)

    # in_net x4 streams
    in_net = StreamNet(3, 70, 2, True, 0.1, dtype=jnp.bfloat16)
    xs = jnp.asarray(rng.standard_normal((B, H, H, 27)) * 0.3, jnp.float32)
    vi = in_net.init(jax.random.PRNGKey(0), xs, True)

    def loss_i(params, xs):
        tot = 0.0
        for orient in ('t', 'n', 'tf', 'n'):
            out, _ = in_net.apply(
                {'params': params, 'batch_stats': vi['batch_stats']}, xs,
                True, orient, mutable=['batch_stats'])
            tot += jnp.sum(out.astype(jnp.float32))
        return tot
    fl_i = 3 * 4 * B * H * H * 4 * (27 * 70 + 5 * 70 * 70) * 2
    timeit(jax.jit(jax.grad(loss_i)), vi['params'], xs,
           name='in_net x4 streams f+b', flops=fl_i)

    # full model + loss (the ablation's fwdbwd for cross-checking)
    model = FeedForward.from_config(cfg)
    stacks = [jnp.asarray(rng.random((B, 9, H, H, 3), dtype=np.float32))
              for _ in range(4)]
    vm = model.init(jax.random.PRNGKey(0), *stacks)
    gt = jnp.zeros((B, H, H))

    def loss_m(params, h, vv, i, d):
        out, _ = model.apply(
            {'params': params, 'batch_stats': vm['batch_stats']},
            h, vv, i, d, train=True, mutable=['batch_stats'])
        err = jnp.abs(out['mean'] - gt)
        return jnp.mean(err * jnp.exp(-out['logvar'])
                        + out['logvar'])
    from bench import conv_flops_per_patch
    fl_m = B * conv_flops_per_patch(70)
    timeit(jax.jit(jax.grad(loss_m)), vm['params'], *stacks,
           name='full model+loss f+b', flops=fl_m)


def main():
    print(f'device: {jax.devices()[0]}', flush=True)
    bare_family()
    module_family()


if __name__ == '__main__':
    main()
