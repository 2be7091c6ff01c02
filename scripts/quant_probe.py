"""Probe: is int8 conv profitable on the v5e for the eval/serving path?

Times the out_net-shaped conv chain (C=280, k=2, full-scene 512²) in fp32 /
bf16 / int8 (int32 accumulation), plus a dynamically-quantized int8 variant
(per-layer activation scale computed on device — what a real W8A8 path pays).

Run on the TPU: `python scripts/quant_probe.py [size] [blocks]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def time_fn(fn, *args, iters=10):
    # fn returns a scalar (reduced inside jit) so the relay readback per
    # iteration is 4 bytes, not the full activation tensor.
    out = fn(*args)
    np.asarray(out)                              # warm + drain
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(out)
    return (time.time() - t0) / iters


def conv(x, k, pads, prefer=None):
    return lax.conv_general_dilated(
        x, k, (1, 1), pads, dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=prefer)


def chain(x, kernels, prefer=None, dtype=None):
    for i, k in enumerate(kernels):
        pads = [(1, 1), (1, 1)] if i % 2 == 0 else [(0, 0), (0, 0)]
        y = conv(x, k, pads, prefer)
        if dtype is not None:                     # requantize between layers
            y = jnp.clip(y.astype(jnp.float32) / 127.0, -127, 127)
            x = y.astype(dtype)
        else:
            x = jnp.maximum(y, 0).astype(x.dtype)
    return x


def chain_dynq(x, kernels):
    """W8A8 with per-layer dynamic activation scale (the honest path)."""
    for i, k in enumerate(kernels):
        pads = [(1, 1), (1, 1)] if i % 2 == 0 else [(0, 0), (0, 0)]
        s = jnp.max(jnp.abs(x)) / 127.0 + 1e-12
        xq = jnp.round(x / s).astype(jnp.int8)
        y = conv(xq, k, pads, prefer=jnp.int32)
        x = jnp.maximum(y.astype(jnp.float32) * s / 127.0, 0.0)
    return x


def main():
    from mmlf_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 280
    print(f'backend={jax.default_backend()} size={size} convs={blocks} C={C}',
          flush=True)
    rng = np.random.RandomState(0)
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    flops = 2 * blocks * size * size * 4 * C * C * reps  # k=2 conv = 4 taps

    x32 = jnp.asarray(rng.rand(1, size, size, C).astype('f4'))
    ks32 = [jnp.asarray(rng.rand(2, 2, C, C).astype('f4') * 0.05)
            for _ in range(blocks)]

    def scalar(fn):
        # repeat the chain inside ONE jitted program so the ~32 ms relay RTT
        # per host sync amortizes over `reps` chain evaluations
        def run(x, ks):
            # thread x through the loop (output shape/dtype == input for all
            # chains here) so XLA cannot hoist the body as loop-invariant
            def body(_, acc):
                x, s = acc
                y = fn(x, ks)
                return y, s + y.astype(jnp.float32).sum()
            _, s = lax.fori_loop(0, reps, body, (x, jnp.float32(0)))
            return s
        return jax.jit(run)

    xbf = x32.astype(jnp.bfloat16)
    ksbf = [k.astype(jnp.bfloat16) for k in ks32]
    t = time_fn(scalar(chain), xbf, ksbf)
    print(f'bf16 : {t*1e3:8.1f} ms  {flops/t/1e12:6.1f} TF/s', flush=True)

    xi8 = jnp.asarray(rng.randint(-127, 127, (1, size, size, C), dtype=np.int8))
    ksi8 = [jnp.asarray(rng.randint(-127, 127, (2, 2, C, C), dtype=np.int8))
            for _ in range(blocks)]
    t = time_fn(scalar(lambda x, ks: chain(x, ks, prefer=jnp.int32,
                                           dtype=jnp.int8)), xi8, ksi8)
    print(f'int8 : {t*1e3:8.1f} ms  {flops/t/1e12:6.1f} TOP/s '
          '(raw, requant between)', flush=True)

    t = time_fn(scalar(chain_dynq), x32, ksi8)
    print(f'w8a8 : {t*1e3:8.1f} ms  {flops/t/1e12:6.1f} TOP/s '
          '(dynamic act scale)', flush=True)

    t = time_fn(scalar(chain), x32, ks32)
    print(f'fp32 : {t*1e3:8.1f} ms  {flops/t/1e12:6.1f} TF/s', flush=True)


if __name__ == '__main__':
    main()
