"""Traffic-lean BatchNorm for the conv trunk.

``flax.linen.BatchNorm`` with ``dtype=float32`` promotes the whole
activation tensor to fp32 for the normalize and again in its backward —
on the bf16 trunk that is several full fp32 passes over ~300 MB per block
(measured ~21 ms of the bs=64 train step on v5e, 17 ms of it in the
backward).  This drop-in replacement:

  * accumulates the batch statistics in fp32 via a single fused
    sum/sum-of-squares reduction pass (XLA fuses both reductions);
  * folds the normalization into one per-channel affine ``x*s + t``
    applied in the activation dtype (one bf16 pass that XLA fuses into
    the preceding conv's epilogue); JAX's AD of this form keeps the
    backward in bf16 too;
  * keeps flax's exact semantics and variable tree (params ``scale`` /
    ``bias``, batch_stats ``mean`` / ``var``, biased batch variance,
    ``ra = m*ra + (1-m)*batch``) so existing checkpoints, converters and
    the torch-oracle tests are unaffected (torch stores the *unbiased*
    variance in its running stats; at n = b*h*w ≈ 6e5 the difference is
    ~2e-6 relative, far below test tolerances — same trade the round-1
    flax path made).

Matches the reference's torch BatchNorm2d behaviour
(/root/reference/mmlf/model/feed_forward.py:86-92) like nn.BatchNorm did.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _bn_apply(x, mean, rstd, scale, bias, n):
    """Training-mode normalize as one per-channel affine, with the
    CANONICAL two-reduction BatchNorm backward.

    JAX AD through ``mean``/``var``-of-x produces more reduction passes
    over the (B, H, W, C) activations than the textbook fused-BN
    backward needs; on a bandwidth-bound v5e trunk those passes are the
    bulk of train-BN's cost (docs/STATUS.md "where the chs=70 step
    goes").  This VJP computes the full dx in one fused reduction pass
    (``Σdy`` and ``Σdy·x`` read dy/x once) plus one elementwise pass —
    ``mean``/``rstd`` receive ZERO cotangents because their dependence
    on x is already folded into dx (the standard fused-BN identity).
    """
    s = scale * rstd
    t = bias - mean * s
    return x * s.astype(x.dtype) + t.astype(x.dtype)


def _bn_apply_fwd(x, mean, rstd, scale, bias, n):
    y = _bn_apply(x, mean, rstd, scale, bias, n)
    return y, (x, mean, rstd, scale)


def _bn_apply_bwd(n, res, dy):
    x, mean, rstd, scale = res
    axes = tuple(range(x.ndim - 1))
    # one fused pass: both reductions read (dy, x) once, fp32 accumulation
    sum_dy = jnp.sum(dy, axis=axes, dtype=jnp.float32)
    sum_dy_x = jnp.sum(dy.astype(jnp.float32) * x.astype(jnp.float32),
                       axis=axes)
    dbeta = sum_dy
    dgamma = rstd * (sum_dy_x - mean * sum_dy)
    k = (scale * rstd).astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rstd
    dx = k * (dy.astype(jnp.float32) - sum_dy / n - xhat * (dgamma / n))
    return (dx.astype(x.dtype), jnp.zeros_like(mean), jnp.zeros_like(rstd),
            dgamma, dbeta)


_bn_apply.defvjp(_bn_apply_fwd, _bn_apply_bwd)


class FusedBatchNorm(nn.Module):
    """BatchNorm over (batch, H, W) with a fused affine normalize.

    ``momentum`` follows the flax convention (decay of the running
    average; torch's ``momentum`` is ``1 - this``).
    """
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones_init(),
                           (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (c,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            s = scale * jax.lax.rsqrt(var + self.epsilon)
            t = bias - mean * s
            return x * s.astype(x.dtype) + t.astype(x.dtype)

        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        # biased batch variance, flax-style mean(x²) - mean²
        var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - \
            jnp.square(mean)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * \
                jax.lax.stop_gradient(mean)
            ra_var.value = m * ra_var.value + (1.0 - m) * \
                jax.lax.stop_gradient(var)

        # stats enter the normalize through stop_gradient: their x-path
        # is folded into _bn_apply's canonical dx (zero cotangents there
        # keep the combination exact, not double-counted)
        n = float(np.prod(x.shape[:-1]))
        rstd = jax.lax.rsqrt(jax.lax.stop_gradient(var) + self.epsilon)
        return _bn_apply(x, jax.lax.stop_gradient(mean), rstd, scale,
                         bias, n)
