"""Pallas-executed OutNet: same variable tree, canvas-fused execution.

``PallasOutNet`` declares EXACTLY the parameter/batch-stats tree of
``OutNet`` (models/feed_forward.py) — ``block{i}/conv1|conv2/{kernel,
bias}`` + ``block{i}/bn/{scale,bias}`` params and ``bn/{mean,var}``
stats — so checkpoints, converters and the torch cross-checks are
untouched.  Execution differs: the whole block chain runs on ``(B, C,
M)`` canvases through the fused Pallas double-conv kernel
(ops/pallas/conv_block.py), with each block's BatchNorm affine + ReLU
applied inside the NEXT block's input stage (one VMEM pass instead of a
separate HBM pass), and BatchNorm batch statistics computed from the
kernel's masked per-channel sums — bit-for-bit the FusedBatchNorm
convention (biased variance, ``ra = m*ra + (1-m)*batch``).

Used on the TRAINING path only (train/loop.py behind ``cfg.pallas_trunk``);
eval and the ensemble keep the XLA path where BN folds into the conv
weights entirely (utils/fold_bn.py).  Orientation folds never apply here:
the out_net is orientation-free (only the in_net streams re-orient).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pallas.conv_block import (canvas_dims, from_canvas,
                                     fused_double_conv, to_canvas)


class _ConvParams(nn.Module):
    """Parameter twin of OrientedConv: declares kernel/bias only."""
    cin: int
    cout: int
    ksize: int = 2

    @nn.compact
    def __call__(self):
        k = self.ksize
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (k, k, self.cin, self.cout), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (self.cout,), jnp.float32)
        return kernel, bias


class _BNParams(nn.Module):
    """Parameter/stats twin of FusedBatchNorm (ops/batchnorm.py)."""
    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, ps, pss, count, train: bool):
        c = self.features
        scale = self.param('scale', nn.initializers.ones_init(),
                           (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (c,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            mean = ps / count
            var = pss / count - jnp.square(mean)    # biased, flax-style
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * \
                    jax.lax.stop_gradient(mean)
                ra_var.value = m * ra_var.value + (1.0 - m) * \
                    jax.lax.stop_gradient(var)
        else:
            mean, var = ra_mean.value, ra_var.value
        s = scale * jax.lax.rsqrt(var + self.epsilon)
        t = bias - mean * s
        return s, t


class _BlockParams(nn.Module):
    """Parameter twin of ConvBlock: conv1/conv2 (+bn) children with the
    same names, declaration only."""
    cin: int
    cout: int
    ksize: int
    use_bn: bool
    bn_momentum: float

    @nn.compact
    def __call__(self, ps=None, pss=None, count=None, train: bool = False,
                 stats_only: bool = False):
        if stats_only:
            # second visit: only the bn child runs (same scope names)
            return _BNParams(self.cout, momentum=1.0 - self.bn_momentum,
                             name='bn')(ps, pss, count, train)
        w1, b1 = _ConvParams(self.cin, self.cout, self.ksize,
                             name='conv1')()
        w2, b2 = _ConvParams(self.cout, self.cout, self.ksize,
                             name='conv2')()
        return w1, b1, w2, b2


def orient_kernel(w, orientation: str):
    """The OrientedConv kernel fold (models/feed_forward.py OrientedConv):
    't' = H/W swap, 'tf' = swap then flip the (new) first axis.  Applied
    OUTSIDE the custom-VJP op, so weight gradients flow back through the
    (linear, differentiable) re-indexing automatically."""
    if orientation in ('t', 'tf'):
        w = jnp.swapaxes(w, 0, 1)
    if orientation == 'tf':
        w = jnp.flip(w, axis=0)
    return w


class PallasOutNet(nn.Module):
    """OutNet twin executed by the fused canvas kernel (k=2 only).

    ``__call__`` takes either an NHWC feature map (identity entry) or,
    via ``entry``, a raw canvas + per-channel affine from upstream
    Pallas stream nets (their final BN+ReLU folds into block0's input
    stage — the whole in->out chain then never leaves canvas form).
    """
    n_blocks: int
    features: int
    out_features: int
    ksize: int
    use_bn: bool
    bn_momentum: float
    dtype: Any = jnp.bfloat16
    remat: bool = False          # accepted for signature parity; the
    #                              kernel's VJP already saves/loads the
    #                              exact residuals it needs

    @nn.compact
    def __call__(self, x, train: bool = False, entry: dict = None):
        assert self.ksize == 2, 'PallasOutNet supports ksize=2 only'
        interpret = jax.default_backend() != 'tpu'

        if entry is None:
            b, h, w, cin = x.shape
            _, _, _, m = canvas_dims(h, w)
            xc = to_canvas(x.astype(self.dtype), m)
            si = jnp.ones((cin,), jnp.float32)
            ti = jnp.zeros((cin,), jnp.float32)
            relu_in = affine_in = False
        else:
            xc, si, ti = x, entry['si'], entry['ti']
            h, w = entry['hw']
            cin = xc.shape[1]
            relu_in, affine_in = True, entry['affine']
        count = jnp.float32(xc.shape[0] * h * w)

        blocks = []
        c_in = cin
        for i in range(self.n_blocks):
            last = i == self.n_blocks - 1
            feats = self.out_features if last else self.features
            blocks.append(_BlockParams(c_in, feats, self.ksize,
                                       self.use_bn, self.bn_momentum,
                                       name=f'block{i}'))
            c_in = feats

        for i, blk in enumerate(blocks):
            last = i == self.n_blocks - 1
            w1, b1, w2, b2 = blk()
            y2c, ps, pss = fused_double_conv(
                xc, si, ti, w1, b1, w2, b2, h, w, relu_in, affine_in,
                interpret)
            if last:
                return from_canvas(y2c, h, w)
            if self.use_bn:
                si, ti = blk(ps, pss, count, train, stats_only=True)
                affine_in = True
            else:
                c = w1.shape[-1]
                si = jnp.ones((c,), jnp.float32)
                ti = jnp.zeros((c,), jnp.float32)
                affine_in = False
            relu_in = True
            xc = y2c


class PallasStreamNet(nn.Module):
    """StreamNet twin on canvases: same variable tree, shared weights
    across orientations via kernel re-indexing (like OrientedConv).

    Returns the RAW final-block canvas plus its BN affine ``(si, ti)`` —
    the consumer (PallasOutNet block0) applies BN+ReLU in its input
    stage, so stream outputs never round-trip through an XLA affine.
    """
    n_blocks: int
    features: int
    ksize: int
    use_bn: bool
    bn_momentum: float
    dtype: Any = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, orientation: str = 'n'):
        assert self.ksize == 2
        b, h, w, cin = x.shape
        _, _, _, m = canvas_dims(h, w)
        count = jnp.float32(b * h * w)
        interpret = jax.default_backend() != 'tpu'

        blocks = []
        c_in = cin
        for i in range(self.n_blocks):
            blocks.append(_BlockParams(c_in, self.features, self.ksize,
                                       self.use_bn, self.bn_momentum,
                                       name=f'block{i}'))
            c_in = self.features

        xc = to_canvas(x.astype(self.dtype), m)
        si = jnp.ones((cin,), jnp.float32)
        ti = jnp.zeros((cin,), jnp.float32)
        relu_in = affine_in = False

        for i, blk in enumerate(blocks):
            w1, b1, w2, b2 = blk()
            w1 = orient_kernel(w1, orientation)
            w2 = orient_kernel(w2, orientation)
            y2c, ps, pss = fused_double_conv(
                xc, si, ti, w1, b1, w2, b2, h, w, relu_in, affine_in,
                interpret)
            if self.use_bn:
                si, ti = blk(ps, pss, count, train, stats_only=True)
                affine_in = True
            else:
                si = jnp.ones((self.features,), jnp.float32)
                ti = jnp.zeros((self.features,), jnp.float32)
                affine_in = False
            relu_in = True
            xc = y2c
        return xc, si, ti, (h, w)
