"""EPINET-style multi-stream CNN for light-field depth estimation.

TPU-native re-design of the reference model (mmlf/model/feed_forward.py):

  * channel-last NHWC everywhere — the native XLA/TPU conv layout;
  * view stacks ``(b, n, H, W, 3)`` are folded to ``(b, H, W, n*3)`` with
    view-major channel order (view*3 + color), matching the reference's
    ``view(b, n*c, h, w)`` so converted torch checkpoints line up;
  * one shared-weight input net for the horizontal+vertical streams and one
    for the two diagonals (reference :95-98); the horizontal stream runs with
    H/W swapped, the increasing diagonal swapped + flipped so all EPIs are
    normalized to the vertical orientation (reference :236-258);
  * ``ksize=2`` convolutions pad (1,1) on the first conv of a block and (0,0)
    on the second, preserving spatial shape exactly like torch's
    ``padding=k//2`` / ``k//2 - 1`` pair (reference :86-92);
  * optional bfloat16 compute in the conv trunk (params + heads stay fp32);
  * BatchNorm statistics are *global across the data-parallel mesh* by
    construction: under jit with a sharded batch, ``mean`` over the batch
    axis is a global mean (XLA inserts the collective).  The reference's
    ``DataParallel`` kept per-replica stats; documented design decision.

Heads (reference :270-305):
  BASE — 1-channel ``mean``;
  UPR (``uncert``) — ``mean`` + ``logvar``, plus a Laplace posterior over
      ``steps`` bins where exp(logvar) is used as the Laplace *scale* b — a
      reference quirk preserved for parity (reference :294-302, :9-12);
  DPP (``discrete``) — ``steps`` logits, softmax posterior, argmax one-hot →
      ``class_to_reg`` mean, posterior-variance logvar (reference :276-290).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.batchnorm import FusedBatchNorm
from ..ops.codecs import bin_centers, class_to_reg
from .unet import UNet


def laplacian(x, mu, b):
    """Laplace density over the last (bin) axis.

    :param x: ``(..., S)`` evaluation points (bin grid)
    :param mu: ``(...)`` location
    :param b: ``(...)`` scale (the reference passes *variance* here — quirk)
    """
    mu = mu[..., None]
    b = b[..., None]
    return 1.0 / (2.0 * b) * jnp.exp(-jnp.abs(x - mu) / b)


class OrientedConv(nn.Module):
    """Conv whose kernel is spatially re-oriented at apply time.

    The reference normalizes EPI orientation by transposing the horizontal
    stream's activations and transposing+mirroring the increasing diagonal
    (reference feed_forward.py:236-256).  Those activation transforms
    commute with convolution: ``P(conv_k(P(x))) == conv_{P(k)}(x)``
    (transpose the kernel's spatial axes AND swap the per-axis paddings)
    and ``F(conv_k(F(x))) == conv_{F(k)}(x)`` (mirror the kernel AND swap
    that axis' (lo, hi) padding — a no-op for symmetric pads).
    Re-orienting the tiny ``k×k×Cin×Cout`` kernel therefore replaces six
    full-activation transpose/flip copies per forward — the weights stay
    SHARED across orientations because it is the same flax parameter.

    ``pad`` is either the symmetric int or per-axis ``(lo, hi)`` pairs
    ``((hlo, hhi), (wlo, whi))`` (negative hi crops — see ConvBlock's
    even-shape pads).

    Orientations: ``'n'`` identity, ``'t'`` H↔W transpose,
    ``'tf'`` transpose + mirror (the diagonal normalization).
    """
    features: int
    ksize: int
    pad: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, orientation: str = 'n'):
        k, p = self.ksize, self.pad
        pads = [(p, p), (p, p)] if isinstance(p, int) else [tuple(p[0]),
                                                            tuple(p[1])]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (k, k, x.shape[-1], self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)

        kern = kernel
        if orientation in ('t', 'tf'):
            kern = jnp.swapaxes(kern, 0, 1)
            pads = [pads[1], pads[0]]
        if orientation == 'tf':
            # the reference transform is permute(H↔W) then flip the
            # ORIGINAL-H axis (reference feed_forward.py:248-256); after the
            # swap above, original-H is kernel axis 0.  (Flipping axis 1
            # here conjugates by the OPPOSITE rotation — a bug that
            # round-1's weight-scale-0.1 oracle tests could not see because
            # the toy networks attenuated all input signal to ~1e-7;
            # tests/test_model.py now guards input sensitivity.)
            kern = jnp.flip(kern, axis=0)
            pads[0] = (pads[0][1], pads[0][0])

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kern.astype(self.dtype),
            window_strides=(1, 1), padding=pads,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + bias.astype(self.dtype)


# Even-shape padding for even-k blocks: torch's pad k//2 / k//2-1 pair
# oscillates the spatial size (96 -> 97 -> 96); conv1 pad (p1, p1+1)
# emits ONE extra hi column/row of garbage (it reads only zero-padding)
# and conv2 pad (p2, p2-1) drops exactly the outputs that would touch it
# — bit-identical math (tests/test_model.py::test_even_pads_exact).
# MEASURED NEUTRAL on v5e (scripts/padshape_probe.py round 3: the
# oscillation costs nothing — chain osc 378.5 ms == chain same 375.8 at
# B=128 C=280, and bench.py is identical either way: 504.2 vs 505.8
# patches/s), so the default stays the torch-identical pattern; the
# machinery remains for layout experiments on other shapes.
EVEN_PADS = False


class ConvBlock(nn.Module):
    """[Conv(k) → ReLU → Conv(k) → (BN) → (ReLU)] with shape-preserving pads."""
    features: int
    ksize: int = 2
    use_bn: bool = True
    bn_momentum: float = 0.1        # torch convention; flax gets 1 - this
    out_bn_relu: bool = True
    dtype: Any = jnp.float32
    orientation: str = 'n'   # module field → static under nn.remat

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.ksize
        p1 = k // 2
        p2 = p1 if k % 2 == 1 else p1 - 1
        if k % 2 == 0 and EVEN_PADS:
            p1 = ((p1, p1 + 1),) * 2
            p2 = ((p2, p2 - 1),) * 2
        x = OrientedConv(self.features, k, p1, dtype=self.dtype,
                         name='conv1')(x, self.orientation)
        x = nn.relu(x)
        x = OrientedConv(self.features, k, p2, dtype=self.dtype,
                         name='conv2')(x, self.orientation)
        if self.out_bn_relu:
            if self.use_bn:
                x = FusedBatchNorm(momentum=1.0 - self.bn_momentum,
                                   name='bn')(x, use_running_average=not
                                              train)
            x = nn.relu(x)
        return x


def _block_cls(remat: bool):
    """ConvBlock, optionally rematerialized (recompute activations in the
    backward pass — trades ~1/3 extra FLOPs for O(blocks) less HBM, which
    is what lets 96²-patch batches of 256+ fit one chip)."""
    if remat:
        return nn.remat(ConvBlock, static_argnums=(2,))   # train
    return ConvBlock


class StreamNet(nn.Module):
    """Input net for one EPI stream: ``in_blocks`` ConvBlocks.

    The same instance (= same weights) serves two streams in different
    orientations; see OrientedConv.
    """
    n_blocks: int
    features: int
    ksize: int
    use_bn: bool
    bn_momentum: float
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, orientation: str = 'n'):
        block = _block_cls(self.remat)
        for i in range(self.n_blocks):
            x = block(self.features, self.ksize, self.use_bn,
                      self.bn_momentum, dtype=self.dtype,
                      orientation=orientation,
                      name=f'block{i}')(x, train)
        return x


class OutNet(nn.Module):
    """Fully-convolutional output net: ``out_blocks`` ConvBlocks, last one
    projects to ``out_features`` without BN/ReLU."""
    n_blocks: int
    features: int
    out_features: int
    ksize: int
    use_bn: bool
    bn_momentum: float
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = _block_cls(self.remat)
        for i in range(self.n_blocks - 1):
            x = block(self.features, self.ksize, self.use_bn,
                      self.bn_momentum, dtype=self.dtype,
                      name=f'block{i}')(x, train)
        x = block(self.out_features, self.ksize, self.use_bn,
                  self.bn_momentum, out_bn_relu=False, dtype=self.dtype,
                  name=f'block{self.n_blocks - 1}')(x, train)
        return x


class FeedForward(nn.Module):
    """The four-stream light-field depth CNN.

    Construct via ``FeedForward.from_config(cfg)``; call with view stacks of
    shape ``(b, n, H, W, 3)``.  Returns the reference's output dict
    ``{'mean', 'logvar', 'scores', 'one_hot', 'posterior'}``.
    """
    ksize: int = 2
    in_blocks: int = 3
    out_blocks: int = 8
    chs: int = 70
    views: int = 9
    cross: bool = False
    uncert: bool = False
    discrete: bool = False
    unet: bool = False
    no_batchnorm: bool = False
    batchnorm_momentum: float = 0.1
    disp_min: float = -3.5
    disp_max: float = 3.5
    dtype: Any = jnp.float32
    remat: bool = False
    pallas_trunk: bool = False   # run the out_net through the fused
    #                              canvas kernel (training path, TPU)

    @classmethod
    def from_config(cls, cfg) -> 'FeedForward':
        return cls(
            remat=getattr(cfg, 'remat', False),
            pallas_trunk=getattr(cfg, 'pallas_trunk', False),
            ksize=cfg.model_ksize,
            in_blocks=cfg.model_in_blocks,
            out_blocks=cfg.model_out_blocks,
            chs=cfg.model_chs,
            views=cfg.model_views,
            cross=cfg.model_cross,
            uncert=cfg.model_uncert,
            discrete=cfg.model_discrete,
            unet=cfg.model_unet,
            no_batchnorm=cfg.model_no_batchnorm,
            batchnorm_momentum=cfg.model_batchnorm_momentum,
            disp_min=cfg.val_disp_min,
            disp_max=cfg.val_disp_max,
            dtype=jnp.bfloat16 if getattr(cfg, 'bf16', False)
            else jnp.float32,
        )

    @property
    def steps(self) -> int:
        return (2 if self.cross else 4) * self.views * 3

    def _fold(self, stack):
        """(b, n, H, W, 3) -> (b, H, W, n*3), view-major channel order."""
        b, n, h, w, c = stack.shape
        return jnp.transpose(stack, (0, 2, 3, 1, 4)).reshape(b, h, w, n * c)

    @nn.compact
    def __call__(self, h_views, v_views, i_views=None, d_views=None,
                 train: bool = False, folded: bool = False):
        """``folded=True`` declares the stacks pre-folded to
        ``(b, H, W, n*3)`` view-major channel order (the layout _fold
        produces) — the TPU input pipeline emits it directly
        (data/augment2.py fold=True), skipping a relayout pass."""
        use_bn = not self.no_batchnorm
        kw = dict(ksize=self.ksize, use_bn=use_bn,
                  bn_momentum=self.batchnorm_momentum, dtype=self.dtype,
                  remat=self.remat)
        # the canvas kernel is the TRAINING path only (conv_block.py): its
        # lane layout asserts width <= TILE-3, which full-scene eval
        # (in-train validation, validate CLI on checkpoints that persisted
        # pallas_trunk=True) would violate — eval always takes the XLA
        # path (the parameter trees are twins, so switching per-call is
        # safe)
        pallas = self.pallas_trunk and self.ksize == 2 and not self.unet \
            and train

        if pallas:
            from .pallas_trunk import PallasStreamNet
            stream_cls = PallasStreamNet
        else:
            stream_cls = StreamNet
        in_net_hv = stream_cls(self.in_blocks, self.chs,
                               name='in_net_hv', **kw)
        in_net_id = None
        if not self.cross:
            in_net_id = stream_cls(self.in_blocks, self.chs,
                                   name='in_net_id', **kw)

        fold = (lambda s: s) if folded else self._fold
        x_h = fold(h_views).astype(self.dtype)
        x_v = fold(v_views).astype(self.dtype)

        # orientation normalization happens in the KERNELS, not the data
        # (see OrientedConv): 't' ≡ the reference's transpose of the
        # horizontal stream, 'tf' ≡ transpose+mirror of the increasing
        # diagonal (reference :236-256) — zero activation copies
        f_h = in_net_hv(x_h, train, 't')
        f_v = in_net_hv(x_v, train)

        feats = [f_h, f_v]
        if not self.cross:
            x_i = fold(i_views).astype(self.dtype)
            x_d = fold(d_views).astype(self.dtype)
            f_i = in_net_id(x_i, train, 'tf')
            f_d = in_net_id(x_d, train)
            feats += [f_i, f_d]

        cat_chs = (2 if self.cross else 4) * self.chs
        out_chs = 1
        if self.uncert:
            out_chs = 2
        elif self.discrete:
            out_chs = self.steps

        if pallas:
            # streams returned RAW canvases + their deferred BN affines
            # (PallasStreamNet); concat on the channel (sublane) axis and
            # let out_net block0's input stage apply BN+ReLU — the whole
            # in->out chain stays in canvas form with zero XLA affine
            # passes.  Same variable tree as StreamNet/OutNet.
            from .pallas_trunk import PallasOutNet
            xc = jnp.concatenate([f[0] for f in feats], axis=1)
            si = jnp.concatenate([f[1] for f in feats])
            ti = jnp.concatenate([f[2] for f in feats])
            entry = {'si': si, 'ti': ti, 'hw': feats[0][3],
                     'affine': use_bn}
            output = PallasOutNet(self.out_blocks, cat_chs, out_chs,
                                  self.ksize, use_bn,
                                  self.batchnorm_momentum,
                                  dtype=self.dtype,
                                  name='out_net')(xc, train, entry=entry)
        elif self.unet:
            features = jnp.concatenate(feats, axis=-1)
            output = UNet(out_chs, depth=5, wf=6, padding=True,
                          batch_norm=True, dtype=self.dtype,
                          name='out_net')(features, train)
        else:
            features = jnp.concatenate(feats, axis=-1)
            output = OutNet(self.out_blocks, cat_chs, out_chs,
                            name='out_net', **kw)(features, train)

        output = output.astype(jnp.float32)
        mean = output[..., 0]

        scores = one_hot = posterior = logvar = None
        bins = bin_centers(self.disp_min, self.disp_max, self.steps)

        if self.discrete:
            scores = output                                   # (b, H, W, S)
            one_hot = (jnp.max(scores, axis=-1, keepdims=True)
                       == scores).astype(jnp.float32)
            posterior = jnp.exp(scores)
            posterior = posterior / jnp.sum(posterior, axis=-1, keepdims=True)
            mean = class_to_reg(one_hot, self.disp_min, self.disp_max,
                                self.steps)
            var = jnp.sum((bins - mean[..., None]) ** 2.0 * posterior,
                          axis=-1)
            logvar = jnp.log(var)

        if self.uncert:
            logvar = output[..., 1]
            var = jnp.exp(logvar)
            # reference quirk: exp(logvar) is the Laplace *scale*, not var
            posterior = laplacian(bins, mean, var)

        return {'mean': mean, 'logvar': logvar, 'scores': scores,
                'one_hot': one_hot, 'posterior': posterior}
