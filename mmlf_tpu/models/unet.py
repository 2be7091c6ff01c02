"""U-Net output network (optional, ``--model_unet``).

Ronneberger-style U-Net matching the reference's architecture knobs
(reference: mmlf/model/unet.py — depth, wf, padding, batch_norm, upconv),
written channel-last for TPU.  Non-default path in the pipeline.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.batchnorm import FusedBatchNorm


class UNetConvBlock(nn.Module):
    features: int
    padding: bool
    batch_norm: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = 1 if self.padding else 0
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=[(p, p), (p, p)],
                        dtype=self.dtype, name=f'conv{i}')(x)
            x = nn.relu(x)
            if self.batch_norm:
                # same traffic-lean BN as the conv trunk (one fp32 stats
                # pass + one fused bf16 affine); variable tree matches
                # nn.BatchNorm so converted checkpoints are unaffected.
                # momentum 0.9 = torch's default 0.1 (the reference U-Net
                # uses torch defaults, mmlf/model/unet.py:24-30)
                x = FusedBatchNorm(momentum=0.9, name=f'bn{i}')(
                    x, use_running_average=not train)
        return x


class UNetUpBlock(nn.Module):
    features: int
    padding: bool
    batch_norm: bool
    up_mode: str = 'upconv'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bridge, train: bool = False):
        if self.up_mode == 'upconv':
            up = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                  dtype=self.dtype, name='up')(x)
        else:
            b, h, w, c = x.shape
            up = jax.image.resize(x, (b, h * 2, w * 2, c), 'bilinear')
            up = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                         name='up_conv')(up)

        # center-crop the skip connection to the upsampled size
        dh = (bridge.shape[1] - up.shape[1]) // 2
        dw = (bridge.shape[2] - up.shape[2]) // 2
        bridge = bridge[:, dh:dh + up.shape[1], dw:dw + up.shape[2], :]

        x = jnp.concatenate([up, bridge], axis=-1)
        return UNetConvBlock(self.features, self.padding, self.batch_norm,
                             dtype=self.dtype, name='conv_block')(x, train)


class UNet(nn.Module):
    n_classes: int
    depth: int = 5
    wf: int = 6
    padding: bool = True
    batch_norm: bool = True
    up_mode: str = 'upconv'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        for i in range(self.depth):
            x = UNetConvBlock(2 ** (self.wf + i), self.padding,
                              self.batch_norm, dtype=self.dtype,
                              name=f'down{i}')(x, train)
            if i != self.depth - 1:
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        for i in reversed(range(self.depth - 1)):
            x = UNetUpBlock(2 ** (self.wf + i), self.padding,
                            self.batch_norm, self.up_mode, dtype=self.dtype,
                            name=f'up{i}')(x, skips[i], train)

        return nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32,
                       name='last')(x)
