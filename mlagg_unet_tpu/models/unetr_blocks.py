"""UNETR-style residual conv blocks (monai equivalents, NHWC).

The flagship head uses monai's UnetrBasicBlock / UnetrUpBlock with instance
norm and res_block=True (nnUNetTrainer_MLAgg_2D_dt_MS.py:1339-1358). These
are faithful re-implementations: conv-norm-lrelu x2 with a 1x1 projected
residual, and transposed-conv upsample + skip concat + res block.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.layers import ConvTranspose2dTorch, InstanceNorm


def lrelu(x):
    return jax.nn.leaky_relu(x, 0.01)


class UnetResBlock(nn.Module):
    """conv(k,s)->IN->lrelu->conv(k,1)->IN [+ 1x1/IN residual] ->lrelu."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        out = nn.Conv(self.out_channels,
                      (self.kernel_size, self.kernel_size),
                      strides=(self.stride, self.stride),
                      padding=self.kernel_size // 2, name="conv1")(x)
        out = InstanceNorm(name="norm1")(out)
        out = lrelu(out)
        out = nn.Conv(self.out_channels,
                      (self.kernel_size, self.kernel_size),
                      padding=self.kernel_size // 2, name="conv2")(out)
        out = InstanceNorm(name="norm2")(out)
        residual = x
        if cin != self.out_channels or self.stride != 1:
            residual = nn.Conv(self.out_channels, (1, 1),
                               strides=(self.stride, self.stride),
                               name="conv3")(x)
            residual = InstanceNorm(name="norm3")(residual)
        return lrelu(out + residual)


class UnetrBasicBlock(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        return UnetResBlock(self.out_channels, self.kernel_size,
                            self.stride, name="layer")(x)


class UnetrUpBlock(nn.Module):
    """transposed conv (k=2, s=2) -> concat skip -> UnetResBlock."""

    out_channels: int
    kernel_size: int = 3
    upsample_kernel_size: int = 2

    @nn.compact
    def __call__(self, x, skip):
        up = ConvTranspose2dTorch(
            self.out_channels, self.upsample_kernel_size,
            self.upsample_kernel_size, 0, name="transp_conv",
        )(x)
        out = jnp.concatenate([up, skip], axis=-1)
        return UnetResBlock(self.out_channels, self.kernel_size,
                            name="conv_block")(out)
