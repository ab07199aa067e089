"""UNETR-style residual conv blocks (monai equivalents, NHWC/NDHWC).

The flagship head uses monai's UnetrBasicBlock / UnetrUpBlock with instance
norm and res_block=True (nnUNetTrainer_MLAgg_2D_dt_MS.py:1339-1358); the
SegMamba decoder uses the same blocks in 3D with anisotropic upsample
strides (nnUNetTrainer_SegMamba.py:297-394). These are faithful
re-implementations: conv-norm-lrelu x2 with a 1x1 projected residual, and
transposed-conv upsample + skip concat + res block. The spatial rank is
inferred from the input; kernel/stride accept ints or per-axis sequences.
"""
from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mlagg_unet_tpu.models.layers import ConvTransposeTorch, InstanceNorm
from mlagg_unet_tpu.ops.fused_norm import (
    fused_instance_norm,
    fused_norms_enabled,
)


def lrelu(x):
    return jax.nn.leaky_relu(x, 0.01)


def _per_axis(v, d):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * d


class _INParams(nn.Module):
    """Param-only twin of InstanceNorm (child GroupNorm_0{scale, bias}) —
    same tree/shapes/init as the functional module, so checkpoints and the
    torch importer are unchanged when the fused kernel path is taken."""

    @nn.compact
    def __call__(self, channels: int):
        class _G(nn.Module):
            @nn.compact
            def __call__(self_g):
                return (self_g.param("scale", nn.initializers.ones,
                                     (channels,)),
                        self_g.param("bias", nn.initializers.zeros,
                                     (channels,)))

        return _G(name="GroupNorm_0")()


class UnetResBlock(nn.Module):
    """conv(k,s)->IN->lrelu->conv(k,1)->IN [+ 1x1/IN residual] ->lrelu.

    With MLAGG_FUSED_IN=1 the norm/act/residual chains run through the
    fused Pallas instance-norm kernel (ops/fused_norm.py): same math, one
    stats read + one fused write. OFF by default — measured slower
    end-to-end than XLA's own fusions (see fused_norm.py docstring).
    """

    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1

    @nn.compact
    def __call__(self, x):
        d = x.ndim - 2
        ks = _per_axis(self.kernel_size, d)
        ss = _per_axis(self.stride, d)
        cin = x.shape[-1]
        co = self.out_channels
        has_proj = cin != co or bool(np.any(np.asarray(ss) != 1))
        fused = fused_norms_enabled()

        out = nn.Conv(co, ks, strides=ss,
                      padding=[(k // 2, k // 2) for k in ks],
                      name="conv1")(x)
        if fused:
            s1, b1 = _INParams(name="norm1")(co)
            out = fused_instance_norm(out, s1, b1, act=True)
        else:
            out = lrelu(InstanceNorm(name="norm1")(out))
        out = nn.Conv(co, ks,
                      padding=[(k // 2, k // 2) for k in ks],
                      name="conv2")(out)
        if fused:
            s2, b2 = _INParams(name="norm2")(co)
            if has_proj:
                residual = nn.Conv(co, (1,) * d, strides=ss,
                                   name="conv3")(x)
                s3, b3 = _INParams(name="norm3")(co)
                return fused_instance_norm(out, s2, b2, act=True,
                                           residual=residual,
                                           res_scale=s3, res_bias=b3)
            return fused_instance_norm(out, s2, b2, act=True, residual=x)
        out = InstanceNorm(name="norm2")(out)
        residual = x
        if has_proj:
            residual = nn.Conv(co, (1,) * d, strides=ss,
                               name="conv3")(x)
            residual = InstanceNorm(name="norm3")(residual)
        return lrelu(out + residual)


class UnetrBasicBlock(nn.Module):
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1

    @nn.compact
    def __call__(self, x):
        return UnetResBlock(self.out_channels, self.kernel_size,
                            self.stride, name="layer")(x)


class UnetrUpBlock(nn.Module):
    """transposed conv (k=s=upsample_kernel_size) -> concat skip ->
    UnetResBlock."""

    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    upsample_kernel_size: Union[int, Sequence[int]] = 2

    @nn.compact
    def __call__(self, x, skip):
        d = x.ndim - 2
        up = ConvTransposeTorch(
            self.out_channels, _per_axis(self.upsample_kernel_size, d),
            _per_axis(self.upsample_kernel_size, d), 0, spatial_dims=d,
            name="transp_conv",
        )(x)
        out = jnp.concatenate([up, skip], axis=-1)
        return UnetResBlock(self.out_channels, self.kernel_size,
                            name="conv_block")(out)
