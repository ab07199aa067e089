"""Shared NN layers (NHWC, flax.linen).

Ports of the building blocks in the flagship model file
(mlagg/nnunetv2/training/nnUNetTrainer/nnUNetTrainer_MLAgg_2D_dt_MS.py:176-228,
564-613) and MambaSkip.py:545-577. All spatial tensors are channels-last
(B, H, W, C) — the TPU-native conv layout.

Transposed convs reproduce the torch ConvTranspose2d(k, s, p) output-size
arithmetic exactly ((in-1)*s - 2p + k), so the reference's asymmetric
left/top pad trick (PatchExpand, :527-545) carries over 1:1.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    """fc1 -> act -> drop -> fc2 -> drop (flagship :176-192)."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = gelu
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features)(x)
        x = self.act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(out_features)(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class DWConv2d(nn.Module):
    """Depthwise 3x3 conv on NHWC images."""

    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.Conv(
            features=c,
            kernel_size=(self.kernel_size, self.kernel_size),
            padding="SAME",
            feature_group_count=c,
            use_bias=self.use_bias,
        )(x)


class ConvolutionalGLU(nn.Module):
    """TransNeXt ConvGLU (flagship :209-227 / MambaSkip.py:559-577):
    fc1 -> chunk -> dwconv+act gate -> fc2. Input (B, H, W, C)."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = gelu
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        hidden = int(2 * self.hidden_features / 3)
        xv = nn.Dense(hidden * 2)(x)
        x1, v = jnp.split(xv, 2, axis=-1)
        x1 = self.act(DWConv2d()(x1)) * v
        x1 = nn.Dropout(self.drop)(x1, deterministic=deterministic)
        x1 = nn.Dense(out_features)(x1)
        x1 = nn.Dropout(self.drop)(x1, deterministic=deterministic)
        return x1


class RMSNorm(nn.Module):
    """fp32 RMS norm over the last dim (flagship :592-613)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (normed * scale).astype(x.dtype)


class InstanceNorm(nn.Module):
    """Per-channel spatial normalization == torch InstanceNorm2d/3d.
    Implemented as GroupNorm with one group per channel."""

    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=x.shape[-1],
            epsilon=self.eps,
            use_bias=self.affine,
            use_scale=self.affine,
        )(x)


class ChannelGroupNorm(nn.Module):
    """GroupNorm(num_groups=channels) as used by MedNeXt blocks
    (flagship :266-270). Identical to InstanceNorm with affine."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=x.shape[-1], epsilon=self.eps)(x)


class ConvTranspose2dTorch(nn.Module):
    """Transposed conv with torch ConvTranspose2d(k, s, p) output arithmetic:
    out = (in - 1) * s - 2p + k."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    feature_group_count: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        cin = x.shape[-1]
        assert cin % self.feature_group_count == 0
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, cin // self.feature_group_count, self.features),
        )
        # fractionally-strided conv: lhs_dilation=s + padding (k-1-p) gives
        # the torch output size (in-1)*s - 2p + k; supports groups
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=((k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def pad_top_left(x: jnp.ndarray, amount: int = 1) -> jnp.ndarray:
    """F.pad(x, (1, 0, 1, 0)) on NHWC: pad top and left of the spatial dims
    (the reference's shape-matching asymmetry, flagship :533-536)."""
    return jnp.pad(x, ((0, 0), (amount, 0), (amount, 0), (0, 0)))


def avg_pool_to(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """AdaptiveAvgPool2d for NHWC when spatial dims divide evenly (the only
    case the planner produces; asserts otherwise)."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    assert H % oh == 0 and W % ow == 0, (
        f"adaptive avg pool needs exact division, got {(H, W)} -> {(oh, ow)}"
    )
    x = x.reshape(B, oh, H // oh, ow, W // ow, C)
    return x.mean(axis=(2, 4))


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std)
