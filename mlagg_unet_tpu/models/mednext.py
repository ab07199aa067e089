"""MedNeXt blocks (NHWC/NDHWC, 2D and 3D).

Ports of the reference's MedNeXt block variants — duplicated in the flagship
file (nnUNetTrainer_MLAgg_2D_dt_MS.py:230-561) and in
network_architecture/mednextv1/blocks_new.py:10-282.

Block: depthwise k-conv -> GroupNorm(one group per channel) -> 1x1 expand
(GELU, optional GRN) -> 1x1 compress, residual. Down/Up variants swap the
depthwise conv for a stride-2 (transposed) one and add a strided 1x1
residual; Up pads top/left by 1 to fix the transposed-conv shape asymmetry.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.layers import (
    ChannelGroupNorm,
    ConvTransposeTorch,
    DepthwiseConv,
    PointwiseConv,
    gelu,
    pad_top_left,
)


def _apply_grn(block: nn.Module, x1, d: int):
    """Global response normalization (blocks_new.py:92-99). Down/Up blocks
    inherit it from MedNeXtBlock in the reference, so all three apply it."""
    shape = (1,) * (d + 1) + (x1.shape[-1],)
    grn_beta = block.param("grn_beta", nn.initializers.zeros, shape)
    grn_gamma = block.param("grn_gamma", nn.initializers.zeros, shape)
    spatial_axes = tuple(range(1, d + 1))
    gx = jnp.sqrt(jnp.sum(x1 * x1, axis=spatial_axes, keepdims=True))
    nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
    return grn_gamma * (x1 * nx) + grn_beta + x1


class MedNeXtBlock(nn.Module):
    """flagship :230-324. NHWC/NDHWC in/out."""

    out_channels: int
    exp_r: int = 4
    kernel_size: int = 7
    do_res: bool = True
    grn: bool = False
    spatial_dims: int = 2

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        d = self.spatial_dims
        x1 = DepthwiseConv(kernel_size=self.kernel_size, spatial_dims=d,
                           name="conv1")(x)
        x1 = ChannelGroupNorm(name="norm")(x1)
        x1 = gelu(PointwiseConv(self.exp_r * cin, spatial_dims=d,
                                name="conv2")(x1))
        if self.grn:
            x1 = _apply_grn(self, x1, d)
        x1 = PointwiseConv(self.out_channels, spatial_dims=d,
                           name="conv3")(x1)
        if self.do_res:
            x1 = x + x1
        return x1


class MedNeXtDownBlock(nn.Module):
    """flagship :327-366: stride-s depthwise conv1; optional strided 1x1
    residual. stride may be per-axis (anisotropic plans, e.g. (1, 2, 2))."""

    out_channels: int
    exp_r: int = 4
    kernel_size: int = 3
    do_res: bool = True
    grn: bool = False
    stride: Union[int, Sequence[int]] = 2
    spatial_dims: int = 2

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        d = self.spatial_dims
        k = (self.kernel_size,) * d
        s = (tuple(self.stride) if isinstance(self.stride, (tuple, list))
             else (self.stride,) * d)
        x1 = nn.Conv(cin, k, strides=s, padding=self.kernel_size // 2,
                     feature_group_count=cin, name="conv1")(x)
        x1 = ChannelGroupNorm(name="norm")(x1)
        x1 = gelu(PointwiseConv(self.exp_r * cin, spatial_dims=d,
                                name="conv2")(x1))
        if self.grn:
            x1 = _apply_grn(self, x1, d)
        x1 = PointwiseConv(self.out_channels, spatial_dims=d,
                           name="conv3")(x1)
        if self.do_res:
            # strided 1x1 conv == slice-then-matmul (k=1 reads no halo)
            sl = tuple([slice(None)] + [slice(None, None, si) for si in s]
                       + [slice(None)])
            res = PointwiseConv(self.out_channels, spatial_dims=d,
                                name="res_conv")(x[sl])
            x1 = x1 + res
        return x1


class MedNeXtUpBlock(nn.Module):
    """flagship :369-419: stride-2 transposed depthwise conv1 + top/left pad;
    optional transposed 1x1 residual. Per-axis strides follow the
    reference's anisotropic handling (blocks_new.py:158-212): stride-1
    axes get kernel 1 on conv1 and no asymmetric pad."""

    out_channels: int
    exp_r: int = 4
    kernel_size: int = 3
    do_res: bool = True
    grn: bool = False
    stride: Union[int, Sequence[int]] = 2
    spatial_dims: int = 2

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        d = self.spatial_dims
        s = (tuple(self.stride) if isinstance(self.stride, (tuple, list))
             else (self.stride,) * d)
        aniso = any(si == 1 for si in s)
        if aniso:
            ks = tuple(1 if si == 1 else self.kernel_size for si in s)
            ps = tuple(k // 2 for k in ks)
        else:
            ks = self.kernel_size
            ps = self.kernel_size // 2
        pad_amts = tuple(1 if si != 1 else 0 for si in s)
        x1 = ConvTransposeTorch(
            cin, ks, s, ps,
            feature_group_count=cin, spatial_dims=d, name="conv1",
        )(x)
        x1 = ChannelGroupNorm(name="norm")(x1)
        x1 = gelu(PointwiseConv(self.exp_r * cin, spatial_dims=d,
                                name="conv2")(x1))
        if self.grn:
            x1 = _apply_grn(self, x1, d)
        x1 = PointwiseConv(self.out_channels, spatial_dims=d,
                           name="conv3")(x1)
        x1 = pad_top_left(x1, pad_amts)
        if self.do_res:
            res = ConvTransposeTorch(self.out_channels, 1, s, 0,
                                     spatial_dims=d, name="res_conv")(x)
            res = pad_top_left(res, pad_amts)
            x1 = x1 + res
        return x1


class PatchExpand(nn.Module):
    """flagship :479-546: GroupNorm -> transposed k-conv stride 2 -> top/left
    pad, optional transposed 1x1 residual. Doubles spatial dims exactly."""

    out_channels: int
    kernel_size: int = 3
    do_res: bool = True
    spatial_dims: int = 2

    @nn.compact
    def __call__(self, x):
        d = self.spatial_dims
        x1 = ChannelGroupNorm(name="norm")(x)
        x1 = ConvTransposeTorch(
            self.out_channels, self.kernel_size, 2, self.kernel_size // 2,
            spatial_dims=d, name="conv1",
        )(x1)
        x1 = pad_top_left(x1)
        if self.do_res:
            res = ConvTransposeTorch(self.out_channels, 1, 2, 0,
                                     spatial_dims=d, name="res_conv")(x)
            res = pad_top_left(res)
            x1 = x1 + res
        return x1


class OutBlock(nn.Module):
    """1x1 projection to class logits (flagship :549-561)."""

    n_classes: int

    @nn.compact
    def __call__(self, x):
        d = x.ndim - 2
        return PointwiseConv(self.n_classes, spatial_dims=d,
                             name="conv_out")(x)
