"""Dynamic plain-conv U-Net generated from plans (NHWC/NDHWC).

Equivalent of the reference's get_network_from_plans + dynamic_network_
architectures PlainConvUNet (the default nnU-Net v2 architecture the planner
targets): per-stage conv stacks (conv -> InstanceNorm -> LeakyReLU) with
plans-driven kernel sizes, anisotropic strides, transposed-conv upsampling,
skip concatenation, and per-stage deep-supervision heads.

Shapes are static per configuration — the topology is codegen'd at build
time from plans (SURVEY.md hard part #8), so everything jits cleanly.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.layers import InstanceNorm


def lrelu(x):
    return jax.nn.leaky_relu(x, 0.01)


class ConvNormAct(nn.Module):
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    norm: str = "instance"   # 'instance' | 'batch' (nnUNetTrainerBN.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = [(k // 2, k // 2) for k in self.kernel_size]
        x = nn.Conv(self.features, tuple(self.kernel_size),
                    strides=tuple(self.strides), padding=pad, name="conv")(x)
        if self.norm == "batch":
            # torch BatchNorm momentum 0.1 == flax momentum 0.9
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, name="norm")(x)
        else:
            x = InstanceNorm(name="norm")(x)
        return lrelu(x)


class StackedConvBlocks(nn.Module):
    num_convs: int
    features: int
    kernel_size: Sequence[int]
    first_stride: Sequence[int]
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_convs):
            stride = self.first_stride if i == 0 else [1] * len(self.kernel_size)
            x = ConvNormAct(self.features, self.kernel_size, stride,
                            norm=self.norm, name=f"conv{i}")(x, train)
        return x


class TransposedConvND(nn.Module):
    """Transposed conv with kernel == stride (the nnU-Net upsampling op):
    output spatial dims = input * stride exactly."""

    features: int
    strides: Sequence[int]

    @nn.compact
    def __call__(self, x):
        dim = len(self.strides)
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.strides, cin, self.features),
        )
        # torch ConvTranspose correlates with the spatially FLIPPED kernel
        # (adjoint of a forward conv) — flip so layout-converted torch
        # weights bit-match (same as layers.ConvTransposeND).
        kern = kernel.astype(x.dtype)
        kern = kern[tuple(slice(None, None, -1) for _ in range(dim))]
        y = jax.lax.conv_general_dilated(
            x, kern,
            window_strides=(1,) * dim,
            padding=[(s - 1, s - 1) for s in self.strides],
            lhs_dilation=tuple(self.strides),
            dimension_numbers=_dim_numbers(dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + bias.astype(y.dtype)


def _dim_numbers(dim: int):
    if dim == 2:
        return ("NHWC", "HWIO", "NHWC")
    if dim == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(dim)


class ConvNorm(nn.Module):
    """conv -> norm, no activation (second half of a residual basic block)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    norm: str = "instance"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = [(k // 2, k // 2) for k in self.kernel_size]
        x = nn.Conv(self.features, tuple(self.kernel_size),
                    strides=tuple(self.strides), padding=pad,
                    use_bias=self.use_bias, name="conv")(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, name="norm")(x)
        else:
            x = InstanceNorm(name="norm")(x)
        return x


class BasicBlockD(nn.Module):
    """nnU-Net residual basic block (dynamic_network_architectures
    building_blocks/residual.py BasicBlockD): conv-norm-act -> conv-norm,
    1x1-conv+norm skip when stride/channels change, activation after the
    add."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        h = ConvNormAct(self.features, self.kernel_size, self.strides,
                        norm=self.norm, name="conv1")(x, train)
        h = ConvNorm(self.features, self.kernel_size,
                     [1] * len(self.kernel_size), norm=self.norm,
                     name="conv2")(h, train)
        if cin != self.features or any(s != 1 for s in self.strides):
            ones = [1] * len(self.kernel_size)
            skip = ConvNorm(self.features, ones, self.strides,
                            norm=self.norm, use_bias=False,
                            name="skip")(x, train)
        else:
            skip = x
        return lrelu(h + skip)


class StackedResidualBlocks(nn.Module):
    """n residual blocks; the first may stride/change channels (reference
    StackedResidualBlocks)."""

    n_blocks: int
    features: int
    kernel_size: Sequence[int]
    first_stride: Sequence[int]
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ones = [1] * len(self.kernel_size)
        for i in range(self.n_blocks):
            stride = self.first_stride if i == 0 else ones
            x = BasicBlockD(self.features, self.kernel_size, stride,
                            norm=self.norm, name=f"block{i}")(x, train)
        return x


class PlainConvUNet(nn.Module):
    """Build from plans-configuration fields. Input (B, *spatial, C)."""

    num_classes: int
    n_stages: int
    features_per_stage: Sequence[int]
    conv_kernel_sizes: Sequence[Sequence[int]]
    pool_op_kernel_sizes: Sequence[Sequence[int]]   # == strides per stage
    n_conv_per_stage_encoder: Sequence[int]
    n_conv_per_stage_decoder: Sequence[int]
    deep_supervision: bool = True
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, deterministic: bool = True
                 ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        train = not deterministic
        skips = []
        for s in range(self.n_stages):
            x = StackedConvBlocks(
                self.n_conv_per_stage_encoder[s],
                self.features_per_stage[s],
                self.conv_kernel_sizes[s],
                self.pool_op_kernel_sizes[s],
                norm=self.norm,
                name=f"encoder_stage{s}",
            )(x, train)
            skips.append(x)

        ds_outputs = []
        for d in range(self.n_stages - 1):
            skip_idx = self.n_stages - 2 - d
            x = TransposedConvND(
                self.features_per_stage[skip_idx],
                self.pool_op_kernel_sizes[skip_idx + 1],
                name=f"decoder_transp{d}",
            )(x)
            x = jnp.concatenate([x, skips[skip_idx]], axis=-1)
            x = StackedConvBlocks(
                self.n_conv_per_stage_decoder[d],
                self.features_per_stage[skip_idx],
                self.conv_kernel_sizes[skip_idx],
                [1] * len(self.conv_kernel_sizes[skip_idx]),
                norm=self.norm,
                name=f"decoder_stage{d}",
            )(x, train)
            if self.deep_supervision or d == self.n_stages - 2:
                ds_outputs.append(
                    nn.Conv(self.num_classes,
                            (1,) * (x.ndim - 2), name=f"seg_head{d}")(x)
                )

        if not self.deep_supervision:
            return ds_outputs[-1]
        # highest resolution first (matches nnU-Net DS target ordering)
        return ds_outputs[::-1]


def network_from_plans(configuration_manager, num_input_channels: int,
                       num_output_channels: int,
                       deep_supervision: bool = True,
                       norm: str = "instance") -> PlainConvUNet:
    """Instantiate from a ConfigurationManager (plans contract)."""
    n_stages = len(configuration_manager.pool_op_kernel_sizes)
    base = configuration_manager.UNet_base_num_features
    max_feat = configuration_manager.unet_max_num_features
    features = [min(base * 2 ** i, max_feat) for i in range(n_stages)]
    return PlainConvUNet(
        num_classes=num_output_channels,
        n_stages=n_stages,
        features_per_stage=features,
        conv_kernel_sizes=configuration_manager.conv_kernel_sizes,
        pool_op_kernel_sizes=configuration_manager.pool_op_kernel_sizes,
        n_conv_per_stage_encoder=configuration_manager.n_conv_per_stage_encoder,
        n_conv_per_stage_decoder=configuration_manager.n_conv_per_stage_decoder,
        deep_supervision=deep_supervision,
        norm=norm,
    )
