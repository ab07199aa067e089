"""Mamba U-Net variant zoo.

TPU-native re-expressions of the reference's standalone variant trainers
(variants/mamba/: nnUNetTrainer_SegMamba.py, nnUNetTrainer_LightMUNet.py,
nnUNetTrainer_UltraLightVMUNet.py, nnUNetTrainer_nnMamba.py — ~8k LoC of
near-duplicated torch modules). All share this framework's Pallas selective
scan through MambaBlock/SS2D; the per-variant structure (where Mamba sits,
channel schedules, gating) follows each paper/reference implementation.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.dynamic_unet import (
    ConvNormAct,
    StackedConvBlocks,
    TransposedConvND,
    lrelu,
)
from mlagg_unet_tpu.models.layers import InstanceNorm
from mlagg_unet_tpu.models.mamba_block import MambaBlock
from mlagg_unet_tpu.models.unetr_blocks import UnetrBasicBlock, UnetrUpBlock


class _TokenMamba(nn.Module):
    """LN -> Mamba over flattened spatial tokens, residual."""

    d_state: int = 16

    @nn.compact
    def __call__(self, x):
        B, *spatial, C = x.shape
        L = 1
        for s in spatial:
            L *= s
        t = x.reshape(B, L, C)
        h = nn.LayerNorm(name="norm")(t)
        h = MambaBlock(d_model=C, d_state=self.d_state, name="mamba")(h)
        return (t + h).reshape(B, *spatial, C)


class GSC(nn.Module):
    """Gated spatial convolution (nnUNetTrainer_SegMamba.py:160-201):
    two parallel conv paths (3x3x3 stack vs 1x1x1), summed, 1x1x1
    projected, with an outer residual. All InstanceNorms are parameterless
    (torch nn.InstanceNorm3d default affine=False)."""

    @nn.compact
    def __call__(self, x):
        d = x.ndim - 2
        c = x.shape[-1]
        x1 = nn.Conv(c, (3,) * d, padding=1, name="proj")(x)
        x1 = jax.nn.relu(InstanceNorm(affine=False)(x1))
        x1 = nn.Conv(c, (3,) * d, padding=1, name="proj2")(x1)
        x1 = jax.nn.relu(InstanceNorm(affine=False)(x1))
        x2 = nn.Conv(c, (1,) * d, name="proj3")(x)
        x2 = jax.nn.relu(InstanceNorm(affine=False)(x2))
        h = nn.Conv(c, (1,) * d, name="proj4")(x1 + x2)
        h = jax.nn.relu(InstanceNorm(affine=False)(h))
        return h + x


class _SegMambaLayer(nn.Module):
    """LN -> tri-orientated Mamba (bimamba v3) on flattened tokens, NO
    residual (nnUNetTrainer_SegMamba.py:119-143)."""

    num_slices: int
    d_state: int = 16

    @nn.compact
    def __call__(self, x):
        B, *spatial, C = x.shape
        L = 1
        for s in spatial:
            L *= s
        t = x.reshape(B, L, C)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(t)
        h = MambaBlock(d_model=C, d_state=self.d_state, bimamba_type="v3",
                       nslices=self.num_slices, name="mamba")(h)
        return h.reshape(B, *spatial, C)


class _MlpChannel(nn.Module):
    """1x1-conv MLP with GELU (nnUNetTrainer_SegMamba.py:146-157)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        d = x.ndim - 2
        c = x.shape[-1]
        h = nn.Conv(self.hidden, (1,) * d, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Conv(c, (1,) * d, name="fc2")(h)


class _SegMambaEncoder(nn.Module):
    """MambaEncoder (nnUNetTrainer_SegMamba.py:204-262): conv-7 stem,
    IN + conv-2 downsampling between stages, per stage GSC -> depths[i]
    MambaLayers, per-scale output head IN -> MlpChannel. num_slices per
    stage is the reference's hardcoded [64, 32, 16, 8] (:227)."""

    depths: Sequence[int]
    dims: Sequence[int]
    strides: Sequence[Sequence[int]]
    num_slices_list: Sequence[int] = (64, 32, 16, 8)

    @nn.compact
    def __call__(self, x):
        d = x.ndim - 2
        outs = []
        for i in range(4):
            if i == 0:
                x = nn.Conv(self.dims[0], (7,) * d,
                            strides=tuple(self.strides[0]), padding=3,
                            name="stem")(x)
            else:
                x = InstanceNorm(affine=False)(x)
                x = nn.Conv(self.dims[i], (2,) * d,
                            strides=tuple(self.strides[i]), padding="VALID",
                            name=f"downsample{i}")(x)
            x = GSC(name=f"gsc{i}")(x)
            for j in range(self.depths[i]):
                x = _SegMambaLayer(num_slices=self.num_slices_list[i],
                                   name=f"stage{i}_{j}")(x)
            o = InstanceNorm(affine=False)(x)
            outs.append(_MlpChannel(2 * self.dims[i], name=f"mlp{i}")(o))
        return outs


class SegMamba(nn.Module):
    """SegMamba (nnUNetTrainer_SegMamba.py:264-416): tri-orientated-Mamba
    encoder (stem + GSC + ToM stages + per-scale MLP heads) feeding a
    UNETR-style decoder (UnetrBasicBlock side branches on the raw input and
    each scale, UnetrUpBlock upsampling, 1x1 out head). 3D, no deep
    supervision (trainer subclasses nnUNetTrainerNoDeepSupervision).
    Weight parity vs the reference torch net is tested in
    tests/test_torch_parity.py::test_segmamba_forward_parity."""

    num_classes: int
    depths: Sequence[int] = (2, 2, 2, 2)
    feat_size: Sequence[int] = (48, 96, 192, 384)
    strides: Sequence[Sequence[int]] = ((1, 2, 2), (2, 2, 2), (2, 2, 2),
                                        (2, 2, 2))
    hidden_size: int = 768
    num_slices_list: Sequence[int] = (64, 32, 16, 8)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.ndim - 2
        f = self.feat_size
        outs = _SegMambaEncoder(self.depths, f, self.strides,
                                self.num_slices_list, name="vit")(x)
        enc1 = UnetrBasicBlock(f[0], name="encoder1")(x)
        enc2 = UnetrBasicBlock(f[1], name="encoder2")(outs[0])
        enc3 = UnetrBasicBlock(f[2], name="encoder3")(outs[1])
        enc4 = UnetrBasicBlock(f[3], name="encoder4")(outs[2])
        enc_hidden = UnetrBasicBlock(self.hidden_size,
                                     name="encoder5")(outs[3])
        h = UnetrUpBlock(f[3], name="decoder5")(enc_hidden, enc4)
        h = UnetrUpBlock(f[2], name="decoder4")(h, enc3)
        h = UnetrUpBlock(f[1], name="decoder3")(h, enc2)
        h = UnetrUpBlock(f[0], upsample_kernel_size=tuple(self.strides[0]),
                         name="decoder2")(h, enc1)
        h = UnetrBasicBlock(f[0], name="decoder1")(h)
        return nn.Conv(self.num_classes, (1,) * d, name="out")(h)


class _ResidualMambaLayer(nn.Module):
    """LightM-UNet RVM layer: scale-gated residual Mamba."""

    d_state: int = 16

    @nn.compact
    def __call__(self, x):
        B, *spatial, C = x.shape
        L = 1
        for s in spatial:
            L *= s
        skip_scale = self.param("skip_scale", nn.initializers.ones, (1,))
        t = x.reshape(B, L, C)
        h = nn.LayerNorm(name="norm")(t)
        h = MambaBlock(d_model=C, d_state=self.d_state, name="mamba")(h)
        out = h + skip_scale * t
        return out.reshape(B, *spatial, C)


class LightMUNet(nn.Module):
    """LightM-UNet (nnUNetTrainer_LightMUNet.py): lightweight UNet whose
    encoder stages are residual-Mamba layers over conv-downsampled maps."""

    num_classes: int
    features: Sequence[int] = (16, 32, 64, 128)
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.ndim - 2
        skips = []
        h = nn.Conv(self.features[0], (3,) * d, padding="SAME",
                    name="stem")(x)
        for i, f in enumerate(self.features):
            if i > 0:
                h = nn.Conv(f, (3,) * d, strides=(2,) * d, padding=1,
                            name=f"down{i}")(h)
            h = _ResidualMambaLayer(name=f"rvm{i}")(h)
            skips.append(h)

        ds = []
        for i in range(len(self.features) - 2, -1, -1):
            h = TransposedConvND(self.features[i], [2] * d,
                                 name=f"up{i}")(h)
            h = h + skips[i]
            h = ConvNormAct(self.features[i], [3] * d, [1] * d,
                            name=f"dec{i}")(h)
            if self.deep_supervision or i == 0:
                ds.append(nn.Conv(self.num_classes, (1,) * d,
                                  name=f"seg{i}")(h))
        if not self.deep_supervision:
            return ds[-1]
        return ds[::-1]


class _PVMLayer(nn.Module):
    """UltraLight VM-UNet parallel vision mamba: channels split into 4
    groups, each through a shared-ish Mamba, concat + projection."""

    d_state: int = 8

    @nn.compact
    def __call__(self, x):
        B, *spatial, C = x.shape
        L = 1
        for s in spatial:
            L *= s
        t = nn.LayerNorm(name="norm")(x.reshape(B, L, C))
        splits = jnp.split(t, 4, axis=-1)
        outs = [
            MambaBlock(d_model=C // 4, d_state=self.d_state,
                       name=f"mamba{i}")(s_)
            for i, s_ in enumerate(splits)
        ]
        h = jnp.concatenate(outs, axis=-1)
        h = nn.Dense(C, name="proj")(h)
        skip_scale = self.param("skip_scale", nn.initializers.ones, (1,))
        return (h + skip_scale * t).reshape(B, *spatial, C)


class UltraLightVMUNet(nn.Module):
    """UltraLight VM-UNet (nnUNetTrainer_UltraLightVMUNet.py): tiny conv
    stem stages then PVM layers, additive-skip decoder. 2D."""

    num_classes: int
    features: Sequence[int] = (8, 16, 24, 32, 48, 64)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        f = self.features
        skips = []
        h = x
        # 3 conv stages
        for i in range(3):
            h = nn.Conv(f[i], (3, 3), strides=(2, 2) if i > 0 else (1, 1),
                        padding=1, name=f"enc_conv{i}")(h)
            h = lrelu(InstanceNorm(name=f"enc_norm{i}")(h))
            skips.append(h)
        # 3 PVM stages
        for i in range(3, 6):
            h = nn.Conv(f[i], (3, 3), strides=(2, 2), padding=1,
                        name=f"enc_down{i}")(h)
            h = _PVMLayer(name=f"pvm{i}")(h)
            if i < 5:
                skips.append(h)

        for i in range(4, -1, -1):
            h = TransposedConvND(skips[i].shape[-1], [2, 2],
                                 name=f"up{i}")(h)
            h = h + skips[i]
            h = nn.Conv(skips[i].shape[-1], (3, 3), padding=1,
                        name=f"dec{i}")(h)
            h = lrelu(h)
        return nn.Conv(self.num_classes, (1, 1), name="seg")(h)


class NNMamba(nn.Module):
    """nnMamba (nnUNetTrainer_nnMamba.py): res-conv encoder with a
    Mamba-in-Convolution skip module on the first scales + conv decoder."""

    num_classes: int
    features: Sequence[int] = (32, 64, 128, 256)
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.ndim - 2
        skips = []
        h = x
        for i, f in enumerate(self.features):
            stride = [1] * d if i == 0 else [2] * d
            h = StackedConvBlocks(2, f, [3] * d, stride, name=f"enc{i}")(h)
            skips.append(h)

        # MIC: mamba over the bottleneck + first skip
        skips[0] = _TokenMamba(name="mic0")(skips[0])
        h = _TokenMamba(name="mic_bot")(h)

        ds = []
        for i in range(len(self.features) - 2, -1, -1):
            h = TransposedConvND(self.features[i], [2] * d, name=f"up{i}")(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = StackedConvBlocks(1, self.features[i], [3] * d, [1] * d,
                                  name=f"dec{i}")(h)
            if self.deep_supervision or i == 0:
                ds.append(nn.Conv(self.num_classes, (1,) * d,
                                  name=f"seg{i}")(h))
        if not self.deep_supervision:
            return ds[-1]
        return ds[::-1]
