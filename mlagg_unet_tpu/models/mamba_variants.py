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

from mlagg_unet_tpu.models.layers import InstanceNorm
from mlagg_unet_tpu.models.mamba_block import MambaBlock
from mlagg_unet_tpu.models.unetr_blocks import UnetrBasicBlock, UnetrUpBlock


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


class _DWConvLayer(nn.Module):
    """depthwise conv(k) + pointwise conv(1) (get_dwconv_layer,
    nnUNetTrainer_LightMUNet.py:144-152). Both convs take the stride and
    default to bias=False, as in the reference."""

    out_channels: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        d = x.ndim - 2
        cin = x.shape[-1]
        x = nn.Conv(cin, (self.kernel,) * d, strides=(self.stride,) * d,
                    padding=self.kernel // 2, feature_group_count=cin,
                    use_bias=self.use_bias, name="dw")(x)
        return nn.Conv(self.out_channels, (1,) * d,
                       strides=(self.stride,) * d,
                       use_bias=self.use_bias, name="pw")(x)


class _LightMambaLayer(nn.Module):
    """LightM-UNet RVM layer (nnUNetTrainer_LightMUNet.py:156-184):
    LN -> Mamba -> + skip_scale*tokens -> the SAME LN again (shared
    parameters — a reference quirk) -> Linear projection."""

    output_dim: int
    d_state: int = 16

    @nn.compact
    def __call__(self, x):
        B, *spatial, C = x.shape
        L = 1
        for s in spatial:
            L *= s
        t = x.reshape(B, L, C)
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        skip_scale = self.param("skip_scale", nn.initializers.ones, (1,))
        h = MambaBlock(d_model=C, d_state=self.d_state, name="mamba")(
            norm(t))
        h = norm(h + skip_scale * t)
        h = nn.Dense(self.output_dim, name="proj")(h)
        return h.reshape(B, *spatial, self.output_dim)


class _GN8(nn.Module):
    """monai ("GROUP", {"num_groups": 8}) norm, affine."""

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=8, epsilon=1e-5)(x)


class _ResMambaBlock(nn.Module):
    """GN8 -> ReLU -> MambaLayer, twice, with outer residual
    (nnUNetTrainer_LightMUNet.py:199-246)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = jax.nn.relu(_GN8(name="norm1")(x))
        h = _LightMambaLayer(c, name="conv1")(h)
        h = jax.nn.relu(_GN8(name="norm2")(h))
        h = _LightMambaLayer(c, name="conv2")(h)
        return h + x


class _ResUpBlock(nn.Module):
    """GN8 -> ReLU -> dwconv + skip_scale*identity -> GN8 -> ReLU
    (nnUNetTrainer_LightMUNet.py:249-289)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        skip_scale = self.param("skip_scale", nn.initializers.ones, (1,))
        h = jax.nn.relu(_GN8(name="norm1")(x))
        h = _DWConvLayer(c, name="conv")(h) + skip_scale * x
        return jax.nn.relu(_GN8(name="norm2")(h))


def _maxpool2(x):
    d = x.ndim - 2
    return nn.max_pool(x, (2,) * d, strides=(2,) * d)


def _nearest2(x):
    for ax in range(1, x.ndim - 1):
        x = jnp.repeat(x, 2, axis=ax)
    return x


class LightMUNet(nn.Module):
    """LightM-UNet (nnUNetTrainer_LightMUNet.py:292-417): MONAI SegResNet
    skeleton with Mamba layers as the conv substitute. dwconv stem,
    down stages = [mamba downsample + maxpool] + ResMambaBlocks, up stages
    = 1x1 conv + nearest upsample + additive skip + ResUpBlock, final
    GN+ReLU+dwconv head. No deep supervision (trainer subclasses
    nnUNetTrainerNoDeepSupervision; Adam lr 1e-4, wd 1e-5 :26-28).
    Weight parity: tests/test_torch_parity.py::test_lightm_unet_parity."""

    num_classes: int
    init_filters: int = 32
    blocks_down: Sequence[int] = (1, 2, 2, 4)
    blocks_up: Sequence[int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        f = self.init_filters
        h = _DWConvLayer(f, name="convInit")(x)
        down_x = []
        for i, item in enumerate(self.blocks_down):
            ch = f * 2 ** i
            if i > 0:
                h = _LightMambaLayer(ch, name=f"down{i}_mamba")(h)
                h = _maxpool2(h)
            for j in range(item):
                h = _ResMambaBlock(name=f"down{i}_block{j}")(h)
            down_x.append(h)
        down_x.reverse()

        n_up = len(self.blocks_up)
        for i in range(n_up):
            cin = f * 2 ** (n_up - i)
            h = nn.Conv(cin // 2, (1,) * (x.ndim - 2), use_bias=False,
                        name=f"up{i}_conv")(h)
            h = _nearest2(h) + down_x[i + 1]
            for j in range(self.blocks_up[i]):
                h = _ResUpBlock(name=f"up{i}_block{j}")(h)

        h = jax.nn.relu(_GN8(name="final_norm")(h))
        return _DWConvLayer(self.num_classes, kernel=1, use_bias=True,
                            name="conv_final")(h)


class _PVMLayer(nn.Module):
    """UltraLight VM-UNet PVM layer (nnUNetTrainer_UltraLightVMUNet.py:
    84-119): shared LN -> channels chunked into 4 quarters, ONE shared
    Mamba(d_model=C/4) on each + skip_scale-gated residual -> concat ->
    the SAME LN again (shared parameters, a reference quirk) -> Linear."""

    output_dim: int
    d_state: int = 16

    @nn.compact
    def __call__(self, x):
        B, *spatial, C = x.shape
        L = 1
        for s in spatial:
            L *= s
        t = x.reshape(B, L, C)
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        skip_scale = self.param("skip_scale", nn.initializers.ones, (1,))
        mamba = MambaBlock(d_model=C // 4, d_state=self.d_state,
                           name="mamba")
        tn = norm(t)
        outs = [mamba(q) + skip_scale * q
                for q in jnp.split(tn, 4, axis=-1)]
        h = norm(jnp.concatenate(outs, axis=-1))
        h = nn.Dense(self.output_dim, name="proj")(h)
        return h.reshape(B, *spatial, self.output_dim)


def _bilinear_ac(x, scale: int = 2):
    """torch F.interpolate(mode='bilinear', align_corners=True): output
    grid endpoints pinned to input endpoints (NOT half-pixel centers, so
    jax.image.resize('linear') does not apply). Per-axis 1-D gathers."""
    for ax in (1, 2):
        n_in = x.shape[ax]
        n_out = n_in * scale
        if n_in == 1:
            x = jnp.repeat(x, scale, axis=ax)
            continue
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        w = (pos - lo.astype(jnp.float32))
        shape = [1] * x.ndim
        shape[ax] = n_out
        w = w.reshape(shape)
        x = (jnp.take(x, lo, axis=ax) * (1 - w)
             + jnp.take(x, lo + 1, axis=ax) * w)
    return x


class _SCAttBridge(nn.Module):
    """SC_Att_Bridge (:122-205): shared spatial attention (mean/max ->
    dilated 7x7 conv -> sigmoid) with residual, then channel attention
    (per-scale GAP concat -> shared conv1d over the channel axis ->
    per-scale Linear -> sigmoid) with residual."""

    c_list: Sequence[int]

    @nn.compact
    def __call__(self, ts):
        satt_conv = nn.Conv(1, (7, 7), padding=9, kernel_dilation=3,
                            name="satt_conv")

        def satt(t):
            stats = jnp.concatenate(
                [jnp.mean(t, axis=-1, keepdims=True),
                 jnp.max(t, axis=-1, keepdims=True)], axis=-1)
            return jax.nn.sigmoid(satt_conv(stats))

        r = ts
        ts = [satt(t) * t for t in ts]
        r_ = ts
        ts = [t + ro for t, ro in zip(ts, r)]

        pooled = jnp.concatenate(
            [jnp.mean(t, axis=(1, 2)) for t in ts], axis=-1)  # (B, csum)
        att = nn.Conv(1, (3,), padding=1, use_bias=False,
                      name="get_all_att")(pooled[..., None])[..., 0]
        outs = []
        for i, t in enumerate(ts):
            a = jax.nn.sigmoid(
                nn.Dense(self.c_list[i], name=f"att{i + 1}")(att))
            outs.append(a[:, None, None, :] * t + r_[i])
        return outs


class UltraLightVMUNet(nn.Module):
    """UltraLight VM-UNet (nnUNetTrainer_UltraLightVMUNet.py:209-326):
    3 conv + 3 PVM encoder stages (GN4 + maxpool + GELU), SC attention
    bridge on the 5 skips, PVM/conv decoder with align-corners bilinear
    upsampling and additive skips. 2D, no deep supervision (trainer:
    AdamW 1e-3/1e-2 'from source code', cosine warmup).
    Weight parity: tests/test_torch_parity.py::test_ultralight_parity."""

    num_classes: int
    c_list: Sequence[int] = (8, 16, 24, 32, 48, 64)
    bridge: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.c_list

        def gn4(h, name):
            return nn.GroupNorm(num_groups=4, epsilon=1e-5, name=name)(h)

        def pool_gelu(h):
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            return jax.nn.gelu(h, approximate=False)

        ts = []
        h = x
        for i in range(3):
            h = nn.Conv(c[i], (3, 3), padding=1, name=f"encoder{i + 1}")(h)
            h = pool_gelu(gn4(h, f"ebn{i + 1}"))
            ts.append(h)
        for i in range(3, 5):
            h = _PVMLayer(c[i], name=f"encoder{i + 1}")(h)
            h = pool_gelu(gn4(h, f"ebn{i + 1}"))
            ts.append(h)

        if self.bridge:
            ts = _SCAttBridge(c, name="scab")(ts)

        h = jax.nn.gelu(_PVMLayer(c[5], name="encoder6")(h),
                        approximate=False)

        h = jax.nn.gelu(gn4(_PVMLayer(c[4], name="decoder1")(h), "dbn1"),
                        approximate=False) + ts[4]
        for i, (mod, ch) in enumerate(
                [("pvm", c[3]), ("pvm", c[2]), ("conv", c[1]),
                 ("conv", c[0])]):
            name = f"decoder{i + 2}"
            if mod == "pvm":
                h = _PVMLayer(ch, name=name)(h)
            else:
                h = nn.Conv(ch, (3, 3), padding=1, name=name)(h)
            h = jax.nn.gelu(_bilinear_ac(gn4(h, f"dbn{i + 2}")),
                            approximate=False) + ts[3 - i]
        h = nn.Conv(self.num_classes, (1, 1), name="final")(h)
        return _bilinear_ac(h)


class _NNDoubleConv(nn.Module):
    """conv(k,s)+BN+ReLU + conv(3)+BN+ReLU (nnUNetTrainer_nnMamba.py
    DoubleConv :199-213). Convs carry bias (torch default)."""

    out_ch: int
    stride: Union[Sequence[int], None] = None
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = x.ndim - 2
        stride = tuple(self.stride) if self.stride is not None else (1,) * d
        h = nn.Conv(self.out_ch, (self.kernel,) * d, strides=stride,
                    padding=self.kernel // 2, name="conv_a")(x)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="bn_a")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.out_ch, (3,) * d, padding=1, name="conv_b")(h)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="bn_b")(h)
        return jax.nn.relu(h)


class _NNMambaLayer(nn.Module):
    """nnMamba MambaLayer (:146-196): 1x1 conv + BN + ReLU, then ONE shared
    Mamba applied to the token tensor and its channel / sequence /
    channel+sequence flips (averaged — note the reference's dims=[2] flip
    is over CHANNELS of the (B, L, C) tokens), residual add, 1x1 conv +
    BN + ReLU."""

    d_state: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = x.ndim - 2
        C = x.shape[-1]
        B = x.shape[0]
        h = nn.Conv(C, (1,) * d, use_bias=False, name="nin")(x)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="norm")(h)
        h = jax.nn.relu(h)
        act = h
        spatial = h.shape[1:-1]
        L = 1
        for s in spatial:
            L *= s
        t = h.reshape(B, L, C)
        mamba = MambaBlock(d_model=C, d_state=self.d_state, name="mamba")
        y = (mamba(t)
             + mamba(t[:, :, ::-1])[:, :, ::-1]
             + mamba(t[:, ::-1])[:, ::-1]
             + mamba(t[:, ::-1, ::-1])[:, ::-1, ::-1]) / 4.0
        out = y.reshape(B, *spatial, C) + act
        out = nn.Conv(C, (1,) * d, use_bias=False, name="nin2")(out)
        out = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                           momentum=0.9, name="norm2")(out)
        return jax.nn.relu(out)


class _NNBasicBlock(nn.Module):
    """ResNet BasicBlock with optional Mamba global-attention add
    (:92-130). The mamba module is passed in bound form so consecutive
    blocks SHARE it (make_res_layer passes one instance, :133-143)."""

    planes: int
    stride: Union[Sequence[int], None] = None
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, mamba=None, train: bool = False):
        d = x.ndim - 2
        stride = tuple(self.stride) if self.stride is not None else (1,) * d
        h = nn.Conv(self.planes, (3,) * d, strides=stride,
                    padding=1, use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.planes, (3,) * d, padding=1, use_bias=False,
                    name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="bn2")(h)
        if mamba is not None:
            h = h + mamba(x, train=train)
        identity = x
        if self.has_downsample:
            identity = nn.Conv(self.planes, (1,) * d, strides=stride,
                               use_bias=False, name="ds_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    epsilon=1e-5, momentum=0.9,
                                    name="ds_bn")(identity)
        return jax.nn.relu(h + identity)


def _trilinear(x, scale):
    """torch nn.Upsample(mode='trilinear', align_corners=False) — half-
    pixel-center linear resize, == jax.image.resize 'linear'."""
    out_shape = (x.shape[0],) + tuple(
        s * f for s, f in zip(x.shape[1:-1], scale)) + (x.shape[-1],)
    return jax.image.resize(x, out_shape, method="linear")


class NNMamba(nn.Module):
    """nnMambaSeg (nnUNetTrainer_nnMamba.py:237-296): DoubleConv stem,
    three ResNet layers (3 blocks each; blocks 1-2 share one MambaLayer as
    a global-attention add), SE-style attention gates on the skips,
    trilinear-upsample decoder whose FINAL DoubleConv produces the class
    logits (BN+ReLU included — a reference quirk). 3D, no deep supervision
    (trainer: AdamW 1e-4/1e-3, cosine warmup, 500 epochs, :14-27).
    Weight parity: tests/test_torch_parity.py::test_nnmamba_parity."""

    num_classes: int
    channels: int = 32
    blocks: int = 3
    strides: Sequence[Sequence[int]] = ((1, 1, 1), (2, 2, 2), (2, 2, 2),
                                        (2, 2, 2))

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        train = not deterministic
        ch = self.channels
        st = [tuple(s) for s in self.strides]

        def se_gate(f, idx):
            c = f.shape[-1]
            pooled = jnp.mean(f, axis=tuple(range(1, f.ndim - 1)))
            a = nn.Dense(c // 16, name=f"att{idx}_layer1")(pooled)
            a = nn.Dense(c, name=f"att{idx}_layer2")(jax.nn.relu(a))
            a = jax.nn.sigmoid(a)
            return f * a.reshape(a.shape[0], *([1] * (f.ndim - 2)),
                                 a.shape[-1])

        def res_layer(h, planes, stride, idx):
            mamba = _NNMambaLayer(name=f"mamba{idx}")
            h = _NNBasicBlock(planes, stride, has_downsample=True,
                              name=f"layer{idx}_block0")(h, train=train)
            for j in range(1, self.blocks):
                h = _NNBasicBlock(planes, name=f"layer{idx}_block{j}")(
                    h, mamba=mamba, train=train)
            return h

        c1 = _NNDoubleConv(ch, st[0], name="in_conv")(x, train=train)
        c2 = res_layer(c1, ch * 2, st[1], 1)
        c3 = res_layer(c2, ch * 4, st[2], 2)
        c4 = res_layer(c3, ch * 8, st[3], 3)

        h = jnp.concatenate([_trilinear(c4, st[3]), se_gate(c3, 3)], -1)
        h = _NNDoubleConv(ch * 4, name="conv5")(h, train=train)
        h = jnp.concatenate([_trilinear(h, st[2]), se_gate(c2, 2)], -1)
        h = _NNDoubleConv(ch * 2, name="conv6")(h, train=train)
        h = jnp.concatenate([_trilinear(h, st[1]), se_gate(c1, 1)], -1)
        h = _NNDoubleConv(ch, name="conv7")(h, train=train)
        h = _trilinear(h, st[0])
        return _NNDoubleConv(self.num_classes, name="conv8")(h, train=train)
