"""MLLA-UNet baseline — linear attention with RoPE (the "Demystify Mamba"
MLLA block) in a symmetric U-shape.

Faithful port of the reference comparison baseline
nnUNetTrainer_MLLA_UNet.py (:169-197 RoPE, :198-253 LinearAttention with
LePE, :256-320 MLLABlock, :322-352 conv PatchMerging, :378-407 conv
PatchExpand, :562-605 conv Stem, :709-850 MLLA_UNet): conv-BN stem (/4),
4 encoder stages of depths (2,4,8,4), conv patch merging, decoder with
skip-concat + concat_back_dim linears and depths (1,2,2,2), final
FinalPatchExpand_X4 (16x linear expand + 4x4 pixel shuffle) and a 1x1
no-bias head. No deep supervision (the trainer subclasses
nnUNetTrainerNoDeepSupervision).

O(N) linear attention: q,k -> elu+1, RoPE-rotated q/k drive the kv
aggregation, z normalizer from the un-rotated features (:242-244).
Verified by output-level torch parity (tests/test_torch_parity.py).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mlagg_unet_tpu.models.layers import (
    ConvTransposeTorch,
    DropPath,
    DWConv2d,
    Mlp,
)

# torch nn.LayerNorm / BatchNorm2d default
_EPS = 1e-5


def rope_rotations(h: int, w: int, dim: int, base: float = 10000.0
                   ) -> np.ndarray:
    """(h, w, dim/2, 2) cos/sin table (reference RoPE :169-191)."""
    k_max = dim // 4  # feature_dim // (2 * n_spatial_dims)
    theta = 1.0 / (base ** (np.arange(k_max) / k_max))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    angles = np.concatenate(
        [ys[..., None] * theta, xs[..., None] * theta], axis=-1
    )  # (h, w, dim/2)
    return np.stack([np.cos(angles), np.sin(angles)], axis=-1).astype(
        np.float32)


def apply_rope(x: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """x: (b, h, w, c); rot: (h, w, c/2, 2). Complex rotation per pair."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, c // 2, 2)
    re = xf[..., 0] * rot[..., 0] - xf[..., 1] * rot[..., 1]
    im = xf[..., 0] * rot[..., 1] + xf[..., 1] * rot[..., 0]
    return jnp.stack([re, im], axis=-1).reshape(b, h, w, c).astype(x.dtype)


class LinearAttention(nn.Module):
    """reference :198-253. Input (B, H, W, C)."""

    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        n = H * W
        nh = self.num_heads
        hd = C // nh

        qk = nn.Dense(2 * C, use_bias=self.qkv_bias, name="qk")(x)
        q, k = jnp.split(qk, 2, axis=-1)
        v = x
        q = jax.nn.elu(q) + 1.0
        k = jax.nn.elu(k) + 1.0

        rot = jnp.asarray(rope_rotations(H, W, C))
        q_rope = apply_rope(q, rot)
        k_rope = apply_rope(k, rot)

        def heads(t):  # (B,H,W,C) -> (B,nh,n,hd)
            return jnp.transpose(t.reshape(B, n, nh, hd), (0, 2, 1, 3))

        qh, kh, vh = heads(q), heads(k), heads(v)
        qr, kr = heads(q_rope), heads(k_rope)

        k_mean = kh.mean(axis=2, keepdims=True)                  # (B,nh,1,hd)
        z = 1.0 / (jnp.einsum("bhnd,bhmd->bhnm", qh, k_mean) + 1e-6)
        kv = jnp.einsum("bhnd,bhne->bhde", kr * (n ** -0.5),
                        vh * (n ** -0.5))
        out = jnp.einsum("bhnd,bhde->bhne", qr, kv) * z          # (B,nh,n,hd)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, H, W, C)

        out = out + DWConv2d(name="lepe")(v)
        return out


class MLLABlockLinear(nn.Module):
    """Gated MLLA block with linear attention (reference MLLABlock
    :256-320, incl. the cpe convs the flagship dropped)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        x = x + DWConv2d(name="cpe1")(x)
        shortcut = x
        h = nn.LayerNorm(epsilon=_EPS, name="norm1")(x)
        act_res = jax.nn.silu(nn.Dense(C, name="act_proj")(h))
        h = nn.Dense(C, name="in_proj")(h)
        h = jax.nn.silu(DWConv2d(name="dwc")(h))
        h = LinearAttention(self.num_heads, self.qkv_bias, name="attn")(h)
        h = nn.Dense(C, name="out_proj")(h * act_res)
        x = shortcut + DropPath(self.drop_path)(h, deterministic)
        x = x + DWConv2d(name="cpe2")(x)
        h = Mlp(int(C * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=_EPS, name="norm2")(x), deterministic)
        return x + DropPath(self.drop_path)(h, deterministic)


class ConvLayer(nn.Module):
    """reference ConvLayer (:114-141): Conv2d (+BatchNorm2d) (+ReLU).
    Explicit torch-style padding (left==right), NOT XLA SAME — the two
    disagree under stride 2."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    use_bn: bool = True
    use_act: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        k, p = self.kernel_size, self.padding
        x = nn.Conv(self.features, (k, k), strides=(self.stride,) * 2,
                    padding=[(p, p), (p, p)],
                    feature_group_count=self.groups,
                    use_bias=self.use_bias, name="conv")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=use_running_average,
                             epsilon=_EPS, momentum=0.9, name="norm")(x)
        if self.use_act:
            x = nn.relu(x)
        return x


class StemMLLAUNet(nn.Module):
    """reference Stem (:562-605): /2 conv-BN-ReLU, residual double conv,
    /2 expand conv + 1x1 project. Total stride 4."""

    embed_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        e = self.embed_dim
        ura = not train
        x = ConvLayer(e // 2, 3, 2, 1, use_bias=False, name="conv1")(x, ura)
        y = ConvLayer(e // 2, 3, 1, 1, use_bias=False, name="conv2_0")(x, ura)
        y = ConvLayer(e // 2, 3, 1, 1, use_bias=False, use_act=False,
                      name="conv2_1")(y, ura)
        x = y + x
        x = ConvLayer(4 * e, 3, 2, 1, use_bias=False, name="conv3_0")(x, ura)
        x = ConvLayer(e, 1, 1, 0, use_bias=False, use_act=False,
                      name="conv3_1")(x, ura)
        return x


class PatchMergingConv(nn.Module):
    """reference PatchMerging (:322-352): 1x1 expand (ratio*2dim) -> dw
    3x3 /2 -> 1x1 project + BN. Output channels 2*dim."""

    out_features: int  # 2 * dim
    ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_features * self.ratio)
        ura = not train
        x = ConvLayer(hidden, 1, use_bn=False, name="conv_0")(x, ura)
        x = ConvLayer(hidden, 3, 2, 1, groups=hidden, use_bn=False,
                      name="conv_1")(x, ura)
        x = ConvLayer(self.out_features, 1, use_act=False,
                      name="conv_2")(x, ura)
        return x


class PatchExpandConv(nn.Module):
    """reference PatchExpand (:378-407): 1x1 expand (ratio*dim) -> dw
    ConvTranspose 3/2/1/op1 (x2 upsample) -> 1x1 project + BN -> LN.
    Output channels dim // 2."""

    out_features: int  # dim // 2
    ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(x.shape[-1] * self.ratio)
        ura = not train
        x = ConvLayer(hidden, 1, use_bn=False, name="conv_0")(x, ura)
        x = ConvTransposeTorch(hidden, 3, 2, padding=1, output_padding=1,
                               feature_group_count=hidden, use_bias=False,
                               name="deconv")(x)
        x = ConvLayer(self.out_features, 1, use_act=False,
                      name="conv_2")(x, ura)
        return nn.LayerNorm(epsilon=_EPS, name="norm")(x)


class MLLAUNet(nn.Module):
    """Symmetric MLLA U-Net (2D), single output (no deep supervision) —
    reference MLLA_UNet (:709-850), trainer defaults :48-63 (embed 64,
    depths 2/4/8/4, decoder depths 1/2/2/2, mlp 4, drop_path 0.1)."""

    num_classes: int
    embed_dim: int = 64
    depths: Sequence[int] = (2, 4, 8, 4)
    depths_decoder: Sequence[int] = (1, 2, 2, 2)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> jnp.ndarray:
        e = self.embed_dim
        nl = len(self.depths)
        dims = [e * 2 ** i for i in range(nl)]
        train = not deterministic
        dpr = [float(v) for v in
               np.linspace(0, self.drop_path_rate, sum(self.depths))]

        h = StemMLLAUNet(e, name="patch_embed")(x, train)

        # encoder: skips captured at each stage INPUT (reference
        # forward_features :812-821 appends before the layer runs)
        skips = []
        for i in range(nl):
            skips.append(h)
            for b in range(self.depths[i]):
                h = MLLABlockLinear(
                    self.num_heads[i], self.mlp_ratio, self.qkv_bias,
                    drop_path=dpr[sum(self.depths[:i]) + b],
                    name=f"layer{i}_block{b}",
                )(h, deterministic)
            if i < nl - 1:
                h = PatchMergingConv(dims[i + 1], name=f"down{i}")(h, train)
        h = nn.LayerNorm(epsilon=_EPS, name="norm")(h)

        # decoder (forward_up_features :826-836)
        h = PatchExpandConv(dims[nl - 2], name="up0")(h, train)
        for j in range(1, nl):
            d = dims[nl - 1 - j]
            h = jnp.concatenate([h, skips[nl - 1 - j]], axis=-1)
            h = nn.Dense(d, name=f"concat_back{j}")(h)
            dpr_slice = dpr[sum(self.depths[:nl - 1 - j]):
                            sum(self.depths[:nl - j])]
            for b in range(self.depths_decoder[j]):
                h = MLLABlockLinear(
                    self.num_heads[nl - 1 - j], self.mlp_ratio,
                    self.qkv_bias, drop_path=dpr_slice[b],
                    name=f"layer_up{j}_block{b}",
                )(h, deterministic)
            if j < nl - 1:
                h = PatchExpandConv(d // 2, name=f"layer_up{j}_upsample"
                                    )(h, train)
        h = nn.LayerNorm(epsilon=_EPS, name="norm_up")(h)

        # FinalPatchExpand_X4 (:143-168) + 1x1 head (:789-794)
        B, H, W, C = h.shape
        h = nn.Dense(16 * C, use_bias=False, name="up_expand")(h)
        h = h.reshape(B, H, W, 4, 4, C)
        h = jnp.transpose(h, (0, 1, 3, 2, 4, 5)).reshape(B, 4 * H, 4 * W, C)
        h = nn.LayerNorm(epsilon=_EPS, name="up_norm")(h)
        return nn.Conv(self.num_classes, (1, 1), use_bias=False,
                       name="output")(h)
