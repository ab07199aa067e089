"""TransUNet baseline — R50-ViT-B/16 hybrid encoder + cup decoder.

Faithful port of the reference comparison baseline
nnUNetTrainerTransUNet.py (:211-230 StdConv2d weight standardization,
:231-304 PreActBottleneck, :304-356 ResNetV2 with its maxpool/zero-pad
skip quirk, :399-470 ViT attention/MLP, :471-517 hybrid Embeddings,
:518-608 Transformer, :609-720 DecoderCup with align_corners bilinear
upsampling, :721-803 VisionTransformer; config :166-186 R50-ViT-B_16).

The trainer (:44-47) builds R50-ViT-B_16 with grid = patch_size/16, so
the ViT patch conv is 1x1 over the 1/16-resolution ResNet feature map.
Verified by output-level torch parity (tests/test_torch_parity.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mlagg_unet_tpu.models.layers import Mlp


class StdConv(nn.Module):
    """Conv2d with weight standardization (reference StdConv2d :211-218):
    kernel standardized over (in, kh, kw) per output channel, biased var,
    eps 1e-5."""

    features: int
    kernel_size: Tuple[int, int]
    stride: int = 1
    padding: int = 0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        k32 = kernel.astype(jnp.float32)
        m = k32.mean(axis=(0, 1, 2), keepdims=True)
        v = k32.var(axis=(0, 1, 2), keepdims=True)
        w = ((k32 - m) / jnp.sqrt(v + 1e-5)).astype(x.dtype)
        p = self.padding
        y = jax.lax.conv_general_dilated(
            x, w, (self.stride,) * 2, [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class PreActBottleneck(nn.Module):
    """reference :231-268. GN(32) eps 1e-6 on the unit branch; projection
    shortcut uses GN(num_groups=cout) at torch's default eps 1e-5."""

    cout: int
    cmid: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        residual = x
        if self.stride != 1 or cin != self.cout:
            residual = StdConv(self.cout, (1, 1), self.stride,
                               name="downsample")(x)
            residual = nn.GroupNorm(num_groups=self.cout, epsilon=1e-5,
                                    name="gn_proj")(residual)
        y = StdConv(self.cmid, (1, 1), name="conv1")(x)
        y = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-6,
                                 name="gn1")(y))
        y = StdConv(self.cmid, (3, 3), self.stride, padding=1,
                    name="conv2")(y)
        y = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-6,
                                 name="gn2")(y))
        y = StdConv(self.cout, (1, 1), name="conv3")(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="gn3")(y)
        return nn.relu(residual + y)


def _max_pool_3x3_valid(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=0) — reference :339."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _pad_to(x, h, w):
    """Zero-pad bottom/right to (h, w) (reference :344-349 skip fixup)."""
    ph, pw = h - x.shape[1], w - x.shape[2]
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))


class ResNetV2(nn.Module):
    """reference :304-356. Returns (x_1/16, [skip_1/8, skip_1/4,
    skip_1/2]). The post-pool feature map is NOT padded (only the skip
    copies are), reproducing the reference's off-by-one behavior."""

    block_units: Sequence[int] = (3, 4, 9)
    width: int = 64

    @nn.compact
    def __call__(self, x):
        w = self.width
        in_h, in_w = x.shape[1], x.shape[2]
        x = StdConv(w, (7, 7), 2, padding=3, name="root_conv")(x)
        x = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-6,
                                 name="root_gn")(x))
        features = [x]
        x = _max_pool_3x3_valid(x)
        couts = [w * 4, w * 8, w * 16]
        cmids = [w, w * 2, w * 4]
        for b, n_units in enumerate(self.block_units):
            for u in range(n_units):
                x = PreActBottleneck(
                    couts[b], cmids[b],
                    stride=2 if (u == 0 and b > 0) else 1,
                    name=f"block{b + 1}_unit{u + 1}")(x)
            if b < len(self.block_units) - 1:
                right_h = in_h // 4 // (b + 1)
                right_w = in_w // 4 // (b + 1)
                features.append(_pad_to(x, right_h, right_w))
        return x, features[::-1]


class ViTAttention(nn.Module):
    """reference :397-442."""

    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hd = C // self.num_heads

        def split(t):
            return jnp.transpose(t.reshape(B, N, self.num_heads, hd),
                                 (0, 2, 1, 3))

        q = split(nn.Dense(C, name="query")(x))
        k = split(nn.Dense(C, name="key")(x))
        v = split(nn.Dense(C, name="value")(x))
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, N, C)
        return nn.Dense(C, name="out")(ctx)


class ViTBlock(nn.Module):
    """reference :518-537. Pre-norm (eps 1e-6) attention + MLP."""

    num_heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-6, name="attention_norm")(x)
        x = x + ViTAttention(self.num_heads, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="ffn_norm")(x)
        return x + Mlp(self.mlp_dim, name="ffn")(h, deterministic)


class Conv2dReLU(nn.Module):
    """reference :609-632: conv (no bias) -> BN -> ReLU."""

    features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, p = self.kernel_size, self.padding
        x = nn.Conv(self.features, (k, k), padding=[(p, p), (p, p)],
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


def upsample_bilinear_x2_align_corners(x):
    """torch nn.UpsamplingBilinear2d(scale_factor=2) — align_corners=True
    (reference DecoderBlock :660). Separable gather + lerp."""

    def up_axis(t, axis):
        n = t.shape[axis]
        out = 2 * n
        if n == 1:
            return jnp.repeat(t, 2, axis=axis)
        src = jnp.arange(out) * (n - 1) / (out - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        frac = (src - lo).astype(t.dtype)
        shape = [1] * t.ndim
        shape[axis] = out
        frac = frac.reshape(shape)
        return (jnp.take(t, lo, axis=axis) * (1 - frac)
                + jnp.take(t, hi, axis=axis) * frac)

    return up_axis(up_axis(x, 1), 2)


class DecoderBlock(nn.Module):
    """reference :634-666: x2 up, concat skip, two Conv2dReLU."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = upsample_bilinear_x2_align_corners(x)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = Conv2dReLU(self.features, name="conv1")(x, train)
        return Conv2dReLU(self.features, name="conv2")(x, train)


class TransUNet(nn.Module):
    """VisionTransformer (reference :721-803) with the R50-ViT-B_16
    hybrid config the trainer builds (:44-47, config :166-186)."""

    num_classes: int
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    resnet_units: Sequence[int] = (3, 4, 9)
    width: int = 64
    decoder_channels: Sequence[int] = (256, 128, 64, 16)
    n_skip: int = 3

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> jnp.ndarray:
        train = not deterministic
        # hybrid backbone
        h, skips = ResNetV2(self.resnet_units, self.width,
                            name="hybrid_model")(x)
        # grid = img/16 => 1x1 patch conv over the 1/16 feature map
        gh, gw = x.shape[1] // 16, x.shape[2] // 16
        h = nn.Conv(self.hidden_size, (1, 1),
                    name="patch_embeddings")(h)
        B = h.shape[0]
        h = h.reshape(B, gh * gw, self.hidden_size)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, gh * gw, self.hidden_size))
        h = h + pos
        for i in range(self.num_layers):
            h = ViTBlock(self.num_heads, self.mlp_dim,
                         name=f"encoder_block{i}")(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-6, name="encoder_norm")(h)

        # cup decoder (:676-720)
        h = h.reshape(B, gh, gw, self.hidden_size)
        h = Conv2dReLU(512, name="conv_more")(h, train)
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < self.n_skip else None
            h = DecoderBlock(ch, name=f"decoder_block{i}")(h, skip, train)
        # SegmentationHead (:668-674): 3x3 conv with bias, no upsampling
        return nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                       name="seg_head")(h)
