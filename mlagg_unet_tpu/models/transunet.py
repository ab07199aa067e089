"""TransUNet — CNN encoder + ViT bottleneck + cascaded upsampler decoder.

Equivalent of the reference's nnUNetTrainerTransUNet.py (831 lines): ResNet-
style conv encoder, transformer over the bottleneck feature tokens (standard
pre-LN ViT blocks on our fused attention), and a conv decoder with skips.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.dynamic_unet import StackedConvBlocks, TransposedConvND
from mlagg_unet_tpu.models.layers import DropPath, Mlp
from mlagg_unet_tpu.ops.flash_attention import flash_attention


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        h = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(3 * C, name="qkv")(h).reshape(B, N, 3, nh, hd)
        q = jnp.transpose(qkv[:, :, 0], (0, 2, 1, 3))
        k = jnp.transpose(qkv[:, :, 1], (0, 2, 1, 3))
        v = jnp.transpose(qkv[:, :, 2], (0, 2, 1, 3))
        attn = flash_attention(q, k, v)
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(B, N, C)
        x = x + nn.Dense(C, name="proj")(attn)
        h = nn.LayerNorm(name="norm2")(x)
        return x + Mlp(int(C * self.mlp_ratio), name="mlp")(h, deterministic)


class TransUNet(nn.Module):
    num_classes: int
    features: Sequence[int] = (32, 64, 128, 256)
    vit_dim: int = 256
    vit_depth: int = 4
    vit_heads: int = 8

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.ndim - 2
        assert d == 2, "TransUNet is 2D"
        skips = []
        h = x
        for i, f in enumerate(self.features):
            stride = [1, 1] if i == 0 else [2, 2]
            h = StackedConvBlocks(2, f, [3, 3], stride, name=f"enc{i}")(h)
            skips.append(h)

        # ViT over bottleneck tokens + learned position embedding
        B, H, W, C = h.shape
        tokens = nn.Dense(self.vit_dim, name="vit_embed")(
            h.reshape(B, H * W, C))
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, H * W, self.vit_dim))
        tokens = tokens + pos
        for i in range(self.vit_depth):
            tokens = ViTBlock(self.vit_heads, name=f"vit{i}")(
                tokens, deterministic)
        tokens = nn.LayerNorm(name="vit_norm")(tokens)
        h = nn.Dense(C, name="vit_out")(tokens).reshape(B, H, W, C)

        for i in range(len(self.features) - 2, -1, -1):
            h = TransposedConvND(self.features[i], [2, 2], name=f"up{i}")(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = StackedConvBlocks(1, self.features[i], [3, 3], [1, 1],
                                  name=f"dec{i}")(h)
        return nn.Conv(self.num_classes, (1, 1), name="seg")(h)
