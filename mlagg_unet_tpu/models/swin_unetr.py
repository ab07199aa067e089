"""SwinUNETR (2D) — windowed Swin transformer encoder + UNETR decoder.

Equivalent of the reference's nnUNetTrainerSwinUNETR_2d.py (monai SwinUNETR
with spatial_dims=2): 4 Swin stages (window attention with alternating
cyclic shift + relative position bias, patch merging) feeding UNETR residual
conv decoder blocks.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mlagg_unet_tpu.models.layers import DropPath, Mlp
from mlagg_unet_tpu.models.unetr_blocks import UnetrBasicBlock, UnetrUpBlock


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int
                   ) -> jnp.ndarray:
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        Bn, N, C = x.shape
        ws = self.window_size
        nh = self.num_heads
        hd = C // nh
        qkv = nn.Dense(3 * C, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = jnp.swapaxes(q, 1, 2) * (hd ** -0.5)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, nh),
        )
        idx = _relative_position_index(ws)
        bias = rpb_table[idx.reshape(-1)].reshape(N, N, nh)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, nh, N, N) \
                + mask[None, :, None]
            attn = attn.reshape(Bn, nh, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
        out = jnp.swapaxes(out, 1, 2).reshape(Bn, N, C)
        return nn.Dense(C, name="proj")(out)


def _shift_mask(H: int, W: int, ws: int, shift: int) -> jnp.ndarray:
    img_mask = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    # pure-numpy window partition: under jit, routing the static mask
    # through jnp ops would create tracers that np.asarray cannot consume
    mask_windows = (
        img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(-1, ws * ws, 1)
    )[:, :, 0]
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return jnp.asarray(np.where(attn_mask != 0, -100.0, 0.0))


class SwinBlock(nn.Module):
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        ws = min(self.window_size, H, W)
        shift = self.shift if ws < min(H, W) else 0
        pad_h = (-H) % ws
        pad_w = (-W) % ws

        shortcut = x
        h = nn.LayerNorm(name="norm1")(x)
        if pad_h or pad_w:
            h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w
        if shift > 0:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
            mask = _shift_mask(Hp, Wp, ws, shift)
        else:
            mask = None
        windows = window_partition(h, ws)
        windows = WindowAttention(self.num_heads, ws, name="attn")(
            windows, mask)
        h = window_reverse(windows, ws, Hp, Wp)
        if shift > 0:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        h = h[:, :H, :W]
        x = shortcut + DropPath(self.drop_path)(h, deterministic)
        h = nn.LayerNorm(name="norm2")(x)
        h = Mlp(int(C * self.mlp_ratio), name="mlp")(h, deterministic)
        return x + DropPath(self.drop_path)(h, deterministic)


class SwinStage(nn.Module):
    depth: int
    num_heads: int
    window_size: int = 7

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            x = SwinBlock(
                self.num_heads, self.window_size,
                shift=0 if i % 2 == 0 else self.window_size // 2,
                name=f"block{i}",
            )(x, deterministic)
        return x


class PatchMergingSwin(nn.Module):
    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pad_h, pad_w = H % 2, W % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            H, W = H + pad_h, W + pad_w
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H // 2, W // 2,
                                                         4 * C)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, name="reduction")(x)


class SwinUNETR(nn.Module):
    """monai-style SwinUNETR, 2D."""

    num_classes: int
    feature_size: int = 24
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        fs = self.feature_size
        from mlagg_unet_tpu.models.layers import torch_bias_init

        # patch embed stride 2 (monai uses patch_size=2 for swin unetr)
        h = nn.Conv(fs, (2, 2), strides=(2, 2),
                    bias_init=torch_bias_init(x.shape[-1] * 4),
                    name="patch_embed")(x)

        hidden = []
        for i, (dep, nh) in enumerate(zip(self.depths, self.num_heads)):
            h = SwinStage(dep, nh, self.window_size, name=f"stage{i}")(
                h, deterministic)
            hidden.append(h)
            if i < len(self.depths) - 1:
                h = PatchMergingSwin(name=f"merge{i}")(h)

        enc0 = UnetrBasicBlock(fs, name="encoder1")(x)
        enc1 = UnetrBasicBlock(fs, name="encoder2")(hidden[0])
        enc2 = UnetrBasicBlock(2 * fs, name="encoder3")(hidden[1])
        enc3 = UnetrBasicBlock(4 * fs, name="encoder4")(hidden[2])
        bottleneck = UnetrBasicBlock(8 * fs, name="encoder10")(hidden[3])

        d3 = UnetrUpBlock(4 * fs, name="decoder4")(bottleneck, enc3)
        d2 = UnetrUpBlock(2 * fs, name="decoder3")(d3, enc2)
        d1 = UnetrUpBlock(fs, name="decoder2")(d2, enc1)
        d0 = UnetrUpBlock(fs, name="decoder1")(d1, enc0)
        return nn.Conv(self.num_classes, (1, 1), name="out")(d0)
