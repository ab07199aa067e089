"""LKM-UNet and MSVM-UNet variants.

* LKM-UNet (nnUNetTrainer_LKM_UNet.py): Large-Kernel Mamba — pixel-level
  bidirectional Mamba within large spatial windows (the "LM block") plus a
  patch-level Mamba over pooled tokens, in a conv U-Net.
* MSVM-UNet (nnUNetTrainer_MSVM_UNet.py): multi-scale VSS blocks — parallel
  multi-scale depthwise convs (3/5/7) feeding the 4-direction selective scan
  — in a hierarchical U-shape.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.dynamic_unet import StackedConvBlocks, TransposedConvND
from mlagg_unet_tpu.models.layers import DropPath, Mlp
from mlagg_unet_tpu.models.mamba_block import MambaBlock
from mlagg_unet_tpu.models.mednext import OutBlock
from mlagg_unet_tpu.models.swin_unetr import window_partition, window_reverse
from mlagg_unet_tpu.models.vmamba import PatchExpand2D, PatchMerging2D, SS2D


class _BiMamba(nn.Module):
    """Bidirectional Mamba over a token sequence (fwd + reversed)."""

    d_state: int = 8

    @nn.compact
    def __call__(self, t):
        fwd = MambaBlock(d_model=t.shape[-1], d_state=self.d_state,
                         name="fwd")(t)
        bwd = MambaBlock(d_model=t.shape[-1], d_state=self.d_state,
                         name="bwd")(jnp.flip(t, axis=1))
        return fwd + jnp.flip(bwd, axis=1)


class LMBlock(nn.Module):
    """Pixel-level windowed bidirectional Mamba + patch-level Mamba."""

    window_size: int = 8
    d_state: int = 8

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws = min(self.window_size, H, W)
        pad_h, pad_w = (-H) % ws, (-W) % ws
        h = nn.LayerNorm(name="norm")(x)
        if pad_h or pad_w:
            h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        # pixel-level: bidirectional mamba within each window
        wins = window_partition(h, ws)                  # (B*nW, ws*ws, C)
        wins = _BiMamba(self.d_state, name="pixel")(wins)
        px = window_reverse(wins, ws, Hp, Wp)[:, :H, :W]

        # patch-level: mamba over window-pooled tokens
        pooled = h.reshape(B, Hp // ws, ws, Wp // ws, ws, C).mean((2, 4))
        pooled = pooled.reshape(B, -1, C)
        pooled = _BiMamba(self.d_state, name="patch")(pooled)
        pooled = pooled.reshape(B, Hp // ws, Wp // ws, C)
        pooled = jax.image.resize(pooled, (B, Hp, Wp, C), "nearest")
        pooled = pooled[:, :H, :W]

        return x + px + pooled


class LKMUNet(nn.Module):
    """Conv U-Net with LM blocks in the encoder (2D)."""

    num_classes: int
    features: Sequence[int] = (16, 32, 64, 128)
    window_size: int = 8
    deep_supervision: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        skips = []
        h = x
        for i, f in enumerate(self.features):
            stride = [1, 1] if i == 0 else [2, 2]
            h = StackedConvBlocks(1, f, [3, 3], stride, name=f"enc{i}")(h)
            h = LMBlock(self.window_size, name=f"lm{i}")(h)
            skips.append(h)

        ds = []
        for i in range(len(self.features) - 2, -1, -1):
            h = TransposedConvND(self.features[i], [2, 2], name=f"up{i}")(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = StackedConvBlocks(1, self.features[i], [3, 3], [1, 1],
                                  name=f"dec{i}")(h)
            if self.deep_supervision or i == 0:
                ds.append(OutBlock(self.num_classes, name=f"seg{i}")(h))
        if not self.deep_supervision:
            return ds[-1]
        return ds[::-1]


class MSVSSBlock(nn.Module):
    """Multi-scale VSS: parallel 3/5/7 depthwise convs + SS2D + MLP."""

    d_state: int = 8
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        C = x.shape[-1]
        h = nn.LayerNorm(name="ln_1")(x)
        ms = sum(
            nn.Conv(C, (k, k), padding="SAME", feature_group_count=C,
                    name=f"dw{k}")(h)
            for k in (3, 5, 7)
        )
        h = SS2D(d_model=C, d_state=self.d_state, name="ss2d")(
            jax.nn.silu(ms), deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic)
        h = Mlp(int(C * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(name="ln_2")(x), deterministic)
        return x + DropPath(self.drop_path)(h, deterministic)


class MSVMUNet(nn.Module):
    """Hierarchical U-shape of multi-scale VSS blocks (2D)."""

    num_classes: int
    embed_dim: int = 32
    depths: Sequence[int] = (2, 2, 2, 2)
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        e = self.embed_dim
        dims = [e * 2 ** i for i in range(len(self.depths))]
        from mlagg_unet_tpu.models.layers import torch_bias_init

        h = nn.Conv(e, (4, 4), strides=(4, 4),
                    bias_init=torch_bias_init(x.shape[-1] * 16),
                    name="patch_embed")(x)
        h = nn.LayerNorm(name="patch_norm")(h)
        skips = []
        for i, dep in enumerate(self.depths):
            for b in range(dep):
                h = MSVSSBlock(name=f"enc{i}_{b}")(h, deterministic)
            skips.append(h)
            if i < len(self.depths) - 1:
                h = PatchMerging2D(dims[i + 1], name=f"down{i}")(h)

        for i in range(len(self.depths) - 2, -1, -1):
            h = PatchExpand2D(dims[i], name=f"up{i}")(h)
            h = h + skips[i]
            h = MSVSSBlock(name=f"dec{i}")(h, deterministic)
        h = PatchExpand2D(max(e // 2, 4), name="up_final_a")(h)
        h = PatchExpand2D(max(e // 4, 4), name="up_final_b")(h)
        return OutBlock(self.num_classes, name="seg")(h)
