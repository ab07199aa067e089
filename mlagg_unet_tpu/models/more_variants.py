"""Additional variant-zoo architectures composed from the shared pieces.

* SwinTUNet: a Swin-transformer U-shape. NOTE the reference's
  nnUNetTrainer_SwinTUNet.py contains only a (vestigial) backbone — no
  trainer class exists upstream and nothing imports it; this net keeps
  the name usable but has no reference counterpart to match.

(The faithful Mamba-UNet lives in models/vmamba.py; the faithful U-Mamba
SS3D variants are UMambaUNet mamba modes in models/umamba.py — both
torch-parity-tested.)
"""
from __future__ import annotations

import math
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.dynamic_unet import StackedConvBlocks, TransposedConvND
from mlagg_unet_tpu.models.mednext import OutBlock
from mlagg_unet_tpu.models.swin_unetr import SwinStage, PatchMergingSwin
from mlagg_unet_tpu.models.vmamba import PatchExpand2D


class SwinTUNet(nn.Module):
    """Swin transformer U-shape with patch-expand decoder."""

    num_classes: int
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7

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
        for i, (dep, nh) in enumerate(zip(self.depths, self.num_heads)):
            h = SwinStage(dep, nh, self.window_size, name=f"stage{i}")(
                h, deterministic)
            skips.append(h)
            if i < len(self.depths) - 1:
                h = PatchMergingSwin(name=f"merge{i}")(h)
        # merge output dim = 2*C; project to the next stage dim if needed
        for i in range(len(self.depths) - 2, -1, -1):
            h = PatchExpand2D(dims[i], name=f"up{i}")(h)
            h = h + skips[i]
            h = SwinStage(1, self.num_heads[i], self.window_size,
                          name=f"dec{i}")(h, deterministic)
        h = PatchExpand2D(max(e // 2, 4), name="up_final_a")(h)
        h = PatchExpand2D(max(e // 4, 4), name="up_final_b")(h)
        return OutBlock(self.num_classes, name="seg")(h)
