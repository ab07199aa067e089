"""VMamba backbone (VSSM) and VM-UNet.

TPU-native equivalents of the reference's VMamba library
(variants/mamba/vmamba/vmamba.py:433-456 SS2D cells + VSSM stages; the
Triton cross-scan kernels become ops/cross_scan.py) and the VM-UNet trainer
family (nnUNetTrainer_VMUNet.py): a U-shape over VSS blocks.

VSSBlock: LN -> SS2D (4-direction selective scan cell) -> DropPath residual
-> LN -> MLP -> residual. VSSM: patch embed (stride-4 conv) + stages with
stride-2 patch merging.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.layers import DropPath, Mlp, gelu
from mlagg_unet_tpu.models.mamba_block import SS2D
from mlagg_unet_tpu.models.mednext import OutBlock


class VSSBlock(nn.Module):
    drop_path: float = 0.0
    d_state: int = 16
    ssm_ratio: float = 2.0
    mlp_ratio: float = 4.0
    forward_type: str = "v2"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(name="ln_1")(x)
        h = SS2D(d_model=x.shape[-1], d_state=self.d_state,
                 expand=self.ssm_ratio, forward_type=self.forward_type,
                 name="self_attention")(h, deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic)
        if self.mlp_ratio > 0:
            h = nn.LayerNorm(name="ln_2")(x)
            h = Mlp(int(x.shape[-1] * self.mlp_ratio), name="mlp")(
                h, deterministic)
            x = x + DropPath(self.drop_path)(h, deterministic)
        return x


class PatchMerging2D(nn.Module):
    """Swin-style 2x2 patch merging (vmamba.py PatchMerging2D)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        # torch concat order [x0, x1, x2, x3] = (h,w) offsets
        # (0,0),(1,0),(0,1),(1,1): w-offset outer, h-offset inner
        x = jnp.transpose(x, (0, 1, 3, 4, 2, 5)).reshape(
            B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)


class VSSM(nn.Module):
    """VMamba encoder: returns per-stage feature maps."""

    depths: Sequence[int] = (2, 2, 9, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    drop_path_rate: float = 0.1
    forward_type: str = "v2"

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        import numpy as np

        from mlagg_unet_tpu.models.layers import torch_bias_init

        # stride-4 patch embed (torch-style bias init: zero-padded regions
        # must not feed exactly-zero vectors into the LayerNorm)
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                    bias_init=torch_bias_init(x.shape[-1] * 16),
                    name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm")(x)

        total = sum(self.depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]

        outs = []
        for i, depth in enumerate(self.depths):
            for b in range(depth):
                x = VSSBlock(
                    drop_path=dpr[sum(self.depths[:i]) + b],
                    d_state=self.d_state, forward_type=self.forward_type,
                    name=f"stage{i}_block{b}",
                )(x, deterministic)
            outs.append(x)
            if i < len(self.depths) - 1:
                x = PatchMerging2D(self.dims[i + 1], name=f"merge{i}")(x)
        return outs


class PatchExpand2D(nn.Module):
    """VM-UNet decoder upsampling: linear expand + pixel shuffle."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = nn.Dense(self.out_dim * 4, use_bias=False, name="expand")(x)
        x = x.reshape(B, H, W, 2, 2, self.out_dim)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            B, 2 * H, 2 * W, self.out_dim)
        return nn.LayerNorm(name="norm")(x)


class VMUNet(nn.Module):
    """VM-UNet (nnUNetTrainer_VMUNet.py lineage): VSSM encoder + VSS-block
    decoder with additive skips + stride-4 final expansion."""

    num_classes: int
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    deep_supervision: bool = False
    forward_type: str = "v2"

    @nn.compact
    def __call__(self, x, deterministic: bool = True
                 ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        B, H, W, _ = x.shape
        feats = VSSM(depths=self.depths, dims=self.dims,
                     d_state=self.d_state, forward_type=self.forward_type,
                     name="vssm")(x, deterministic)
        h = feats[-1]
        ds = []
        for i in range(len(self.dims) - 2, -1, -1):
            if self.deep_supervision:
                ds.append(OutBlock(self.num_classes, name=f"out_{i+1}")(h))
            h = PatchExpand2D(self.dims[i], name=f"up_{i}")(h)
            h = h + feats[i]
            h = VSSBlock(d_state=self.d_state, name=f"dec_block_{i}")(
                h, deterministic)
        # final x4 upsample back to input resolution
        h = PatchExpand2D(self.dims[0] // 2, name="up_final_a")(h)
        h = PatchExpand2D(self.dims[0] // 4, name="up_final_b")(h)
        out = OutBlock(self.num_classes, name="out_0")(h)
        if self.deep_supervision:
            return [out] + ds[::-1]
        return out
