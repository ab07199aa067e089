"""Swin-UMamba — faithful ports of both reference variants.

Reference: mlagg/nnunetv2/training/nnUNetTrainer/variants/mamba/
* nnUNetTrainerSwinUMambaScratch.py — PatchEmbed2D :126, PatchMerging2D
  :152, SS2D (VMamba v0 cell) :195, VSSBlock :381, VSSLayer :401,
  VSSMEncoder :467, SwinUMamba :556 (stem conv7s2+IN, patch-2 VSSM
  encoder, monai UnetrBasicBlock/UnetrUpBlock decoder, 4 UnetOutBlock
  deep-supervision heads), get_swin_umamba_from_plans :768
  (feat_size [48,96,192,384,768], hidden 768).
* nnUNetTrainerSwinUMambaDScratch.py — PatchExpand :138 (Swin-UNet
  2x linear expand), FinalPatchExpand_X4 :163, UNetResDecoder :616
  (PatchExpand + concat + Linear concat_back_dim + 2-block VSSLayer per
  stage, FinalPatchExpand_X4 head), SwinUMambaD :728,
  get_swin_umamba_d_from_plans :786 (patch-4 encoder, dims 96,
  drop_path 0.2).

The SS2D cell is our parity-tested mamba_block.SS2D with
forward_type="v0" (fp32 scan, LayerNorm out_norm, SiLU z-gate); the
4-direction scan runs on the Pallas selective-scan kernel. Numerics
verified end-to-end against the exec'd reference
(tests/test_torch_parity.py::test_swin_umamba_forward_parity,
::test_swin_umamba_d_forward_parity).
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.layers import DropPath, InstanceNorm
from mlagg_unet_tpu.models.unetr_blocks import (
    UnetrBasicBlock,
    UnetrUpBlock,
)
from mlagg_unet_tpu.models.vmamba import PatchMerging2D, VSSBlock


class VSSLayer(nn.Module):
    """Stack of VSSBlocks (reference VSSLayer :401, downsample=None)."""

    depth: int
    d_state: int = 16
    drop_path: Sequence[float] = ()

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = VSSBlock(drop_path=dp, d_state=self.d_state, mlp_ratio=0.0,
                         forward_type="v0", name=f"block{i}")(
                             x, deterministic)
        return x


class VSSMEncoder(nn.Module):
    """reference :467. Returns [input, stage0..stage3] feature maps,
    all NHWC; downsampling happens AFTER each stage's features are
    recorded (skips are at the pre-merge resolution)."""

    patch_size: int = 4
    depths: Sequence[int] = (2, 2, 9, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    drop_path_rate: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        ret = [x]
        p = self.patch_size
        x = nn.Conv(self.dims[0], (p, p), strides=(p, p),
                    name="patch_embed_proj")(x)
        x = nn.LayerNorm(name="patch_embed_norm")(x)

        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        for s, depth in enumerate(self.depths):
            start = sum(self.depths[:s])
            x = VSSLayer(depth, self.d_state,
                         tuple(dpr[start:start + depth]),
                         name=f"layer{s}")(x, deterministic)
            ret.append(x)
            if s < len(self.depths) - 1:
                x = PatchMerging2D(2 * self.dims[s],
                                   name=f"downsample{s}")(x)
        return ret


class UnetOutBlock(nn.Module):
    """monai UnetOutBlock: plain 1x1 conv with bias."""

    num_classes: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.num_classes, (1, 1), name="conv")(x)


class SwinUMamba(nn.Module):
    """reference SwinUMamba :556 (the 'Scratch' trainer's network)."""

    num_classes: int
    feat_size: Sequence[int] = (48, 96, 192, 384, 768)
    hidden_size: int = 768
    # reference hardcodes depths (2,2,9,2) / dims (96..768); configurable
    # here only so tests can build cheap instances
    vssm_depths: Sequence[int] = (2, 2, 9, 2)
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        f = self.feat_size
        # stem: conv7 stride2 + affine InstanceNorm (:579-582)
        x1 = nn.Conv(f[0], (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                     name="stem_conv")(x)
        x1 = InstanceNorm(name="stem_norm")(x1)

        vss_outs = VSSMEncoder(
            patch_size=2, depths=tuple(self.vssm_depths),
            dims=tuple(f[1] * 2 ** i for i in range(len(self.vssm_depths))),
            name="vssm_encoder")(x1, deterministic)

        enc1 = UnetrBasicBlock(f[0], name="encoder1")(x)
        enc2 = UnetrBasicBlock(f[1], name="encoder2")(vss_outs[0])
        enc3 = UnetrBasicBlock(f[2], name="encoder3")(vss_outs[1])
        enc4 = UnetrBasicBlock(f[3], name="encoder4")(vss_outs[2])
        enc5 = UnetrBasicBlock(f[4], name="encoder5")(vss_outs[3])
        enc_hidden = vss_outs[4]

        dec4 = UnetrUpBlock(f[4], name="decoder6")(enc_hidden, enc5)
        dec3 = UnetrUpBlock(f[3], name="decoder5")(dec4, enc4)
        dec2 = UnetrUpBlock(f[2], name="decoder4")(dec3, enc3)
        dec1 = UnetrUpBlock(f[1], name="decoder3")(dec2, enc2)
        dec0 = UnetrUpBlock(f[0], name="decoder2")(dec1, enc1)
        dec_out = UnetrBasicBlock(f[0], name="decoder1")(dec0)

        if self.deep_supervision:
            feats = [dec_out, dec1, dec2, dec3]
            return [UnetOutBlock(self.num_classes, name=f"out{i}")(feats[i])
                    for i in range(4)]
        return UnetOutBlock(self.num_classes, name="out0")(dec_out)


class PatchExpand(nn.Module):
    """reference SwinUMambaD PatchExpand :138: Linear C->2C (no bias),
    pixel-shuffle by 2 with (p1, p2, c) channel order, LayerNorm(C/2)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        x = nn.Dense(2 * self.dim, use_bias=False, name="expand")(x)
        C = 2 * self.dim
        x = x.reshape(B, H, W, 2, 2, C // 4)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            B, 2 * H, 2 * W, C // 4)
        return nn.LayerNorm(name="norm")(x)


class FinalPatchExpand_X4(nn.Module):
    """reference :163: Linear C->16C (no bias), shuffle by 4, LN(C)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        x = nn.Dense(16 * self.dim, use_bias=False, name="expand")(x)
        x = x.reshape(B, H, W, 4, 4, self.dim)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            B, 4 * H, 4 * W, self.dim)
        return nn.LayerNorm(name="norm")(x)


class SwinUMambaD(nn.Module):
    """reference SwinUMambaD :728: patch-4 VSSM encoder + VSS decoder
    (PatchExpand, concat_back_dim Linear, depth-2 VSSLayer stages,
    FinalPatchExpand_X4 head)."""

    num_classes: int
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    drop_path_rate: float = 0.2
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        skips = VSSMEncoder(patch_size=4, dims=tuple(self.dims),
                            name="vssm_encoder")(x, deterministic)
        n = len(self.dims)
        # dpr: linspace(drop_path_rate, 0, (n-1)*2) split per stage (:648)
        total = (n - 1) * 2
        dpr = [self.drop_path_rate * (1 - i / max(total - 1, 1))
               for i in range(total)]

        lres = skips[-1]
        seg_outputs = []
        for s in range(n):
            if s < n - 1:
                feats_skip = self.dims[n - s - 2]
                h = PatchExpand(self.dims[n - s - 1],
                                name=f"expand{s}")(lres)
                h = jnp.concatenate([h, skips[-(s + 2)]], axis=-1)
                h = nn.Dense(feats_skip, name=f"concat_back_dim{s}")(h)
                h = VSSLayer(2, self.d_state,
                             tuple(dpr[2 * s:2 * s + 2]),
                             name=f"stage{s}")(h, deterministic)
            else:
                feats_skip = self.dims[0]
                h = FinalPatchExpand_X4(self.dims[0],
                                        name=f"expand{s}")(lres)
            if self.deep_supervision or s == n - 1:
                seg_outputs.append(
                    nn.Conv(self.num_classes, (1, 1), name=f"seg{s}")(h))
            lres = h

        seg_outputs = seg_outputs[::-1]
        if not self.deep_supervision:
            return seg_outputs[0]
        return seg_outputs
