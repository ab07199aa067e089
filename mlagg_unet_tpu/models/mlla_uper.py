"""MLLA_Uper — the flagship MLAgg-UNet network (NHWC, flax).

Port of MLLA_Uper (nnUNetTrainer_MLAgg_2D_dt_MS.py:1183-1407):
MLLA encoder (4 stages) -> Multi-Scale Mamba Module over all 4 scales
(VSSConvLayer) -> MedNeXt-block decoder with PatchExpand upsampling ->
stem-resolution UNETR head -> 1 + 4 deep-supervision output heads.

Construction defaults mirror the flagship trainer's build
(nnUNetTrainer_MLAgg_2D_dt_MS.py:62-92): embed 96, depths (2,2,2,2), heads
(2,4,8,16), mlp_ratio 2, sr_ratio (16,8,4,2), drop_path 0.1, patch_size 2.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.mednext import MedNeXtBlock, OutBlock, PatchExpand
from mlagg_unet_tpu.models.mlla import MLLAEncoder
from mlagg_unet_tpu.models.mamba_skip import VSSConvLayer
from mlagg_unet_tpu.models.unetr_blocks import UnetrBasicBlock, UnetrUpBlock


class MLLAUper(nn.Module):
    out_channels: int
    embed_dim: int = 96
    patch_size: int = 2
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    sr_ratio: Sequence[int] = (16, 8, 4, 2)
    deep_supervision: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        e = self.embed_dim
        hidden = [x for x in MLLAEncoder(
            patch_size=self.patch_size,
            embed_dim=e,
            depths=self.depths,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop_rate=self.drop_rate,
            drop_path_rate=self.drop_path_rate,
            sr_ratio=self.sr_ratio,
            name="mlla",
        )(x, deterministic)]
        # hidden = [input, s0(e,/2), s1(2e,/4), s2(4e,/8), s3(8e,/16)]

        skips = VSSConvLayer(
            feature_dims=[e, e * 2, e * 4, e * 8],
            hidden_dim=e // 2,
            depth=1,
            drop_path=0.1,
            name="mambaskip",
        )(hidden[1:], deterministic)
        hidden = [hidden[0]] + list(skips)

        ds_outs = []
        if self.deep_supervision:
            ds_outs.append(OutBlock(self.out_channels, name="out_4")(hidden[4]))

        h = PatchExpand(4 * e, kernel_size=3, do_res=True, name="up_2")(hidden[4])
        h = hidden[3] + h
        for i in range(self.depths[-2]):
            h = MedNeXtBlock(4 * e, exp_r=int(self.mlp_ratio), kernel_size=3,
                             do_res=True, name=f"dec_block_2_{i}")(h)
        if self.deep_supervision:
            ds_outs.append(OutBlock(self.out_channels, name="out_3")(h))

        h = PatchExpand(2 * e, kernel_size=3, do_res=True, name="up_1")(h)
        h = hidden[2] + h
        for i in range(self.depths[-3]):
            h = MedNeXtBlock(2 * e, exp_r=int(self.mlp_ratio), kernel_size=3,
                             do_res=True, name=f"dec_block_1_{i}")(h)
        if self.deep_supervision:
            ds_outs.append(OutBlock(self.out_channels, name="out_2")(h))

        h = PatchExpand(e, kernel_size=3, do_res=True, name="up_0")(h)
        h = hidden[1] + h
        for i in range(self.depths[-4]):
            h = MedNeXtBlock(e, exp_r=int(self.mlp_ratio), kernel_size=3,
                             do_res=True, name=f"dec_block_0_{i}")(h)
        if self.deep_supervision:
            ds_outs.append(OutBlock(self.out_channels, name="out_1")(h))

        enc0 = UnetrBasicBlock(e // 2, kernel_size=3, name="encoder0")(hidden[0])
        h = UnetrUpBlock(e // 2, kernel_size=3, upsample_kernel_size=2,
                         name="decoder0")(h, enc0)
        out0 = OutBlock(self.out_channels, name="out_0")(h)

        if self.deep_supervision:
            # [full res, 1/2, 1/4, 1/8, 1/16] — matches the reference's
            # return order [x, x_ds_1, x_ds_2, x_ds_3, x_ds_4] (:1404-1405)
            return [out0, ds_outs[3], ds_outs[2], ds_outs[1], ds_outs[0]]
        return out0
