"""U-Mamba networks: plans-driven conv U-Net with Mamba blocks.

Ports of the reference's U-Mamba family (variants/mamba/UMambaBot_2d.py:39-64,
UMambaBot_3d.py, UMambaEnc_2d.py / _3d.py): the standard nnU-Net conv
encoder/decoder with a residual LN->Mamba block at the bottleneck (Bot) or
after every encoder stage (Enc), operating on flattened spatial tokens.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.dynamic_unet import (
    StackedConvBlocks,
    TransposedConvND,
)
from mlagg_unet_tpu.models.mamba_block import MambaBlock


class _MambaLayer(nn.Module):
    """LN -> Mamba on flattened tokens, residual (UMambaBot_2d.py:15-36)."""

    d_state: int = 16

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        C = x.shape[-1]
        spatial = x.shape[1:-1]
        L = 1
        for s in spatial:
            L *= s
        tokens = x.reshape(B, L, C)
        h = nn.LayerNorm(name="norm")(tokens)
        h = MambaBlock(d_model=C, d_state=self.d_state, name="mamba")(h)
        return (tokens + h).reshape(B, *spatial, C)


class UMambaUNet(nn.Module):
    """mamba_mode='bot': Mamba at the bottleneck only;
    'enc': Mamba after every encoder stage."""

    num_classes: int
    n_stages: int
    features_per_stage: Sequence[int]
    conv_kernel_sizes: Sequence[Sequence[int]]
    pool_op_kernel_sizes: Sequence[Sequence[int]]
    n_conv_per_stage_encoder: Sequence[int]
    n_conv_per_stage_decoder: Sequence[int]
    deep_supervision: bool = True
    mamba_mode: str = "bot"

    @nn.compact
    def __call__(self, x, deterministic: bool = True
                 ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        skips = []
        for s in range(self.n_stages):
            x = StackedConvBlocks(
                self.n_conv_per_stage_encoder[s],
                self.features_per_stage[s],
                self.conv_kernel_sizes[s],
                self.pool_op_kernel_sizes[s],
                name=f"encoder_stage{s}",
            )(x)
            if self.mamba_mode == "enc" or (
                self.mamba_mode == "bot" and s == self.n_stages - 1
            ):
                x = _MambaLayer(name=f"mamba{s}")(x)
            skips.append(x)

        ds_outputs = []
        for d in range(self.n_stages - 1):
            skip_idx = self.n_stages - 2 - d
            x = TransposedConvND(
                self.features_per_stage[skip_idx],
                self.pool_op_kernel_sizes[skip_idx + 1],
                name=f"decoder_transp{d}",
            )(x)
            x = jnp.concatenate([x, skips[skip_idx]], axis=-1)
            x = StackedConvBlocks(
                self.n_conv_per_stage_decoder[d],
                self.features_per_stage[skip_idx],
                self.conv_kernel_sizes[skip_idx],
                [1] * len(self.conv_kernel_sizes[skip_idx]),
                name=f"decoder_stage{d}",
            )(x)
            if self.deep_supervision or d == self.n_stages - 2:
                ds_outputs.append(
                    nn.Conv(self.num_classes, (1,) * (x.ndim - 2),
                            name=f"seg_head{d}")(x)
                )
        if not self.deep_supervision:
            return ds_outputs[-1]
        return ds_outputs[::-1]


def umamba_from_plans(configuration_manager, num_input_channels: int,
                      num_output_channels: int, deep_supervision: bool = True,
                      mamba_mode: str = "bot") -> UMambaUNet:
    n_stages = len(configuration_manager.pool_op_kernel_sizes)
    base = configuration_manager.UNet_base_num_features
    max_feat = configuration_manager.unet_max_num_features
    features = [min(base * 2 ** i, max_feat) for i in range(n_stages)]
    return UMambaUNet(
        num_classes=num_output_channels,
        n_stages=n_stages,
        features_per_stage=features,
        conv_kernel_sizes=configuration_manager.conv_kernel_sizes,
        pool_op_kernel_sizes=configuration_manager.pool_op_kernel_sizes,
        n_conv_per_stage_encoder=configuration_manager.n_conv_per_stage_encoder,
        n_conv_per_stage_decoder=configuration_manager.n_conv_per_stage_decoder,
        deep_supervision=deep_supervision,
        mamba_mode=mamba_mode,
    )
