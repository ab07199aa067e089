"""Full MedNeXt U-shape networks + the Mambaskip variant.

Ports of network_architecture/mednextv1/MedNextV1_new.py:11 (5-level
MedNeXt-block U-Net with stem, DS heads) and MedNextV1_new_Mambaskip.py:15
(same net with a VSSConvLayer multi-scale mamba module over the 5 residual
streams), plus the create_mednext_v1 size presets (create_mednext_v1.py:65).
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.mamba_skip import VSSConvLayer
from mlagg_unet_tpu.models.mednext import (
    MedNeXtBlock,
    MedNeXtDownBlock,
    MedNeXtUpBlock,
    OutBlock,
)


class MedNeXtNet(nn.Module):
    """5-level encoder/decoder, channel schedule n, 2n, 4n, 8n, 16n."""

    n_classes: int
    n_channels: int = 32
    exp_r: Union[int, Sequence[int]] = 4
    kernel_size: int = 7
    deep_supervision: bool = False
    do_res: bool = True
    do_res_up_down: bool = True
    block_counts: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2, 2)
    strides: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2)
    grn: bool = False
    spatial_dims: int = 2
    use_mamba_skip: bool = False
    mamba_hidden_dim: int = 16

    @nn.compact
    def __call__(self, x, deterministic: bool = True
                 ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        d = self.spatial_dims
        n = self.n_channels
        exp_r = (self.exp_r if isinstance(self.exp_r, (list, tuple))
                 else [self.exp_r] * len(self.block_counts))

        x = nn.Conv(n, (1,) * d, name="stem")(x)

        def blocks(h, channels, count, er, name):
            for i in range(count):
                h = MedNeXtBlock(channels, er, self.kernel_size,
                                 do_res=self.do_res, grn=self.grn,
                                 spatial_dims=d, name=f"{name}_{i}")(h)
            return h

        res = []
        h = x
        for lvl in range(4):
            ch = n * (2 ** lvl)
            h = blocks(h, ch, self.block_counts[lvl], exp_r[lvl],
                       f"enc_block_{lvl}")
            res.append(h)
            h = MedNeXtDownBlock(
                ch * 2, exp_r[lvl + 1], self.kernel_size,
                do_res=self.do_res_up_down, grn=self.grn,
                stride=self.strides[lvl], spatial_dims=d,
                name=f"down_{lvl}",
            )(h)

        h = blocks(h, n * 16, self.block_counts[4], exp_r[4], "bottleneck")

        if self.use_mamba_skip:
            # MedNextV1_new_Mambaskip.py:178,330: MSMM over the 5 streams
            streams = res + [h]
            streams = VSSConvLayer(
                feature_dims=[n, 2 * n, 4 * n, 8 * n, 16 * n],
                hidden_dim=self.mamba_hidden_dim,
                depth=1, drop_path=0.1, name="mambaskip",
            )(streams, deterministic)
            res = streams[:4]
            h = streams[4]

        ds_outs = []
        if self.deep_supervision:
            ds_outs.append(OutBlock(self.n_classes, name="out_4")(h))

        for up in range(4):
            lvl = 3 - up  # decode to this level
            ch = n * (2 ** lvl)
            h = MedNeXtUpBlock(
                ch, exp_r[5 + up], self.kernel_size,
                do_res=self.do_res_up_down, grn=self.grn,
                stride=self.strides[4 + up], spatial_dims=d,
                name=f"up_{lvl}",
            )(h)
            h = res[lvl] + h
            h = blocks(h, ch, self.block_counts[5 + up], exp_r[5 + up],
                       f"dec_block_{lvl}")
            if self.deep_supervision and lvl > 0:
                ds_outs.append(OutBlock(self.n_classes,
                                        name=f"out_{lvl}")(h))

        out = OutBlock(self.n_classes, name="out_0")(h)
        if self.deep_supervision:
            return [out] + ds_outs[::-1]
        return out


def create_mednext_v1(num_input_channels: int, num_classes: int,
                      model_id: str = "B", kernel_size: int = 3,
                      deep_supervision: bool = False,
                      spatial_dims: int = 2,
                      use_mamba_skip: bool = False) -> MedNeXtNet:
    """Size presets (reference create_mednext_v1.py:65): S/B/M/L."""
    presets = {
        "S": dict(n_channels=32, exp_r=2,
                  block_counts=(2, 2, 2, 2, 2, 2, 2, 2, 2)),
        "B": dict(n_channels=32,
                  exp_r=(2, 3, 4, 4, 4, 4, 4, 3, 2),
                  block_counts=(2, 2, 2, 2, 2, 2, 2, 2, 2)),
        "M": dict(n_channels=32,
                  exp_r=(2, 3, 4, 4, 4, 4, 4, 3, 2),
                  block_counts=(3, 4, 4, 4, 4, 4, 4, 4, 3)),
        "L": dict(n_channels=32,
                  exp_r=(3, 4, 8, 8, 8, 8, 8, 4, 3),
                  block_counts=(3, 4, 8, 8, 8, 8, 8, 4, 3)),
    }
    p = presets[model_id]
    return MedNeXtNet(
        n_classes=num_classes, kernel_size=kernel_size,
        deep_supervision=deep_supervision, do_res=True, do_res_up_down=True,
        spatial_dims=spatial_dims, use_mamba_skip=use_mamba_skip, **p,
    )
