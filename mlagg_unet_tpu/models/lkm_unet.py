"""LKM-UNet — faithful port of the reference architecture.

Reference: mlagg/nnunetv2/training/nnUNetTrainer/variants/mamba/
nnUNetTrainer_LKM_UNet.py — BiPixelMambaLayer :150 (pixel-level
bidirectional Mamba over a p-strided sub-grid decomposition),
BiWindowMambaLayer :256 (avg-pooled patch-level bidirectional Mamba,
nearest unpool), ResidualBiMambaEncoder :358 (nnU-Net residual conv stages,
each followed by BiPixel then BiWindow), UNetResDecoder :493 (transpconv +
residual stacks + per-stage seg heads), LKMUNet :621,
get_lkmunet_from_plans :732 (conv_bias=True, InstanceNorm, LeakyReLU).

Both Bi layers share ONE out_proj across the forward and backward Mamba
passes (:163-180: the inner Mambas' out_proj are replaced by Identity and a
deep-copied Linear is applied to the sum). The pixel layer's "windows" are
p-strided sub-grids, not contiguous tiles (:205-210: the reshape/permute
pulls the within-period offsets into the batch). 3D uses per-axis periods
(5p, 7p, 6p) (:172-175); divisibility failures silently fall back to the
full volume, exactly like the reference.

Layout: NHWC/NDHWC (TPU-native); the Mamba core is our Pallas selective
scan. Numerics verified against the exec'd reference
(tests/test_torch_parity.py::test_lkm_unet_forward_parity).
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.dynamic_unet import (
    StackedConvBlocks,
    StackedResidualBlocks,
    TransposedConvND,
)
from mlagg_unet_tpu.models.mamba_block import MambaBlock


class _BiMambaShared(nn.Module):
    """norm -> fwd Mamba + token-reversed bwd Mamba -> shared out_proj.
    Input/output: (NB, L, C)."""

    dim: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2

    @nn.compact
    def __call__(self, t):
        t = nn.LayerNorm(name="norm")(t)
        fwd = MambaBlock(self.dim, self.d_state, self.d_conv, self.expand,
                         project_out=False, name="mamba_forw")(t)
        bwd = MambaBlock(self.dim, self.d_state, self.d_conv, self.expand,
                         project_out=False, name="mamba_backw")(
                             jnp.flip(t, axis=1))
        y = fwd + jnp.flip(bwd, axis=1)
        return nn.Dense(self.dim, use_bias=False, name="out_proj")(y)


class BiPixelMambaLayer(nn.Module):
    """reference :150. 2D: period p = 5 * p_raw; the image decomposes into
    p*p interleaved sub-grids that each run through the shared
    bidirectional Mamba. 3D periods: (5, 7, 6) * p_raw."""

    dim: int
    p_raw: int

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim
        C = x.shape[-1]
        bi = _BiMambaShared(self.dim, name="bi")

        if ndim == 5:
            B, Z, H, W, _ = x.shape
            p1, p2, p3 = 5 * self.p_raw, 7 * self.p_raw, 6 * self.p_raw
            if Z % p1 == 0 and H % p2 == 0 and W % p3 == 0:
                nz, nh, nw = Z // p1, H // p2, W // p3
                xd = x.reshape(B, nz, p1, nh, p2, nw, p3, C)
                xd = xd.transpose(0, 2, 4, 6, 1, 3, 5, 7)
                xd = xd.reshape(B * p1 * p2 * p3, nz * nh * nw, C)
                y = bi(xd)
                y = y.reshape(B, p1, p2, p3, nz, nh, nw, C)
                y = y.transpose(0, 4, 1, 5, 2, 6, 3, 7)
                return x + y.reshape(B, Z, H, W, C)
            y = bi(x.reshape(B, Z * H * W, C))
            return x + y.reshape(x.shape)

        B, H, W, _ = x.shape
        p = 5 * self.p_raw
        if p > 0 and H % p == 0 and W % p == 0:
            nh, nw = H // p, W // p
            xd = x.reshape(B, nh, p, nw, p, C)
            xd = xd.transpose(0, 2, 4, 1, 3, 5)       # (B, p, p, nh, nw, C)
            xd = xd.reshape(B * p * p, nh * nw, C)
            y = bi(xd)
            y = y.reshape(B, p, p, nh, nw, C)
            y = y.transpose(0, 3, 1, 4, 2, 5)         # (B, nh, p, nw, p, C)
            return x + y.reshape(B, H, W, C)
        y = bi(x.reshape(B, H * W, C))
        return x + y.reshape(x.shape)


class BiWindowMambaLayer(nn.Module):
    """reference :256. Avg-pool by p, bidirectional Mamba over the pooled
    tokens, nearest-neighbour unpool, residual."""

    dim: int
    p_raw: int

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim
        C = x.shape[-1]
        p = self.p_raw if self.p_raw > 0 else 1
        bi = _BiMambaShared(self.dim, name="bi")
        spatial = x.shape[1:-1]
        B = x.shape[0]

        if all(s % p == 0 for s in spatial):
            sp = len(spatial)
            pooled = nn.avg_pool(x, (p,) * sp, strides=(p,) * sp)
            pshape = pooled.shape
            y = bi(pooled.reshape(B, -1, C)).reshape(pshape)
            # nearest unpool == repeat each cell p times per axis
            for ax in range(1, sp + 1):
                y = jnp.repeat(y, p, axis=ax)
            return x + y
        y = bi(x.reshape(B, -1, C))
        return x + y.reshape(x.shape)


class LKMUNet(nn.Module):
    """reference :621 + get_lkmunet_from_plans :732."""

    num_classes: int
    n_stages: int = 6
    features_per_stage: Sequence[int] = (32, 64, 128, 256, 512, 512)
    kernel_sizes: Sequence[Sequence[int]] = ((3, 3),) * 6
    strides: Sequence[Sequence[int]] = ((1, 1), (2, 2), (2, 2), (2, 2),
                                        (2, 2), (2, 2))
    n_conv_per_stage: Sequence[int] = (2, 2, 2, 2, 2, 2)
    n_conv_per_stage_decoder: Sequence[int] = (2, 2, 2, 2, 2)
    deep_supervision: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        n = self.n_stages
        # stem: one plain conv block at stage-0 features, stride 1
        x = StackedConvBlocks(1, self.features_per_stage[0],
                              self.kernel_sizes[0],
                              [1] * len(self.kernel_sizes[0]),
                              name="stem")(x)
        skips = []
        for s in range(n):
            x = StackedResidualBlocks(
                self.n_conv_per_stage[s], self.features_per_stage[s],
                self.kernel_sizes[s], self.strides[s],
                name=f"stage{s}")(x)
            # reference :441-442: p-parameters derived from stage depth
            p_pix = 2 ** ((n - s + 1) // 2 - 1)
            p_win = 2 ** ((n - s + 1) // 2) // 2
            x = BiPixelMambaLayer(self.features_per_stage[s], p_pix,
                                  name=f"pixel_mamba{s}")(x)
            x = BiWindowMambaLayer(self.features_per_stage[s], p_win,
                                   name=f"window_mamba{s}")(x)
            skips.append(x)

        seg_outputs = []
        lres = skips[-1]
        for s in range(1, n):
            feats_skip = self.features_per_stage[n - s - 1]
            up = TransposedConvND(feats_skip, self.strides[n - s],
                                  name=f"transpconv{s - 1}")(lres)
            up = jnp.concatenate([up, skips[n - s - 1]], axis=-1)
            up = StackedResidualBlocks(
                self.n_conv_per_stage_decoder[s - 1], feats_skip,
                self.kernel_sizes[n - s - 1], [1] * len(self.strides[0]),
                name=f"dec_stage{s - 1}")(up)
            if self.deep_supervision or s == n - 1:
                seg_outputs.append(
                    nn.Conv(self.num_classes, (1,) * len(self.strides[0]),
                            name=f"seg{s - 1}")(up))
            lres = up

        seg_outputs = seg_outputs[::-1]
        if not self.deep_supervision:
            return seg_outputs[0]
        return seg_outputs
