"""Additional variant-zoo architectures composed from the shared pieces.

* SwinTUNet (nnUNetTrainer_SwinTUNet.py): Swin transformer U-shape with
  patch-expand decoder.
* MambaUNet (nnUNetTrainer_MambaUNet.py): pure-VSS U-shape (Swin-UNet with
  VSS blocks) — thin preset over our VMUNet.
* SS3D (UMambaBot_SS3D.py / SS3D variants): 6-direction 3D selective scan
  cell (forward+backward along each spatial axis) + U-Mamba-SS3D net.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlagg_unet_tpu.models.dynamic_unet import StackedConvBlocks, TransposedConvND
from mlagg_unet_tpu.models.mamba_skip import (
    _a_log_init,
    _dt_proj_bias_init,
    _dt_proj_weight_init,
)
from mlagg_unet_tpu.models.mednext import OutBlock
from mlagg_unet_tpu.models.swin_unetr import SwinStage, PatchMergingSwin
from mlagg_unet_tpu.models.vmamba import PatchExpand2D, VSSBlock, VSSM
from mlagg_unet_tpu.ops import selective_scan_auto as selective_scan


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


def _scan6_3d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, 6, C, L): forward+backward raster scans with
    each spatial axis innermost-first (z-major, y-major, x-major)."""
    B, D, H, W, C = x.shape
    L = D * H * W
    orders = [
        jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(B, C, L),  # (d,h,w)
        jnp.transpose(x, (0, 4, 2, 3, 1)).reshape(B, C, L),  # (h,w,d)
        jnp.transpose(x, (0, 4, 3, 1, 2)).reshape(B, C, L),  # (w,d,h)
    ]
    fwd = jnp.stack(orders, axis=1)                           # (B,3,C,L)
    return jnp.concatenate([fwd, jnp.flip(fwd, axis=-1)], axis=1)


def _merge6_3d(ys: jnp.ndarray, D: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of _scan6_3d, summed over the 6 directions -> (B, C, L)."""
    B, K, C, L = ys.shape
    y = []
    fwd = [ys[:, 0], ys[:, 1], ys[:, 2]]
    bwd = [jnp.flip(ys[:, 3], -1), jnp.flip(ys[:, 4], -1),
           jnp.flip(ys[:, 5], -1)]
    for arr in (fwd, bwd):
        y.append(arr[0])
        y.append(jnp.transpose(
            arr[1].reshape(B, C, H, W, D), (0, 1, 4, 2, 3)).reshape(B, C, L))
        y.append(jnp.transpose(
            arr[2].reshape(B, C, W, D, H), (0, 1, 3, 4, 2)).reshape(B, C, L))
    return sum(y)


class SS3D(nn.Module):
    """6-direction 3D selective scan cell. Input/output (B, D, H, W, C)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: float = 2.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, Dz, H, W, _ = x.shape
        d_inner = int(self.expand * self.d_model)
        dt_rank = math.ceil(self.d_model / 16)
        K = 6
        L = Dz * H * W

        xz = nn.Dense(2 * d_inner, use_bias=False, name="in_proj")(x)
        xh, z = jnp.split(xz, 2, axis=-1)
        xh = nn.Conv(d_inner, (self.d_conv,) * 3, padding="SAME",
                     feature_group_count=d_inner, name="conv3d")(xh)
        xh = jax.nn.silu(xh)

        xs = _scan6_3d(xh)                                    # (B,6,Din,L)

        x_proj_weight = self.param(
            "x_proj_weight", nn.initializers.lecun_normal(),
            (K, dt_rank + 2 * self.d_state, d_inner), jnp.float32)
        dt_projs_weight = self.param(
            "dt_projs_weight", _dt_proj_weight_init(dt_rank),
            (K, d_inner, dt_rank), jnp.float32)
        dt_projs_bias = self.param("dt_projs_bias", _dt_proj_bias_init(),
                                   (K, d_inner), jnp.float32)
        A_logs = self.param("A_logs", _a_log_init(K, d_inner, self.d_state),
                            (K, d_inner, self.d_state), jnp.float32)
        Ds = self.param("Ds", nn.initializers.ones, (K, d_inner), jnp.float32)

        x_dbl = jnp.einsum("bkdl,kcd->bkcl", xs.astype(jnp.float32),
                           x_proj_weight, preferred_element_type=jnp.float32)
        dts = jnp.einsum("bkrl,kdr->bkdl", x_dbl[:, :, :dt_rank],
                         dt_projs_weight, preferred_element_type=jnp.float32)
        Bs = x_dbl[:, :, dt_rank: dt_rank + self.d_state]
        Cs = x_dbl[:, :, dt_rank + self.d_state:]
        A = -jnp.exp(A_logs)

        out_y = selective_scan(xs, dts, A, Bs, Cs, Ds, dt_projs_bias,
                               delta_softplus=True)
        y = _merge6_3d(out_y, Dz, H, W)
        y = jnp.swapaxes(y, 1, 2)
        y = nn.LayerNorm(name="out_norm")(y)
        y = y.reshape(B, Dz, H, W, d_inner)
        y = y * jax.nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)


class _SS3DLayer(nn.Module):
    d_state: int = 16

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm")(x)
        h = SS3D(d_model=x.shape[-1], d_state=self.d_state, name="ss3d")(h)
        return x + h


class UMambaSS3D(nn.Module):
    """U-Mamba with an SS3D cell at the bottleneck (UMambaBot_SS3D.py)."""

    num_classes: int
    features: Sequence[int] = (16, 32, 64)
    deep_supervision: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.ndim - 2
        assert d == 3
        skips = []
        h = x
        for i, f in enumerate(self.features):
            stride = [1] * d if i == 0 else [2] * d
            h = StackedConvBlocks(2, f, [3] * d, stride, name=f"enc{i}")(h)
            skips.append(h)
        h = _SS3DLayer(name="ss3d_bot")(h)

        ds = []
        for i in range(len(self.features) - 2, -1, -1):
            h = TransposedConvND(self.features[i], [2] * d, name=f"up{i}")(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = StackedConvBlocks(1, self.features[i], [3] * d, [1] * d,
                                  name=f"dec{i}")(h)
            if self.deep_supervision or i == 0:
                ds.append(nn.Conv(self.num_classes, (1,) * d,
                                  name=f"seg{i}")(h))
        if not self.deep_supervision:
            return ds[-1]
        return ds[::-1]
