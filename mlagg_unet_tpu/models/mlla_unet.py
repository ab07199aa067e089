"""MLLA-UNet baseline — linear attention with RoPE (the "Demystify Mamba"
MLLA block) in a symmetric U-shape.

Port of the reference's comparison baseline nnUNetTrainer_MLLA_UNet.py
(:169-197 RoPE, :198-253 LinearAttention with LePE, MLLABlock, MLLA_UNet).
O(N) linear attention: q,k -> elu+1, RoPE-rotated q/k drive the kv
aggregation, z normalizer from the un-rotated features (:242-244).
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mlagg_unet_tpu.models.layers import DropPath, DWConv2d, Mlp, gelu
from mlagg_unet_tpu.models.mednext import OutBlock
from mlagg_unet_tpu.models.mlla import PatchEmbed
from mlagg_unet_tpu.models.vmamba import PatchExpand2D, PatchMerging2D


def rope_rotations(h: int, w: int, dim: int, base: float = 10000.0
                   ) -> np.ndarray:
    """(h, w, dim/2, 2) cos/sin table (reference RoPE :169-191)."""
    k_max = dim // 4  # feature_dim // (2 * n_spatial_dims)
    theta = 1.0 / (base ** (np.arange(k_max) / k_max))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    angles = np.concatenate(
        [ys[..., None] * theta, xs[..., None] * theta], axis=-1
    )  # (h, w, dim/2)
    return np.stack([np.cos(angles), np.sin(angles)], axis=-1).astype(
        np.float32)


def apply_rope(x: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """x: (b, h, w, c); rot: (h, w, c/2, 2). Complex rotation per pair."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, c // 2, 2)
    re = xf[..., 0] * rot[..., 0] - xf[..., 1] * rot[..., 1]
    im = xf[..., 0] * rot[..., 1] + xf[..., 1] * rot[..., 0]
    return jnp.stack([re, im], axis=-1).reshape(b, h, w, c).astype(x.dtype)


class LinearAttention(nn.Module):
    """reference :198-253. Input (B, H, W, C)."""

    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        n = H * W
        nh = self.num_heads
        hd = C // nh

        qk = nn.Dense(2 * C, use_bias=self.qkv_bias, name="qk")(x)
        q, k = jnp.split(qk, 2, axis=-1)
        v = x
        q = jax.nn.elu(q) + 1.0
        k = jax.nn.elu(k) + 1.0

        rot = jnp.asarray(rope_rotations(H, W, C))
        q_rope = apply_rope(q, rot)
        k_rope = apply_rope(k, rot)

        def heads(t):  # (B,H,W,C) -> (B,nh,n,hd)
            return jnp.transpose(t.reshape(B, n, nh, hd), (0, 2, 1, 3))

        qh, kh, vh = heads(q), heads(k), heads(v)
        qr, kr = heads(q_rope), heads(k_rope)

        k_mean = kh.mean(axis=2, keepdims=True)                  # (B,nh,1,hd)
        z = 1.0 / (jnp.einsum("bhnd,bhmd->bhnm", qh, k_mean) + 1e-6)
        kv = jnp.einsum("bhnd,bhne->bhde", kr * (n ** -0.5),
                        vh * (n ** -0.5))
        out = jnp.einsum("bhnd,bhde->bhne", qr, kv) * z          # (B,nh,n,hd)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, H, W, C)

        out = out + DWConv2d(name="lepe")(v)
        return out


class MLLABlockLinear(nn.Module):
    """Gated MLLA block with linear attention (reference MLLABlock in
    nnUNetTrainer_MLLA_UNet.py, incl. the cpe convs the flagship dropped)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        x = x + DWConv2d(name="cpe1")(x)
        shortcut = x
        h = nn.LayerNorm(name="norm1")(x)
        act_res = jax.nn.silu(nn.Dense(C, name="act_proj")(h))
        h = nn.Dense(C, name="in_proj")(h)
        h = jax.nn.silu(DWConv2d(name="dwc")(h))
        h = LinearAttention(self.num_heads, self.qkv_bias, name="attn")(h)
        h = nn.Dense(C, name="out_proj")(h * act_res)
        x = shortcut + DropPath(self.drop_path)(h, deterministic)
        x = x + DWConv2d(name="cpe2")(x)
        h = Mlp(int(C * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(name="norm2")(x), deterministic)
        return x + DropPath(self.drop_path)(h, deterministic)


class MLLAUNet(nn.Module):
    """Symmetric MLLA U-Net (2D)."""

    num_classes: int
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True
                 ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        e = self.embed_dim
        dims = [e * 2 ** i for i in range(len(self.depths))]
        total = sum(self.depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]

        h = PatchEmbed(patch_size=4, embed_dim=e, name="patch_embed")(x)
        skips = []
        for i, dep in enumerate(self.depths):
            for b in range(dep):
                h = MLLABlockLinear(
                    self.num_heads[i], self.mlp_ratio,
                    drop_path=dpr[sum(self.depths[:i]) + b],
                    name=f"enc{i}_block{b}",
                )(h, deterministic)
            skips.append(h)
            if i < len(self.depths) - 1:
                h = PatchMerging2D(dims[i + 1], name=f"down{i}")(h)

        ds = []
        for i in range(len(self.depths) - 2, -1, -1):
            if self.deep_supervision:
                ds.append(OutBlock(self.num_classes, name=f"out_{i+1}")(h))
            h = PatchExpand2D(dims[i], name=f"up{i}")(h)
            h = h + skips[i]
            h = MLLABlockLinear(self.num_heads[i], self.mlp_ratio,
                                name=f"dec{i}_block")(h, deterministic)

        # final x4 expansion back to input resolution
        h = PatchExpand2D(max(e // 2, 4), name="up_final_a")(h)
        h = PatchExpand2D(max(e // 4, 4), name="up_final_b")(h)
        out = OutBlock(self.num_classes, name="out_0")(h)
        if self.deep_supervision:
            return [out] + ds[::-1]
        return out
