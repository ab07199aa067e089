"""SwinUNETR (2D) — faithful port of the monai SwinUNETR the reference
trainer builds (nnUNetTrainerSwinUNETR_2d.py:38-46: feature_size=96,
spatial_dims=2, patch_size=2, window_size=7, depths (2,2,2,2), heads
(3,6,12,24)).

The swin internals follow the reference's own vendored monai swin code,
which keeps the 2D branches intact
(nnUNetTrainer_VMUNet3D_woinit_new_SwinT.py:588-1097):
  * per-axis window clamping to the feature map with shift zeroed only on
    clamped axes (get_window_size :588-612),
  * pad-to-window + cyclic shift + additive -100 region mask
    (SwinTransformerBlock.forward_part1 :1015-1046, compute_mask :680-717),
  * relative-position bias indexed from the full configured-window table
    sliced [:n, :n] even when the runtime window is smaller
    (WindowAttention :806-828),
  * patch merging after EVERY stage (monai BasicLayer downsample), so the
    swin pyramid is [fs@1/2, 2fs@1/4, 4fs@1/8, 8fs@1/16, 16fs@1/32] and the
    decoder has five UnetrUpBlocks (decoder5..decoder1),
  * the parameter-free channel layer-norm monai applies to every hidden
    state (SwinTransformer.proj_out, normalize=True).

Decoder blocks are the monai UnetrBasicBlock/UnetrUpBlock semantics shared
with SegMamba/SwinUMamba (unetr_blocks.py). Verified by output-level torch
parity (tests/test_torch_parity.py::test_swin_unetr_forward_parity).
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mlagg_unet_tpu.models.layers import Mlp, torch_bias_init
from mlagg_unet_tpu.models.unetr_blocks import UnetrBasicBlock, UnetrUpBlock


def _pair(v) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def window_partition(x: jnp.ndarray, ws) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws0*ws1, C) (vendored monai :615-646)."""
    ws = _pair(ws)
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws[0], ws[0], W // ws[1], ws[1], C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws[0] * ws[1], C)


def window_reverse(win: jnp.ndarray, ws, H: int, W: int) -> jnp.ndarray:
    ws = _pair(ws)
    B = win.shape[0] // ((H // ws[0]) * (W // ws[1]))
    x = win.reshape(B, H // ws[0], W // ws[1], ws[0], ws[1], -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _rel_pos_index(ws: Sequence[int]) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws[0]), np.arange(ws[1]),
                                  indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 0] *= 2 * ws[1] - 1
    return rel.sum(-1)


def _shift_mask(dims: Sequence[int], ws: Sequence[int],
                ss: Sequence[int]) -> np.ndarray:
    """Shifted-window region mask (vendored compute_mask :680-717)."""
    img = np.zeros((1, *dims, 1), np.float32)
    cnt = 0
    segs = [
        (slice(0, -w), slice(-w, -s), slice(-s, None)) if s > 0
        else (slice(None),)
        for w, s in zip(ws, ss)
    ]
    for h in segs[0]:
        for w in segs[1]:
            img[:, h, w, :] = cnt
            cnt += 1
    win = (img.reshape(1, dims[0] // ws[0], ws[0], dims[1] // ws[1],
                       ws[1], 1)
           .transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws[0] * ws[1]))
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """Vendored monai WindowAttention (:720-828). The bias table and index
    are built for the CONFIGURED window even when the runtime window is
    clamped; the index is sliced [:n, :n] (:812-814)."""

    num_heads: int
    window_size: Sequence[int]

    @nn.compact
    def __call__(self, x, mask=None):
        Bn, N, C = x.shape
        ws = _pair(self.window_size)
        nh = self.num_heads
        hd = C // nh
        qkv = nn.Dense(3 * C, name="qkv")(x).reshape(Bn, N, 3, nh, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd ** -0.5) @ jnp.swapaxes(k, -2, -1)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws[0] - 1) * (2 * ws[1] - 1), nh))
        idx = _rel_pos_index(ws)[:N, :N]
        attn = attn + table[idx.reshape(-1)].reshape(
            N, N, nh).transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(Bn // nw, nw, nh, N, N) + mask[None, :, None]
            attn = attn.reshape(Bn, nh, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).swapaxes(1, 2).reshape(Bn, N, C)
        return nn.Dense(C, name="proj")(out)


class SwinBlock(nn.Module):
    """Vendored monai SwinTransformerBlock 2D path (:829-1046): LN(1e-5) ->
    pad/shift/window attention -> residual; LN -> MLP -> residual."""

    num_heads: int
    window_size: Union[int, Sequence[int]] = 7
    shift: bool = False
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        dims = (H, W)
        cfg = _pair(self.window_size)
        ws = tuple(min(w, d) for w, d in zip(cfg, dims))
        ss = tuple(0 if dims[i] <= cfg[i] or not self.shift
                   else cfg[i] // 2 for i in range(2))

        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        pads = [(0, (w - d % w) % w) for d, w in zip(dims, ws)]
        h = jnp.pad(h, [(0, 0)] + pads + [(0, 0)])
        hp, wp = h.shape[1:3]
        if any(ss):
            h = jnp.roll(h, (-ss[0], -ss[1]), axis=(1, 2))
            mask = jnp.asarray(_shift_mask((hp, wp), ws, ss))
        else:
            mask = None
        win = window_partition(h, ws)
        win = WindowAttention(self.num_heads, cfg, name="attn")(win, mask)
        h = window_reverse(win, ws, hp, wp)
        if any(ss):
            h = jnp.roll(h, ss, axis=(1, 2))
        h = h[:, :H, :W]
        x = shortcut + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x + Mlp(int(C * self.mlp_ratio), name="mlp")(
            h, deterministic)


class PatchMergingV2(nn.Module):
    """monai PatchMergingV2, 2D path (= PatchMerging v1 for 2D): concat
    the 2x2 neighborhood in [h0w0, h1w0, h0w1, h1w1] order, LN(4C),
    linear 4C->2C no bias."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, j::2, i::2, :] for i in range(2) for j in range(2)],
            axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, name="reduction")(x)


class BasicLayer(nn.Module):
    """monai BasicLayer: depth blocks (shift on odd blocks) + merge."""

    depth: int
    num_heads: int
    window_size: Union[int, Sequence[int]] = 7
    downsample: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            x = SwinBlock(self.num_heads, self.window_size,
                          shift=i % 2 == 1, name=f"blocks{i}")(
                              x, deterministic)
        if self.downsample:
            x = PatchMergingV2(name="downsample")(x)
        return x


def _proj_out(x: jnp.ndarray) -> jnp.ndarray:
    """monai SwinTransformer.proj_out: parameter-free F.layer_norm over
    channels (eps 1e-5)."""
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-5)


class SwinViT(nn.Module):
    """monai SwinTransformer (2D): patch-embed conv 2x2/2, four stages
    that each END with a patch merge, returning the five normalized
    hidden states."""

    embed_dim: int
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Union[int, Sequence[int]] = 7

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Conv(self.embed_dim, (2, 2), strides=(2, 2),
                    bias_init=torch_bias_init(x.shape[-1] * 4),
                    name="patch_embed")(x)
        hidden = [_proj_out(h)]
        for i, (dep, nh) in enumerate(zip(self.depths, self.num_heads)):
            # monai names stages layers1..layers4
            h = BasicLayer(dep, nh, self.window_size,
                           name=f"layers{i + 1}")(h, deterministic)
            hidden.append(_proj_out(h))
        return hidden


class SwinUNETR(nn.Module):
    """monai SwinUNETR wiring (encoder1..4 on input + first three hidden
    states, encoder10 on the 16fs bottleneck, decoder5..decoder1,
    UnetOutBlock)."""

    num_classes: int
    feature_size: int = 96          # nnUNetTrainerSwinUNETR_2d.py:43
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Union[int, Sequence[int]] = 7

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        fs = self.feature_size
        hidden = SwinViT(fs, self.depths, self.num_heads,
                         self.window_size, name="swinViT")(
                             x, deterministic)
        enc0 = UnetrBasicBlock(fs, name="encoder1")(x)
        enc1 = UnetrBasicBlock(fs, name="encoder2")(hidden[0])
        enc2 = UnetrBasicBlock(2 * fs, name="encoder3")(hidden[1])
        enc3 = UnetrBasicBlock(4 * fs, name="encoder4")(hidden[2])
        dec4 = UnetrBasicBlock(16 * fs, name="encoder10")(hidden[4])
        d3 = UnetrUpBlock(8 * fs, name="decoder5")(dec4, hidden[3])
        d2 = UnetrUpBlock(4 * fs, name="decoder4")(d3, enc3)
        d1 = UnetrUpBlock(2 * fs, name="decoder3")(d2, enc2)
        d0 = UnetrUpBlock(fs, name="decoder2")(d1, enc1)
        out = UnetrUpBlock(fs, name="decoder1")(d0, enc0)
        return nn.Conv(self.num_classes, (1, 1), name="out")(out)


# ---------------------------------------------------------------------------
# Back-compat helpers for the (upstream-vestigial) SwinTUNet in
# more_variants.py — blocks without the trailing merge, and the swin-v1
# style patch merge it was built with.
# ---------------------------------------------------------------------------

class SwinStage(nn.Module):
    depth: int
    num_heads: int
    window_size: Union[int, Sequence[int]] = 7

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            x = SwinBlock(self.num_heads, self.window_size,
                          shift=i % 2 == 1, name=f"block{i}")(
                              x, deterministic)
        return x


class PatchMergingSwin(nn.Module):
    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pad_h, pad_w = H % 2, W % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            H, W = H + pad_h, W + pad_w
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, name="reduction")(x)
