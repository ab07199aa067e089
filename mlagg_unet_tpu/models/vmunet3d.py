"""VM-UNet-3D (``VSSM_UNETR``): 3D VMamba encoder + UNETR decoder.

Reference: nnUNetTrainer_VMUNet3D.py — VSSM_UNETR (:660-808), the
12-direction SS3D cell (:208-446, forward_corev0 :332-386: 6 axis orders
d-h-w / d-w-h / h-d-w / h-w-d / w-d-h / w-h-d each scanned forward and
reversed), VSSBlock with ConvolutionalGLU mlp (:461-518), VSSLayer (:521),
PatchEmbed3D (:90) / PatchMerging3D (:159), and the SwinT-bottleneck variant
nnUNetTrainer_VMUNet3D_woinit_new_SwinT.py (:998-1180: last VSSM stage is a
3D shifted-window transformer BasicLayer instead of a VSSLayer).

TPU notes: the 12 scan paths are batched into one (B, 12, C, L) selective
scan so a single Pallas kernel launch covers all directions; the scan-order
permutations are pure XLA transposes. Window attention uses static 3D
partitions with masks computed at trace time (no dynamic shapes under jit).
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mlagg_unet_tpu.models.dynamic_unet import TransposedConvND
from mlagg_unet_tpu.models.layers import InstanceNorm, torch_bias_init
from mlagg_unet_tpu.models.mamba_skip import (
    _a_log_init,
    _dt_proj_bias_init,
    _dt_proj_weight_init,
)
from mlagg_unet_tpu.ops import selective_scan_auto as selective_scan

# the six axis orders over (D, H, W): dhw, dwh, hdw, hwd, wdh, whd
# (nnUNetTrainer_VMUNet3D.py:339-347)
_AXIS_ORDERS: Tuple[Tuple[int, int, int], ...] = (
    (0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0),
)


def _scan12_3d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, 12, C, L): the six axis-order raster scans
    followed by their length-reversed counterparts."""
    B = x.shape[0]
    C = x.shape[-1]
    L = x.shape[1] * x.shape[2] * x.shape[3]
    fwd = jnp.stack(
        [jnp.transpose(x, (0, 4) + tuple(1 + a for a in o)).reshape(B, C, L)
         for o in _AXIS_ORDERS], axis=1)                      # (B, 6, C, L)
    return jnp.concatenate([fwd, jnp.flip(fwd, axis=-1)], axis=1)


def _merge12_3d(ys: jnp.ndarray, D: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of _scan12_3d summed over the 12 paths -> (B, C, L)
    (the reference un-permutes each path then sums, :374-386, :437)."""
    B, _, C, L = ys.shape
    dims = (D, H, W)
    total = jnp.zeros((B, C, L), ys.dtype)
    for half in range(2):
        block = ys[:, 6 * half: 6 * half + 6]
        if half == 1:
            block = jnp.flip(block, axis=-1)
        for k, order in enumerate(_AXIS_ORDERS):
            y = block[:, k].reshape(B, C, *(dims[a] for a in order))
            inv = tuple(int(np.argsort(order)[i]) for i in range(3))
            y = jnp.transpose(y, (0, 1) + tuple(2 + a for a in inv))
            total = total + y.reshape(B, C, L)
    return total


class SS3D12(nn.Module):
    """12-direction 3D selective-scan cell (nnUNetTrainer_VMUNet3D.py:208).

    in_proj -> (x, z); x -> depthwise conv3d + SiLU -> 12-path scan ->
    sum paths -> LayerNorm -> * SiLU(z) -> out_proj.
    """

    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: float = 2.0
    # the *_woinit_new trainers remove the z gate: in_proj emits d_inner
    # only and the SiLU(z) multiply disappears
    # (nnUNetTrainer_VMUNet3D_woinit_new.py:246-248,437-448)
    no_z: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, Dz, H, W, _ = x.shape
        d_inner = int(self.expand * self.d_model)
        dt_rank = math.ceil(self.d_model / 16)
        K = 12
        L = Dz * H * W

        if self.no_z:
            xh = nn.Dense(d_inner, use_bias=False, name="in_proj")(x)
            z = None
        else:
            xz = nn.Dense(2 * d_inner, use_bias=False, name="in_proj")(x)
            xh, z = jnp.split(xz, 2, axis=-1)
        xh = nn.Conv(d_inner, (self.d_conv,) * 3, padding="SAME",
                     feature_group_count=d_inner, name="conv3d")(xh)
        xh = jax.nn.silu(xh)

        xs = _scan12_3d(xh)                                   # (B,12,Din,L)

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
        y = _merge12_3d(out_y, Dz, H, W)                      # (B,Din,L)
        y = jnp.swapaxes(y, 1, 2)
        y = nn.LayerNorm(epsilon=1e-5, name="out_norm")(y)
        y = y.reshape(B, Dz, H, W, d_inner)
        if z is not None:
            y = y * jax.nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)


class ConvGLU3D(nn.Module):
    """ConvolutionalGLU mlp (nnUNetTrainer_VMUNet3D.py:461-480):
    fc1 -> chunk(x, v) -> GELU(dwconv3d(x)) * v -> fc2."""

    hidden_features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        hidden = int(2 * self.hidden_features / 3)
        h = nn.Dense(hidden * 2, name="fc1")(x)
        h, v = jnp.split(h, 2, axis=-1)
        h = nn.Conv(hidden, (3, 3, 3), padding="SAME",
                    feature_group_count=hidden, name="dwconv")(h)
        h = jax.nn.gelu(h, approximate=False) * v
        return nn.Dense(cin, name="fc2")(h)


class _PlainMlp3D(nn.Module):
    """monai MLPBlock: Linear -> GELU -> Linear (field names linear1/2;
    used by UMambaEnc_SS3D's VSSBlock, UMambaEnc_SS3D.py:420)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Dense(self.hidden, name="linear1")(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(c, name="linear2")(h)


class VSSBlock3D(nn.Module):
    """LN -> SS3D12 -> +res; LN -> mlp -> +res (:483-518). mlp_type
    'conv_glu' = ConvolutionalGLU (VMUNet3D, UMambaBot_SS3D); 'plain' =
    monai MLPBlock (UMambaEnc_SS3D.py:420)."""

    d_state: int = 16
    expand: float = 2.0
    mlp_ratio: float = 4.0
    no_z: bool = False
    mlp_type: str = "conv_glu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = x + SS3D12(d_model=dim, d_state=self.d_state,
                       expand=self.expand, no_z=self.no_z,
                       name="self_attention")(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        if self.mlp_type == "plain":
            return x + _PlainMlp3D(int(dim * self.mlp_ratio),
                                   name="mlp")(h)
        return x + ConvGLU3D(int(dim * self.mlp_ratio), name="mlp")(h)


# ---------------------------------------------------------------------------
# 3D shifted-window transformer bottleneck (SwinT variant, :829-1060)
# ---------------------------------------------------------------------------

def _window_partition3d(x: jnp.ndarray, ws: Sequence[int]) -> jnp.ndarray:
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // ws[0], ws[0], H // ws[1], ws[1],
                  W // ws[2], ws[2], C)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        -1, ws[0] * ws[1] * ws[2], C)


def _window_reverse3d(win: jnp.ndarray, ws: Sequence[int],
                      D: int, H: int, W: int) -> jnp.ndarray:
    B = win.shape[0] // ((D // ws[0]) * (H // ws[1]) * (W // ws[2]))
    x = win.reshape(B, D // ws[0], H // ws[1], W // ws[2],
                    ws[0], ws[1], ws[2], -1)
    return x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, D, H, W, -1)


def _rel_pos_index3d(ws: Sequence[int]) -> np.ndarray:
    coords = np.stack(np.meshgrid(*(np.arange(w) for w in ws),
                                  indexing="ij")).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 2] += ws[2] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= 2 * ws[2] - 1
    return rel.sum(-1)


def _shift_mask3d(dims: Sequence[int], ws: Sequence[int],
                  ss: Sequence[int]) -> np.ndarray:
    """Attention mask for shifted 3D windows (compute_mask, :680-700)."""
    img = np.zeros((1, *dims, 1), np.float32)
    cnt = 0
    segs = [
        (slice(0, -w), slice(-w, -s), slice(-s, None)) if s > 0
        else (slice(None),)
        for w, s in zip(ws, ss)
    ]
    for d in segs[0]:
        for h in segs[1]:
            for w in segs[2]:
                img[:, d, h, w, :] = cnt
                cnt += 1
    win = np.asarray(_window_partition3d(jnp.asarray(img), ws))[:, :, 0]
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -1e9, 0.0).astype(np.float32)


class WindowAttention3D(nn.Module):
    num_heads: int
    # the CONFIGURED window (monai builds the bias table/index for this
    # size even when the runtime window is clamped to the feature map and
    # slices index[:n, :n] — reproduce that quirk exactly,
    # nnUNetTrainer_VMUNet3D_woinit_new_SwinT.py:733-827)
    window_size: Sequence[int]

    @nn.compact
    def __call__(self, x, mask=None):
        Bn, N, C = x.shape
        ws = tuple(self.window_size)
        head_dim = C // self.num_heads
        qkv = nn.Dense(C * 3, name="qkv")(x).reshape(
            Bn, N, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ jnp.swapaxes(k, -2, -1)) * (head_dim ** -0.5)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1),
             self.num_heads))
        idx = _rel_pos_index3d(ws)[:N, :N]
        attn = attn + table[idx.reshape(-1)].reshape(
            N, N, self.num_heads).transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(Bn // nw, nw, self.num_heads, N, N)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(Bn, self.num_heads, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).swapaxes(1, 2).reshape(Bn, N, C)
        return nn.Dense(C, name="proj")(out)


class SwinBlock3D(nn.Module):
    num_heads: int
    window_size: Sequence[int]
    shift: bool = False
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, D, H, W, C = x.shape
        dims = (D, H, W)
        ws = [min(w, s) for w, s in zip(self.window_size, dims)]
        ss = [0 if dims[i] <= self.window_size[i] or not self.shift
              else ws[i] // 2 for i in range(3)]

        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        pads = [(0, (w - d % w) % w) for d, w in zip(dims, ws)]
        h = jnp.pad(h, [(0, 0)] + pads + [(0, 0)])
        pd, ph, pw = h.shape[1:4]
        if any(ss):
            h = jnp.roll(h, shift=[-s for s in ss], axis=(1, 2, 3))
            mask = jnp.asarray(_shift_mask3d((pd, ph, pw), ws, ss))
        else:
            mask = None
        win = _window_partition3d(h, ws)
        win = WindowAttention3D(self.num_heads, tuple(self.window_size),
                                name="attn")(win, mask)
        h = _window_reverse3d(win, ws, pd, ph, pw)
        if any(ss):
            h = jnp.roll(h, shift=ss, axis=(1, 2, 3))
        h = h[:, :D, :H, :W]
        x = x + h
        # the SwinT variant swaps the classic MLP for ConvolutionalGLU
        # (nnUNetTrainer_VMUNet3D_woinit_new_SwinT.py:888-892)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x + ConvGLU3D(int(C * self.mlp_ratio), name="mlp")(h)


class SwinLayer3D(nn.Module):
    depth: int
    num_heads: int
    window_size: Sequence[int]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            x = SwinBlock3D(self.num_heads, self.window_size,
                            shift=i % 2 == 1, name=f"block{i}")(
                                x, deterministic)
        return x


# ---------------------------------------------------------------------------
# VSSM backbone + UNETR assembly
# ---------------------------------------------------------------------------

class PatchEmbed3D(nn.Module):
    """Conv(k=patch, s=patch) + LN (:90-115)."""

    embed_dim: int
    patch_size: Sequence[int]

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * int(np.prod(self.patch_size))
        h = nn.Conv(self.embed_dim, tuple(self.patch_size),
                    strides=tuple(self.patch_size),
                    bias_init=torch_bias_init(fan_in), name="proj")(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(h)


class PatchMerging3D(nn.Module):
    """Conv(k=3, s=stride, pad=1) + LN (:159-181)."""

    out_dim: int
    stride: Sequence[int]

    @nn.compact
    def __call__(self, x):
        # torch Conv3d(k=3, stride, padding=1): symmetric pad — NOT 'SAME',
        # which pads asymmetrically under stride 2 and shifts the windows
        h = nn.Conv(self.out_dim, (3, 3, 3), strides=tuple(self.stride),
                    padding=1, name="reduction")(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(h)


class VSSM3D(nn.Module):
    """4-stage 3D VSSM encoder returning all scales (:561-658)."""

    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    strides: Sequence[Sequence[int]] = (
        (2, 4, 4), (2, 2, 2), (2, 2, 2), (1, 2, 2))
    d_state: int = 16
    ssm_ratio: float = 2.0
    mlp_ratio: float = 4.0
    last_stage_swin: bool = False
    num_heads: int = 24
    window_size: Sequence[int] = (5, 6, 7)
    no_z: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        outs = []
        h = x
        n = len(self.depths)
        for i in range(n):
            if i == 0:
                h = PatchEmbed3D(self.dims[0], self.strides[0],
                                 name="patch_embed")(h)
            else:
                h = PatchMerging3D(self.dims[i], self.strides[i],
                                   name=f"merge{i}")(h)
            if self.last_stage_swin and i == n - 1:
                for j in range(self.depths[i]):
                    h = SwinBlock3D(self.num_heads, self.window_size,
                                    shift=j % 2 == 1,
                                    name=f"stage{i}_block{j}")(
                                        h, deterministic)
            else:
                for j in range(self.depths[i]):
                    h = VSSBlock3D(d_state=self.d_state,
                                   expand=self.ssm_ratio,
                                   mlp_ratio=self.mlp_ratio,
                                   no_z=self.no_z,
                                   name=f"stage{i}_block{j}")(
                                       h, deterministic)
            outs.append(h)
        return outs


class _ResBlockND(nn.Module):
    """monai UnetResBlock for arbitrary spatial rank (NDHWC here)."""

    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        cin = x.shape[-1]
        k = (self.kernel_size,) * nd
        out = nn.Conv(self.out_channels, k, padding="SAME", name="conv1")(x)
        out = InstanceNorm(name="norm1")(out)
        out = jax.nn.leaky_relu(out, 0.01)
        out = nn.Conv(self.out_channels, k, padding="SAME", name="conv2")(out)
        out = InstanceNorm(name="norm2")(out)
        residual = x
        if cin != self.out_channels:
            residual = nn.Conv(self.out_channels, (1,) * nd, name="conv3")(x)
            residual = InstanceNorm(name="norm3")(residual)
        return jax.nn.leaky_relu(out + residual, 0.01)


class _UpBlockND(nn.Module):
    """monai UnetrUpBlock: transp-conv upsample -> concat skip -> res block.
    monai's transposed conv uses k = s = upsample_kernel_size with
    padding (k-1)//2 and output_padding s+2p-k so the output is exactly
    stride * input — for k > 3 (e.g. the stage-0 stride [2,4,4]) this is
    NOT the padding-0 kernel TransposedConvND implements."""

    out_channels: int
    upsample_strides: Sequence[int]

    @nn.compact
    def __call__(self, x, skip):
        from mlagg_unet_tpu.models.layers import ConvTransposeTorch

        ks = tuple(self.upsample_strides)
        ps = tuple((k - 1) // 2 for k in ks)
        ops = tuple(s + 2 * p - k for s, p, k in zip(ks, ps, ks))
        up = ConvTransposeTorch(self.out_channels, ks, ks, ps,
                                spatial_dims=len(ks), output_padding=ops,
                                name="transp_conv")(x)
        out = jnp.concatenate([up, skip], axis=-1)
        return _ResBlockND(self.out_channels, name="conv_block")(out)


class VMUNet3D(nn.Module):
    """``VSSM_UNETR`` (:660-808): VSSM3D multi-scale encoder; UNETR residual
    conv blocks on the raw input + each scale; transposed-conv decoder; 1x1
    out head. No deep supervision (trainer extends NoDeepSupervision)."""

    num_classes: int
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    strides: Sequence[Sequence[int]] = (
        (2, 4, 4), (2, 2, 2), (2, 2, 2), (1, 2, 2))
    d_state: int = 16
    ssm_ratio: float = 2.0
    mlp_ratio: float = 4.0
    last_stage_swin: bool = False
    num_heads: int = 24
    window_size: Sequence[int] = (5, 6, 7)
    # *_woinit_new: no z gate in SS3D, encoder5 removed (decoder4 consumes
    # the raw bottleneck, nnUNetTrainer_VMUNet3D_woinit_new.py:752-811)
    no_z: bool = False
    use_encoder5: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feats = VSSM3D(
            depths=self.depths, dims=self.dims, strides=self.strides,
            d_state=self.d_state, ssm_ratio=self.ssm_ratio,
            mlp_ratio=self.mlp_ratio, last_stage_swin=self.last_stage_swin,
            num_heads=self.num_heads, window_size=self.window_size,
            no_z=self.no_z, name="vssm")(x, deterministic)
        enc1 = _ResBlockND(self.dims[0], name="encoder1")(x)
        enc2 = _ResBlockND(self.dims[0], name="encoder2")(feats[0])
        enc3 = _ResBlockND(self.dims[1], name="encoder3")(feats[1])
        enc4 = _ResBlockND(self.dims[2], name="encoder4")(feats[2])
        hidden = _ResBlockND(self.dims[3], name="encoder5")(feats[3]) \
            if self.use_encoder5 else feats[3]
        h = _UpBlockND(self.dims[2], self.strides[3], name="decoder4")(
            hidden, enc4)
        h = _UpBlockND(self.dims[1], self.strides[2], name="decoder3")(
            h, enc3)
        h = _UpBlockND(self.dims[0], self.strides[1], name="decoder2")(
            h, enc2)
        h = _UpBlockND(self.dims[0], self.strides[0], name="decoder1")(
            h, enc1)
        return nn.Conv(self.num_classes, (1, 1, 1), name="out")(h)
