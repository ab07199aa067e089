"""Local windowed (3x3) attention via shifted slices — TPU-native.

The reference implements TransNeXt-style local attention by materializing
unfolded key/value neighborhoods with nn.Unfold plus a precomputed padding
mask (nnUNetTrainer_MLAgg_2D_dt_MS.py:616-622,693-717). Gather-style unfold is
hostile to the TPU; instead we compute, for each of the window_size^2 offsets,
the shifted elementwise product q * shift(k) summed over head_dim — 9 fused
VPU passes, no gather, no (N, 9, dh) materialization of keys.

Semantics parity: out-of-bounds window positions are masked to -inf before
softmax, exactly like the reference's padding_mask (unfold zero-pads, mask
marks those taps).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _window_offsets(window_size: int):
    r = window_size // 2
    return [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift image content so out[.., y, x, ..] = x[.., y+dy, x+dx, ..]
    (zero fill). x: (B, H, W, ...)."""
    H, W = x.shape[1], x.shape[2]
    pad = [(0, 0), (max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))] + [
        (0, 0)
    ] * (x.ndim - 3)
    xp = jnp.pad(x, pad)
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(xp, max(dy, 0), H, axis=1), max(dx, 0), W, axis=2
    )


def _border_mask(H: int, W: int, dy: int, dx: int) -> jnp.ndarray:
    """(H, W) bool, True where position (y+dy, x+dx) is out of bounds."""
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    return ((ys + dy < 0) | (ys + dy >= H) | (xs + dx < 0) | (xs + dx >= W))


def local_window_attention_logits(
    q: jnp.ndarray, k: jnp.ndarray, window_size: int = 3
) -> jnp.ndarray:
    """q, k: (B, H, W, nh, dk) (q pre-scaled). Returns logits
    (B, H, W, nh, window_size^2) fp32 with -inf at border taps."""
    B, H, W, nh, dk = q.shape
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    logits = []
    for dy, dx in _window_offsets(window_size):
        kshift = _shift2d(kf, dy, dx)
        s = jnp.sum(qf * kshift, axis=-1)  # (B, H, W, nh)
        m = _border_mask(H, W, dy, dx)[None, :, :, None]
        logits.append(jnp.where(m, NEG_INF, s))
    return jnp.stack(logits, axis=-1)


def local_window_attention_apply(
    attn: jnp.ndarray, v: jnp.ndarray, window_size: int = 3
) -> jnp.ndarray:
    """attn: (B, H, W, nh, ws^2) weights (already softmaxed / combined);
    v: (B, H, W, nh, dv). Returns (B, H, W, nh, dv)."""
    out = jnp.zeros(v.shape, jnp.float32)
    vf = v.astype(jnp.float32)
    for j, (dy, dx) in enumerate(_window_offsets(window_size)):
        vshift = _shift2d(vf, dy, dx)
        out = out + attn[..., j : j + 1] * vshift
    # fp32 island ends here: return in the caller's compute dtype so a
    # bf16 model doesn't silently promote everything downstream to fp32
    return out.astype(v.dtype)
