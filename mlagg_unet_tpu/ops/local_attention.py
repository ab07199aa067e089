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


def _pad_once(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Zero-pad H/W by the window radius ONCE (in the input dtype) so the
    per-tap shifts below are static slices of the same tensor — XLA fuses
    slices into their consumers, where 9 separate pad+dynamic_slice copies
    each materialized a full-size shifted tensor (measured: the f32 shifted
    copies dominated layer0/1 HBM traffic in the flagship forward)."""
    pad = [(0, 0), (r, r), (r, r)] + [(0, 0)] * (x.ndim - 3)
    return jnp.pad(x, pad)


def _tap(xp: jnp.ndarray, H: int, W: int, r: int, dy: int, dx: int
         ) -> jnp.ndarray:
    """Slice of the padded tensor equal to the zero-filled shift
    out[.., y, x, ..] = x[.., y+dy, x+dx, ..]."""
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(xp, r + dy, r + dy + H, axis=1),
        r + dx, r + dx + W, axis=2)


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
    r = window_size // 2
    kp = _pad_once(k, r)  # input dtype; upcast fuses into the product
    logits = []
    for dy, dx in _window_offsets(window_size):
        # upcast PER TAP inside the fusion: hoisting q.astype(f32) out of
        # the loop makes XLA materialize a full f32 copy of q (the convert
        # fuses into q's producer, doubling that matmul's output bytes —
        # census_detail r4); per-tap converts are register-only
        kshift = _tap(kp, H, W, r, dy, dx).astype(jnp.float32)
        s = jnp.sum(q.astype(jnp.float32) * kshift, axis=-1)  # (B,H,W,nh)
        m = _border_mask(H, W, dy, dx)[None, :, :, None]
        logits.append(jnp.where(m, NEG_INF, s))
    return jnp.stack(logits, axis=-1)


def local_window_attention_apply(
    attn: jnp.ndarray, v: jnp.ndarray, window_size: int = 3
) -> jnp.ndarray:
    """attn: (B, H, W, nh, ws^2) weights (already softmaxed / combined);
    v: (B, H, W, nh, dv). Returns (B, H, W, nh, dv)."""
    H, W = v.shape[1], v.shape[2]
    r = window_size // 2
    out = jnp.zeros(v.shape, jnp.float32)
    vp = _pad_once(v, r)  # input dtype; upcast fuses into the multiply-add
    for j, (dy, dx) in enumerate(_window_offsets(window_size)):
        vshift = _tap(vp, H, W, r, dy, dx).astype(jnp.float32)
        out = out + attn[..., j : j + 1] * vshift
    # fp32 island ends here: return in the caller's compute dtype so a
    # bf16 model doesn't silently promote everything downstream to fp32
    return out.astype(v.dtype)
