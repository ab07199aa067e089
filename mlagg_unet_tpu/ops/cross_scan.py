"""Cross-scan / cross-merge layout transforms (4-direction selective scan).

Replaces the reference's Triton kernels (vmamba/csm_triton.py:16-92
CrossScanTriton/CrossMergeTriton) and the torch stack/flip/transpose code in
SS2D_skip.forward_corev0 (MambaSkip.py:405-473). On TPU these are pure layout
transforms — XLA compiles transposes/flips/concats into efficient copies, so
no custom kernel is needed (SURVEY.md N5).

Directions (matching VMamba): 0 = row-major (H,W), 1 = column-major
(transpose), 2 = reversed row-major, 3 = reversed column-major.

Multi-scale variants implement the MSMM trick: each scale is expanded to its
4 scan orders first, then scales are concatenated along L so one scan runs
over the whole multi-scale sequence (MambaSkip.py:405-422).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Interleaved-layout variants (MSMM fast path).
#
# The v2 selective-scan kernels consume the L axis in (S=128, T) lane order
# per IL_MEGA-lane chunk (lane t*128+s <-> time s*T+t; see
# selective_scan_pallas.IL_MEGA). Producing that order directly from the
# NHWC feature maps composes the interleave permutation into the cross-scan
# transpose that must happen anyway — one gather instead of
# transpose-concat-interleave (the wrapper's own interleave measured
# ~7.3 ms/call at MSMM shapes, v5e 2026-08-21).
#
# Each scale is padded to an IL_MEGA multiple so every scale occupies whole
# chunks and the per-scale permutations compose. Interior pad lanes have
# u = B = C = 0; the caller forces their delta to -1e9 (softplus -> 0 =>
# a = 1, bx = 0: exact state passthrough across scale boundaries, matching
# the reference's uninterrupted cross-scale scan) via il_pad_mask.
# ---------------------------------------------------------------------------

def _pad_to(L: int, mega: int) -> int:
    return -(-L // mega) * mega


def interleave_tokens(tok: jnp.ndarray, mega: int) -> jnp.ndarray:
    """tok: (B, L, C) natural token order -> (B, C, Lp) in IL lane order
    (zero-padded to an L multiple of mega). time m*mega + s*T + t lands at
    lane m*mega + t*128 + s."""
    B, L, C = tok.shape
    Lp = _pad_to(L, mega)
    if Lp != L:
        tok = jnp.pad(tok, ((0, 0), (0, Lp - L), (0, 0)))
    T = mega // 128
    t5 = tok.reshape(B, Lp // mega, 128, T, C)        # (B, m, s, t, C)
    return jnp.transpose(t5, (0, 4, 1, 3, 2)).reshape(B, C, Lp)


def deinterleave_to_tokens(y: jnp.ndarray, mega: int, L: int) -> jnp.ndarray:
    """y: (B, K, C, Lp) in IL lane order -> (B, K, L, C) natural tokens."""
    B, K, C, Lp = y.shape
    T = mega // 128
    y6 = y.reshape(B, K, C, Lp // mega, T, 128)       # (B, K, C, m, t, s)
    out = jnp.transpose(y6, (0, 1, 3, 5, 4, 2)).reshape(B, K, Lp, C)
    return out[:, :, :L]


def cross_scan_multiscale_2dir_il(
    xs: Sequence[jnp.ndarray], mega: int, reverse_scales: bool = False,
) -> Tuple[jnp.ndarray, List[int]]:
    """Interleaved-layout counterpart of cross_scan_multiscale_2dir:
    returns ((B, 2, C, Lp_cat) in IL lane order, [padded L_i]). Scales are
    zero-padded to mega multiples individually (the scan passes state
    through pads — see il_pad_mask) and concatenated in forward or
    reversed scale order."""
    parts = []
    for x in xs:
        B, H, W, C = x.shape
        row = x.reshape(B, H * W, C)
        col = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, H * W, C)
        parts.append(jnp.stack([interleave_tokens(row, mega),
                                interleave_tokens(col, mega)], axis=1))
    l_pad = [_pad_to(x.shape[1] * x.shape[2], mega) for x in xs]
    order = (range(len(xs) - 1, -1, -1) if reverse_scales
             else range(len(xs)))
    return jnp.concatenate([parts[i] for i in order], axis=-1), l_pad


def il_pad_mask(
    shapes: Sequence[Tuple[int, int]], mega: int, reverse_scales: bool,
) -> np.ndarray:
    """(Lp_cat,) bool, True = real token, in the interleaved lane order of
    cross_scan_multiscale_2dir_il's concat. Static (numpy) — callers fold
    it into the dts einsum epilogue as where(mask, dts, -1e9)."""
    T = mega // 128
    order = (range(len(shapes) - 1, -1, -1) if reverse_scales
             else range(len(shapes)))
    pieces = []
    for i in order:
        H, W = shapes[i]
        L = H * W
        Lp = _pad_to(L, mega)
        m = np.zeros(Lp, bool)
        m[:L] = True
        pieces.append(
            m.reshape(Lp // mega, 128, T).transpose(0, 2, 1).reshape(Lp))
    return np.concatenate(pieces)


def cross_merge_multiscale_tokens_2dir_il(
    y_fwd: jnp.ndarray, y_rev: jnp.ndarray,
    shapes: Sequence[Tuple[int, int]], mega: int,
) -> List[jnp.ndarray]:
    """Interleaved counterpart of cross_merge_multiscale_tokens_2dir:
    y_fwd/y_rev are (B, 2, C, Lp_cat) scan outputs in IL lane order (fwd =
    forward scale order, rev = reversed scale order). Returns per-scale
    natural token tensors [(B, L_i, C)] summed over the 4 directions."""
    B, _, C, _ = y_fwd.shape
    l_pad = [_pad_to(h * w, mega) for h, w in shapes]
    off_f = [0]
    for l in l_pad:
        off_f.append(off_f[-1] + l)
    off_r = {}
    pos = 0
    for i in range(len(shapes) - 1, -1, -1):
        off_r[i] = pos
        pos += l_pad[i]
    out = []
    for i, (H, W) in enumerate(shapes):
        L = H * W
        sf = slice(off_f[i], off_f[i + 1])
        sr = slice(off_r[i], off_r[i] + l_pad[i])
        yf = deinterleave_to_tokens(y_fwd[..., sf], mega, L)  # (B,2,L,C)
        yr = deinterleave_to_tokens(y_rev[..., sr], mega, L)
        row = yf[:, 0] + yr[:, 0]                             # (B, L, C)
        colseq = yf[:, 1] + yr[:, 1]                          # col-major order
        col = jnp.transpose(colseq.reshape(B, W, H, C), (0, 2, 1, 3)
                            ).reshape(B, L, C)
        out.append(row + col)
    return out


def cross_scan_2d(x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, C) -> (B, 4, C, L) in the 4 scan orders.

    Each direction is composed as flip-then-transpose directly on x so XLA
    fuses it into ONE strided copy per direction (a separate flip over the
    stacked (B, 2, C, L) result costs an extra full-tensor HBM pass).
    Reversing the flattened row-major sequence == reversing both spatial
    axes before flattening: flip(reshape(x)) == reshape(x[::-1, ::-1])."""
    B, H, W, C = x.shape
    xr = x[:, ::-1, ::-1, :]
    d0 = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, C, H * W)   # row-major
    d1 = jnp.transpose(x, (0, 3, 2, 1)).reshape(B, C, H * W)   # col-major
    d2 = jnp.transpose(xr, (0, 3, 1, 2)).reshape(B, C, H * W)  # rev row-major
    d3 = jnp.transpose(xr, (0, 3, 2, 1)).reshape(B, C, H * W)  # rev col-major
    return jnp.stack([d0, d1, d2, d3], axis=1)                 # (B,4,C,L)


def cross_merge_2d(ys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """ys: (B, 4, C, L) per-direction scan outputs -> merged (B, C, L)
    (sum after inverting each direction's layout). Each inverse is a pure
    index permutation composed directly into the sum so XLA's loop fusion
    reads all four layouts without materializing intermediates."""
    B, K, C, L = ys.shape
    y0 = ys[:, 0].reshape(B, C, H, W)
    y1 = jnp.transpose(ys[:, 1].reshape(B, C, W, H), (0, 1, 3, 2))
    y2 = ys[:, 2].reshape(B, C, H, W)[:, :, ::-1, ::-1]
    y3 = jnp.transpose(ys[:, 3].reshape(B, C, W, H), (0, 1, 3, 2)
                       )[:, :, ::-1, ::-1]
    return (y0 + y1 + y2 + y3).reshape(B, C, L)


def cross_scan_multiscale(
    xs: Sequence[jnp.ndarray], pad_to: int = 0
) -> Tuple[jnp.ndarray, List[int]]:
    """xs: list of (B, H_i, W_i, C) feature maps. Returns
    ((B, 4, C, L_cat), [L_i]) with each direction built per scale and scales
    concatenated along L — the reference's "implicit causality across scales"
    (MambaSkip.py:414-422: flips are *per scale*, not over the concat).

    pad_to > L_cat appends an all-zero tail inside the same concat (free
    compared to a separate pad copy) so the selective-scan kernel's own
    pad/slice becomes a no-op (see selective_scan_pallas.padded_scan_len);
    the tail sits after every real scale, so the causal scan's real region
    is unaffected and cross_merge_multiscale never reads it."""
    parts = [cross_scan_2d(x) for x in xs]
    l_split = [x.shape[1] * x.shape[2] for x in xs]
    l_cat = sum(l_split)
    if pad_to > l_cat:
        B, K, C, _ = parts[0].shape
        parts.append(jnp.zeros((B, K, C, pad_to - l_cat), parts[0].dtype))
    return jnp.concatenate(parts, axis=-1), l_split


def _dirs01(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-major and column-major layouts of (B, H, W, C) — the two
    UN-reversed scan orders. Directions 2/3 are their time reversals and
    are handled by the scan kernel's reverse=True index maps instead of
    explicit flip copies."""
    B, H, W, C = x.shape
    d0 = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, C, H * W)
    d1 = jnp.transpose(x, (0, 3, 2, 1)).reshape(B, C, H * W)
    return d0, d1


def cross_scan_multiscale_2dir(
    xs: Sequence[jnp.ndarray], pad_to: int = 0,
    reverse_scales: bool = False,
) -> Tuple[jnp.ndarray, List[int]]:
    """Two-layout variant of cross_scan_multiscale for kernel-folded
    direction reversal: returns ((B, 2, C, L_cat), [L_i]) holding only the
    row-major / col-major layouts per scale.

    reverse_scales=True concatenates the scales in REVERSED order: scanning
    that layout right-to-left (selective_scan reverse=True) visits scale 0
    first, each scale's tokens in reversed order — exactly the reference's
    direction-2/3 sequences (per-scale flips, scale order unchanged;
    MambaSkip.py:414-422) — with zero flip copies. The zero pad tail stays
    at the right end: the reverse kernel scans it first and it contributes
    zero state to the real region."""
    parts = [_dirs01(x) for x in xs]
    l_split = [x.shape[1] * x.shape[2] for x in xs]
    order = range(len(xs) - 1, -1, -1) if reverse_scales else range(len(xs))
    stacked = [jnp.stack(parts[i], axis=1) for i in order]   # (B,2,C,L_i)
    l_cat = sum(l_split)
    if pad_to > l_cat:
        B, K, C, _ = stacked[0].shape
        stacked.append(jnp.zeros((B, K, C, pad_to - l_cat),
                                 stacked[0].dtype))
    return jnp.concatenate(stacked, axis=-1), l_split


def cross_merge_multiscale_tokens_2dir(
    y_fwd: jnp.ndarray, y_rev: jnp.ndarray,
    shapes: Sequence[Tuple[int, int]], l_split: Sequence[int],
) -> List[jnp.ndarray]:
    """Merge for the 2-layout scheme: y_fwd holds directions 0/1 in the
    forward scale order, y_rev directions 2/3 in reversed scale order with
    outputs already in natural storage order (the reverse kernel writes
    y at the original positions). Per scale: sum the two row-major rows
    with the two un-transposed col-major rows. Returns [(B, L_i, C)]."""
    B, _, C, _ = y_fwd.shape
    off_f = [0]
    for l in l_split:
        off_f.append(off_f[-1] + l)
    off_r_end = [0]
    for l in reversed(l_split):
        off_r_end.append(off_r_end[-1] + l)
    # scale i sits at offset sum(l_split[i+1:]) in the reversed concat
    n_sc = len(l_split)
    out = []
    for i, (H, W) in enumerate(shapes):
        sf = slice(off_f[i], off_f[i + 1])
        r0 = off_r_end[n_sc - 1 - i]
        sr = slice(r0, r0 + l_split[i])
        row = y_fwd[:, 0, :, sf] + y_rev[:, 0, :, sr]        # (B, C, L_i)
        col = y_fwd[:, 1, :, sf] + y_rev[:, 1, :, sr]
        col = jnp.transpose(col.reshape(B, C, W, H), (0, 1, 3, 2)
                            ).reshape(B, C, H * W)
        out.append(jnp.swapaxes(row + col, 1, 2))            # (B, L_i, C)
    return out


def cross_merge_multiscale_tokens(
    ys: jnp.ndarray, shapes: Sequence[Tuple[int, int]], l_split: Sequence[int]
) -> List[jnp.ndarray]:
    """Like cross_merge_multiscale but returns per-scale TOKEN tensors
    [(B, L_i, C)] — callers whose downstream ops are token-pointwise
    (LayerNorm/Dense) apply them per scale, skipping the full-length fp32
    re-concat and (B, C, L) -> (B, L, C) swap (two whole-tensor HBM passes
    at MSMM sizes). Any pad tail after sum(l_split) is simply never read."""
    B, K, C, L = ys.shape
    offsets = [0]
    for l in l_split:
        offsets.append(offsets[-1] + l)
    out = []
    for i, (H, W) in enumerate(shapes):
        sl = slice(offsets[i], offsets[i + 1])
        merged = cross_merge_2d(ys[..., sl], H, W)          # (B, C, L_i)
        out.append(jnp.swapaxes(merged, 1, 2))              # (B, L_i, C)
    return out


def cross_merge_multiscale(
    ys: jnp.ndarray, shapes: Sequence[Tuple[int, int]], l_split: Sequence[int]
) -> jnp.ndarray:
    """ys: (B, 4, C, L_cat); shapes: [(H_i, W_i)]. Inverse of
    cross_scan_multiscale: per-scale inverse flip/transpose, then sum over
    directions (MambaSkip.py:454-473). Returns (B, C, L_cat)."""
    B, K, C, L = ys.shape
    offsets = [0]
    for l in l_split:
        offsets.append(offsets[-1] + l)
    merged = []
    for i, (H, W) in enumerate(shapes):
        sl = slice(offsets[i], offsets[i + 1])
        merged.append(cross_merge_2d(ys[..., sl], H, W))
    return jnp.concatenate(merged, axis=-1)


# ---------------------------------------------------------------------------
# direction-count ablations (reference csms6s.py:30-104
# CrossScan/Merge_Ab_{1,2}direction, selected by forward_type v31d/v32d/
# v051d/v052d in vmamba.py:452-456). K stays 4 so parameter shapes are
# unchanged; only the scanned sequences differ.
# ---------------------------------------------------------------------------

def cross_scan_1direction(x: jnp.ndarray) -> jnp.ndarray:
    """All 4 scan paths see the same row-major sequence."""
    B, H, W, C = x.shape
    hw = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, C, H * W)
    return jnp.broadcast_to(hw[:, None], (B, 4, C, H * W))


def cross_merge_1direction(ys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    return ys.sum(axis=1)


def cross_scan_2direction(x: jnp.ndarray) -> jnp.ndarray:
    """Paths 0/1 = row-major, paths 2/3 = reversed row-major."""
    B, H, W, C = x.shape
    hw = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, C, H * W)
    fwd = jnp.broadcast_to(hw[:, None], (B, 2, C, H * W))
    return jnp.concatenate([fwd, jnp.flip(fwd, axis=-1)], axis=1)


def cross_merge_2direction(ys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    return (ys[:, 0] + ys[:, 1]
            + jnp.flip(ys[:, 2], -1) + jnp.flip(ys[:, 3], -1))
