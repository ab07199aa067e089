"""Fused local-window aggregated attention (the flagship's attn_local
branch) — one Pallas kernel per batch element.

The unfused path materializes ~8 full-size HBM tensors per block half
(q, k, v, 9-tap logits, softmax, diff-combine, apply, RMSNorm, LePE).
This kernel keeps the whole branch VMEM-resident: HBM traffic is one
read of the input half-map and one write of the output half-map; the
q/kv projections, the 3x3 window attention with Differential-
Transformer lambda combine (reference nnUNetTrainer_MLAgg_2D_dt_MS.py
:625-717), the RMSNorm sublayer, and the LePE depthwise positional
term all run on row chunks in VMEM.

Mosaic constraints shaping the implementation:
  * the lane (minor = channel) axis cannot be reshaped/split in-kernel,
    so per-head reductions/broadcasts run as tiny MXU matmuls against
    static 0/1 segment matrices (head-sum: (T, ch) @ (ch, nh);
    head-broadcast: (T, nh) @ (nh, ch));
  * unrolled python loops keep every iteration's temporaries live on the
    VMEM stack, so row chunks iterate on a GRID axis with a two-PHASE
    sweep per batch element (phase 0 fills border-padded k/v VMEM
    scratch; phase 1 computes attention rows, slicing taps directly out
    of the padded scratch at dynamic offsets — no halo copies).

The softmax over the 9 window taps keeps a running max and normalizes
branch-separated numerator accumulators at the end — no (T, 9) score
matrix ever exists. Out-of-bounds taps are masked to -inf exactly like
the reference's unfold padding-mask; fp32 arithmetic in VMEM; the k/v
scratch uses the input dtype (bf16 in production — identical
quantization to the unfused bf16 path). Inference-only; the functional
flax path remains the training implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_OFFS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _local_attn_kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                       bv_ref, sub_ref, lw_ref, lb_ref, lam_ref,
                       seg0_ref, seg1_ref, segv_ref, bc_ref, o_ref,
                       k_scr, v_scr, *,
                       H: int, W: int, ch: int, nh: int,
                       lam_init: float, scale: float, rc: int):
    phase = pl.program_id(1)
    j = pl.program_id(2)
    r = j * rc
    T = rc * W

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(phase == 0, j == 0))
    def _():
        k_scr[:] = jnp.zeros_like(k_scr)
        v_scr[:] = jnp.zeros_like(v_scr)

    xs = x_ref[0].astype(jnp.float32).reshape(T, ch)

    @pl.when(phase == 0)
    def _():
        # fill the interior of the border-padded k/v scratch
        k = (mm(xs, wk_ref[...].astype(jnp.float32))
             + bk_ref[...].astype(jnp.float32))
        v = (mm(xs, wv_ref[...].astype(jnp.float32))
             + bv_ref[...].astype(jnp.float32))
        k_scr[pl.ds(r + 1, rc), 1:W + 1] = k.reshape(
            rc, W, ch).astype(k_scr.dtype)
        v_scr[pl.ds(r + 1, rc), 1:W + 1] = v.reshape(
            rc, W, ch).astype(v_scr.dtype)

    @pl.when(phase == 1)
    def _():
        lam = lam_ref[0, 0]
        seg0 = seg0_ref[...]      # (ch, nh) selects q1-branch channels
        seg1 = seg1_ref[...]      # (ch, nh) selects q2-branch channels
        q = (mm(xs, wq_ref[...].astype(jnp.float32))
             + bq_ref[...].astype(jnp.float32)) * scale

        idx = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        gr = r + idx // W
        gc = idx % W

        def tap(scr, dy, dx):
            t = scr[pl.ds(r + dy + 1, rc), 1 + dx:1 + dx + W]
            return t.astype(jnp.float32).reshape(T, ch)

        s0s, s1s = [], []
        m0 = jnp.full((T, nh), NEG_INF, jnp.float32)
        m1 = jnp.full((T, nh), NEG_INF, jnp.float32)
        for dy, dx in _OFFS:
            prod = q * tap(k_scr, dy, dx)
            valid = ((gr + dy >= 0) & (gr + dy < H)
                     & (gc + dx >= 0) & (gc + dx < W))
            s0 = jnp.where(valid, mm(prod, seg0), NEG_INF)   # (T, nh)
            s1 = jnp.where(valid, mm(prod, seg1), NEG_INF)
            s0s.append(s0)
            s1s.append(s1)
            m0 = jnp.maximum(m0, s0)
            m1 = jnp.maximum(m1, s1)

        bc = bc_ref[...]          # (nh, ch) head -> channel broadcast
        num0 = jnp.zeros((T, ch), jnp.float32)
        num1 = jnp.zeros((T, ch), jnp.float32)
        d0 = jnp.zeros((T, nh), jnp.float32)
        d1 = jnp.zeros((T, nh), jnp.float32)
        lep = jnp.broadcast_to(lb_ref[...].astype(jnp.float32), (T, ch))
        for i, (dy, dx) in enumerate(_OFFS):
            vtap = tap(v_scr, dy, dx)
            e0 = jnp.exp(s0s[i] - m0)                 # (T, nh)
            e1 = jnp.exp(s1s[i] - m1)
            d0 = d0 + e0
            d1 = d1 + e1
            num0 = num0 + mm(e0, bc) * vtap
            num1 = num1 + mm(e1, bc) * vtap
            lep = lep + lw_ref[i].astype(jnp.float32) * vtap

        out = num0 * mm(1.0 / d0, bc) - lam * (num1 * mm(1.0 / d1, bc))
        # RMSNorm over each head's 2hd channels (segment mean via matmul)
        ms = mm(out * out, segv_ref[...])             # (T, nh) means
        out = out * mm(jax.lax.rsqrt(ms + 1e-5), bc)
        out = out * sub_ref[...].astype(jnp.float32) * (1.0 - lam_init)
        o_ref[0] = (out + lep).reshape(rc, W, ch).astype(o_ref.dtype)


def local_aggregated_attention_fused(
    x, wq, bq, wkv, bkv, subln_scale, lepe_w, lepe_b, lam,
    nh: int, lam_init: float = 0.8, row_chunk: int = 4,
):
    """x: (B, H, W, ch) half-map. lepe_w: (3, 3, 1, ch) depthwise kernel;
    lam: () fp32 scalar (exp-lambda combine computed by the caller).
    Returns (B, H, W, ch) in x's dtype."""
    B, H, W, ch = x.shape
    hd = ch // nh // 2
    scale = hd ** -0.5
    rc = min(row_chunk, H)
    while H % rc:
        rc //= 2

    # static segment matrices: channel c belongs to q-group g = c // hd
    # (g = 2*head + branch) and to v-head c // (2*hd)
    cidx = np.arange(ch)
    g = cidx // hd
    seg0 = np.zeros((ch, nh), np.float32)
    seg1 = np.zeros((ch, nh), np.float32)
    seg0[g % 2 == 0, (g // 2)[g % 2 == 0]] = 1.0
    seg1[g % 2 == 1, (g // 2)[g % 2 == 1]] = 1.0
    vh = cidx // (2 * hd)
    segv = np.zeros((ch, nh), np.float32)
    segv[cidx, vh] = 1.0 / (2 * hd)                  # head mean
    bc = np.zeros((nh, ch), np.float32)
    bc[vh, cidx] = 1.0
    sub_t = jnp.tile(subln_scale.reshape(1, 2 * hd), (1, nh))  # (1, ch)

    kern = functools.partial(
        _local_attn_kernel, H=H, W=W, ch=ch, nh=nh,
        lam_init=lam_init, scale=scale, rc=rc)

    def cmap(i, p, j):
        return (i, j, 0, 0)

    def omap(i, p, j):
        # phase 0 parks on block 0 (no garbage flushes); phase 1 writes j
        return (i, j * p, 0, 0)

    def wmap2(i, p, j):
        return (0, 0)

    def wmap3(i, p, j):
        return (0, 0, 0)

    out = pl.pallas_call(
        kern,
        grid=(B, 2, H // rc),
        in_specs=[
            pl.BlockSpec((1, rc, W, ch), cmap),
            pl.BlockSpec((ch, ch), wmap2),
            pl.BlockSpec((1, ch), wmap2),
            pl.BlockSpec((ch, ch), wmap2),
            pl.BlockSpec((1, ch), wmap2),
            pl.BlockSpec((ch, ch), wmap2),
            pl.BlockSpec((1, ch), wmap2),
            pl.BlockSpec((1, ch), wmap2),
            pl.BlockSpec((9, 1, ch), wmap3),
            pl.BlockSpec((1, ch), wmap2),
            pl.BlockSpec((1, 1), wmap2),
            pl.BlockSpec((ch, nh), wmap2),
            pl.BlockSpec((ch, nh), wmap2),
            pl.BlockSpec((ch, nh), wmap2),
            pl.BlockSpec((nh, ch), wmap2),
        ],
        out_specs=pl.BlockSpec((1, rc, W, ch), omap),
        out_shape=jax.ShapeDtypeStruct((B, H, W, ch), x.dtype),
        # k/v scratch in the INPUT dtype: bf16 in production (the unfused
        # bf16 path quantizes k/v identically), f32 when the caller is f32
        # so the kernel matches the functional path to float roundoff.
        # +2 border rows/cols are zero-filled once per batch element.
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, ch), x.dtype),
            pltpu.VMEM((H + 2, W + 2, ch), x.dtype),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, wq, bq.reshape(1, ch), wkv[:, :ch], bkv[:ch].reshape(1, ch),
      wkv[:, ch:], bkv[ch:].reshape(1, ch), sub_t,
      lepe_w.reshape(9, 1, ch), lepe_b.reshape(1, ch),
      lam.reshape(1, 1).astype(jnp.float32),
      jnp.asarray(seg0), jnp.asarray(seg1), jnp.asarray(segv),
      jnp.asarray(bc))
    return out
