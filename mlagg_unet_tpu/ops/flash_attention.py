"""Fused (flash) attention for TPU in Pallas.

Replaces the reference's ``flash_attn`` CUDA dependency (N3 in SURVEY.md):
the flagship AggregatedAttention pooled branch makes 4 flash_attn_func calls
per block (nnUNetTrainer_MLAgg_2D_dt_MS.py:745-751). Since the two calls per
query group share keys, we also support dk != dv so the pairs collapse to one
call each with v = concat(v1, v2) (the path the reference comments as "for
packages that support different qk/v dimensions", :738-740).

Forward: classic online-softmax streaming over key blocks, fp32 accumulators
in VMEM. Backward: custom_vjp that recomputes attention with the XLA
reference implementation (exact same math); a fused Pallas backward is a
later optimization — at flagship shapes the pooled Lk is tiny (< 128) so the
recompute is cheap.

Layout: (batch, heads, seqlen, head_dim) — heads fold into the grid batch dim.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Naive softmax attention, fp32 math. q: (b, h, lq, dk), k: (b, h, lk, dk),
    v: (b, h, lk, dv). mask: broadcastable to (b, h, lq, lk), True = masked out.
    Matches the reference's non-flash diff_attn fallback math
    (nnUNetTrainer_MLAgg_2D_dt_MS.py:762-777) up to the lambda combine, which
    callers do outside."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    # q/k/v stay in their storage dtype: the MXU multiplies bf16 operands
    # exactly into the f32 accumulator, so pre-upcasting changes nothing
    # numerically but makes XLA materialize full f32 copies of q/k (their
    # producer fusions absorb the convert — census_detail r4). The scores
    # s are f32 either way; p is cast to v's dtype for the second matmul,
    # mirroring the reference flash path's fp16 probabilities.
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
    ) * scale
    if mask is not None:
        s = jnp.where(mask, NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale: float, lk: int, block_k: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)          # (bq, dk)
    k = k_ref[0].astype(jnp.float32)          # (bk, dk)
    v = v_ref[0].astype(jnp.float32)          # (bk, dv)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                  # (bq, bk)

    # mask out zero-padded key tail
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < lk, s, NEG_INF)

    m_prev = m_ref[:, 0:1]                     # (bq, 1)
    l_prev = l_ref[:, 0:1]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_cur)
    alpha = jnp.exp(m_prev - m_cur)
    l_cur = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_cur, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_cur, l_ref.shape)

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:, 0:1]).astype(o_ref.dtype)


def _interpret_mode() -> bool:
    # off-TPU (tests on the virtual CPU mesh) the Mosaic kernel can't compile;
    # interpret mode preserves exact fp32 semantics
    return jax.default_backend() != "tpu"


def _flash_forward(q, k, v, scale, block_q, block_k):
    b, h, lq, dk = q.shape
    lk = k.shape[2]
    dv = v.shape[-1]

    bq = min(block_q, max(8, lq))
    bk = min(block_k, max(8, lk))

    pad_q = (-lq) % bq
    pad_k = (-lk) % bk
    qf = q.reshape(b * h, lq, dk)
    kf = k.reshape(b * h, lk, dk)
    vf = v.reshape(b * h, lk, dv)
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))
    lq_p, lk_p = lq + pad_q, lk + pad_k

    grid = (b * h, lq_p // bq, lk_p // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, lk=lk, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dk), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, bk, dk), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, bk, dv), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, dv), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(qf, kf, vf)
    return out[:, :lq].reshape(b, h, lq, dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_pallas(q, k, v, scale, block_q, block_k):
    return _flash_forward(q, k, v, scale, block_q, block_k)


def _flash_fwd(q, k, v, scale, block_q, block_k):
    return _flash_forward(q, k, v, scale, block_q, block_k), (q, k, v)


def _flash_bwd(scale, block_q, block_k, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_reference(q_, k_, v_, scale), q, k, v)
    return vjp(g)


_flash_attention_pallas.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused non-causal attention. q: (b, h, lq, dk), k: (b, h, lk, dk),
    v: (b, h, lk, dv) with dk possibly != dv. Returns (b, h, lq, dv).

    use_pallas=None auto-dispatches: the Pallas kernel pays off when the
    score matrix is big; tiny pooled-branch shapes run the fused-by-XLA
    reference path (same math, same dtype discipline).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if use_pallas is None:
        on_tpu = jax.default_backend() == "tpu"
        # flash pays off only when the KV axis is long enough that the
        # streaming kernel saves real memory traffic; for the flagship's
        # pooled branch (lk <= 56) the (lq, lk) score matrix is tiny and
        # the fused-by-XLA einsum path wins. Measured on v5e (r3): XLA
        # fuses the whole short-KV attention into one pass (0.08 ms at
        # lq=14336, lk=56 vs 0.45 ms for a single-pass VMEM-resident
        # Pallas kernel; model forward 135.6 -> 140.1 ms with the kernel
        # dispatched) — do NOT add a small-KV kernel here, it loses.
        use_pallas = (on_tpu and k.shape[2] >= 512
                      and q.shape[2] * k.shape[2] >= 256 * 256)
    if not use_pallas:
        return attention_reference(q, k, v, scale)
    return _flash_attention_pallas(q, k, v, scale, block_q, block_k)
