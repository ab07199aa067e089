"""Fused MLLA block tail: gate-mul -> out_proj -> +residual -> LayerNorm
-> MLP -> +residual in ONE Pallas kernel.

Why: the flagship forward is HBM-bound in block glue (census r4:
~55 GB accessed/forward at batch 20, ~775 GB/s effective = at roofline).
XLA materializes every matmul/norm output of the block tail to HBM
(~6 full-size tensors per block). This kernel keeps them all in VMEM:
HBM traffic becomes 3 reads + 1 write of (tokens, C).

Semantics: token-pointwise, so the kernel grids over token blocks.
Arithmetic is fp32 in VMEM regardless of I/O dtype (a bf16 model pays
no precision cost vs the reference's AMP-fp16 tail). The unfused
reference path (mlla.py) remains the training/CPU implementation; the
kernel is inference-only (no custom_vjp needed) and equivalence is
tested in tests/test_mlla_fused.py.

Reference semantics: nnUNetTrainer_MLAgg_2D_dt_MS.py:877-911 (out_proj
gating + residual + norm2 + Mlp).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7):
    Mosaic implements neither erf nor erfc, but exp it has. The 1e-7
    error is far below the kernel's bf16 I/O quantization."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # torch.nn.GELU default == exact erf form (same math as
    # models.layers.gelu)
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _tail_kernel(h_ref, a_ref, s_ref, wo_ref, bo_ref, g_ref, be_ref,
                 w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, eps: float):
    h = h_ref[...].astype(jnp.float32)          # (T, C)
    a = a_ref[...].astype(jnp.float32)
    s = s_ref[...].astype(jnp.float32)
    wo = wo_ref[...].astype(jnp.float32)        # (C, C)
    bo = bo_ref[...].astype(jnp.float32)        # (1, C)

    x2 = s + jax.lax.dot_general(
        h * a, wo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo

    mu = jnp.mean(x2, axis=-1, keepdims=True)
    var = jnp.mean(x2 * x2, axis=-1, keepdims=True) - mu * mu
    g = g_ref[...].astype(jnp.float32)
    be = be_ref[...].astype(jnp.float32)
    y = (x2 - mu) * jax.lax.rsqrt(var + eps) * g + be

    z = jax.lax.dot_general(
        y, w1_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...].astype(jnp.float32)
    z = _gelu_exact(z)
    out = x2 + jax.lax.dot_general(
        z, w2_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _front_kernel(x_ref, g_ref, be_ref, wa_ref, ba_ref, wi_ref, bi_ref,
                  a_ref, h_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)           # (T, C)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + be_ref[...].astype(jnp.float32)

    a = jax.lax.dot_general(
        y, wa_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + ba_ref[...].astype(jnp.float32)
    a_ref[...] = (a * jax.nn.sigmoid(a)).astype(a_ref.dtype)   # silu
    h = jax.lax.dot_general(
        y, wi_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bi_ref[...].astype(jnp.float32)
    h_ref[...] = h.astype(h_ref.dtype)


def mlla_block_front_fused(x, ln_scale, ln_bias, wa, ba, wi, bi,
                           eps: float = 1e-6, block_tokens: int = 512):
    """norm1 -> (silu(act_proj), in_proj) in one HBM pass.
    x: (B, N, C) -> (a, h) each (B, N, C) in x's dtype."""
    B, N, C = x.shape
    tok = B * N
    T = block_tokens
    while T > 128 and T * C * 5 * 4 > 6 * 1024 * 1024:
        T //= 2
    pad = (-tok) % T
    xf = x.reshape(tok, C)
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    n_blocks = (tok + pad) // T

    def tmap(i):
        return (i, 0)

    def wmap(i):
        return (0, 0)

    a, h = pl.pallas_call(
        functools.partial(_front_kernel, eps=eps),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((T, C), tmap),
            pl.BlockSpec((1, C), wmap),
            pl.BlockSpec((1, C), wmap),
            pl.BlockSpec((C, C), wmap),
            pl.BlockSpec((1, C), wmap),
            pl.BlockSpec((C, C), wmap),
            pl.BlockSpec((1, C), wmap),
        ],
        out_specs=(pl.BlockSpec((T, C), tmap), pl.BlockSpec((T, C), tmap)),
        out_shape=(jax.ShapeDtypeStruct((tok + pad, C), x.dtype),
                   jax.ShapeDtypeStruct((tok + pad, C), x.dtype)),
        interpret=jax.default_backend() != "tpu",
    )(xf, ln_scale.reshape(1, C), ln_bias.reshape(1, C), wa,
      ba.reshape(1, C), wi, bi.reshape(1, C))
    return a[:tok].reshape(B, N, C), h[:tok].reshape(B, N, C)


def fused_tail_enabled() -> bool:
    return (os.environ.get("MLAGG_FUSED_TAIL", "1") != "0"
            and jax.default_backend() == "tpu")


def mlla_block_tail_fused(h_att, act_res, shortcut, wo, bo, ln_scale,
                          ln_bias, w1, b1, w2, b2, eps: float = 1e-6,
                          block_tokens: int = 512):
    """h_att/act_res/shortcut: (B, N, C). Returns (B, N, C) in the input
    dtype. fp32 arithmetic in VMEM; one HBM write."""
    B, N, C = h_att.shape
    hidden = w1.shape[-1]
    tok = B * N

    # pick T so the ~6 live (T, C)+(T, hidden) fp32 tensors fit VMEM
    T = block_tokens
    while T > 128 and T * (C * 4 + hidden * 3) * 4 > 6 * 1024 * 1024:
        T //= 2
    pad = (-tok) % T

    def flat(x):
        x = x.reshape(tok, C)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
        return x

    hf, af, sf = flat(h_att), flat(act_res), flat(shortcut)
    n_blocks = (tok + pad) // T

    def tmap(i):
        return (i, 0)

    def wmap(i):
        return (0, 0)

    out = pl.pallas_call(
        functools.partial(_tail_kernel, eps=eps),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((T, C), tmap),
            pl.BlockSpec((T, C), tmap),
            pl.BlockSpec((T, C), tmap),
            pl.BlockSpec((C, C), wmap),
            pl.BlockSpec((1, C), wmap),
            pl.BlockSpec((1, C), wmap),
            pl.BlockSpec((1, C), wmap),
            pl.BlockSpec((C, hidden), wmap),
            pl.BlockSpec((1, hidden), wmap),
            pl.BlockSpec((hidden, C), wmap),
            pl.BlockSpec((1, C), wmap),
        ],
        out_specs=pl.BlockSpec((T, C), tmap),
        out_shape=jax.ShapeDtypeStruct((tok + pad, C), h_att.dtype),
        interpret=jax.default_backend() != "tpu",
    )(hf, af, sf, wo, bo.reshape(1, C), ln_scale.reshape(1, C),
      ln_bias.reshape(1, C), w1, b1.reshape(1, hidden), w2,
      b2.reshape(1, C))
    return out[:tok].reshape(B, N, C)
