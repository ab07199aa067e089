"""Fused InstanceNorm(+residual)(+LeakyReLU) Pallas kernel.

Why: the UNETR-head conv blocks (conv -> InstanceNorm -> lrelu chains at
full resolution, monai UnetResBlock semantics — reference
nnUNetTrainer_MLAgg_2D_dt_MS.py:1339-1358) dominate the non-scan forward
glue. XLA lowers each norm to a convert+reduce fusion (stats pass) plus a
separate normalize fusion plus a separate compare-select (lrelu) fusion:
~3 reads + 2-3 writes of the full-res tensor per norm, measured 1.6-2.2 ms
per stats fusion alone at (20, 256, 224, 48) on v5e — >10x the bandwidth
roofline. This kernel does the whole norm(+norm'd/raw residual add)(+lrelu)
chain in TWO passes over HBM (one stats read, one fused
normalize-add-act read+write), fp32 arithmetic in VMEM, I/O in the model
dtype.

Measured outcome (2026-08-21 A/B on v5e, flagship sliding-window bench):
the kernel LOSES end-to-end — 0.992 vol/s fused vs 1.1727 unfused —
because splitting the chain out of XLA's surrounding fusions costs more
than the norm passes save. Default OFF (see fused_norms_enabled); kept
as a tested opt-in for future tile-geometry tuning.

Training: the op carries a custom_vjp whose backward recomputes the
functional (flax GroupNorm-equivalent) graph and differentiates it, so
gradients are numerically equivalent (fp32-rounding-level, measured ~3e-5
on scale/bias grads vs the flax GroupNorm path) to the unfused path and
the kernel is safe to use inside jitted train steps. Note the fused mode-1
residual add runs in fp32 where the unfused path adds post-cast.

Instance norm here == torch InstanceNorm2d/3d == flax GroupNorm with one
group per channel: per-(sample, channel) mean/var over ALL spatial
positions, var = E[x^2] - E[x]^2, fp32 stats.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_norms_enabled() -> bool:
    """Default OFF: the kernel is numerically equivalent and fully tested
    (tests/test_fused_norm.py) but measured SLOWER end-to-end than XLA's
    own norm fusions in the flagship inference bench — 0.992 vs 1.1727
    vol/s on v5e (2026-08-21 A/B, MLAGG_FUSED_IN=1 vs 0, same HEAD); it
    was the round-4 1.1879->1.0567 regression. Kept as an opt-in tuning
    vehicle (MLAGG_FUSED_IN=1 enables on any backend; interpret-mode
    Pallas off-TPU — slow, for CPU tests of the fused model branch)."""
    return os.environ.get("MLAGG_FUSED_IN", "0") == "1"


def _leaky(x):
    return jnp.where(x >= 0, x, 0.01 * x)


# ---------------------------------------------------------------- kernels
#
# Layout: XLA materializes NHWC conv outputs with minor-to-major
# (C, N, W, H) on TPU — i.e. physically (H*W, N, C) row-major with (N, C)
# on (sublane, lane). Blocking the kernel over a logical (S, N, C) view
# therefore streams contiguous HBM and the jnp transposes in the wrapper
# are layout bitcasts, not copies (a (N, S, C)-blocked first version cost
# ~6 ms of relayout copies per forward, measured on v5e).

def _stats_kernel(x_ref, o_ref, acc_ref, *, S: int, ts: int):
    """Accumulate per-lane [sum, sumsq] over spatial tiles.
    Grid (ceil(S/ts),); x block (ts, N*C); out (2, N*C) f32 revisited
    every step so it flushes once at the end."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xf = x_ref[...].astype(jnp.float32)                   # (ts, NC)
    if S % ts:
        limit = S - t * ts
        mask = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 0) < limit
        xf = jnp.where(mask, xf, 0.0)
    acc_ref[0:1] += jnp.sum(xf, axis=0, keepdims=True)
    acc_ref[1:2] += jnp.sum(xf * xf, axis=0, keepdims=True)
    o_ref[...] = acc_ref[...]


def _apply_kernel(*refs, S: int, eps: float, act: bool, res_mode: int):
    """normalize(+residual add)(+lrelu) in one read+write pass.
    res_mode: 0 = none, 1 = raw residual add, 2 = residual is normalized
    with its own (stats, scale, bias) before the add."""
    if res_mode == 2:
        x_ref, st_ref, s_ref, b_ref, r_ref, rst_ref, rs_ref, rb_ref, o_ref = refs
    elif res_mode == 1:
        x_ref, st_ref, s_ref, b_ref, r_ref, o_ref = refs
    else:
        x_ref, st_ref, s_ref, b_ref, o_ref = refs
    xf = x_ref[...].astype(jnp.float32)                   # (ts, NC)

    def norm(v, st_r, s_r, b_r):
        mean = st_r[0:1].astype(jnp.float32) / S          # (1, NC)
        var = st_r[1:2].astype(jnp.float32) / S - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        return ((v - mean) * inv * s_r[...].astype(jnp.float32)
                + b_r[...].astype(jnp.float32))

    y = norm(xf, st_ref, s_ref, b_ref)
    if res_mode == 2:
        y = y + norm(r_ref[...].astype(jnp.float32), rst_ref, rs_ref, rb_ref)
    elif res_mode == 1:
        y = y + r_ref[...].astype(jnp.float32)
    if act:
        y = _leaky(y)
    o_ref[...] = y.astype(o_ref.dtype)


# ------------------------------------------------------------- dispatch

def _pick_tile(S: int, NC: int, n_streams: int) -> Optional[int]:
    # keep the live fp32 working set well inside VMEM; None = even the
    # minimum tile would blow the budget (caller falls back to the
    # functional path instead of risking a VMEM OOM)
    ts = 1024
    budget = 8 * 1024 * 1024
    lanes = -(-NC // 128) * 128
    while ts > 8 and (ts > S or ts * lanes * 4 * n_streams > budget):
        ts //= 2
    if ts * lanes * 4 * n_streams > budget:
        return None
    return ts


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _stats(xt: jnp.ndarray, ts: int) -> jnp.ndarray:
    """xt: (S, N*C) -> (2, N*C) f32 [sum, sumsq] per lane."""
    S, NC = xt.shape
    nt = pl.cdiv(S, ts)
    return pl.pallas_call(
        functools.partial(_stats_kernel, S=S, ts=ts),
        grid=(nt,),
        in_specs=[pl.BlockSpec((ts, NC), lambda t: (t, 0))],
        out_specs=pl.BlockSpec((2, NC), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, NC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, NC), jnp.float32)],
        interpret=_interpret(),
    )(xt)


def _fused_forward(x, scale, bias, residual, res_scale, res_bias,
                   act: bool, res_mode: int, eps: float):
    shape = x.shape
    N, C = shape[0], shape[-1]
    S = 1
    for d in shape[1:-1]:
        S *= d
    NC = N * C
    # (N, *spatial, C) -> (S, N*C): matches the physical TPU layout of
    # conv outputs (C minor, then N, then spatial), so this is a bitcast
    # (see module comment) AND packs (N, C) into one dense lane axis —
    # 960 lanes at flagship head shapes vs 48/128 + 20/32 tile padding
    # for a (ts, N, C)-blocked variant.
    xt = jnp.transpose(x.reshape(N, S, C), (1, 0, 2)).reshape(S, NC)

    def lanes(v):
        # per-channel param -> per-(n, c) lane vector, lane = n*C + c
        return jnp.tile(v.reshape(1, C), (1, N)).reshape(1, NC)

    n_streams = 3 if res_mode else 2
    ts = _pick_tile(S, NC, n_streams)
    if ts is None:
        return _functional(x, scale, bias, residual, res_scale, res_bias,
                           act, res_mode, eps)
    nt = pl.cdiv(S, ts)

    tmap = lambda t: (t, 0)
    cmap = lambda t: (0, 0)

    in_specs = [
        pl.BlockSpec((ts, NC), tmap),
        pl.BlockSpec((2, NC), cmap),
        pl.BlockSpec((1, NC), cmap),
        pl.BlockSpec((1, NC), cmap),
    ]
    operands = [xt, _stats(xt, ts), lanes(scale), lanes(bias)]
    if res_mode:
        rt = jnp.transpose(residual.reshape(N, S, C), (1, 0, 2)).reshape(S, NC)
        in_specs.append(pl.BlockSpec((ts, NC), tmap))
        operands.append(rt)
        if res_mode == 2:
            in_specs += [pl.BlockSpec((2, NC), cmap),
                         pl.BlockSpec((1, NC), cmap),
                         pl.BlockSpec((1, NC), cmap)]
            operands += [_stats(rt, ts), lanes(res_scale), lanes(res_bias)]

    out = pl.pallas_call(
        functools.partial(_apply_kernel, S=S, eps=eps, act=act,
                          res_mode=res_mode),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ts, NC), tmap),
        out_shape=jax.ShapeDtypeStruct((S, NC), x.dtype),
        interpret=_interpret(),
    )(*operands)
    return jnp.transpose(out.reshape(S, N, C), (1, 0, 2)).reshape(shape)


# ------------------------------------------------- functional reference

def _functional(x, scale, bias, residual, res_scale, res_bias,
                act: bool, res_mode: int, eps: float):
    """Exact flax-GroupNorm(num_groups=C)-equivalent graph; the
    custom_vjp backward differentiates THIS, so fused == unfused grads."""
    red = tuple(range(1, x.ndim - 1))

    def norm(v, s, b):
        vf = v.astype(jnp.float32)
        mean = jnp.mean(vf, axis=red, keepdims=True)
        var = jnp.mean(vf * vf, axis=red, keepdims=True) - mean * mean
        y = (vf - mean) * jax.lax.rsqrt(var + eps)
        return y * s.astype(jnp.float32) + b.astype(jnp.float32)

    y = norm(x, scale, bias)
    if res_mode == 2:
        y = y + norm(residual, res_scale, res_bias)
    elif res_mode == 1:
        y = y + residual.astype(jnp.float32)
    if act:
        y = _leaky(y)
    return y.astype(x.dtype)


# ------------------------------------------------------------ custom vjp

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _fused_norm_op(x, scale, bias, residual, res_scale, res_bias,
                   act, res_mode, eps):
    return _fused_forward(x, scale, bias, residual, res_scale, res_bias,
                          act, res_mode, eps)


def _op_fwd(x, scale, bias, residual, res_scale, res_bias,
            act, res_mode, eps):
    out = _fused_forward(x, scale, bias, residual, res_scale, res_bias,
                         act, res_mode, eps)
    return out, (x, scale, bias, residual, res_scale, res_bias)


def _op_bwd(act, res_mode, eps, res, g):
    x, scale, bias, residual, res_scale, res_bias = res
    _, vjp = jax.vjp(
        lambda *a: _functional(*a, act=act, res_mode=res_mode, eps=eps),
        x, scale, bias, residual, res_scale, res_bias)
    return vjp(g)


_fused_norm_op.defvjp(_op_fwd, _op_bwd)


# ---------------------------------------------------------------- public

def fused_instance_norm(x, scale, bias, *,
                        act: bool = False,
                        residual: Optional[jnp.ndarray] = None,
                        res_scale: Optional[jnp.ndarray] = None,
                        res_bias: Optional[jnp.ndarray] = None,
                        eps: float = 1e-5):
    """InstanceNorm(x)*scale+bias [+ InstanceNorm(residual)*rs+rb | + residual]
    [lrelu 0.01], one fused HBM pass for everything after the stats read.

    x: (N, *spatial, C). Returns x.shape in x.dtype. Differentiable; the
    backward matches the functional graph exactly (recompute-based vjp).
    """
    if residual is None:
        res_mode = 0
        residual = x[..., :1]          # dummy, unused
        res_scale = res_bias = scale[:1]
    elif res_scale is None:
        res_mode = 1
        res_scale = res_bias = scale[:1]
    else:
        res_mode = 2
    return _fused_norm_op(x, scale, bias, residual, res_scale, res_bias,
                          act, res_mode, eps)


def functional_instance_norm(x, scale, bias, *,
                             act: bool = False,
                             residual: Optional[jnp.ndarray] = None,
                             res_scale: Optional[jnp.ndarray] = None,
                             res_bias: Optional[jnp.ndarray] = None,
                             eps: float = 1e-5):
    """Unfused reference path with the same signature (CPU / tests)."""
    if residual is None:
        res_mode = 0
    elif res_scale is None:
        res_mode = 1
    else:
        res_mode = 2
    return _functional(x, scale, bias, residual, res_scale, res_bias,
                       act, res_mode, eps)
