"""Pallas TPU kernel for the selective scan (Mamba S6 forward).

Why: the XLA chunked associative scan (ops/selective_scan.py) materializes
its (b, g, d, Lc, n) intermediates to HBM on every log-depth pass; at the
flagship MSMM shapes (b=32 tiles, g=4, d=96, L=19040, n=16) that measures
2.7 s per forward — 87% of the whole network. This kernel keeps each chunk's
scan entirely in VMEM: HBM traffic collapses to one read of u/delta/B/C and
one write of y.

Layout: grid (BG, L/Lc) with the L-chunk axis innermost (sequential); the
(n, d) recurrence state lives in a VMEM scratch that persists across chunk
steps. Within a chunk the first-order recurrence is solved by log-depth
doubling over the lane (time) axis using pltpu.roll + masking:
    a <- a * shift_k(a);  b <- b + a_orig * shift_k(b)
All arithmetic float32 (parity with the CUDA kernel's fp32 path).

Gradients: custom_vjp whose backward recomputes through the XLA
implementation (exact same math). Training speed is therefore unchanged;
inference takes the fast path. A fused Pallas backward is a follow-up.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the ops package re-exports the function under the submodule's name, so
# fetch the MODULE from sys.modules via a from-import
from mlagg_unet_tpu.ops.selective_scan import (
    selective_scan as _xla_selective_scan,
)


def _scan_kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, y_ref, h_scratch, *,
                 lc: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    u = u_ref[0].astype(jnp.float32)        # (d, Lc)
    dt = dt_ref[0].astype(jnp.float32)      # (d, Lc)  (bias+softplus applied)
    A = A_ref[0].astype(jnp.float32)        # (d, n)
    Bm = B_ref[0].astype(jnp.float32)       # (n, Lc)
    Cm = C_ref[0].astype(jnp.float32)       # (n, Lc)

    n = A.shape[1]
    d = A.shape[0]

    # (n, d, Lc) layout: time on lanes
    a = jnp.exp(dt[None, :, :] * jnp.swapaxes(A, 0, 1)[:, :, None])
    bx = (dt * u)[None, :, :] * Bm[:, None, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (n, d, lc), dimension=2)
    shift = 1
    while shift < lc:
        a_sh = pltpu.roll(a, shift, axis=2)
        b_sh = pltpu.roll(bx, shift, axis=2)
        valid = lane >= shift
        bx = jnp.where(valid, bx + a * b_sh, bx)
        a = jnp.where(valid, a * a_sh, a)
        shift *= 2

    # incorporate carry state from previous chunks
    h0 = h_scratch[:, :d]                    # (n, d)
    h = bx + a * h0[:, :, None]              # (n, d, Lc)

    y_ref[0] = jnp.sum(h * Cm[:, None, :], axis=0).astype(y_ref.dtype)
    h_scratch[:, :d] = h[:, :, lc - 1]


def _pallas_forward(u, delta, A, B, C, D, delta_bias, delta_softplus,
                    chunk_size):
    b, g, d, L = u.shape
    n = A.shape[-1]
    BG = b * g

    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, :, None]
    if delta_softplus:
        delta = jax.nn.softplus(delta)

    lc = min(chunk_size, max(128, 1))
    pad_l = (-L) % lc
    pad_d = (-d) % 8
    if pad_l or pad_d:
        # delta=0 on padded steps -> a=1, bx=0 (identity)
        u_p = jnp.pad(u, ((0, 0), (0, 0), (0, pad_d), (0, pad_l)))
        dt_p = jnp.pad(delta, ((0, 0), (0, 0), (0, pad_d), (0, pad_l)))
        B_p = jnp.pad(B, ((0, 0), (0, 0), (0, 0), (0, pad_l)))
        C_p = jnp.pad(C, ((0, 0), (0, 0), (0, 0), (0, pad_l)))
        A_p = jnp.pad(A, ((0, 0), (0, pad_d), (0, 0)))
    else:
        u_p, dt_p, B_p, C_p, A_p = u, delta, B, C, A
    dp = d + pad_d
    Lp = L + pad_l
    nchunks = Lp // lc

    u_f = u_p.reshape(BG, dp, Lp)
    dt_f = dt_p.reshape(BG, dp, Lp)
    B_f = B_p.astype(jnp.float32).reshape(BG, n, Lp)
    C_f = C_p.astype(jnp.float32).reshape(BG, n, Lp)
    A_f = jnp.broadcast_to(A_p.astype(jnp.float32)[None], (b, g, dp, n)
                           ).reshape(BG, dp, n)

    grid = (BG, nchunks)
    y = pl.pallas_call(
        functools.partial(_scan_kernel, lc=lc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dp, lc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, dp, lc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, dp, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, lc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, n, lc), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, dp, lc), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((BG, dp, Lp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, max(dp, 128)), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(u_f, dt_f, A_f, B_f, C_f)

    y = y.reshape(b, g, dp, Lp)[:, :, :d, :L]
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :, :, None] * u[:, :, :d, :L]
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _selective_scan_pallas(u, delta, A, B, C, D, delta_bias,
                           delta_softplus, chunk_size):
    return _pallas_forward(u, delta, A, B, C, D, delta_bias,
                           delta_softplus, chunk_size)


def _fwd(u, delta, A, B, C, D, delta_bias, delta_softplus, chunk_size):
    y = _pallas_forward(u, delta, A, B, C, D, delta_bias, delta_softplus,
                        chunk_size)
    return y, (u, delta, A, B, C, D, delta_bias)


def _bwd(delta_softplus, chunk_size, res, gy):
    u, delta, A, B, C, D, delta_bias = res
    has_D = D is not None
    has_bias = delta_bias is not None

    def f(u_, delta_, A_, B_, C_, D_, bias_):
        return _xla_selective_scan(
            u_, delta_, A_, B_, C_,
            D_ if has_D else None, bias_ if has_bias else None,
            delta_softplus=delta_softplus, chunk_size=chunk_size,
        )

    _, vjp = jax.vjp(f, u, delta, A, B, C, D, delta_bias)
    return vjp(gy)


_selective_scan_pallas.defvjp(_fwd, _bwd)


def selective_scan_pallas(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = False,
    chunk_size: int = 256,
) -> jnp.ndarray:
    """Same contract as ops.selective_scan.selective_scan:
    u/delta (b,g,d,l); A (g,d,n); B/C (b,g,n,l); D/delta_bias (g,d)."""
    return _selective_scan_pallas(u, delta, A, B, C, D, delta_bias,
                                  delta_softplus, chunk_size)
