"""Pallas TPU kernels for the selective scan (Mamba S6), forward + backward.

Why: the XLA chunked associative scan (ops/selective_scan.py) materializes
its (b, g, d, Lc, n) intermediates to HBM on every log-depth pass; at the
flagship MSMM shapes (b=32 tiles, g=4, d=96, L=19040, n=16) that measures
2.7 s per forward — 87% of the whole network. These kernels keep each
chunk's scan entirely in VMEM: HBM traffic collapses to one read of the
operands and one write of the results (15x measured on the forward).

Forward: grid (BG, L/Lc) with the chunk axis innermost (sequential); the
(n, d) recurrence state persists in VMEM scratch; within a chunk the
first-order recurrence h_t = a_t h_{t-1} + b_t is solved by log-depth
doubling over the lane (time) axis via pltpu.roll + iota masking. The
kernel additionally emits each chunk's START state so the backward can
recompute h locally.

Backward: the adjoint of a linear recurrence is the REVERSED recurrence
    g_t = gy_t (x) C_t + a_{t+1} (.) g_{t+1}
so the same doubling machinery runs over time-flipped chunks iterated in
reverse grid order, with (a_first, g_first) of the later chunk carried in
scratch. Within a chunk, h is recomputed from the saved start state
(recompute-in-backward, exactly like the reference CUDA kernel), and all
gradient contractions (dB, dC, du, ddelta, dA) are fused in VMEM.

All arithmetic float32 (parity with the CUDA kernel's fp32 path).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _doubling_scan(a, b, lane, lc):
    """Cumulative first-order scan along the last (lane) axis:
    returns (a_cum, b_cum) with b_cum_k = sum_j (prod_{i>j..k} a_i) b_j and
    a_cum_k = prod_{0..k} a_i."""
    shift = 1
    while shift < lc:
        a_sh = pltpu.roll(a, shift, axis=2)
        b_sh = pltpu.roll(b, shift, axis=2)
        valid = lane >= shift
        b = jnp.where(valid, b + a * b_sh, b)
        a = jnp.where(valid, a * a_sh, a)
        shift *= 2
    return a, b


def _fwd_kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, y_ref, h0_ref,
                h_scratch, *, lc: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    u = u_ref[0].astype(jnp.float32)        # (d, Lc)
    dt = dt_ref[0].astype(jnp.float32)      # (d, Lc)  (bias+softplus applied)
    A = A_ref[0].astype(jnp.float32)        # (d, n)
    Bm = B_ref[0].astype(jnp.float32)       # (n, Lc)
    Cm = C_ref[0].astype(jnp.float32)       # (n, Lc)

    n, d = A.shape[1], A.shape[0]

    a = jnp.exp(dt[None, :, :] * jnp.swapaxes(A, 0, 1)[:, :, None])
    bx = (dt * u)[None, :, :] * Bm[:, None, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (n, d, lc), dimension=2)
    a_cum, b_cum = _doubling_scan(a, bx, lane, lc)

    h0 = h_scratch[:, :d]                    # (n, d) chunk-start state
    h0_ref[0, 0] = h0.astype(h0_ref.dtype)
    h = b_cum + a_cum * h0[:, :, None]       # (n, d, Lc)

    y_ref[0] = jnp.sum(h * Cm[:, None, :], axis=0).astype(y_ref.dtype)
    h_scratch[:, :d] = h[:, :, lc - 1]


def _bwd_kernel(u_ref, dt_ref, A_ref, B_ref, C_ref, gy_ref, h0_ref,
                du_ref, ddt_ref, dA_ref, dB_ref, dC_ref,
                carry_scratch, dA_scratch, *, lc: int):
    """Processes chunks in REVERSE time order (index_map flips j).
    carry_scratch: (2, n, d_pad) rows = (a_first, g_first) of the
    later-in-time chunk. dA accumulates across chunks in scratch."""
    j = pl.program_id(1)
    nchunks = pl.num_programs(1)

    u = u_ref[0].astype(jnp.float32)         # (d, Lc)
    dt = dt_ref[0].astype(jnp.float32)       # (d, Lc)
    A = A_ref[0].astype(jnp.float32)         # (d, n)
    Bm = B_ref[0].astype(jnp.float32)        # (n, Lc)
    Cm = C_ref[0].astype(jnp.float32)        # (n, Lc)
    gy = gy_ref[0].astype(jnp.float32)       # (d, Lc)
    h0 = h0_ref[0, 0].astype(jnp.float32)    # (n, d)

    n, d = A.shape[1], A.shape[0]
    At = jnp.swapaxes(A, 0, 1)               # (n, d)

    @pl.when(j == 0)
    def _():
        carry_scratch[:] = jnp.zeros_like(carry_scratch)
        dA_scratch[:] = jnp.zeros_like(dA_scratch)

    lane = jax.lax.broadcasted_iota(jnp.int32, (n, d, lc), dimension=2)

    # ---- recompute within-chunk a, bx, h from the saved start state
    a = jnp.exp(dt[None, :, :] * At[:, :, None])          # (n, d, Lc)
    s = dt * u                                             # (d, Lc)
    bx = s[None, :, :] * Bm[:, None, :]
    a_cum, b_cum = _doubling_scan(a, bx, lane, lc)
    h = b_cum + a_cum * h0[:, :, None]                     # h_t
    h_prev = pltpu.roll(h, 1, axis=2)
    h_prev = jnp.where(lane >= 1, h_prev, h0[:, :, None])  # h_{t-1}

    # ---- reverse scan for g_t = G_t + a_{t+1} g_{t+1}, in place (no flips:
    # Mosaic lacks a rev primitive) via right-to-left doubling
    G = gy[None, :, :] * Cm[:, None, :]                    # (n, d, Lc)
    a_next_first = carry_scratch[0, :, :d]                 # (n, d)
    g_next_first = carry_scratch[1, :, :d]
    m = pltpu.roll(a, lc - 1, axis=2)                      # m_t = a_{t+1}
    m = jnp.where(lane <= lc - 2, m, a_next_first[:, :, None])
    v = G
    shift = 1
    while shift < lc:
        m_sh = pltpu.roll(m, lc - shift, axis=2)
        v_sh = pltpu.roll(v, lc - shift, axis=2)
        valid = lane < lc - shift
        v = jnp.where(valid, v + m * v_sh, v)
        m = jnp.where(valid, m * m_sh, m)
        shift *= 2
    g = v + m * g_next_first[:, :, None]                   # (n, d, Lc)

    # save carry for the next (earlier) chunk
    carry_scratch[0, :, :d] = a[:, :, 0]
    carry_scratch[1, :, :d] = g[:, :, 0]

    # ---- gradient contractions
    da = g * h_prev                                        # (n, d, Lc)
    gB = jnp.sum(g * Bm[:, None, :], axis=0)               # (d, Lc)
    du_ref[0] = (dt * gB).astype(du_ref.dtype)
    ddt = u * gB + jnp.sum(da * a * At[:, :, None], axis=0)
    ddt_ref[0] = ddt.astype(ddt_ref.dtype)
    dB_ref[0] = jnp.sum(g * s[None, :, :], axis=1).astype(dB_ref.dtype)
    dC_ref[0] = jnp.sum(h * gy[None, :, :], axis=1).astype(dC_ref.dtype)
    dA_scratch[:, :d] += jnp.sum(da * a * dt[None, :, :], axis=2)

    @pl.when(j == nchunks - 1)
    def _():
        dA_ref[0] = jnp.swapaxes(dA_scratch[:, :d], 0, 1).astype(dA_ref.dtype)


def _prep_padded(u, delta, A, B, C, delta_bias, delta_softplus, chunk_size):
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
        u_p = jnp.pad(u, ((0, 0), (0, 0), (0, pad_d), (0, pad_l)))
        dt_p = jnp.pad(delta, ((0, 0), (0, 0), (0, pad_d), (0, pad_l)))
        B_p = jnp.pad(B, ((0, 0), (0, 0), (0, 0), (0, pad_l)))
        C_p = jnp.pad(C, ((0, 0), (0, 0), (0, 0), (0, pad_l)))
        A_p = jnp.pad(A, ((0, 0), (0, pad_d), (0, 0)))
    else:
        u_p, dt_p, B_p, C_p, A_p = u, delta, B, C, A
    dp, Lp = d + pad_d, L + pad_l
    nchunks = Lp // lc

    shapes = dict(b=b, g=g, d=d, L=L, n=n, BG=BG, dp=dp, Lp=Lp, lc=lc,
                  nchunks=nchunks)
    u_f = u_p.reshape(BG, dp, Lp)
    dt_f = dt_p.reshape(BG, dp, Lp)
    B_f = B_p.astype(jnp.float32).reshape(BG, n, Lp)
    C_f = C_p.astype(jnp.float32).reshape(BG, n, Lp)
    A_f = jnp.broadcast_to(A_p.astype(jnp.float32)[None], (b, g, dp, n)
                           ).reshape(BG, dp, n)
    return u_f, dt_f, A_f, B_f, C_f, shapes


def _interpret():
    return jax.default_backend() != "tpu"


def _pallas_forward(u, delta, A, B, C, D, delta_bias, delta_softplus,
                    chunk_size, with_states: bool = False):
    u_f, dt_f, A_f, B_f, C_f, s = _prep_padded(
        u, delta, A, B, C, delta_bias, delta_softplus, chunk_size)
    b, g, d, L, n = s["b"], s["g"], s["d"], s["L"], s["n"]
    BG, dp, Lp, lc, nchunks = s["BG"], s["dp"], s["Lp"], s["lc"], s["nchunks"]

    grid = (BG, nchunks)
    y, h0_states = pl.pallas_call(
        functools.partial(_fwd_kernel, lc=lc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dp, lc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, dp, lc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, dp, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, lc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, n, lc), lambda i, j: (i, 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, dp, lc), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, n, dp), lambda i, j: (i, j, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BG, dp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((BG, nchunks, n, dp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((n, max(dp, 128)), jnp.float32)],
        interpret=_interpret(),
    )(u_f, dt_f, A_f, B_f, C_f)

    y = y.reshape(b, g, dp, Lp)[:, :, :d, :L]
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :, :, None] \
            * u.astype(jnp.float32)
    if with_states:
        return y, h0_states
    return y


def _pallas_backward(u, delta, A, B, C, D, delta_bias, delta_softplus,
                     chunk_size, h0_states, gy):
    """Returns (du, ddelta, dA, dB, dC, dD, dbias) matching input shapes."""
    u_f, dt_f, A_f, B_f, C_f, s = _prep_padded(
        u, delta, A, B, C, delta_bias, delta_softplus, chunk_size)
    b, g, d, L, n = s["b"], s["g"], s["d"], s["L"], s["n"]
    BG, dp, Lp, lc, nchunks = s["BG"], s["dp"], s["Lp"], s["lc"], s["nchunks"]

    gy_f = gy.astype(jnp.float32)
    if Lp != L or dp != d:
        gy_f = jnp.pad(gy_f, ((0, 0), (0, 0), (0, dp - d), (0, Lp - L)))
    gy_f = gy_f.reshape(BG, dp, Lp)

    grid = (BG, nchunks)
    rev = nchunks - 1

    du_c, ddt_c, dA_c, dB_c, dC_c = pl.pallas_call(
        functools.partial(_bwd_kernel, lc=lc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dp, lc), lambda i, j: (i, 0, rev - j)),
            pl.BlockSpec((1, dp, lc), lambda i, j: (i, 0, rev - j)),
            pl.BlockSpec((1, dp, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, lc), lambda i, j: (i, 0, rev - j)),
            pl.BlockSpec((1, n, lc), lambda i, j: (i, 0, rev - j)),
            pl.BlockSpec((1, dp, lc), lambda i, j: (i, 0, rev - j)),
            pl.BlockSpec((1, 1, n, dp), lambda i, j: (i, rev - j, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, dp, lc), lambda i, j: (i, 0, rev - j)),
            pl.BlockSpec((1, dp, lc), lambda i, j: (i, 0, rev - j)),
            pl.BlockSpec((1, dp, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, lc), lambda i, j: (i, 0, rev - j)),
            pl.BlockSpec((1, n, lc), lambda i, j: (i, 0, rev - j)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BG, dp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((BG, dp, Lp), jnp.float32),
            jax.ShapeDtypeStruct((BG, dp, n), jnp.float32),
            jax.ShapeDtypeStruct((BG, n, Lp), jnp.float32),
            jax.ShapeDtypeStruct((BG, n, Lp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n, max(dp, 128)), jnp.float32),
            pltpu.VMEM((n, max(dp, 128)), jnp.float32),
        ],
        interpret=_interpret(),
    )(u_f, dt_f, A_f, B_f, C_f, gy_f, h0_states)

    uf32 = u.astype(jnp.float32)
    gyf32 = gy.astype(jnp.float32)

    du = du_c.reshape(b, g, dp, Lp)[:, :, :d, :L]
    ddt = ddt_c.reshape(b, g, dp, Lp)[:, :, :d, :L]
    dA_bg = dA_c.reshape(b, g, dp, n)[:, :, :d, :]
    dA = dA_bg.sum(0)                                       # (g, d, n)
    dB = dB_c.reshape(b, g, n, Lp)[..., :L]
    dC = dC_c.reshape(b, g, n, Lp)[..., :L]

    if D is not None:
        du = du + D.astype(jnp.float32)[None, :, :, None] * gyf32
        dD = jnp.sum(gyf32 * uf32, axis=(0, 3))             # (g, d)
    else:
        dD = None

    # chain ddelta through softplus(+bias)
    if delta_softplus:
        pre = delta.astype(jnp.float32)
        if delta_bias is not None:
            pre = pre + delta_bias.astype(jnp.float32)[None, :, :, None]
        ddelta = ddt * jax.nn.sigmoid(pre)
    else:
        ddelta = ddt
    dbias = (jnp.sum(ddelta, axis=(0, 3)) if delta_bias is not None else None)

    return (du.astype(u.dtype), ddelta.astype(delta.dtype),
            dA.astype(A.dtype), dB.astype(B.dtype), dC.astype(C.dtype),
            None if dD is None else dD.astype(D.dtype),
            None if dbias is None else dbias.astype(delta_bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _selective_scan_pallas(u, delta, A, B, C, D, delta_bias,
                           delta_softplus, chunk_size):
    return _pallas_forward(u, delta, A, B, C, D, delta_bias,
                           delta_softplus, chunk_size)


def _fwd(u, delta, A, B, C, D, delta_bias, delta_softplus, chunk_size):
    y, h0_states = _pallas_forward(u, delta, A, B, C, D, delta_bias,
                                   delta_softplus, chunk_size,
                                   with_states=True)
    return y, (u, delta, A, B, C, D, delta_bias, h0_states)


def _bwd(delta_softplus, chunk_size, res, gy):
    u, delta, A, B, C, D, delta_bias, h0_states = res
    return _pallas_backward(u, delta, A, B, C, D, delta_bias,
                            delta_softplus, chunk_size, h0_states, gy)


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
