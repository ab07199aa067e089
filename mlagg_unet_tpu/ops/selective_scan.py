"""Selective scan (Mamba S6 recurrence), TPU-native.

Replaces the reference's external CUDA kernels — ``mamba_ssm``'s
``selective_scan_fn`` (used by MambaSkip.py:18,167,407 and the U-Mamba
variants) and VMamba's ``selective_scan_cuda{,_core,_oflex}``
(vmamba/csms6s.py:219-280).

Math (per batch b, group g, channel d, state n, time l):
    delta  = softplus(delta_raw + delta_bias)          [if delta_softplus]
    a_l    = exp(delta_l * A)                          A < 0, shape (g,d,n)
    h_l    = a_l * h_{l-1} + delta_l * B_l * u_l       B_l shape (g,n) per l
    y_l    = sum_n C_l[n] * h_l[n] + D * u_l

TPU-first design: instead of a sequential per-step CUDA loop we use a
*chunked associative scan*: the first-order recurrence is associative under
    (a1, b1) . (a2, b2) = (a1*a2, b1*a2 + b2)
so each chunk runs a log-depth parallel scan (pure VPU work that XLA fuses),
and a tiny lax.scan carries the (b,g,d,n) state across chunks. Each chunk is
wrapped in jax.checkpoint, so the backward pass recomputes within-chunk
intermediates: peak memory is O(b*g*d*n*(L/chunk + chunk)) instead of
O(b*g*d*n*L) — same trick as the CUDA kernel's recompute-in-backward.

All scan arithmetic is float32 regardless of input dtype (the reference
force-casts to fp32 too, MambaSkip.py:437-443).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _softplus(x):
    return jax.nn.softplus(x)


def _match_vma(x, ref):
    """Give ``x`` the same varying-manual-axes type as ``ref``.

    Under ``shard_map`` (jax>=0.9 vma semantics), a ``lax.scan`` carry
    initialized with ``jnp.zeros`` is *unvarying* while the carry produced
    by the body (derived from sharded operands) is varying on the mesh
    axes — the scan then fails type-checking. ``jax.lax.pvary`` on the
    ref's vma set fixes the init; outside shard_map vma is empty and this
    is a no-op.
    """
    vma = getattr(jax.typeof(ref), "vma", None)
    if vma:
        if hasattr(jax.lax, "pcast"):
            x = jax.lax.pcast(x, tuple(vma), to="varying")
        else:
            x = jax.lax.pvary(x, tuple(vma))
    return x


def _prep(u, delta, A, B, C, D, delta_bias, delta_softplus):
    """Validate shapes and force fp32. Shapes:
    u, delta: (b, g, d, l); A: (g, d, n); B, C: (b, g, n, l);
    D: (g, d) or None; delta_bias: (g, d) or None.
    """
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)
    b, g, d, l = u.shape
    n = A.shape[-1]
    assert A.shape == (g, d, n), (A.shape, (g, d, n))
    assert B.shape == (b, g, n, l), (B.shape, (b, g, n, l))
    assert C.shape == (b, g, n, l)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, :, None]
    if delta_softplus:
        delta = _softplus(delta)
    return u, delta, A, B, C, D


def selective_scan_seq_ref(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = False,
) -> jnp.ndarray:
    """Step-by-step lax.scan reference (numerics ground truth for tests).
    Same contract as selective_scan. Do not use in hot paths."""
    u, delta, A, B, C, D = _prep(u, delta, A, B, C, D, delta_bias, delta_softplus)
    b, g, d, l = u.shape
    n = A.shape[-1]

    # time-major inputs for lax.scan
    u_t = jnp.moveaxis(u, -1, 0)          # (l, b, g, d)
    delta_t = jnp.moveaxis(delta, -1, 0)  # (l, b, g, d)
    B_t = jnp.moveaxis(B, -1, 0)          # (l, b, g, n)
    C_t = jnp.moveaxis(C, -1, 0)          # (l, b, g, n)

    def step(h, inp):
        u_l, delta_l, B_l, C_l = inp
        a = jnp.exp(delta_l[..., None] * A[None])             # (b,g,d,n)
        bx = (delta_l * u_l)[..., None] * B_l[:, :, None, :]  # (b,g,d,n)
        h = a * h + bx
        y = jnp.sum(h * C_l[:, :, None, :], axis=-1)          # (b,g,d)
        return h, y

    h0 = _match_vma(jnp.zeros((b, g, d, n), jnp.float32), u)
    _, ys = jax.lax.scan(step, h0, (u_t, delta_t, B_t, C_t))
    y = jnp.moveaxis(ys, 0, -1)  # (b,g,d,l)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :, :, None] * u
    return y


def _chunk_scan(h0, u_c, delta_c, B_c, C_c, A):
    """Scan one chunk. h0: (b,g,d,n); u_c/delta_c: (b,g,d,Lc);
    B_c/C_c: (b,g,n,Lc). Returns (h_last, y_c)."""
    a = jnp.exp(delta_c[..., None] * A[None, :, :, None, :])          # (b,g,d,Lc,n)
    bx = (delta_c * u_c)[..., None] * jnp.swapaxes(B_c, -1, -2)[:, :, None]  # (b,g,d,Lc,n)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, b_l * a_r + b_r

    a_cum, b_cum = jax.lax.associative_scan(combine, (a, bx), axis=3)
    h = b_cum + a_cum * h0[:, :, :, None, :]                           # (b,g,d,Lc,n)
    # contraction over n rides the MXU
    y_c = jnp.einsum("bgdln,bgnl->bgdl", h, C_c,
                     preferred_element_type=jnp.float32)
    return h[:, :, :, -1, :], y_c


@partial(jax.jit, static_argnames=("delta_softplus", "chunk_size",
                                   "reverse"))
def selective_scan(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = False,
    chunk_size: int = 256,
    reverse: bool = False,
) -> jnp.ndarray:
    """Chunked associative-scan selective scan (production path).

    u, delta: (b, g, d, l); A: (g, d, n) (negative); B, C: (b, g, n, l);
    D: (g, d) or None; delta_bias: (g, d) or None. Returns (b, g, d, l)
    fp32 (reference contract: the scan boundary stays fp32 even under AMP).
    reverse=True scans right-to-left in natural storage order (defined as
    flip -> scan -> flip; the Pallas kernel folds the flips into its index
    maps, this XLA fallback performs them explicitly).
    """
    if reverse:
        y = selective_scan(u[..., ::-1], delta[..., ::-1], A, B[..., ::-1],
                           C[..., ::-1], D, delta_bias, delta_softplus,
                           chunk_size)
        return y[..., ::-1]
    u, delta, A, B, C, D = _prep(u, delta, A, B, C, D, delta_bias, delta_softplus)
    b, g, d, l = u.shape
    n = A.shape[-1]

    lc = min(chunk_size, l)
    pad = (-l) % lc
    if pad:
        # delta=0 => a=1, bx=0: padded steps leave the state untouched
        u_p = jnp.pad(u, ((0, 0),) * 3 + ((0, pad),))
        delta_p = jnp.pad(delta, ((0, 0),) * 3 + ((0, pad),))
        B_p = jnp.pad(B, ((0, 0),) * 3 + ((0, pad),))
        C_p = jnp.pad(C, ((0, 0),) * 3 + ((0, pad),))
    else:
        u_p, delta_p, B_p, C_p = u, delta, B, C
    nchunks = (l + pad) // lc

    # chunk-major: (nchunks, ..., lc)
    def to_chunks(x):
        return jnp.moveaxis(
            x.reshape(*x.shape[:-1], nchunks, lc), -2, 0
        )

    u_ch, delta_ch, B_ch, C_ch = map(to_chunks, (u_p, delta_p, B_p, C_p))

    chunk_fn = jax.checkpoint(partial(_chunk_scan, A=A))

    def scan_body(h, inp):
        u_c, delta_c, B_c, C_c = inp
        h, y_c = chunk_fn(h, u_c, delta_c, B_c, C_c)
        return h, y_c

    h0 = _match_vma(jnp.zeros((b, g, d, n), jnp.float32), u)
    _, y_chunks = jax.lax.scan(scan_body, h0, (u_ch, delta_ch, B_ch, C_ch))
    y = jnp.moveaxis(y_chunks, 0, -2).reshape(b, g, d, l + pad)[..., :l]
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :, :, None] * u
    # y stays fp32: the reference deliberately keeps this boundary fp32 even
    # under AMP (MambaSkip.py:437,452,532-534 asserts out_y.dtype == float
    # before the 4-direction merge). The bf16-emission experiment saved only
    # ~0.4 ms/forward (y is ~150 MB of a ~57 GB forward) — not worth the
    # contract divergence.
    return y


def selective_scan_flat(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = True,
    chunk_size: int = 256,
    n_groups: int = 4,
) -> jnp.ndarray:
    """Drop-in for the reference calling convention
    (MambaSkip.py:445-451): u/delta (b, k*d, l), A (k*d, n), B/C (b, k, n, l),
    D (k*d,), delta_bias (k*d,). Returns (b, k*d, l) fp32 (the reference's
    scan-output contract; see selective_scan)."""
    b, kd, l = u.shape
    k = n_groups
    d = kd // k
    n = A.shape[-1]
    y = selective_scan(
        u.reshape(b, k, d, l),
        delta.reshape(b, k, d, l),
        A.reshape(k, d, n),
        B, C,
        None if D is None else D.reshape(k, d),
        None if delta_bias is None else delta_bias.reshape(k, d),
        delta_softplus=delta_softplus,
        chunk_size=chunk_size,
    )
    return y.reshape(b, kd, l)
