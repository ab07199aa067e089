"""Selective scan numerics: chunked associative scan vs. step-by-step
recurrence (the ground truth the CUDA kernel implements)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlagg_unet_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_flat,
    selective_scan_seq_ref,
)


def make_inputs(rng, b=2, g=4, d=6, n=8, l=37):
    u = rng.randn(b, g, d, l).astype(np.float32)
    delta = rng.randn(b, g, d, l).astype(np.float32) * 0.5
    A = -np.exp(rng.randn(g, d, n).astype(np.float32) * 0.3)
    B = rng.randn(b, g, n, l).astype(np.float32)
    C = rng.randn(b, g, n, l).astype(np.float32)
    D = rng.randn(g, d).astype(np.float32)
    delta_bias = rng.randn(g, d).astype(np.float32) * 0.1
    return u, delta, A, B, C, D, delta_bias


def test_matches_sequential_reference(rng):
    args = make_inputs(rng)
    y_ref = selective_scan_seq_ref(*args, delta_softplus=True)
    y = selective_scan(*args, delta_softplus=True, chunk_size=16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


def test_chunk_size_invariance(rng):
    args = make_inputs(rng, l=53)
    y1 = selective_scan(*args, delta_softplus=True, chunk_size=8)
    y2 = selective_scan(*args, delta_softplus=True, chunk_size=64)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5, atol=2e-5)


def test_no_optional_args(rng):
    u, delta, A, B, C, D, delta_bias = make_inputs(rng, l=20)
    y_ref = selective_scan_seq_ref(u, delta, A, B, C)
    y = selective_scan(u, delta, A, B, C, chunk_size=7)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


def test_gradients_match_reference(rng):
    args = make_inputs(rng, b=1, g=2, d=3, n=4, l=19)

    def loss_fast(u, delta, A, B, C, D, dbias):
        return selective_scan(
            u, delta, A, B, C, D, dbias, delta_softplus=True, chunk_size=8
        ).sum()

    def loss_ref(u, delta, A, B, C, D, dbias):
        return selective_scan_seq_ref(
            u, delta, A, B, C, D, dbias, delta_softplus=True
        ).sum()

    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    for gf, gr in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4)


def test_flat_calling_convention(rng):
    b, k, d, n, l = 2, 4, 5, 6, 23
    u = rng.randn(b, k * d, l).astype(np.float32)
    delta = rng.randn(b, k * d, l).astype(np.float32)
    A = -np.exp(rng.randn(k * d, n).astype(np.float32) * 0.2)
    B = rng.randn(b, k, n, l).astype(np.float32)
    C = rng.randn(b, k, n, l).astype(np.float32)
    D = rng.randn(k * d).astype(np.float32)
    dbias = rng.randn(k * d).astype(np.float32)
    y = selective_scan_flat(u, delta, A, B, C, D, dbias, delta_softplus=True,
                            n_groups=k, chunk_size=8)
    assert y.shape == (b, k * d, l)
    y_ref = selective_scan_seq_ref(
        u.reshape(b, k, d, l), delta.reshape(b, k, d, l), A.reshape(k, d, n),
        B, C, D.reshape(k, d), dbias.reshape(k, d), delta_softplus=True,
    ).reshape(b, k * d, l)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


def test_state_decay_stability(rng):
    # long sequence, check no NaN/inf and fp32 output
    args = make_inputs(rng, b=1, g=1, d=2, n=4, l=1000)
    y = selective_scan(*args, delta_softplus=True, chunk_size=128)
    assert y.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(y)))
