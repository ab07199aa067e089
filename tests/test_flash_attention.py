"""Flash attention kernel vs. naive softmax attention (the reference's
commented diff_attn fallback math gives the required semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlagg_unet_tpu.ops.flash_attention import (
    _flash_attention_pallas,
    attention_reference,
    flash_attention,
)


def make_qkv(rng, b=2, h=3, lq=64, lk=48, dk=16, dv=32):
    q = rng.randn(b, h, lq, dk).astype(np.float32)
    k = rng.randn(b, h, lk, dk).astype(np.float32)
    v = rng.randn(b, h, lk, dv).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_pallas_matches_reference(rng):
    q, k, v = make_qkv(rng)
    ref = attention_reference(q, k, v)
    out = _flash_attention_pallas(q, k, v, 1.0 / np.sqrt(q.shape[-1]), 32, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ragged_key_length(rng):
    # lk not a multiple of block_k: padded keys must not leak into softmax
    q, k, v = make_qkv(rng, lq=33, lk=19)
    ref = attention_reference(q, k, v)
    out = _flash_attention_pallas(q, k, v, 1.0 / np.sqrt(q.shape[-1]), 16, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_dk_neq_dv(rng):
    q, k, v = make_qkv(rng, dk=8, dv=24)
    ref = attention_reference(q, k, v)
    out = _flash_attention_pallas(q, k, v, 1.0 / np.sqrt(q.shape[-1]), 32, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gradients(rng):
    q, k, v = make_qkv(rng, b=1, h=2, lq=16, lk=16, dk=8, dv=8)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def f_pallas(q, k, v):
        return _flash_attention_pallas(q, k, v, scale, 16, 16).sum()

    def f_ref(q, k, v):
        return attention_reference(q, k, v, scale).sum()

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_dispatcher_small_shapes_use_reference(rng):
    q, k, v = make_qkv(rng, lq=8, lk=8)
    out = flash_attention(q, k, v)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_softmax_numerics_large_logits(rng):
    q, k, v = make_qkv(rng, lq=32, lk=32, dk=16, dv=16)
    q = q * 30.0  # large logits stress the online softmax
    ref = attention_reference(q, k, v)
    out = _flash_attention_pallas(q, k, v, 1.0 / np.sqrt(16), 16, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
