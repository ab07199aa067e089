"""Fused MLLA block tail (ops/mlla_fused.py) vs the functional
reference tail, and MLLABlock param-tree stability across the twins
refactor."""
import jax
import jax.numpy as jnp
import numpy as np

from mlagg_unet_tpu.ops.mlla_fused import mlla_block_tail_fused


def _reference_tail(h, a, s, wo, bo, g, be, w1, b1, w2, b2, eps=1e-6):
    x2 = s + (h * a) @ wo + bo
    xf = x2.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * g + be
    z = jax.nn.gelu(y @ w1 + b1, approximate=False)
    return x2 + (z @ w2 + b2).astype(x2.dtype)


def test_fused_tail_matches_reference_f32():
    rs = np.random.RandomState(0)
    B, N, C = 2, 300, 96  # N not a multiple of the token block: pad path
    h = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
    a = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
    s = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
    wo = jnp.asarray(rs.randn(C, C).astype(np.float32) * 0.05)
    bo = jnp.asarray(rs.randn(C).astype(np.float32) * 0.01)
    g = jnp.asarray(1 + 0.1 * rs.randn(C).astype(np.float32))
    be = jnp.asarray(0.1 * rs.randn(C).astype(np.float32))
    w1 = jnp.asarray(rs.randn(C, 2 * C).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rs.randn(2 * C).astype(np.float32) * 0.01)
    w2 = jnp.asarray(rs.randn(2 * C, C).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rs.randn(C).astype(np.float32) * 0.01)

    got = mlla_block_tail_fused(h, a, s, wo, bo, g, be, w1, b1, w2, b2)
    exp = _reference_tail(h, a, s, wo, bo, g, be, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               rtol=2e-5, atol=2e-5)


def test_mllablock_param_tree_matches_pre_refactor():
    """The twins must produce the exact nn.Dense/LayerNorm/Mlp tree the
    torch importer and old checkpoints expect."""
    from mlagg_unet_tpu.models.mlla import MLLABlock

    m = MLLABlock(num_heads=2, mlp_ratio=2.0, sr_ratio=8)
    x = jnp.zeros((1, 16, 16, 96), jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    assert set(params["out_proj"]) == {"kernel", "bias"}
    assert params["out_proj"]["kernel"].shape == (96, 96)
    assert set(params["norm2"]) == {"scale", "bias"}
    assert set(params["mlp"]) == {"Dense_0", "Dense_1"}
    assert params["mlp"]["Dense_0"]["kernel"].shape == (96, 192)
    assert params["mlp"]["Dense_1"]["kernel"].shape == (192, 96)


def test_fused_local_attention_matches_functional():
    """ops/mlla_attn_fused (interpret mode off-TPU) == the functional
    local AggregatedAttention branch, including border masking, the
    diff-lambda combine, RMSNorm, and LePE."""
    import os

    from mlagg_unet_tpu.models.mlla import AggregatedAttention
    from mlagg_unet_tpu.ops.mlla_attn_fused import (
        local_aggregated_attention_fused,
    )

    rs = np.random.RandomState(7)
    B, H, W, C = 2, 24, 20, 48
    nh = 1
    x = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32) * 0.5)
    m = AggregatedAttention(num_heads=nh, local=True, sr_ratio=8)
    params = m.init({"params": jax.random.PRNGKey(3)}, x)["params"]
    # randomize the subln scale / lepe so the test isn't at init-identity
    params = dict(params)
    params["subln"] = {"scale": jnp.asarray(
        1 + 0.2 * rs.randn(C // nh).astype(np.float32))}

    ref = m.apply({"params": params}, x, True)  # functional path (CPU)

    hd = C // nh // 2
    lam = (jnp.exp(jnp.sum(params["lambda_q1"] * params["lambda_k1"]))
           - jnp.exp(jnp.sum(params["lambda_q2"] * params["lambda_k2"]))
           + 0.8)
    got = local_aggregated_attention_fused(
        x, params["q"]["kernel"], params["q"]["bias"],
        params["kv"]["kernel"], params["kv"]["bias"],
        params["subln"]["scale"], params["lepe"]["Conv_0"]["kernel"],
        params["lepe"]["Conv_0"]["bias"], lam, nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
