"""Equivalence tests for the fused InstanceNorm Pallas kernel
(ops/fused_norm.py) vs the functional flax-GroupNorm-equivalent graph.

Reference semantics: monai UnetResBlock conv->IN->lrelu chains used by the
flagship head (nnUNetTrainer_MLAgg_2D_dt_MS.py:1339-1358). On CPU the
kernel runs in Pallas interpret mode — slow but exact.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlagg_unet_tpu.ops.fused_norm import (
    _pick_tile,
    fused_instance_norm,
    functional_instance_norm,
    fused_norms_enabled,
)


def _mk(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


def _params(rng, C, dtype=jnp.float32):
    return (_mk(rng, (C,), dtype) * 0.5 + 1.0, _mk(rng, (C,), dtype) * 0.1)


CASES = [
    # (shape NHWC-ish, act, res_mode)  — odd spatial sizes on purpose
    ((2, 7, 5, 3), False, 0),
    ((2, 7, 5, 3), True, 0),
    ((3, 9, 11, 4), True, 1),
    ((2, 6, 10, 8), True, 2),
    ((1, 5, 7, 3, 6), True, 2),      # 3D
    ((2, 37, 1, 5), True, 1),        # S not divisible by any pow2 tile
]


@pytest.mark.parametrize("shape,act,res_mode", CASES)
def test_fused_matches_functional_fwd(shape, act, res_mode):
    rng = np.random.default_rng(0)
    C = shape[-1]
    x = _mk(rng, shape)
    s, b = _params(rng, C)
    kw = {}
    if res_mode >= 1:
        kw["residual"] = _mk(rng, shape)
    if res_mode == 2:
        kw["res_scale"], kw["res_bias"] = _params(rng, C)
    y_f = fused_instance_norm(x, s, b, act=act, **kw)
    y_r = functional_instance_norm(x, s, b, act=act, **kw)
    assert y_f.dtype == y_r.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("res_mode", [0, 1, 2])
def test_fused_matches_functional_grads(res_mode):
    rng = np.random.default_rng(1)
    shape, C = (2, 6, 5, 4), 4
    x = _mk(rng, shape)
    s, b = _params(rng, C)
    res = _mk(rng, shape) if res_mode >= 1 else None
    rs, rb = _params(rng, C) if res_mode == 2 else (None, None)
    cot = _mk(rng, shape)

    def run(fn, x, s, b, res, rs, rb):
        kw = {"act": True}
        if res is not None:
            kw["residual"] = res
        if rs is not None:
            kw["res_scale"], kw["res_bias"] = rs, rb
        return jnp.sum(fn(x, s, b, **kw) * cot)

    args = [a for a in (x, s, b, res, rs, rb) if a is not None]
    n = len(args)

    def wrap(fn):
        def f(*a):
            full = list(a) + [None] * (6 - n)
            return run(fn, *full)
        return f

    g_f = jax.grad(wrap(fused_instance_norm), argnums=tuple(range(n)))(*args)
    g_r = jax.grad(wrap(functional_instance_norm),
                   argnums=tuple(range(n)))(*args)
    for gf, gr in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-5, atol=2e-5)


def test_fused_bf16_io():
    rng = np.random.default_rng(2)
    shape, C = (2, 8, 6, 4), 4
    x = _mk(rng, shape, jnp.bfloat16)
    s, b = _params(rng, C)
    res = _mk(rng, shape, jnp.bfloat16)
    y_f = fused_instance_norm(x, s, b, act=True, residual=res)
    y_r = functional_instance_norm(x, s, b, act=True, residual=res)
    assert y_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_f, np.float32), np.asarray(y_r, np.float32),
        rtol=2e-2, atol=2e-2)


def test_vmem_overflow_falls_back_to_functional():
    # min tile (8) x padded lanes x 4B x 3 streams > 8MB => _pick_tile None
    assert _pick_tile(8, 90_000, 3) is None
    # and the op still returns correct values through the fallback
    rng = np.random.default_rng(3)
    shape, C = (1, 4, 2, 90_000 // 8), 90_000 // 8  # keep runtime sane
    assert _pick_tile(8, shape[0] * C, 3) is not None  # this one fits
    x = _mk(rng, (1, 2, 1, 90_000))
    s, b = _params(rng, 90_000)
    res = _mk(rng, (1, 2, 1, 90_000))
    y_f = fused_instance_norm(x, s, b, act=True, residual=res)
    y_r = functional_instance_norm(x, s, b, act=True, residual=res)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               rtol=1e-5, atol=1e-5)


def test_model_level_fused_branch_matches_unfused(monkeypatch):
    """UnetResBlock with the fused branch force-enabled (interpret mode)
    must match the unfused branch output AND produce the same param tree
    (checkpoint/torch-import compatibility)."""
    from mlagg_unet_tpu.models.unetr_blocks import UnetResBlock

    rng = np.random.default_rng(4)
    x = _mk(rng, (2, 12, 10, 6))

    monkeypatch.setenv("MLAGG_FUSED_IN", "1")
    assert fused_norms_enabled()
    blk = UnetResBlock(out_channels=8, kernel_size=3, stride=2)
    p_fused = blk.init(jax.random.PRNGKey(0), x)
    y_fused = blk.apply(p_fused, x)

    monkeypatch.setenv("MLAGG_FUSED_IN", "0")
    assert not fused_norms_enabled()
    p_ref = blk.init(jax.random.PRNGKey(0), x)
    y_ref = blk.apply(p_ref, x)

    t_f = jax.tree_util.tree_structure(p_fused)
    t_r = jax.tree_util.tree_structure(p_ref)
    assert t_f == t_r
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    # cross-apply: params from one branch drive the other
    y_cross = blk.apply(p_fused, x)  # still MLAGG_FUSED_IN=0 here
    np.testing.assert_allclose(np.asarray(y_cross), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
