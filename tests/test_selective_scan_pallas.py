"""Pallas selective-scan kernel vs the XLA implementation (interpret mode
off-TPU exercises identical kernel logic)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlagg_unet_tpu.ops.selective_scan import selective_scan, selective_scan_seq_ref
from mlagg_unet_tpu.ops.selective_scan_pallas import selective_scan_pallas


def make_inputs(rng, b=2, g=2, d=8, n=4, l=40):
    u = rng.randn(b, g, d, l).astype(np.float32)
    delta = rng.randn(b, g, d, l).astype(np.float32) * 0.5
    A = -np.exp(rng.randn(g, d, n).astype(np.float32) * 0.3)
    B = rng.randn(b, g, n, l).astype(np.float32)
    C = rng.randn(b, g, n, l).astype(np.float32)
    D = rng.randn(g, d).astype(np.float32)
    db = rng.randn(g, d).astype(np.float32) * 0.1
    return u, delta, A, B, C, D, db


def test_pallas_matches_reference(rng):
    args = make_inputs(rng)
    y_ref = selective_scan_seq_ref(*args, delta_softplus=True)
    y = selective_scan_pallas(*args, delta_softplus=True, chunk_size=128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_multi_chunk(rng):
    # L spans multiple chunks; carry must propagate exactly
    args = make_inputs(rng, l=300)
    y_ref = selective_scan(*args, delta_softplus=True, chunk_size=64)
    y = selective_scan_pallas(*args, delta_softplus=True, chunk_size=128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_no_optionals(rng):
    u, delta, A, B, C, D, db = make_inputs(rng, l=50)
    y_ref = selective_scan_seq_ref(u, delta, A, B, C)
    y = selective_scan_pallas(u, delta, A, B, C, chunk_size=128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_unaligned_d(rng):
    # d not a multiple of 8 exercises the d-padding path
    args = make_inputs(rng, d=6, l=140)
    y_ref = selective_scan_seq_ref(*args, delta_softplus=True)
    y = selective_scan_pallas(*args, delta_softplus=True, chunk_size=128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_gradients_multichunk(rng):
    """Gradient carry across chunk boundaries (L spans 3 chunks)."""
    args = make_inputs(rng, b=1, g=2, d=8, n=4, l=300)

    def loss_p(*a):
        return (selective_scan_pallas(*a, delta_softplus=True,
                                      chunk_size=128) ** 2).sum()

    def loss_x(*a):
        return (selective_scan(*a, delta_softplus=True,
                               chunk_size=64) ** 2).sum()

    gp = jax.grad(loss_p, argnums=tuple(range(7)))(*args)
    gx = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    for i, (a_, b_) in enumerate(zip(gp, gx)):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=2e-4,
            err_msg=f"grad argnum {i}")


def test_pallas_gradients_no_optionals(rng):
    u, delta, A, B, C, _, _ = make_inputs(rng, b=1, g=1, d=4, n=4, l=200)

    def loss_p(u, delta, A, B, C):
        return selective_scan_pallas(u, delta, A, B, C,
                                     chunk_size=128).sum()

    def loss_x(u, delta, A, B, C):
        return selective_scan_seq_ref(u, delta, A, B, C).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    for i, (a_, b_) in enumerate(zip(gp, gx)):
        # no softplus on delta here, so the raw random deltas make the
        # recurrence exponentially unstable (|grad| ~ 1e3): compare
        # relative to the gradient's scale, not elementwise rtol+atol —
        # different (equally valid) fp32 summation orders across kernel
        # versions legitimately differ by ~1e-4 relative
        rel = float(np.abs(np.asarray(a_) - np.asarray(b_)).max()
                    / (np.abs(np.asarray(b_)).max() + 1e-30))
        assert rel < 2e-4, (i, rel)


def test_pallas_gradients_via_xla_backward(rng):
    args = make_inputs(rng, b=1, g=1, d=4, n=4, l=20)

    def loss_p(*a):
        return selective_scan_pallas(*a, delta_softplus=True,
                                     chunk_size=128).sum()

    def loss_x(*a):
        return selective_scan_seq_ref(*a, delta_softplus=True).sum()

    gp = jax.grad(loss_p, argnums=tuple(range(7)))(*args)
    gx = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
    for a_, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("l", [320, 331])
def test_pallas_nonpow2_L_in_chunk_range(rng, l):
    """L in (256, 512) used to become a non-power-of-two lc (e.g. L=320
    from a 20x20x... map), whose mega-chunk was NOT a multiple of the
    256-lane forward sub-chunk: lanes >= 256 were never written. lc is
    now forced to a power of two; forward and backward must both match."""
    args = make_inputs(rng, b=1, g=2, d=8, n=4, l=l)
    y_ref = selective_scan_seq_ref(*args, delta_softplus=True)
    y = selective_scan_pallas(*args, delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

    def loss_p(u, delta, B, C):
        return (selective_scan_pallas(u, delta, args[2], B, C, args[5],
                                      args[6], delta_softplus=True) ** 2).sum()

    def loss_x(u, delta, B, C):
        return (selective_scan_seq_ref(u, delta, args[2], B, C, args[5],
                                       args[6], delta_softplus=True) ** 2).sum()

    a4 = (args[0], args[1], args[3], args[4])
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(*a4)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(*a4)
    for name, a_, b_ in zip(["du", "ddelta", "dB", "dC"], gp, gx):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_scan_gb_env_override_validated(rng, monkeypatch):
    """A forced MLAGG_SCAN_GB that does not divide b*g must be ignored,
    not truncate the grid (which silently left rows unwritten)."""
    monkeypatch.setenv("MLAGG_SCAN_GB", "4")
    args = make_inputs(rng, b=3, g=2, d=8, n=4, l=64)  # BG=6, 6 % 4 != 0
    y_ref = selective_scan_seq_ref(*args, delta_softplus=True)
    y = selective_scan_pallas(*args, delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_wide_d_blocking(rng):
    """d large enough that the kernel splits the channel axis across grid
    cells (d-blocking; VMamba stage-3 cells reach d_inner=768). Forward
    AND gradients must agree across the per-d-block partial dB/dC path."""
    args = make_inputs(rng, b=1, g=1, d=768, n=16, l=256)
    y_ref = selective_scan(*args, delta_softplus=True, chunk_size=64)
    y = selective_scan_pallas(*args, delta_softplus=True, chunk_size=512)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=3e-5, atol=3e-5)

    def loss_p(u, delta, B, C):
        return jnp.sum(jnp.sin(selective_scan_pallas(
            u, delta, args[2], B, C, args[5], args[6],
            delta_softplus=True, chunk_size=512)))

    def loss_x(u, delta, B, C):
        return jnp.sum(jnp.sin(selective_scan(
            u, delta, args[2], B, C, args[5], args[6],
            delta_softplus=True, chunk_size=64)))

    a4 = (args[0], args[1], args[3], args[4])
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(*a4)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(*a4)
    for name, a, b in zip(["du", "ddelta", "dB", "dC"], gp, gx):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-30))
        assert rel < 1e-3, (name, rel)


def test_pallas_reverse_scan(rng):
    """reverse=True == flip -> scan -> flip (the definition used by the
    VMamba cross-scan directions 2/3; the kernel folds the flips into its
    grid index maps and mirrored doubling). Covers L not a multiple of the
    mega chunk (pad tail is scanned FIRST in reverse and must contribute
    zero state) and the flip-based reversed backward."""
    args = make_inputs(rng, b=2, g=2, d=16, n=8, l=320)
    y_flip = selective_scan_pallas(
        args[0][..., ::-1], args[1][..., ::-1], args[2], args[3][..., ::-1],
        args[4][..., ::-1], args[5], args[6], delta_softplus=True,
    )[..., ::-1]
    y_rev = selective_scan_pallas(*args, delta_softplus=True, reverse=True)
    np.testing.assert_allclose(np.asarray(y_rev), np.asarray(y_flip),
                               rtol=2e-5, atol=2e-5)

    def loss_rev(u, delta, B, C):
        return jnp.sum(jnp.sin(selective_scan_pallas(
            u, delta, args[2], B, C, args[5], args[6],
            delta_softplus=True, reverse=True)))

    def loss_flip(u, delta, B, C):
        return jnp.sum(jnp.sin(selective_scan_pallas(
            u[..., ::-1], delta[..., ::-1], args[2], B[..., ::-1],
            C[..., ::-1], args[5], args[6],
            delta_softplus=True)[..., ::-1]))

    a4 = (args[0], args[1], args[3], args[4])
    gr = jax.grad(loss_rev, argnums=(0, 1, 2, 3))(*a4)
    gf = jax.grad(loss_flip, argnums=(0, 1, 2, 3))(*a4)
    for name, a, b in zip(["du", "ddelta", "dB", "dC"], gr, gf):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-30))
        assert rel < 1e-4, (name, rel)


def test_xla_reverse_scan(rng):
    """XLA fallback reverse= kwarg matches the flip definition."""
    args = make_inputs(rng, b=1, g=2, d=8, n=8, l=96)
    y_flip = selective_scan(
        args[0][..., ::-1], args[1][..., ::-1], args[2], args[3][..., ::-1],
        args[4][..., ::-1], args[5], args[6], delta_softplus=True,
    )[..., ::-1]
    y_rev = selective_scan(*args, delta_softplus=True, reverse=True)
    np.testing.assert_allclose(np.asarray(y_rev), np.asarray(y_flip),
                               rtol=1e-6, atol=1e-6)


def test_pallas_reverse_wide_d_and_rows(rng):
    """Reverse scan with d-blocking (wide d splits the channel axis across
    grid cells), multiple mega chunks, and multi-row groups — the carry
    and restart-state plumbing must mirror correctly in every grid
    dimension."""
    args = make_inputs(rng, b=4, g=2, d=768, n=16, l=640)
    y_flip = selective_scan_pallas(
        args[0][..., ::-1], args[1][..., ::-1], args[2], args[3][..., ::-1],
        args[4][..., ::-1], args[5], args[6], delta_softplus=True,
    )[..., ::-1]
    y_rev = selective_scan_pallas(*args, delta_softplus=True, reverse=True)
    np.testing.assert_allclose(np.asarray(y_rev), np.asarray(y_flip),
                               rtol=3e-5, atol=3e-5)

    def loss_rev(u, B):
        return jnp.sum(jnp.cos(selective_scan_pallas(
            u, args[1], args[2], B, args[4], args[5], args[6],
            delta_softplus=True, reverse=True)))

    def loss_flip(u, B):
        return jnp.sum(jnp.cos(selective_scan_pallas(
            u[..., ::-1], args[1][..., ::-1], args[2], B[..., ::-1],
            args[4][..., ::-1], args[5], args[6],
            delta_softplus=True)[..., ::-1]))

    gr = jax.grad(loss_rev, argnums=(0, 1))(args[0], args[3])
    gf = jax.grad(loss_flip, argnums=(0, 1))(args[0], args[3])
    for name, a, b in zip(["du", "dB"], gr, gf):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-30))
        assert rel < 1e-3, (name, rel)


def test_pallas_v2_multi_step_long_l(rng):
    """The v2 two-phase kernels' T>1 path (time factored as 128
    lane-segments x T sequential steps, operands wrapper-interleaved):
    L = 2048 selects mega=1024/T=8 in the forward and T=lc/128 in the
    backward, crossing both segment and chunk boundaries in both scan
    directions. Checked against the XLA implementation fwd + grads."""
    args = make_inputs(rng, b=1, g=2, d=8, n=4, l=2048)
    for rev in (False, True):
        y_ref = selective_scan(*args, delta_softplus=True, chunk_size=64,
                               reverse=rev)
        y = selective_scan_pallas(*args, delta_softplus=True, reverse=rev)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)

        def loss_p(*a):
            return jnp.sum(jnp.sin(selective_scan_pallas(
                *a, delta_softplus=True, reverse=rev)))

        def loss_x(*a):
            return jnp.sum(jnp.sin(selective_scan(
                *a, delta_softplus=True, chunk_size=64, reverse=rev)))

        gp = jax.grad(loss_p, argnums=tuple(range(7)))(*args)
        gx = jax.grad(loss_x, argnums=tuple(range(7)))(*args)
        for i, (a_, b_) in enumerate(zip(gp, gx)):
            rel = float(jnp.abs(a_ - b_).max()
                        / (jnp.abs(b_).max() + 1e-30))
            assert rel < 2e-4, (rev, i, rel)
