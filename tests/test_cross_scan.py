"""Cross scan/merge layout transforms: invertibility + exact order parity
with the reference's torch stack/flip/transpose construction."""
import jax.numpy as jnp
import numpy as np

from mlagg_unet_tpu.ops.cross_scan import (
    cross_merge_2d,
    cross_merge_multiscale,
    cross_scan_2d,
    cross_scan_multiscale,
)


def test_scan_orders(rng):
    B, H, W, C = 1, 2, 3, 1
    x = jnp.asarray(np.arange(H * W, dtype=np.float32).reshape(B, H, W, C))
    xs = np.asarray(cross_scan_2d(x))[0, :, 0]  # (4, L)
    row = np.arange(6, dtype=np.float32)
    col = np.asarray([0, 3, 1, 4, 2, 5], dtype=np.float32)
    np.testing.assert_array_equal(xs[0], row)
    np.testing.assert_array_equal(xs[1], col)
    np.testing.assert_array_equal(xs[2], row[::-1])
    np.testing.assert_array_equal(xs[3], col[::-1])


def test_merge_inverts_scan(rng):
    B, H, W, C = 2, 5, 7, 3
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    ys = cross_scan_2d(x)
    merged = cross_merge_2d(ys, H, W)  # (B, C, L)
    expected = 4.0 * jnp.transpose(x, (0, 3, 1, 2)).reshape(B, C, H * W)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(expected), rtol=1e-6)


def test_multiscale_roundtrip(rng):
    shapes = [(8, 6), (4, 3), (2, 2)]
    xs = [jnp.asarray(rng.randn(2, h, w, 4).astype(np.float32)) for h, w in shapes]
    cat, l_split = cross_scan_multiscale(xs)
    assert cat.shape == (2, 4, 4, sum(h * w for h, w in shapes))
    assert l_split == [h * w for h, w in shapes]
    merged = cross_merge_multiscale(cat, shapes, l_split)
    offset = 0
    for (h, w), x in zip(shapes, xs):
        expected = 4.0 * jnp.transpose(x, (0, 3, 1, 2)).reshape(2, 4, h * w)
        np.testing.assert_allclose(
            np.asarray(merged[..., offset : offset + h * w]),
            np.asarray(expected), rtol=1e-6,
        )
        offset += h * w


def test_direction_ablations_roundtrip(rng):
    """1/2-direction ablation scans (csms6s.py CrossScan_Ab_*): K stays 4,
    paths replicate; merge sums the inverted paths."""
    import jax.numpy as jnp

    from mlagg_unet_tpu.ops.cross_scan import (
        cross_merge_1direction,
        cross_merge_2direction,
        cross_scan_1direction,
        cross_scan_2direction,
    )

    x = jnp.asarray(rng.randn(2, 3, 4, 5).astype(np.float32))
    hw = jnp.transpose(x, (0, 3, 1, 2)).reshape(2, 5, 12)

    s1 = cross_scan_1direction(x)
    assert s1.shape == (2, 4, 5, 12)
    for k in range(4):
        np.testing.assert_array_equal(np.asarray(s1[:, k]), np.asarray(hw))
    np.testing.assert_allclose(np.asarray(cross_merge_1direction(s1, 3, 4)),
                               4 * np.asarray(hw), rtol=1e-6)

    s2 = cross_scan_2direction(x)
    np.testing.assert_array_equal(np.asarray(s2[:, 0]), np.asarray(hw))
    np.testing.assert_array_equal(np.asarray(s2[:, 2]),
                                  np.asarray(jnp.flip(hw, -1)))
    np.testing.assert_allclose(np.asarray(cross_merge_2direction(s2, 3, 4)),
                               4 * np.asarray(hw), rtol=1e-6)


def test_ss2d_forward_type_ablations(rng):
    """Every forward_type variant builds and produces finite output of the
    right shape (vmamba.py:394-458 dispatch)."""
    import jax
    import jax.numpy as jnp

    from mlagg_unet_tpu.models.mamba_block import SS2D

    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    key = jax.random.PRNGKey(0)
    for ft in ("v0", "v2", "v3", "v05", "v31d", "v32d", "v051d", "v052d",
               "v2_noz", "v2_nozact", "v2_onnone", "v2_onsoftmax",
               "v2_onsigmoid", "v2_ondwconv3", "v2_no32"):
        m = SS2D(d_model=16, d_state=4, forward_type=ft)
        v = m.init({"params": key}, x)
        out = m.apply(v, x)
        assert out.shape == x.shape, ft
        assert bool(jnp.all(jnp.isfinite(out))), ft
    # _noz must drop the gate half of in_proj
    m = SS2D(d_model=16, d_state=4, forward_type="v2_noz")
    v = m.init({"params": key}, x)
    assert v["params"]["in_proj"]["kernel"].shape == (16, 32)


def test_2dir_scheme_matches_4dir(rng):
    """The kernel-folded reversal scheme (2 layouts + reverse=True scans)
    must be an exact re-arrangement of the classic 4-direction path:
    scanning the reversed-scale-order concat right-to-left reproduces each
    direction-2/3 per-scale flipped sequence, and the merge reproduces
    cross_merge_multiscale_tokens."""
    import jax.numpy as jnp

    from mlagg_unet_tpu.ops.cross_scan import (
        cross_merge_multiscale_tokens,
        cross_merge_multiscale_tokens_2dir,
        cross_scan_multiscale,
        cross_scan_multiscale_2dir,
    )

    shapes = [(6, 4), (3, 2), (2, 2)]
    xs = [jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
          for h, w in shapes]
    cat4, l_split = cross_scan_multiscale(xs, pad_to=80)
    fwd, ls2 = cross_scan_multiscale_2dir(xs, pad_to=80)
    rev, _ = cross_scan_multiscale_2dir(xs, pad_to=80, reverse_scales=True)
    assert ls2 == l_split
    L = sum(l_split)
    # dirs 0/1: identical sequences
    np.testing.assert_array_equal(np.asarray(cat4[:, :2]), np.asarray(fwd))
    # dirs 2/3: cat4 rows are concat_i(rev(d_i)); the reversed-scale concat
    # read right-to-left gives the same sequence
    np.testing.assert_array_equal(
        np.asarray(cat4[:, 2:, :, :L]),
        np.asarray(rev[..., :L][..., ::-1]))

    # merge equivalence on synthetic per-direction scan outputs: emulate
    # y4 (4-dir, natural per-direction sequence order) and the 2-dir pair
    # (y_rev holds dirs 2/3 outputs in natural STORAGE order)
    y4 = jnp.asarray(rng.randn(2, 4, 3, cat4.shape[-1]).astype(np.float32))
    y_fwd = y4[:, :2]
    y_rev = jnp.concatenate(
        [y4[:, 2:, :, :L][..., ::-1],
         jnp.zeros((2, 2, 3, cat4.shape[-1] - L), jnp.float32)], axis=-1)
    tok4 = cross_merge_multiscale_tokens(y4, shapes, l_split)
    tok2 = cross_merge_multiscale_tokens_2dir(y_fwd, y_rev, shapes, l_split)
    for a, b in zip(tok4, tok2):
        # summation order differs (y0+y2 before the transpose vs after):
        # equal up to fp32 rounding
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
