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
