"""ops/cubic_spline.py vs scipy.ndimage ground truth.

The device order-3 resampler must reproduce the exact semantics the host
augmentation uses (scipy map_coordinates(order=3, mode='constant')) —
prefilter boundary, mirror tap extension, and the hard cval cutoff for
coordinates outside [0, n-1]."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import map_coordinates, spline_filter1d

from mlagg_unet_tpu.ops.cubic_spline import (
    map_coordinates_cubic,
    map_coordinates_seg_linear_onehot,
    spline_filter_cubic_1d,
)


def test_prefilter_matches_scipy_mirror():
    for n in (2, 3, 5, 12, 40, 257):
        x = np.random.RandomState(n).randn(n).astype(np.float32)
        ref = spline_filter1d(x.astype(float), order=3, mode="mirror")
        got = np.asarray(spline_filter_cubic_1d(jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_prefilter_batched_axes():
    x = np.random.RandomState(0).randn(3, 17).astype(np.float32)
    ref = np.stack([spline_filter1d(r.astype(float), order=3, mode="mirror")
                    for r in x])
    got = np.asarray(spline_filter_cubic_1d(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_map_coordinates_cubic_2d():
    rs = np.random.RandomState(1)
    x = rs.randn(23, 19).astype(np.float32)
    # interior, edge, and out-of-range coordinates
    cy = rs.uniform(-2, 24, size=400)
    cx = rs.uniform(-2, 20, size=400)
    ref = map_coordinates(x.astype(float), [cy, cx], order=3,
                          mode="constant", cval=0.0)
    got = np.asarray(map_coordinates_cubic(
        jnp.asarray(x), [jnp.asarray(cy), jnp.asarray(cx)], cval=0.0))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_map_coordinates_cubic_3d_rotated_grid():
    """The actual augmentation use: a rotated+scaled coordinate grid."""
    rs = np.random.RandomState(2)
    x = rs.randn(20, 24, 22).astype(np.float32)
    patch = (12, 14, 10)
    from tests.test_augment_parity import _bg_rot3d

    M = _bg_rot3d(0.3, -0.2, 0.15)
    mesh = np.stack(np.meshgrid(
        *[np.arange(s, dtype=float) - (s - 1) / 2 for s in patch],
        indexing="ij"))
    coords = np.einsum("ij,jzyx->izyx", M.T, mesh) * 1.08 + np.array(
        [(s - 1) / 2 for s in x.shape]).reshape(3, 1, 1, 1)
    ref = map_coordinates(x.astype(float), coords, order=3,
                          mode="constant", cval=0.0)
    got = np.asarray(map_coordinates_cubic(
        jnp.asarray(x), [jnp.asarray(c) for c in coords], cval=0.0))
    assert got.shape == patch
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_map_coordinates_cubic_under_jit_and_vmap():
    rs = np.random.RandomState(3)
    x = rs.randn(4, 16, 18).astype(np.float32)
    cy = rs.uniform(0, 15, size=(5, 7))
    cx = rs.uniform(0, 17, size=(5, 7))

    fn = jax.jit(lambda ch: map_coordinates_cubic(
        ch, [jnp.asarray(cy), jnp.asarray(cx)]))
    got = np.asarray(jax.vmap(fn)(jnp.asarray(x)))
    ref = np.stack([
        map_coordinates(ch.astype(float), [cy, cx], order=3,
                        mode="constant", cval=0.0) for ch in x])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_seg_linear_onehot_matches_host():
    """Device one-hot order-1 seg interpolation == the host
    batchgenerators-exact _interpolate_seg (order 1, cval -1)."""
    from mlagg_unet_tpu.data.augment import _interpolate_seg

    rs = np.random.RandomState(4)
    seg = rs.randint(0, 4, size=(15, 17, 13)).astype(np.float32)
    patch = (9, 11, 7)
    mesh = np.stack(np.meshgrid(
        *[np.arange(s, dtype=float) - (s - 1) / 2 for s in patch],
        indexing="ij"))
    coords = mesh * 1.3 + np.array(
        [(s - 1) / 2 for s in seg.shape]).reshape(3, 1, 1, 1)
    ref = _interpolate_seg(seg, coords, order=1, cval=-1)
    got = np.asarray(map_coordinates_seg_linear_onehot(
        jnp.asarray(seg), [jnp.asarray(c) for c in coords], num_classes=4))
    np.testing.assert_array_equal(got, ref)


def test_lowres_cubic_up_matches_host():
    """Down(order0)+up(order3) along each axis == the host
    _skimage_resize pair at the reference's default upsample order."""
    from mlagg_unet_tpu.data.augment import _skimage_resize
    from mlagg_unet_tpu.ops.cubic_spline import lowres_axis_cubic_up

    rs = np.random.RandomState(5)
    for n, z in ((21, 0.62), (40, 0.5), (17, 0.97), (33, 1.0)):
        x = rs.randn(n).astype(np.float32)
        t = max(1, min(n, int(round(n * z))))
        down = _skimage_resize(x, (t,), order=0)
        exp = _skimage_resize(down, (n,), order=3)
        got = np.asarray(lowres_axis_cubic_up(
            jnp.asarray(x), jnp.float32(t), 0))
        np.testing.assert_allclose(got, exp, rtol=3e-4, atol=3e-4)


def test_lowres_cubic_up_2d_separable():
    from mlagg_unet_tpu.data.augment import _skimage_resize
    from mlagg_unet_tpu.ops.cubic_spline import lowres_axis_cubic_up

    rs = np.random.RandomState(6)
    x = rs.randn(19, 23).astype(np.float32)
    z = 0.7
    # host composes per-axis too (separable zoom == per-axis zoom chain)?
    # ground truth: full 2D scipy pair
    target = np.maximum(np.round(np.array(x.shape) * z).astype(int), 1)
    down = _skimage_resize(x, target, order=0)
    exp = _skimage_resize(down, x.shape, order=3)
    got = jnp.asarray(x)
    for ax in range(2):
        t = max(1, min(x.shape[ax], int(round(x.shape[ax] * z))))
        got = lowres_axis_cubic_up(got, jnp.float32(t), ax)
    got = np.asarray(got)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)
