"""Native C++ resampler vs scipy ground truth."""
import numpy as np
import pytest
from scipy.ndimage import map_coordinates

from mlagg_unet_tpu.native import get_lib, native_resize


def _scipy_resize(data, new_shape, order):
    coords = np.meshgrid(
        *[(np.arange(n) + 0.5) * (o / n) - 0.5
          for o, n in zip(data.shape, new_shape)],
        indexing="ij",
    )
    return map_coordinates(data.astype(float), np.array(coords), order=order,
                           mode="nearest")


needs_native = pytest.mark.skipif(get_lib() is None,
                                  reason="native lib unavailable")


@needs_native
@pytest.mark.parametrize("order", [0, 1, 3])
def test_native_matches_scipy_3d(rng, order):
    data = rng.rand(9, 14, 11).astype(np.float64)
    out = native_resize(data, (18, 21, 17), order)
    ref = _scipy_resize(data, (18, 21, 17), order)
    np.testing.assert_allclose(out, ref, atol=1e-9)


@needs_native
@pytest.mark.parametrize("order", [0, 1, 3])
def test_native_matches_scipy_2d(rng, order):
    data = rng.rand(23, 17).astype(np.float64)
    out = native_resize(data, (11, 40), order)
    ref = _scipy_resize(data, (11, 40), order)
    np.testing.assert_allclose(out, ref, atol=1e-9)


@needs_native
def test_native_downsample(rng):
    data = rng.rand(32, 32, 32)
    out = native_resize(data, (8, 8, 8), 3)
    ref = _scipy_resize(data, (8, 8, 8), 3)
    np.testing.assert_allclose(out, ref, atol=1e-9)


@needs_native
def test_native_singleton_axis(rng):
    data = rng.rand(1, 16, 16)
    out = native_resize(data, (1, 32, 32), 3)
    ref = _scipy_resize(data, (1, 32, 32), 3)
    np.testing.assert_allclose(out, ref, atol=1e-9)


def test_resize_uses_native_transparently(rng):
    """_resize must produce identical results whether or not native is on."""
    import os

    from mlagg_unet_tpu.preprocessing import resampling

    data = rng.rand(12, 18).astype(np.float32)
    out = resampling._resize(data, (20, 25), order=3)
    ref = _scipy_resize(data, (20, 25), 3)
    np.testing.assert_allclose(out, ref, atol=1e-7)
