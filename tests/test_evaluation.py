"""Metrics and surface dice tests."""
import numpy as np
import pytest

from mlagg_unet_tpu.evaluation import surface_dice as sd
from mlagg_unet_tpu.evaluation.metrics import (
    compute_tp_fp_fn_tn,
    label_or_region_to_mask,
)


def test_tp_fp_fn_tn():
    ref = np.array([[1, 1, 0], [0, 1, 0]], bool)
    pred = np.array([[1, 0, 0], [1, 1, 0]], bool)
    tp, fp, fn, tn = compute_tp_fp_fn_tn(ref, pred)
    assert (tp, fp, fn, tn) == (2, 1, 1, 2)
    ignore = np.array([[0, 0, 0], [1, 0, 0]], bool)
    tp, fp, fn, tn = compute_tp_fp_fn_tn(ref, pred, ignore)
    assert (tp, fp, fn, tn) == (2, 0, 1, 2)


def test_region_mask():
    seg = np.array([0, 1, 2, 3])
    m = label_or_region_to_mask(seg, (1, 3))
    np.testing.assert_array_equal(m, [False, True, False, True])


def test_dice_coefficient():
    a = np.zeros((10, 10, 10), bool)
    b = np.zeros((10, 10, 10), bool)
    a[2:6] = True
    b[2:6] = True
    assert sd.compute_dice_coefficient(a, b) == 1.0
    b[:] = False
    b[4:8] = True
    d = sd.compute_dice_coefficient(a, b)
    assert 0 < d < 1


def test_surface_dice_perfect_and_shifted():
    a = np.zeros((20, 20, 20), bool)
    a[5:15, 5:15, 5:15] = True
    dist = sd.compute_surface_distances(a, a, (1.0, 1.0, 1.0))
    assert sd.compute_surface_dice_at_tolerance(dist, 0.0) == 1.0

    b = np.roll(a, 2, axis=0)  # shift by 2mm
    dist = sd.compute_surface_distances(a, b, (1.0, 1.0, 1.0))
    nsd1 = sd.compute_surface_dice_at_tolerance(dist, 1.0)
    nsd3 = sd.compute_surface_dice_at_tolerance(dist, 3.0)
    assert nsd1 < nsd3
    assert nsd3 > 0.9

    hd95 = sd.compute_robust_hausdorff(dist, 95)
    assert 1.0 <= hd95 <= 3.0


def test_surface_dice_spacing_aware():
    a = np.zeros((20, 20, 20), bool)
    a[5:15, 5:15, 5:15] = True
    b = np.roll(a, 1, axis=0)
    # 1 voxel shift = 4mm along axis 0
    dist = sd.compute_surface_distances(a, b, (4.0, 1.0, 1.0))
    nsd2 = sd.compute_surface_dice_at_tolerance(dist, 2.0)
    nsd5 = sd.compute_surface_dice_at_tolerance(dist, 5.0)
    assert nsd5 > nsd2


def test_empty_masks():
    a = np.zeros((10, 10, 10), bool)
    assert np.isnan(sd.compute_dice_coefficient(a, a))
    dist = sd.compute_surface_distances(a, a, (1, 1, 1))
    assert np.isnan(sd.compute_surface_dice_at_tolerance(dist, 1.0))
