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


# ---------------------------------------------------------------------------
# exact parity vs the reference DeepMind implementation (executed from
# /root/reference/evaluation/SurfaceDice.py under old-numpy shims)
# ---------------------------------------------------------------------------

def _load_reference_surface_dice():
    import types

    path = "/root/reference/evaluation/SurfaceDice.py"
    # drop the file's own numpy import so the old-API shim binding survives
    src = open(path).read().replace("import numpy as np", "")
    class _NpShim:
        Inf = np.inf
        NaN = np.nan

        def __getattr__(self, k):
            return getattr(np, k)

    np_shim = _NpShim()
    import scipy.ndimage
    ns = {"np": np_shim, "scipy": scipy}
    exec(compile(src, path, "exec"), ns)
    return ns


def _shapes(rng):
    z = np.zeros((24, 20, 22), bool)
    sphere = z.copy()
    ii, jj, kk = np.mgrid[:24, :20, :22]
    sphere[(ii - 12.0) ** 2 + (jj - 9.0) ** 2 + (kk - 11.0) ** 2 <= 49] = True
    cube = z.copy()
    cube[6:18, 4:15, 5:17] = True
    blob = rng.rand(24, 20, 22) > 0.83
    single = z.copy()
    single[12, 9, 11] = True
    return {"sphere": sphere, "cube": cube, "blob": blob, "single": single,
            "empty": z}


@pytest.mark.parametrize("spacing", [(1.0, 1.0, 1.0), (2.0, 0.7, 1.3)])
def test_exact_parity_with_reference_impl(spacing):
    ref = _load_reference_surface_dice()
    rng = np.random.RandomState(7)
    shapes = _shapes(rng)
    pairs = [("sphere", "cube"), ("sphere", "sphere"), ("blob", "cube"),
             ("single", "sphere"), ("empty", "cube"), ("empty", "empty")]
    for name_gt, name_pred in pairs:
        gt, pred = shapes[name_gt], shapes[name_pred]
        ours = sd.compute_surface_distances(gt, pred, spacing)
        theirs = ref["compute_surface_distances"](gt, pred, list(spacing))
        for k in ("distances_gt_to_pred", "distances_pred_to_gt",
                  "surfel_areas_gt", "surfel_areas_pred"):
            np.testing.assert_allclose(
                ours[k], theirs[k], rtol=1e-12, atol=1e-12,
                err_msg=f"{name_gt}->{name_pred} {k}")
        for tol in (0.0, 1.0, 3.0):
            a = sd.compute_surface_dice_at_tolerance(ours, tol)
            b = ref["compute_surface_dice_at_tolerance"](theirs, tol)
            assert (np.isnan(a) and np.isnan(b)) or abs(a - b) < 1e-12, (
                name_gt, name_pred, tol, a, b)
        if name_gt != "empty":
            a = sd.compute_robust_hausdorff(ours, 95)
            b = ref["compute_robust_hausdorff"](theirs, 95)
            assert a == b or (np.isinf(a) and np.isinf(b))
            np.testing.assert_allclose(
                sd.compute_average_surface_distance(ours),
                ref["compute_average_surface_distance"](theirs),
                rtol=1e-12)
            np.testing.assert_allclose(
                sd.compute_surface_overlap_at_tolerance(ours, 1.0),
                ref["compute_surface_overlap_at_tolerance"](theirs, 1.0),
                rtol=1e-12)


def test_exact_nsd_known_plane_shift():
    """Flat 1-voxel-thick slabs 2mm apart: border voxels occupy two rows
    per slab (the code map lives on voxel corners), so surfel distances are
    1 or 2 mm — NSD is 0 below 1mm and exactly 1 from 2mm on."""
    a = np.zeros((10, 12, 12), bool)
    b = np.zeros((10, 12, 12), bool)
    a[4, 2:10, 2:10] = True
    b[6, 2:10, 2:10] = True
    dist = sd.compute_surface_distances(a, b, (1.0, 1.0, 1.0))
    assert sd.compute_surface_dice_at_tolerance(dist, 0.5) == 0.0
    mid = sd.compute_surface_dice_at_tolerance(dist, 1.0)
    assert 0.0 < mid < 1.0
    assert sd.compute_surface_dice_at_tolerance(dist, 2.0) == 1.0
