"""Golden-value parity tests for data/augment.py against batchgenerators
semantics (the library the reference composes in
nnUNetTrainer.get_training_transforms, nnUNetTrainer.py:643-733).

batchgenerators is not installable in this environment, so goldens are
ANALYTIC: each test encodes the batchgenerators source formula inline
(independent of the implementation under test) and uses constructions where
the result is exactly predictable:

* affine resampling of a LINEAR ramp field is exact for any spline order
  (B-splines reproduce polynomials up to their degree), so the full
  coordinate-map construction — zero-centered output mesh, transposed
  rotation-matrix application (rotate_coords_3d: coords^T @ M), scale,
  center shift — is checked to float accuracy;
* rotation by exactly 90 degrees maps grid points to grid points, so the
  result must equal np.rot90 exactly;
* seg resampling must follow interpolate_img(is_seg=True): per-label
  one-hot interpolation thresholded at 0.5 — never label-value
  interpolation (which invents phantom intermediate labels);
* SimulateLowRes uses skimage.transform.resize(mode='edge',
  anti_aliasing=False) == pixel-area-aligned (grid_mode) resampling;
* the intensity transforms (gamma/contrast/brightness/noise) have
  closed-form expected outputs once the RNG is scripted.
"""
import math

import numpy as np

from mlagg_unet_tpu.data import augment as aug


class ScriptedRNG:
    """Deterministic stand-in for np.random.RandomState: .uniform() returns
    the next scripted value regardless of bounds; .normal asserts the scale
    it was handed (to pin the std-vs-variance semantics)."""

    def __init__(self, uniforms, expect_normal_scale=None):
        self.q = list(uniforms)
        self.expect_normal_scale = expect_normal_scale
        self.normal_calls = 0

    def uniform(self, low=0.0, high=1.0, size=None):
        assert self.q, "script exhausted"
        return self.q.pop(0)

    def normal(self, loc=0.0, scale=1.0, size=None):
        self.normal_calls += 1
        if self.expect_normal_scale is not None:
            assert math.isclose(scale, self.expect_normal_scale), (
                scale, self.expect_normal_scale)
        rs = np.random.RandomState(0)
        return rs.normal(loc, scale, size)


def _ramp3d(shape, w=(2.0, -1.0, 0.5), b=3.0):
    zz, yy, xx = np.meshgrid(*[np.arange(s, dtype=float) for s in shape],
                             indexing="ij")
    return (b + w[0] * zz + w[1] * yy + w[2] * xx).astype(np.float64)


def _bg_rot3d(ax, ay, az):
    """batchgenerators create_matrix_rotation_{x,y,z}_3d chained as
    I @ Rx @ Ry @ Rz (augmentations/utils.py)."""
    rx = np.array([[1, 0, 0],
                   [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]])
    ry = np.array([[np.cos(ay), 0, np.sin(ay)],
                   [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]])
    rz = np.array([[np.cos(az), -np.sin(az), 0],
                   [np.sin(az), np.cos(az), 0],
                   [0, 0, 1]])
    return rx @ ry @ rz


def test_rotation_scale_exact_on_linear_ramp():
    """Full batchgenerators augment_spatial coordinate chain, checked
    analytically: out[p] = ramp(M^T (p - c_out) * sc + c_in). The transposed
    application (coords^T @ M) is the load-bearing detail — the untransposed
    form gives a different (inverse) rotation for the same angles."""
    inflated = (40, 44, 42)
    patch = (16, 18, 14)
    data = _ramp3d(inflated)[None]
    ax, ay, az, sc = 0.35, -0.25, 0.15, 0.85
    # script: do_rot gate (pass), do_scale gate (pass), ax, ay, az,
    #         scale-branch gate (>=0.5 -> upper branch), sc
    rng = ScriptedRNG([0.0, 0.0, ax, ay, az, 0.9, sc])
    out, _ = aug.spatial_augment(
        data, None, patch,
        {"x": (ax, ax), "y": (ay, ay), "z": (az, az)},
        scale_range=(0.7, 1.4), p_rot=0.2, p_scale=0.2, rng=rng,
    )
    M = _bg_rot3d(ax, ay, az)
    c_out = (np.array(patch) - 1) / 2.0
    c_in = (np.array(inflated) - 1) / 2.0
    mesh = np.stack(np.meshgrid(*[np.arange(s, dtype=float) for s in patch],
                                indexing="ij"))
    rel = mesh - c_out[:, None, None, None]
    src = np.einsum("ij,jzyx->izyx", M.T, rel) * sc + c_in[:, None, None, None]
    w, b = (2.0, -1.0, 0.5), 3.0
    expected = b + w[0] * src[0] + w[1] * src[1] + w[2] * src[2]
    assert np.max(np.abs(out[0] - expected)) < 1e-3


def test_rotation_90deg_matches_rot90():
    """angle=pi/2 in 2D: coords_new = R(pi/2)^T p = R(-pi/2) p, so
    out[i, j] = in[j, N-1-i] = np.rot90(in, 1). Grid points map to grid
    points -> exact for data (order 3) and seg (order 1, one-hot)."""
    n = 17
    rs = np.random.RandomState(5)
    data = rs.rand(1, n, n).astype(np.float64)
    seg = rs.randint(0, 4, size=(1, n, n)).astype(np.float64)
    ang = np.pi / 2
    rng = ScriptedRNG([0.0, 0.99, ang])  # rot yes, scale no, angle
    out, oseg = aug.spatial_augment(
        data, seg, (n, n), {"x": (ang, ang)}, rng=rng,
        order_data=3, order_seg=1,
    )
    np.testing.assert_allclose(out[0], np.rot90(data[0], 1), atol=1e-6)
    np.testing.assert_array_equal(oseg[0], np.rot90(seg[0], 1))


def test_seg_resampling_is_one_hot_no_phantom_labels():
    """interpolate_img(is_seg=True, order!=0) interpolates each label as a
    one-hot channel and thresholds at 0.5 (batchgenerators
    augmentations/utils.py). Value-interpolation of a 0|3 boundary would
    emit phantom labels 1/2 — forbidden."""
    inflated = (30, 30)
    seg = np.zeros((1,) + inflated, dtype=np.float64)
    seg[0, :, 15:] = 3.0
    ang = 0.3
    rng = ScriptedRNG([0.0, 0.99, ang])
    _, oseg = aug.spatial_augment(
        np.zeros_like(seg), seg, (16, 16), {"x": (ang, ang)}, rng=rng,
        order_seg=1,
    )
    assert set(np.unique(oseg)) <= {0.0, 3.0}, np.unique(oseg)


def test_seg_one_hot_threshold_semantics_direct():
    """_interpolate_seg at a half-grid point: one-hot weights (0.5, 0.5)
    resolve by sorted-label overwrite order, exactly like batchgenerators
    (later label wins at >= 0.5)."""
    seg = np.array([[0.0, 3.0], [0.0, 3.0]])
    coords = np.array([[[0.5]], [[0.5]]])  # exactly between all four voxels
    out = aug._interpolate_seg(seg, coords, order=1, cval=-1)
    assert out[0, 0] == 3.0  # 0 and 3 both hit 0.5; 3 overwrites 0


def test_seg_linear_fast_path_matches_per_label_map_coordinates():
    """_interpolate_seg_linear must equal the literal batchgenerators
    formulation (per-label map_coordinates(order=1, constant, cval) with
    >=0.5 sorted-overwrite) — including border excursions past the volume
    edge, where out-of-range corners contribute cval."""
    from scipy.ndimage import map_coordinates

    rs = np.random.RandomState(21)
    for dim, shape in ((2, (13, 11)), (3, (7, 9, 8))):
        seg = rs.randint(-1, 4, size=shape).astype(np.float64)
        # coords spanning interior AND outside (border behavior)
        coords = np.stack([
            rs.uniform(-2.0, shape[a] + 1.0, size=(50,)) for a in range(dim)
        ]).reshape(dim, 50)
        golden = np.zeros(coords.shape[1:], dtype=seg.dtype)
        for c in np.unique(seg):
            res = map_coordinates((seg == c).astype(float), coords, order=1,
                                  mode="constant", cval=-1)
            golden[res >= 0.5] = c
        got = aug._interpolate_seg_linear(seg, coords, cval=-1)
        np.testing.assert_array_equal(got, golden)


def test_get_patch_size_matches_reference_rule():
    """compute_initial_patch_size.py:4-24 golden: rotate the patch-extent
    vector around each axis separately, take the componentwise max of
    |rotated| and the original, divide by min(scale_range)."""
    patch = (20, 160, 160)
    rot = (-30 / 360 * 2 * np.pi, 30 / 360 * 2 * np.pi)
    got = aug.get_patch_size(patch, rot, rot, rot, (0.7, 1.4))

    r = 30 / 360 * 2 * np.pi
    coords = np.array(patch, dtype=float)
    final = coords.copy()
    for axes in ((r, 0, 0), (0, r, 0), (0, 0, r)):
        final = np.maximum(np.abs(_bg_rot3d(*axes).T @ coords), final)
    expected = (final / 0.7).astype(int)
    np.testing.assert_array_equal(got, expected)

    # 2D rule
    got2 = aug.get_patch_size((192, 160), rot, rot, rot, (0.7, 1.4))
    c2 = np.array([192.0, 160.0])
    R = np.array([[np.cos(r), -np.sin(r)], [np.sin(r), np.cos(r)]])
    exp2 = (np.maximum(np.abs(R.T @ c2), c2) / 0.7).astype(int)
    np.testing.assert_array_equal(got2, exp2)


def test_gamma_transform_analytic():
    """augment_gamma closed form with retain_stats, scripted gamma=1.3."""
    rs = np.random.RandomState(7)
    data = rs.rand(1, 6, 6).astype(np.float32) * 4 - 1
    orig = data.copy()
    rng = ScriptedRNG([0.0, 0.9, 1.3])  # p gate pass, upper branch, gamma
    out = aug.gamma_transform(data, rng, p=0.3, gamma_range=(0.7, 1.5),
                              invert_image=False, retain_stats=True)
    sl = orig[0].astype(np.float64)
    mn, sd = sl.mean(), sl.std()
    minm = sl.min()
    rnge = sl.max() - minm
    g = np.power((sl - minm) / (rnge + 1e-7), 1.3) * rnge + minm
    g = (g - g.mean()) / (g.std() + 1e-8) * sd + mn
    np.testing.assert_allclose(out[0], g, rtol=1e-5, atol=1e-5)


def test_gamma_invert_image_round_trip_sign():
    rs = np.random.RandomState(3)
    data = rs.rand(1, 5, 5).astype(np.float32)
    orig = data.copy()
    rng = ScriptedRNG([0.0, 0.9, 1.4])
    out = aug.gamma_transform(data, rng, p=0.1, invert_image=True,
                              retain_stats=True)
    sl = -orig[0].astype(np.float64)
    mn, sd = sl.mean(), sl.std()
    minm = sl.min()
    rnge = sl.max() - minm
    g = np.power((sl - minm) / (rnge + 1e-7), 1.4) * rnge + minm
    g = (g - g.mean()) / (g.std() + 1e-8) * sd + mn
    np.testing.assert_allclose(out[0], -g, rtol=1e-5, atol=1e-5)


def test_gaussian_noise_scale_is_variance_value():
    """batchgenerators augment_gaussian_noise hands the sampled 'variance'
    straight to np.random.normal as the SCALE (std) — no sqrt."""
    data = np.zeros((1, 4, 4), np.float32)
    rng = ScriptedRNG([0.0, 0.07], expect_normal_scale=0.07)
    aug.gaussian_noise(data, rng, p=0.1, noise_variance=(0, 0.1))
    assert rng.normal_calls == 1


def test_brightness_multiplicative_per_channel():
    data = np.ones((2, 3, 3), np.float32)
    rng = ScriptedRNG([0.0, 0.8, 1.2])  # gate, mult_c0, mult_c1
    out = aug.brightness_multiplicative(data, rng, p=0.15,
                                        mult_range=(0.75, 1.25))
    np.testing.assert_allclose(out[0], 0.8)
    np.testing.assert_allclose(out[1], 1.2)


def test_contrast_preserve_range_analytic():
    rs = np.random.RandomState(11)
    data = rs.rand(1, 5, 5).astype(np.float32) * 2
    orig = data.copy()
    rng = ScriptedRNG([0.0, 1.25])  # gate, factor
    out = aug.contrast_augmentation(data, rng, p=0.15)
    sl = orig[0]
    exp = np.clip((sl - sl.mean()) * 1.25 + sl.mean(), sl.min(), sl.max())
    np.testing.assert_allclose(out[0], exp, rtol=1e-5, atol=1e-6)


def test_simulate_lowres_grid_mode_alignment():
    """skimage resize == area-aligned mapping: nearest-downsample of an
    8-wide axis to 3 samples input coordinates (i+0.5)*8/3 - 0.5 =
    (5/6, 3.5, 37/6) -> nearest (floor(x+0.5)) = (1, 4, 6) — corner-aligned
    mapping (i*7/2) would pick (0, 3/4, 7)."""
    x = np.arange(8, dtype=np.float32)
    x2d = np.tile(x, (8, 1))
    down = aug._skimage_resize(x2d, (8, 3), order=0)
    np.testing.assert_array_equal(down[0], [1.0, 4.0, 6.0])


def test_simulate_lowres_identity_when_zoom_one():
    data = np.random.RandomState(0).rand(1, 10, 12).astype(np.float32)
    orig = data.copy()
    rng = ScriptedRNG([0.0, 0.0, 1.0])  # p gate, per-channel gate, zoom=1
    out = aug.simulate_low_resolution(data, rng, p=0.25, p_per_channel=0.5)
    np.testing.assert_allclose(out, orig)


def test_simulate_lowres_ignore_axes():
    """dummy-2D 3D aug keeps the z axis untouched (ignore_axes=(0,))."""
    data = np.random.RandomState(2).rand(1, 6, 16, 16).astype(np.float32)
    rng = ScriptedRNG([0.0, 0.0, 0.5])
    out = aug.simulate_low_resolution(data, rng, p=0.25, p_per_channel=0.5,
                                      ignore_axes=(0,))
    assert out.shape == (1, 6, 16, 16)


def test_mirror_flip_semantics():
    data = np.random.RandomState(4).rand(1, 4, 6).astype(np.float32)
    seg = np.random.RandomState(5).randint(0, 2, (1, 4, 6))
    orig_d, orig_s = data.copy(), seg.copy()
    rng = ScriptedRNG([0.2, 0.9])  # flip axis0 yes, axis1 no
    od, os_ = aug.mirror(data, seg, rng, (0, 1))
    np.testing.assert_array_equal(od, orig_d[:, ::-1, :])
    np.testing.assert_array_equal(os_, orig_s[:, ::-1, :])


def test_no_rot_no_scale_is_center_crop():
    data = np.random.RandomState(9).rand(1, 20, 22).astype(np.float32)
    rng = ScriptedRNG([0.99, 0.99])
    out, _ = aug.spatial_augment(data, None, (10, 12), {"x": (-1, 1)},
                                 rng=rng)
    np.testing.assert_array_equal(out[0], data[0, 5:15, 5:17])


def test_bbox_crop_matches_uncropped_interpolation():
    """spatial_augment crops the input to the sampled bbox (+20-voxel
    spline margin) before map_coordinates; the result must match direct
    interpolation over the FULL inflated volume (the IIR prefilter's
    influence decays by |z1|~0.268/voxel, so 20 voxels => ~1e-12). Also
    covers the seg path: border cval semantics must survive the crop."""
    from scipy.ndimage import map_coordinates

    inflated = (40, 46, 44)
    patch = (20, 22, 18)
    rs = np.random.RandomState(3)
    data = rs.randn(1, *inflated)
    seg = rs.randint(0, 4, size=(1, *inflated)).astype(np.int8)
    ax, ay, az, sc = 0.3, -0.2, 0.1, 1.2  # zoom-out: samples reach edges
    rng = ScriptedRNG([0.0, 0.0, ax, ay, az, 0.9, sc])
    out, oseg = aug.spatial_augment(
        data, seg, patch, {"x": (ax, ax), "y": (ay, ay), "z": (az, az)},
        scale_range=(0.7, 1.4), rng=rng, order_data=3, order_seg=1,
    )

    # reference computation without any cropping
    M = _bg_rot3d(ax, ay, az)
    c_out = (np.array(patch) - 1) / 2.0
    c_in = (np.array(inflated) - 1) / 2.0
    mesh = np.stack(np.meshgrid(*[np.arange(s, dtype=float) for s in patch],
                                indexing="ij"))
    rel = mesh - c_out[:, None, None, None]
    coords = np.einsum("ij,jzyx->izyx", M.T, rel) * sc \
        + c_in[:, None, None, None]
    expected = map_coordinates(data[0], coords, order=3, mode="constant",
                               cval=0.0)
    np.testing.assert_allclose(out[0], expected, atol=1e-6)
    expected_seg = aug._interpolate_seg(seg[0], coords, 1, -1)
    np.testing.assert_array_equal(oseg[0], expected_seg)
