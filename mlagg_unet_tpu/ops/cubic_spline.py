"""Cubic B-spline interpolation on device — scipy-exact, jit-compatible.

`jax.scipy.ndimage.map_coordinates` stops at order 1; the reference's
default augmentation pipeline resamples DATA at order 3
(nnUNetTrainer.py:649, batchgenerators augment_spatial -> scipy
map_coordinates(order=3, mode='constant', cval=0)). This module
reproduces scipy's order-3 semantics exactly (verified against
scipy.ndimage in tests/test_cubic_spline.py):

  * prefilter: the cubic B-spline IIR (pole z = sqrt(3) - 2, gain 6)
    with MIRROR boundary — scipy applies the mirror-boundary filter for
    mode='constant' (no prepadding; probed empirically, scipy 1.17);
  * interpolation: 4 taps/axis with the cubic B-spline weights, taps
    MIRROR-extended at the edges;
  * mode='constant': output positions whose coordinate lies strictly
    outside [0, n-1] on any axis return cval exactly.

TPU-first design: the IIR prefilter is a first-order linear recurrence
-> log-depth `jax.lax.associative_scan` per axis (the same associativity
as the selective-scan kernel); the 4^dim-tap gather is a static unrolled
loop of flat 1D gathers (dim static, taps static, coords dynamic).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

_Z = math.sqrt(3.0) - 2.0  # the cubic B-spline pole
_GAIN = 6.0                # (1 - z)(1 - 1/z)


def _first_order_scan(b, a_const, reverse=False):
    """y_i = b_i + a*y_{i-1} along the LAST axis (log-depth)."""
    a = jnp.full(b.shape, a_const, b.dtype)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    _, y = jax.lax.associative_scan(combine, (a, b), axis=b.ndim - 1,
                                    reverse=reverse)
    return y


def spline_filter_cubic_1d(x: jnp.ndarray) -> jnp.ndarray:
    """Cubic spline prefilter along the last axis, mirror boundary.
    Matches scipy.ndimage.spline_filter1d(order=3, mode='mirror') to
    ~1e-6 f32 (exact closed-form causal init, valid for every n >= 2)."""
    n = x.shape[-1]
    if n == 1:
        return x * _GAIN
    y = x.astype(jnp.float32) * _GAIN
    z = jnp.float32(_Z)

    # exact mirror causal init:
    #   c0 = (y0 + z^{n-1} y_{n-1} + sum_{i=1}^{n-2}(z^i + z^{2n-2-i}) y_i)
    #        / (1 - z^{2n-2})
    ii = jnp.arange(1, n - 1)
    sign = (1 - 2 * (ii % 2)).astype(jnp.float32)      # (-1)^i, z < 0
    lz = math.log(abs(_Z))
    zi = sign * jnp.exp(ii.astype(jnp.float32) * lz)
    zn1 = jnp.float32((_Z) ** (n - 1))                 # n static
    # z^{2n-2-i} computed in log space ((-1)^{2n-2-i} == (-1)^i): the
    # naive zn1^2 / zi is 0/0 = NaN once z^i underflows f32 (n >~ 150)
    z2n2i = sign * jnp.exp((2 * n - 2 - ii).astype(jnp.float32) * lz)
    w = zi + z2n2i
    c0 = (y[..., 0] + zn1 * y[..., n - 1]
          + jnp.sum(w * y[..., 1:n - 1], axis=-1)) / (1 - zn1 * zn1)

    # causal pass: cp_i = y_i + z cp_{i-1}, cp_0 = c0 (fold init into b)
    b = y.at[..., 0].set(c0)
    cp = _first_order_scan(b, _Z)

    # anticausal: cm_{n-1} = z/(z^2-1) (cp_{n-1} + z cp_{n-2});
    # cm_i = z (cm_{i+1} - cp_i) -> reverse recurrence with a=z, b=-z*cp_i
    last = (z / (z * z - 1)) * (cp[..., n - 1] + z * cp[..., n - 2])
    br = (-z) * cp
    br = br.at[..., n - 1].set(last)
    return _first_order_scan(br, _Z, reverse=True)


def spline_filter_cubic(x: jnp.ndarray) -> jnp.ndarray:
    """Prefilter over every axis of x (any rank)."""
    for ax in range(x.ndim):
        x = jnp.moveaxis(spline_filter_cubic_1d(jnp.moveaxis(x, ax, -1)),
                         -1, ax)
    return x


def _cubic_weights(f):
    """4-tap cubic B-spline weights for fractional position f in [0,1):
    taps at floor-1, floor, floor+1, floor+2."""
    f2 = f * f
    f3 = f2 * f
    omf = 1.0 - f
    return (omf * omf * omf / 6.0,
            (4.0 - 6.0 * f2 + 3.0 * f3) / 6.0,
            (1.0 + 3.0 * f + 3.0 * f2 - 3.0 * f3) / 6.0,
            f3 / 6.0)


def _mirror_index(idx, n: int):
    """Mirror (reflect-about-edge-samples) index fold into [0, n-1]:
    period 2n-2, matching scipy's 'mirror' extension."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * n - 2
    idx = jnp.abs(idx) % period
    return jnp.where(idx >= n, period - idx, idx)


def map_coordinates_cubic(x: jnp.ndarray, coords: Sequence[jnp.ndarray],
                          cval: float = 0.0,
                          prefiltered: bool = False) -> jnp.ndarray:
    """scipy.ndimage.map_coordinates(x, coords, order=3, mode='constant',
    cval=cval) on device. x: dim-D array; coords: dim arrays of a common
    shape S. Returns shape S, fp32.

    prefiltered=True skips the IIR (pass spline_filter_cubic(x))."""
    dim = x.ndim
    assert len(coords) == dim
    c = x.astype(jnp.float32) if prefiltered else spline_filter_cubic(x)
    shape = x.shape

    coords = [co.astype(jnp.float32) for co in coords]
    out_shape = coords[0].shape
    flat = [co.ravel() for co in coords]

    base, fracs, valid = [], [], None
    for co, n in zip(flat, shape):
        fl = jnp.floor(co)
        base.append(fl.astype(jnp.int32) - 1)
        fracs.append(co - fl)
        v = (co >= 0) & (co <= n - 1)
        valid = v if valid is None else (valid & v)

    weights = [_cubic_weights(f) for f in fracs]  # dim x 4 x (P,)

    # flat gather addresses: mirror-fold each axis's tap index
    strides = []
    s = 1
    for n in reversed(shape):
        strides.append(s)
        s *= n
    strides = strides[::-1]
    cf = c.ravel()

    out = jnp.zeros_like(flat[0])
    for tap in range(4 ** dim):
        t = tap
        addr = 0
        w = None
        for ax in range(dim):
            k = t % 4
            t //= 4
            idx = _mirror_index(base[ax] + k, shape[ax])
            addr = addr + idx * strides[ax]
            w = weights[ax][k] if w is None else w * weights[ax][k]
        out = out + w * jnp.take(cf, addr)
    out = jnp.where(valid, out, jnp.float32(cval))
    return out.reshape(out_shape)


def lowres_axis_cubic_up(x: jnp.ndarray, t, axis: int) -> jnp.ndarray:
    """Nearest-downsample to dynamic length t then cubic upsample back,
    along `axis` — the reference SimulateLowResolutionTransform's
    down(order 0) + up(order 3) pair under scipy zoom(mode='nearest',
    grid_mode=True), with STATIC shapes (t is a traced scalar).

    Matches the host _skimage_resize(order0) + _skimage_resize(order3)
    composition to ~1e-6: the dynamic-length downsampled signal is
    edge-extended into a static buffer with 12 pad samples per side
    (scipy itself prepads exactly 12 for mode='nearest' — the IIR
    influence decays by |z| ~ 0.268, |z|^12 ~ 1e-7), mirror-filtered,
    and sampled with clamped taps."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    tf = jnp.asarray(t, jnp.float32)

    i = jnp.arange(n, dtype=jnp.float32)
    # d_ext[i] = d[min(i, t-1)], d[i] = x[src0(i)] (nearest, grid_mode).
    # scipy's order-0 rounding is floor(c + 0.5) (halves up) — jnp.round
    # rounds half-to-even, which shifts EVERY sample at zoom 0.5
    i_e = jnp.minimum(i, tf - 1)
    src = jnp.clip(jnp.floor((i_e + 0.5) * n / tf), 0, n - 1)
    d_ext = jnp.take(x, src.astype(jnp.int32), axis=-1)

    pad = 12
    left = jnp.repeat(d_ext[..., :1], pad, axis=-1)
    right = jnp.repeat(d_ext[..., -1:], pad, axis=-1)
    coeffs = spline_filter_cubic_1d(
        jnp.concatenate([left, d_ext, right], axis=-1))  # (..., n+24)

    j = jnp.arange(n, dtype=jnp.float32)
    pcoord = (j + 0.5) * tf / n - 0.5
    fl = jnp.floor(pcoord)
    frac = pcoord - fl
    base = fl.astype(jnp.int32) - 1 + pad
    w = _cubic_weights(frac)
    y = jnp.zeros_like(d_ext, dtype=jnp.float32)
    for k in range(4):
        idx = jnp.clip(base + k, 0, n + 2 * pad - 1)
        y = y + w[k] * jnp.take(coeffs, idx, axis=-1)
    return jnp.moveaxis(y, -1, axis)


def map_coordinates_seg_linear_onehot(
    seg: jnp.ndarray, coords: Sequence[jnp.ndarray], num_classes: int,
    cval: float = -1.0
) -> jnp.ndarray:
    """batchgenerators interpolate_img(is_seg=True, order=1) on device:
    each label in ascending order is interpolated as a one-hot channel at
    order 1 (scipy constant-mode: out-of-range corners contribute cval to
    the score) and positions scoring >= 0.5 are overwritten with that
    label. Matches the host _interpolate_seg_linear exactly for labels
    0..num_classes-1 (labels are the dense nnU-Net label ids).

    Returns fp32 of the coords' shape; positions where every label
    scores < 0.5 (e.g. fully outside the volume) stay 0, exactly like
    the host's zeros-initialized result buffer."""
    from jax.scipy.ndimage import map_coordinates as jmap

    out = jnp.zeros(coords[0].shape, jnp.float32)
    for lab in range(num_classes):
        onehot = (seg == lab).astype(jnp.float32)
        score = jmap(onehot, list(coords), order=1, mode="constant",
                     cval=cval)
        out = jnp.where(score >= 0.5, jnp.float32(lab), out)
    return out
