// Fast multithreaded spline resampling for the host-side hot loops
// (preprocessing per-case resample + inference export resample).
//
// Replaces scipy.ndimage.map_coordinates in _resize() with the SAME math:
// pixel-center coordinate mapping x_src = (x_dst + 0.5) * (in/out) - 0.5,
// boundary mode 'nearest', interpolation orders 0 (nearest), 1 (linear) and
// 3 (cubic B-spline with Unser's recursive prefilter, matching
// scipy.ndimage.spline_filter). OpenMP-parallel over output voxels.
//
// Built by mlagg_unet_tpu/native/__init__.py via the system compiler; the
// Python layer falls back to scipy when unavailable.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline int64_t clamp_idx(int64_t i, int64_t n) {
    if (i < 0) return 0;
    if (i >= n) return n - 1;
    return i;
}

// scipy.ndimage semantics for order-3 / mode='nearest': the input is
// edge-padded by 12 per axis, prefiltered with the MIRROR-boundary Unser
// IIR (exactly scipy.ndimage.spline_filter1d(mode='mirror')), and evaluated
// on the padded coefficient array. kEdgePad below mirrors scipy's npad=12.
constexpr int64_t kEdgePad = 12;

// exact mirror-boundary cubic prefilter, in place
void spline_filter1d(double* line, int64_t n) {
    if (n < 2) return;
    const double z = std::sqrt(3.0) - 2.0;  // pole for cubic
    const double gain = (1.0 - z) * (1.0 - 1.0 / z);
    for (int64_t i = 0; i < n; ++i) line[i] *= gain;

    // causal init: truncated mirror series (|z|^30 ~ 5e-18)
    const int64_t period = 2 * n - 2;
    auto mirror_idx = [n, period](int64_t k) {
        int64_t mmod = ((k % period) + period) % period;
        return mmod < n ? mmod : period - mmod;
    };
    double sum = 0.0;
    double zk = 1.0;
    for (int64_t k = 0; k < 40; ++k) {
        sum += zk * line[mirror_idx(k)];
        zk *= z;
    }
    line[0] = sum;
    for (int64_t i = 1; i < n; ++i) line[i] += z * line[i - 1];
    // anti-causal init (mirror)
    line[n - 1] = (z / (z * z - 1.0)) * (z * line[n - 2] + line[n - 1]);
    for (int64_t i = n - 2; i >= 0; --i)
        line[i] = z * (line[i + 1] - line[i]);
}

inline void cubic_weights(double t, double w[4]) {
    // B-spline basis for fractional offset t in [0,1): nodes at -1,0,1,2
    const double t2 = t * t, t3 = t2 * t;
    w[0] = (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0;
    w[1] = (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0;
    w[2] = (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0;
    w[3] = t3 / 6.0;
}

}  // namespace

extern "C" {

// 3D resize (also covers 2D via nz == 1 on both sides).
// in:  (iz, iy, ix) C-order doubles; out: (oz, oy, ox).
// order: 0 nearest, 1 linear, 3 cubic B-spline.
int resample3d(const double* in, int64_t iz, int64_t iy, int64_t ix,
               double* out, int64_t oz, int64_t oy, int64_t ox,
               int order) {
    const double sz = (double)iz / (double)oz;
    const double sy = (double)iy / (double)oy;
    const double sx = (double)ix / (double)ox;

    std::vector<double> coeff;
    const double* src = in;
    // padded coefficient-grid geometry (order 3 only)
    int64_t pz = iz, py = iy, px = ix;
    int64_t off = 0;
    if (order == 3) {
        // edge-pad by 12 per axis (scipy's npad), then mirror-prefilter
        off = kEdgePad;
        pz = iz + 2 * off;
        py = iy + 2 * off;
        px = ix + 2 * off;
        coeff.resize((size_t)(pz * py * px));
#pragma omp parallel for collapse(2)
        for (int64_t z = 0; z < pz; ++z)
            for (int64_t y = 0; y < py; ++y) {
                int64_t zi = clamp_idx(z - off, iz);
                int64_t yi = clamp_idx(y - off, iy);
                double* row = &coeff[(z * py + y) * px];
                const double* irow = in + (zi * iy + yi) * ix;
                for (int64_t x = 0; x < px; ++x)
                    row[x] = irow[clamp_idx(x - off, ix)];
            }
#pragma omp parallel for collapse(2)
        for (int64_t z = 0; z < pz; ++z)
            for (int64_t y = 0; y < py; ++y)
                spline_filter1d(&coeff[(z * py + y) * px], px);
#pragma omp parallel for collapse(2)
        for (int64_t z = 0; z < pz; ++z)
            for (int64_t x = 0; x < px; ++x) {
                std::vector<double> line((size_t)py);
                for (int64_t y = 0; y < py; ++y)
                    line[y] = coeff[(z * py + y) * px + x];
                spline_filter1d(line.data(), py);
                for (int64_t y = 0; y < py; ++y)
                    coeff[(z * py + y) * px + x] = line[y];
            }
#pragma omp parallel for collapse(2)
        for (int64_t y = 0; y < py; ++y)
            for (int64_t x = 0; x < px; ++x) {
                std::vector<double> line((size_t)pz);
                for (int64_t z = 0; z < pz; ++z)
                    line[z] = coeff[(z * py + y) * px + x];
                spline_filter1d(line.data(), pz);
                for (int64_t z = 0; z < pz; ++z)
                    coeff[(z * py + y) * px + x] = line[z];
            }
        src = coeff.data();
    }

#pragma omp parallel for collapse(2)
    for (int64_t z = 0; z < oz; ++z) {
        for (int64_t y = 0; y < oy; ++y) {
            const double cz = sz * ((double)z + 0.5) - 0.5;
            const double cy = sy * ((double)y + 0.5) - 0.5;
            double* orow = out + (z * oy + y) * ox;
            for (int64_t x = 0; x < ox; ++x) {
                const double cx = sx * ((double)x + 0.5) - 0.5;
                if (order == 0) {
                    int64_t pz = clamp_idx((int64_t)std::llround(cz), iz);
                    int64_t py = clamp_idx((int64_t)std::llround(cy), iy);
                    int64_t px = clamp_idx((int64_t)std::llround(cx), ix);
                    orow[x] = src[(pz * iy + py) * ix + px];
                } else if (order == 1) {
                    int64_t z0 = (int64_t)std::floor(cz);
                    int64_t y0 = (int64_t)std::floor(cy);
                    int64_t x0 = (int64_t)std::floor(cx);
                    double tz = cz - z0, ty = cy - y0, tx = cx - x0;
                    double acc = 0.0;
                    for (int dz = 0; dz < 2; ++dz) {
                        int64_t pz = clamp_idx(z0 + dz, iz);
                        double wz = dz ? tz : 1.0 - tz;
                        if (iz == 1) { pz = 0; wz = dz ? 0.0 : 1.0; }
                        for (int dy = 0; dy < 2; ++dy) {
                            int64_t py = clamp_idx(y0 + dy, iy);
                            double wy = dy ? ty : 1.0 - ty;
                            if (iy == 1) { py = 0; wy = dy ? 0.0 : 1.0; }
                            for (int dx = 0; dx < 2; ++dx) {
                                int64_t px = clamp_idx(x0 + dx, ix);
                                double wx = dx ? tx : 1.0 - tx;
                                if (ix == 1) { px = 0; wx = dx ? 0.0 : 1.0; }
                                acc += wz * wy * wx *
                                       src[(pz * iy + py) * ix + px];
                            }
                        }
                    }
                    orow[x] = acc;
                } else {  // order 3: evaluate on the padded coefficients
                    const double czp = cz + (double)off;
                    const double cyp = cy + (double)off;
                    const double cxp = cx + (double)off;
                    int64_t z0 = (int64_t)std::floor(czp);
                    int64_t y0 = (int64_t)std::floor(cyp);
                    int64_t x0 = (int64_t)std::floor(cxp);
                    double wz[4], wy[4], wx[4];
                    cubic_weights(czp - z0, wz);
                    cubic_weights(cyp - y0, wy);
                    cubic_weights(cxp - x0, wx);
                    double acc = 0.0;
                    for (int dz = 0; dz < 4; ++dz) {
                        int64_t zi = clamp_idx(z0 - 1 + dz, pz);
                        for (int dy = 0; dy < 4; ++dy) {
                            int64_t yi = clamp_idx(y0 - 1 + dy, py);
                            const double* srow = src + (zi * py + yi) * px;
                            double partial = 0.0;
                            for (int dx = 0; dx < 4; ++dx) {
                                int64_t xi = clamp_idx(x0 - 1 + dx, px);
                                partial += wx[dx] * srow[xi];
                            }
                            acc += wz[dz] * wy[dy] * partial;
                        }
                    }
                    orow[x] = acc;
                }
            }
        }
    }
    return 0;
}

}  // extern "C"
