// Native data-loader core: separable filtering + integer-factor resampling.
//
// The training input pipeline synthesizes LR images on the fly through the
// CEM's own resize kernels (reference: LRHR_dataset.py:87 via
// imresize_CEM.py); on the host this is the per-sample hot path.  scipy's
// convolve2d does a full 2-D correlation (k^2 taps/pixel); this C++ core
// exploits the kernels' separability (see exsr.ops.filters) and OpenMP-free
// plain loops that vectorize well, giving the threaded DataLoader a native
// decode-side kernel.
//
// Exposed C ABI (used via ctypes from exsr/native/__init__.py):
//   exsr_sepconv_edge(img, H, W, C, kcol, kc, krow, kr, out)
//       out = correlate(edge_pad(img), kcol x krow), same H, W
//   exsr_downscale(img, H, W, C, kcol, kc, krow, kr, f, pre, out)
//       out = subsample(correlate(edge_pad(img), k), f, pre)
//   exsr_upscale(img, H, W, C, kcol, kc, krow, kr, f, pre, out)
//       out = correlate(edge_pad(zero_stuff(img, f, pre)), k)
//
// All buffers are float64 HWC, kernels are float64 1-D taps.  Semantics
// exactly match exsr.ops.resize.imresize / exsr.ops.filters (edge padding
// of the (stuffed) image by k//2, 'valid' correlation).

#include <cstdint>
#include <vector>
#include <algorithm>

namespace {

inline int64_t clampi(int64_t v, int64_t lo, int64_t hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// Correlate rows (along W) with edge padding; img HWC -> out HWC.
void corr_rows_edge(const double* img, int64_t H, int64_t W, int64_t C,
                    const double* k, int64_t klen, double* out) {
    const int64_t r = klen / 2;
    for (int64_t y = 0; y < H; ++y) {
        const double* row = img + y * W * C;
        double* orow = out + y * W * C;
        for (int64_t x = 0; x < W; ++x) {
            for (int64_t c = 0; c < C; ++c) {
                double acc = 0.0;
                for (int64_t t = 0; t < klen; ++t) {
                    int64_t xx = clampi(x + t - r, 0, W - 1);
                    acc += k[t] * row[xx * C + c];
                }
                orow[x * C + c] = acc;
            }
        }
    }
}

// Correlate columns (along H) with edge padding.
void corr_cols_edge(const double* img, int64_t H, int64_t W, int64_t C,
                    const double* k, int64_t klen, double* out) {
    const int64_t r = klen / 2;
    for (int64_t y = 0; y < H; ++y) {
        double* orow = out + y * W * C;
        for (int64_t t = 0; t < klen; ++t) {
            int64_t yy = clampi(y + t - r, 0, H - 1);
            const double* irow = img + yy * W * C;
            const double kv = k[t];
            if (t == 0) {
                for (int64_t i = 0; i < W * C; ++i) orow[i] = kv * irow[i];
            } else {
                for (int64_t i = 0; i < W * C; ++i) orow[i] += kv * irow[i];
            }
        }
    }
}

}  // namespace

extern "C" {

void exsr_sepconv_edge(const double* img, int64_t H, int64_t W, int64_t C,
                       const double* kcol, int64_t kc,
                       const double* krow, int64_t kr, double* out) {
    std::vector<double> tmp((size_t)(H * W * C));
    corr_cols_edge(img, H, W, C, kcol, kc, tmp.data());
    corr_rows_edge(tmp.data(), H, W, C, krow, kr, out);
}

void exsr_downscale(const double* img, int64_t H, int64_t W, int64_t C,
                    const double* kcol, int64_t kc,
                    const double* krow, int64_t kr,
                    int64_t f, int64_t pre_y, int64_t pre_x, double* out) {
    std::vector<double> full((size_t)(H * W * C));
    exsr_sepconv_edge(img, H, W, C, kcol, kc, krow, kr, full.data());
    const int64_t Ho = H / f, Wo = W / f;
    for (int64_t y = 0; y < Ho; ++y) {
        const double* irow = full.data() + (y * f + pre_y) * W * C;
        double* orow = out + y * Wo * C;
        for (int64_t x = 0; x < Wo; ++x)
            for (int64_t c = 0; c < C; ++c)
                orow[x * C + c] = irow[(x * f + pre_x) * C + c];
    }
}

void exsr_upscale(const double* img, int64_t H, int64_t W, int64_t C,
                  const double* kcol, int64_t kc,
                  const double* krow, int64_t kr,
                  int64_t f, int64_t pre_y, int64_t pre_x, double* out) {
    const int64_t Ho = H * f, Wo = W * f;
    std::vector<double> stuffed((size_t)(Ho * Wo * C), 0.0);
    for (int64_t y = 0; y < H; ++y)
        for (int64_t x = 0; x < W; ++x)
            for (int64_t c = 0; c < C; ++c)
                stuffed[((y * f + pre_y) * Wo + (x * f + pre_x)) * C + c] =
                    img[(y * W + x) * C + c];
    exsr_sepconv_edge(stuffed.data(), Ho, Wo, C, kcol, kc, krow, kr, out);
}

}  // extern "C"
