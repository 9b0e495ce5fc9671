// Host-side batch transform kernels for the input pipeline.
//
// The per-step host work in the train loop is uint8 -> float32 decode
// with rescale to [-1, 1] and optional horizontal flip (reference
// transform semantics, utils/data.py:77-82).  numpy does this as a
// chain of allocating elementwise ops; this single-pass C++ kernel
// writes the final buffer directly (one read, one write per element)
// — the TPU-feed analogue of the reference's C++-backed DataLoader
// workers.  Loaded via ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC batch_ops.cpp -o libbatch_ops.so

#include <cstdint>
#include <cstring>

extern "C" {

// dst[i] = src[i] * scale + bias  (e.g. scale=2/255, bias=-1)
void u8_to_f32_affine(const uint8_t* src, float* dst, int64_t n,
                      double scale, double bias) {
    // precomputed 256-entry LUT: one load per element instead of a
    // multiply-add; the table lives in L1
    float lut[256];
    // double intermediate keeps endpoints exact (255*(2/255)-1 == 1.0f)
    for (int v = 0; v < 256; ++v)
        lut[v] = (float)((double)v * scale + bias);
    for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
}

// Batch transform with per-image horizontal flip (NHWC layout).
// flip_mask[i] != 0 => image i is mirrored along W.
void u8_batch_transform(const uint8_t* src, float* dst,
                        int64_t n_imgs, int64_t h, int64_t w, int64_t c,
                        double scale, double bias, const uint8_t* flip_mask) {
    float lut[256];
    for (int v = 0; v < 256; ++v)
        lut[v] = (float)((double)v * scale + bias);
    const int64_t img = h * w * c;
    const int64_t row = w * c;
    for (int64_t i = 0; i < n_imgs; ++i) {
        const uint8_t* s = src + i * img;
        float* d = dst + i * img;
        if (flip_mask && flip_mask[i]) {
            for (int64_t y = 0; y < h; ++y) {
                const uint8_t* sr = s + y * row;
                float* dr = d + y * row;
                for (int64_t x = 0; x < w; ++x) {
                    const uint8_t* sp = sr + (w - 1 - x) * c;
                    float* dp = dr + x * c;
                    for (int64_t k = 0; k < c; ++k) dp[k] = lut[sp[k]];
                }
            }
        } else {
            for (int64_t j = 0; j < img; ++j) d[j] = lut[s[j]];
        }
    }
}

// Gather rows by index then transform: fuses the shuffle-index gather
// with the dtype conversion (saves one uint8 batch materialization).
void u8_gather_transform(const uint8_t* src, const int64_t* idx,
                         float* dst, int64_t n_out, int64_t img_elems,
                         double scale, double bias, const uint8_t* flip_mask,
                         int64_t h, int64_t w, int64_t c) {
    float lut[256];
    for (int v = 0; v < 256; ++v)
        lut[v] = (float)((double)v * scale + bias);
    const int64_t row = w * c;
    for (int64_t i = 0; i < n_out; ++i) {
        const uint8_t* s = src + idx[i] * img_elems;
        float* d = dst + i * img_elems;
        if (flip_mask && flip_mask[i]) {
            for (int64_t y = 0; y < h; ++y) {
                const uint8_t* sr = s + y * row;
                float* dr = d + y * row;
                for (int64_t x = 0; x < w; ++x) {
                    const uint8_t* sp = sr + (w - 1 - x) * c;
                    float* dp = dr + x * c;
                    for (int64_t k = 0; k < c; ++k) dp[k] = lut[sp[k]];
                }
            }
        } else {
            for (int64_t j = 0; j < img_elems; ++j) d[j] = lut[s[j]];
        }
    }
}

}  // extern "C"
