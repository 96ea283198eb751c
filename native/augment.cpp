// Native host-side augmentation kernels.
//
// The reference does its augmentation with scipy in 8 forked DataLoader
// workers (train_…unet_2D.py:90-91); this host has ONE core, so the
// Python/scipy per-slice zoom+rotate becomes the input bottleneck for a
// ~240 steps/sec TPU train loop. These are the two expensive inner
// loops (order-0 zoom, order-0 rotate) as tight C++, exposed via ctypes
// (icl_tpu/native/__init__.py). Semantics match scipy.ndimage exactly:
//   zoom (grid_mode=False):  src = round(dst * (in-1)/(out-1))
//   rotate (reshape=False):  src = R(dst - c) + c, nearest, cval=0
//
// Build: g++ -O3 -march=native -shared -fPIC augment.cpp -o libaugment.so
#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

inline int zoom_index(int i, int in_size, int out_size) {
    if (out_size == 1) return 0;
    double ratio = double(in_size - 1) / double(out_size - 1);
    int idx = int(std::floor(i * ratio + 0.5));
    if (idx < 0) idx = 0;
    if (idx >= in_size) idx = in_size - 1;
    return idx;
}

template <typename T>
void zoom_nearest(const T* in, int h, int w, T* out, int oh, int ow) {
    // Precompute column map once; rows on the fly.
    int* col = new int[ow];
    for (int j = 0; j < ow; ++j) col[j] = zoom_index(j, w, ow);
    for (int i = 0; i < oh; ++i) {
        const T* row = in + size_t(zoom_index(i, h, oh)) * w;
        T* orow = out + size_t(i) * ow;
        for (int j = 0; j < ow; ++j) orow[j] = row[col[j]];
    }
    delete[] col;
}

template <typename T>
void rotate_nearest(const T* in, int h, int w, float angle_deg, T* out) {
    // scipy.ndimage.rotate(order=0, reshape=False, mode='constant'):
    // output(o) = input(R^-1 (o - c) + c); for order-0 this reduces to a
    // nearest gather with rounding of the source coordinate.
    const double theta = -double(angle_deg) * M_PI / 180.0;
    const double ct = std::cos(theta), st = std::sin(theta);
    const double cy = (h - 1) / 2.0, cx = (w - 1) / 2.0;
    for (int i = 0; i < h; ++i) {
        const double dy = i - cy;
        T* orow = out + size_t(i) * w;
        for (int j = 0; j < w; ++j) {
            const double dx = j - cx;
            const double sy = ct * dy - st * dx + cy;
            const double sx = st * dy + ct * dx + cx;
            // scipy validity rule: the UNROUNDED coordinate must lie in
            // [0, size-1]; otherwise cval (verified against ndimage).
            if (sy < 0.0 || sy > h - 1 || sx < 0.0 || sx > w - 1) {
                orow[j] = T(0);
            } else {
                const long iy = long(std::floor(sy + 0.5));
                const long ix = long(std::floor(sx + 0.5));
                orow[j] = in[size_t(iy) * w + ix];
            }
        }
    }
}

}  // namespace

extern "C" {

void zoom_nearest_f32(const float* in, int h, int w, float* out, int oh, int ow) {
    zoom_nearest<float>(in, h, w, out, oh, ow);
}

void zoom_nearest_u8(const uint8_t* in, int h, int w, uint8_t* out, int oh, int ow) {
    zoom_nearest<uint8_t>(in, h, w, out, oh, ow);
}

void rotate_nearest_f32(const float* in, int h, int w, float angle, float* out) {
    rotate_nearest<float>(in, h, w, angle, out);
}

void rotate_nearest_u8(const uint8_t* in, int h, int w, float angle, uint8_t* out) {
    rotate_nearest<uint8_t>(in, h, w, angle, out);
}

}  // extern "C"
