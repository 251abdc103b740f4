// Host-side blockwise 8x8 DCT for the DCT-domain data pipeline.
//
// Native replacement for the reference's imported jpeg2dct / TurboJPEG
// coefficient path (datasets/dataset_imagenet_dct.py:12-15): the TPU only
// ever sees fixed-shape coefficient tensors; this kernel produces them on the
// host an order of magnitude faster than numpy einsum, keeping the input
// pipeline off the critical path.
//
// C ABI, loaded via ctypes (vwfd_tpu/native.py). Build:
//   g++ -O3 -march=native -shared -fPIC csrc/blockdct.cpp -o vwfd_tpu/_native.so

#include <cmath>
#include <cstring>

namespace {

struct DctTable {
    float c[8][8];
    DctTable() {
        const double pi = 3.14159265358979323846;
        for (int j = 0; j < 8; ++j) c[0][j] = (float)std::sqrt(1.0 / 8.0);
        for (int i = 1; i < 8; ++i)
            for (int j = 0; j < 8; ++j)
                c[i][j] = (float)(std::cos(pi * i * (2 * j + 1) / 16.0) *
                                  std::sqrt(2.0 / 8.0));
    }
};
const DctTable kDct;

}  // namespace

extern "C" {

// plane: (h, w) row-major float32; out: (h/8, w/8, 64) row-major float32.
void blockwise_dct8(const float* plane, int h, int w, float* out) {
    const int bh = h / 8, bw = w / 8;
    float tmp[8][8];
    float blk[8][8];
    for (int by = 0; by < bh; ++by) {
        for (int bx = 0; bx < bw; ++bx) {
            const float* src = plane + (by * 8) * w + bx * 8;
            // tmp = C * block
            for (int i = 0; i < 8; ++i) {
                for (int j = 0; j < 8; ++j) {
                    float acc = 0.f;
                    for (int k = 0; k < 8; ++k)
                        acc += kDct.c[i][k] * src[k * w + j];
                    tmp[i][j] = acc;
                }
            }
            // blk = tmp * C^T
            for (int i = 0; i < 8; ++i) {
                for (int j = 0; j < 8; ++j) {
                    float acc = 0.f;
                    for (int k = 0; k < 8; ++k)
                        acc += tmp[i][k] * kDct.c[j][k];
                    blk[i][j] = acc;
                }
            }
            std::memcpy(out + (by * bw + bx) * 64, &blk[0][0],
                        64 * sizeof(float));
        }
    }
}

// Batched variant: planes (n, h, w) -> out (n, h/8, w/8, 64).
void blockwise_dct8_batch(const float* planes, int n, int h, int w,
                          float* out) {
    const long plane_sz = (long)h * w;
    const long out_sz = (long)(h / 8) * (w / 8) * 64;
    for (int i = 0; i < n; ++i)
        blockwise_dct8(planes + i * plane_sz, h, w, out + i * out_sz);
}

// Free-form stroke rasterization helper: thick line segment into a mask.
// mask: (h, w) float32; draws value 1.0 with given radius (brush/2).
void draw_thick_line(float* mask, int h, int w, int y0, int x0, int y1,
                     int x1, int radius) {
    const int steps = (int)(std::sqrt((double)((y1 - y0) * (y1 - y0) +
                                               (x1 - x0) * (x1 - x0)))) + 1;
    for (int s = 0; s <= steps; ++s) {
        const double t = (double)s / steps;
        const int cy = (int)(y0 + t * (y1 - y0));
        const int cx = (int)(x0 + t * (x1 - x0));
        for (int dy = -radius; dy <= radius; ++dy) {
            const int yy = cy + dy;
            if (yy < 0 || yy >= h) continue;
            for (int dx = -radius; dx <= radius; ++dx) {
                const int xx = cx + dx;
                if (xx < 0 || xx >= w) continue;
                if (dy * dy + dx * dx <= radius * radius)
                    mask[yy * w + xx] = 1.0f;
            }
        }
    }
}

}  // extern "C"
