// Native host-side frame preprocessing for the Atari pipeline.
//
// The reference's WarpFrame (pfrl/wrappers/atari_wrappers.py:159-183) calls
// cv2.cvtColor + cv2.resize(INTER_AREA) per frame per env — a host-CPU hot
// loop that must keep up with the TPU actor. This library fuses
// RGB->grayscale and fractional-box (area) resize into one pass over the
// input, batched over env lanes, with no OpenCV dependency. Exposed to
// Python via ctypes (pfrl_tpu/runtime/__init__.py); a numpy implementation
// with identical semantics serves as fallback and test oracle.
//
// Semantics (mirrored exactly by the numpy fallback):
//   gray  = round(0.299 R + 0.587 G + 0.114 B)            (uint8, like cv2)
//   out   = round(area_average(gray))                     (uint8)
// where area_average uses fractional pixel-overlap weights — the same math
// as cv2 INTER_AREA for arbitrary scale factors.
//
// Build: g++ -O3 -shared -fPIC (see pfrl_tpu/runtime/__init__.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

// Per-axis fractional box overlap: for output index o, input pixels
// [o*scale, (o+1)*scale) contribute with weight = overlap length.
struct AxisMap {
    std::vector<int32_t> start;   // first contributing input index
    std::vector<int32_t> count;   // number of contributing inputs
    std::vector<float> weights;   // flattened [sum(count)] weights
    std::vector<int32_t> offset;  // start of each output's weights
};

AxisMap build_axis_map(int in_size, int out_size) {
    AxisMap m;
    m.start.resize(out_size);
    m.count.resize(out_size);
    m.offset.resize(out_size);
    const double scale = static_cast<double>(in_size) / out_size;
    const double inv_area = 1.0 / scale;
    for (int o = 0; o < out_size; ++o) {
        const double lo = o * scale;
        const double hi = (o + 1) * scale;
        int ilo = static_cast<int>(std::floor(lo));
        int ihi = static_cast<int>(std::ceil(hi));
        if (ihi > in_size) ihi = in_size;
        m.start[o] = ilo;
        m.count[o] = ihi - ilo;
        m.offset[o] = static_cast<int32_t>(m.weights.size());
        for (int i = ilo; i < ihi; ++i) {
            const double cov_lo = (i < lo) ? lo : i;
            const double cov_hi = ((i + 1) > hi) ? hi : (i + 1);
            m.weights.push_back(static_cast<float>((cov_hi - cov_lo) * inv_area));
        }
    }
    return m;
}

inline uint8_t luma_u8(uint8_t r, uint8_t g, uint8_t b) {
    // cv2 RGB2GRAY coefficients, round-half-away like cv2's fixed point.
    const float y = 0.299f * r + 0.587f * g + 0.114f * b;
    return static_cast<uint8_t>(y + 0.5f);
}

}  // namespace

extern "C" {

// Fused batched RGB->gray + area resize.
//   in:  [n, in_h, in_w, 3] uint8 (C-contiguous)
//   out: [n, out_h, out_w]  uint8
void warp_frames_rgb(const uint8_t* in, int n, int in_h, int in_w,
                     uint8_t* out, int out_h, int out_w) {
    const AxisMap ym = build_axis_map(in_h, out_h);
    const AxisMap xm = build_axis_map(in_w, out_w);
    std::vector<uint8_t> gray(static_cast<size_t>(in_h) * in_w);
    std::vector<float> row_acc(static_cast<size_t>(out_w));

    for (int f = 0; f < n; ++f) {
        const uint8_t* src = in + static_cast<size_t>(f) * in_h * in_w * 3;
        // Pass 1: grayscale the whole frame (sequential, vectorizable).
        for (size_t p = 0, q = 0; p < static_cast<size_t>(in_h) * in_w;
             ++p, q += 3) {
            gray[p] = luma_u8(src[q], src[q + 1], src[q + 2]);
        }
        // Pass 2: separable area resize (rows of the output).
        uint8_t* dst = out + static_cast<size_t>(f) * out_h * out_w;
        for (int oy = 0; oy < out_h; ++oy) {
            std::memset(row_acc.data(), 0, out_w * sizeof(float));
            const int ys = ym.start[oy];
            const int yc = ym.count[oy];
            const float* yw = ym.weights.data() + ym.offset[oy];
            for (int ky = 0; ky < yc; ++ky) {
                const uint8_t* grow =
                    gray.data() + static_cast<size_t>(ys + ky) * in_w;
                const float wy = yw[ky];
                for (int ox = 0; ox < out_w; ++ox) {
                    const int xs = xm.start[ox];
                    const int xc = xm.count[ox];
                    const float* xw = xm.weights.data() + xm.offset[ox];
                    float acc = 0.0f;
                    for (int kx = 0; kx < xc; ++kx) {
                        acc += xw[kx] * grow[xs + kx];
                    }
                    row_acc[ox] += wy * acc;
                }
            }
            for (int ox = 0; ox < out_w; ++ox) {
                float v = row_acc[ox] + 0.5f;
                if (v > 255.0f) v = 255.0f;
                dst[static_cast<size_t>(oy) * out_w + ox] =
                    static_cast<uint8_t>(v);
            }
        }
    }
}

// Same fused warp for frames that are already single-channel.
//   in:  [n, in_h, in_w] uint8; out: [n, out_h, out_w] uint8
void warp_frames_gray(const uint8_t* in, int n, int in_h, int in_w,
                      uint8_t* out, int out_h, int out_w) {
    const AxisMap ym = build_axis_map(in_h, out_h);
    const AxisMap xm = build_axis_map(in_w, out_w);
    std::vector<float> row_acc(static_cast<size_t>(out_w));
    for (int f = 0; f < n; ++f) {
        const uint8_t* gray = in + static_cast<size_t>(f) * in_h * in_w;
        uint8_t* dst = out + static_cast<size_t>(f) * out_h * out_w;
        for (int oy = 0; oy < out_h; ++oy) {
            std::memset(row_acc.data(), 0, out_w * sizeof(float));
            const int ys = ym.start[oy];
            const int yc = ym.count[oy];
            const float* yw = ym.weights.data() + ym.offset[oy];
            for (int ky = 0; ky < yc; ++ky) {
                const uint8_t* grow = gray + static_cast<size_t>(ys + ky) * in_w;
                const float wy = yw[ky];
                for (int ox = 0; ox < out_w; ++ox) {
                    const int xs = xm.start[ox];
                    const int xc = xm.count[ox];
                    const float* xw = xm.weights.data() + xm.offset[ox];
                    float acc = 0.0f;
                    for (int kx = 0; kx < xc; ++kx) {
                        acc += xw[kx] * grow[xs + kx];
                    }
                    row_acc[ox] += wy * acc;
                }
            }
            for (int ox = 0; ox < out_w; ++ox) {
                float v = row_acc[ox] + 0.5f;
                if (v > 255.0f) v = 255.0f;
                dst[static_cast<size_t>(oy) * out_w + ox] =
                    static_cast<uint8_t>(v);
            }
        }
    }
}

// Elementwise max of two uint8 buffers (MaxAndSkip's two-frame max,
// atari_wrappers.py:124-139).
void frame_max_u8(const uint8_t* a, const uint8_t* b, uint8_t* out,
                  int64_t count) {
    for (int64_t i = 0; i < count; ++i) {
        out[i] = a[i] > b[i] ? a[i] : b[i];
    }
}

}  // extern "C"
