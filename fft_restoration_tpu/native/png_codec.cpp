// Native PNG scanline unfiltering — the hot loop of PNG decode.
//
// The reference framework leans on OpenCV (C++) for all image I/O
// (/root/reference/serial.cpp:22); this framework's runtime is
// OpenCV-free, with a pure-Python codec (utils/imageio.py) and this C++
// fast path for the sequential, branch-heavy per-scanline unfilter that
// Python executes ~1000x slower. Loaded via ctypes (no pybind11 in the
// image); falls back to Python transparently when the .so is absent.
//
// Build: make -C fft_restoration_tpu/native
//
// PNG filter spec (RFC 2083 §6): each scanline is prefixed by a filter
// byte 0..4 (None, Sub, Up, Average, Paeth); reconstruction is
// sequential in x for Sub/Average/Paeth and in y for Up/Average/Paeth.

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

inline uint8_t paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = p > a ? p - a : a - p;
    int pb = p > b ? p - b : b - p;
    int pc = p > c ? p - c : c - p;
    if (pa <= pb && pa <= pc) return static_cast<uint8_t>(a);
    if (pb <= pc) return static_cast<uint8_t>(b);
    return static_cast<uint8_t>(c);
}

}  // namespace

extern "C" {

// raw:    height * (stride + 1) filtered bytes (filter byte per row)
// out:    height * stride reconstructed bytes
// return: 0 on success, -1 on a bad filter byte
int unfilter_scanlines(const uint8_t* raw, uint8_t* out, int height,
                       int stride, int bpp) {
    const uint8_t* prev = nullptr;
    for (int y = 0; y < height; ++y) {
        const uint8_t* src = raw + static_cast<int64_t>(y) * (stride + 1);
        uint8_t* dst = out + static_cast<int64_t>(y) * stride;
        const uint8_t filter = src[0];
        ++src;
        switch (filter) {
            case 0:  // None
                std::memcpy(dst, src, stride);
                break;
            case 1:  // Sub
                std::memcpy(dst, src, bpp);
                for (int x = bpp; x < stride; ++x)
                    dst[x] = static_cast<uint8_t>(src[x] + dst[x - bpp]);
                break;
            case 2:  // Up
                if (prev) {
                    for (int x = 0; x < stride; ++x)
                        dst[x] = static_cast<uint8_t>(src[x] + prev[x]);
                } else {
                    std::memcpy(dst, src, stride);
                }
                break;
            case 3:  // Average
                for (int x = 0; x < stride; ++x) {
                    const int left = x >= bpp ? dst[x - bpp] : 0;
                    const int up = prev ? prev[x] : 0;
                    dst[x] = static_cast<uint8_t>(src[x] + ((left + up) >> 1));
                }
                break;
            case 4:  // Paeth
                for (int x = 0; x < stride; ++x) {
                    const int left = x >= bpp ? dst[x - bpp] : 0;
                    const int up = prev ? prev[x] : 0;
                    const int ul = (prev && x >= bpp) ? prev[x - bpp] : 0;
                    dst[x] = static_cast<uint8_t>(src[x] + paeth(left, up, ul));
                }
                break;
            default:
                return -1;
        }
        prev = dst;
    }
    return 0;
}

// Filter scanlines for encoding with the Paeth predictor (type 4) —
// better compression than the Python encoder's Up filter on natural
// images. out must hold height * (stride + 1) bytes.
int filter_scanlines_paeth(const uint8_t* img, uint8_t* out, int height,
                           int stride, int bpp) {
    const uint8_t* prev = nullptr;
    for (int y = 0; y < height; ++y) {
        const uint8_t* src = img + static_cast<int64_t>(y) * stride;
        uint8_t* dst = out + static_cast<int64_t>(y) * (stride + 1);
        dst[0] = 4;
        ++dst;
        for (int x = 0; x < stride; ++x) {
            const int left = x >= bpp ? src[x - bpp] : 0;
            const int up = prev ? prev[x] : 0;
            const int ul = (prev && x >= bpp) ? prev[x - bpp] : 0;
            dst[x] = static_cast<uint8_t>(src[x] - paeth(left, up, ul));
        }
        prev = src;
    }
    return 0;
}

}  // extern "C"
