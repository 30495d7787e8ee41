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

#include <atomic>
#include <thread>
#include <vector>

#include <zlib.h>

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

// ---------------------------------------------------------------------------
// Full in-memory PNG decode (8-bit, non-interlaced RGB/RGBA/gray) and a
// threaded batch front-end — the framework's native data-loader for the
// batched pipeline (models/batched.py). The reference's loader is
// cv::imread called serially per image (serial.cpp:22); here N images
// decode on a std::thread pool into one preallocated host buffer.

namespace {

struct PngInfo {
    uint32_t width = 0, height = 0;
    uint8_t bit_depth = 0, color_type = 0, interlace = 0;
};

inline uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

const uint8_t kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

// Decode one PNG buffer to tightly-packed RGB8 (out = w*h*3).
// Returns 0 ok; -1 bad signature/structure; -2 unsupported format;
// -3 zlib error; -4 bad filter; -5 output size mismatch.
int decode_rgb8_one(const uint8_t* data, int64_t len, uint8_t* out,
                    int expect_w, int expect_h) {
    if (len < 8 || std::memcmp(data, kSig, 8) != 0) return -1;
    PngInfo info;
    std::vector<uint8_t> idat;
    std::vector<uint8_t> palette;  // 3 bytes per entry
    int64_t pos = 8;
    while (pos + 12 <= len) {
        const uint32_t clen = be32(data + pos);
        const uint8_t* ctype = data + pos + 4;
        const uint8_t* body = data + pos + 8;
        if (pos + 12 + clen > len) return -1;
        if (!std::memcmp(ctype, "IHDR", 4)) {
            if (clen < 13) return -1;
            info.width = be32(body);
            info.height = be32(body + 4);
            info.bit_depth = body[8];
            info.color_type = body[9];
            info.interlace = body[12];
        } else if (!std::memcmp(ctype, "PLTE", 4)) {
            palette.assign(body, body + clen);
        } else if (!std::memcmp(ctype, "IDAT", 4)) {
            idat.insert(idat.end(), body, body + clen);
        } else if (!std::memcmp(ctype, "IEND", 4)) {
            break;
        }
        pos += 12 + clen;
    }
    if (info.width == 0 || info.interlace != 0 || info.bit_depth != 8)
        return -2;
    if (expect_w > 0 && (int)info.width != expect_w) return -5;
    if (expect_h > 0 && (int)info.height != expect_h) return -5;
    int channels;
    switch (info.color_type) {
        case 0: channels = 1; break;
        case 2: channels = 3; break;
        case 3: channels = 1; break;
        case 4: channels = 2; break;
        case 6: channels = 4; break;
        default: return -2;
    }
    const int w = info.width, h = info.height;
    const int stride = w * channels;
    std::vector<uint8_t> raw((int64_t)h * (stride + 1));
    {
        uLongf dst_len = raw.size();
        if (uncompress(raw.data(), &dst_len, idat.data(), idat.size()) != Z_OK ||
            dst_len != raw.size())
            return -3;
    }
    std::vector<uint8_t> recon((int64_t)h * stride);
    if (unfilter_scanlines(raw.data(), recon.data(), h, stride, channels) != 0)
        return -4;
    // expand to RGB8
    for (int64_t i = 0; i < (int64_t)w * h; ++i) {
        const uint8_t* px = recon.data() + i * channels;
        uint8_t r, g, b;
        switch (info.color_type) {
            case 0: case 4: r = g = b = px[0]; break;
            case 3: {
                const int idx = px[0] * 3;
                if (idx + 2 >= (int)palette.size()) return -2;
                r = palette[idx]; g = palette[idx + 1]; b = palette[idx + 2];
                break;
            }
            default: r = px[0]; g = px[1]; b = px[2]; break;
        }
        out[i * 3] = r;
        out[i * 3 + 1] = g;
        out[i * 3 + 2] = b;
    }
    return 0;
}

}  // namespace

extern "C" {

// Probe dimensions. Returns 0 and fills w/h, or <0.
int png_get_size(const uint8_t* data, int64_t len, int* w, int* h) {
    if (len < 33 || std::memcmp(data, kSig, 8) != 0) return -1;
    if (std::memcmp(data + 12, "IHDR", 4) != 0) return -1;
    *w = (int)be32(data + 16);
    *h = (int)be32(data + 20);
    return 0;
}

int decode_png_rgb8(const uint8_t* data, int64_t len, uint8_t* out, int w,
                    int h) {
    return decode_rgb8_one(data, len, out, w, h);
}

// Batch decode: n same-sized PNG buffers into out[n, h, w, 3] using up
// to `threads` worker threads. Returns 0, or the first nonzero error.
int decode_png_batch_rgb8(const uint8_t** datas, const int64_t* lens, int n,
                          uint8_t* out, int w, int h, int threads) {
    if (threads < 1) threads = 1;
    if (threads > n) threads = n;
    std::atomic<int> next(0);
    std::atomic<int> err(0);
    const int64_t frame = (int64_t)w * h * 3;
    auto worker = [&]() {
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) return;
            const int rc = decode_rgb8_one(datas[i], lens[i], out + i * frame, w, h);
            if (rc != 0) {
                int expected = 0;
                err.compare_exchange_strong(expected, rc);
            }
        }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
    return err.load();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Baseline-JPEG entropy decode — the sequential hot loop of JPEG ingest
// (utils/jpeg.py). Python resolves markers/tables and the vectorized
// dequant/IDCT; this function Huffman-decodes one restart segment of
// interleaved MCUs into raw coefficient blocks.
//
// Tables arrive as the same 16-bit LUTs the Python decoder builds
// (_Huff): lut_sym/lut_len[table][window16] -> (symbol, code bits).
// Table layout: per component c, DC table at index 2c, AC at 2c+1.

namespace {

struct BitReader {
    const uint8_t* data;
    int64_t nbytes;
    int64_t bitpos = 0;

    inline int peek16() const {
        int64_t byte = bitpos >> 3;
        int shift = static_cast<int>(bitpos & 7);
        uint32_t window = 0;
        for (int i = 0; i < 3; ++i) {
            uint32_t b = (byte + i < nbytes) ? data[byte + i] : 0;
            window = (window << 8) | b;
        }
        return static_cast<int>((window >> (8 - shift)) & 0xFFFF);
    }

    inline bool ok(int64_t need) const { return bitpos + need <= nbytes * 8; }
};

inline int extend(int v, int s) {
    return (s && v < (1 << (s - 1))) ? v - (1 << s) + 1 : v;
}

}  // namespace

// Decode n_mcu interleaved MCUs. block_comp: component index of each of
// blocks_per_mcu blocks in an MCU. out: (n_mcu * blocks_per_mcu, 64)
// int32, natural (zigzag) coefficient order. Returns 0 on success,
// -1 invalid Huffman code, -2 exhausted data, -3 AC overflow.
extern "C" int jpeg_decode_scan(const uint8_t* data, int64_t nbytes, int n_comps,
                     const uint8_t* lut_sym, const uint8_t* lut_len,
                     const int32_t* block_comp, int blocks_per_mcu,
                     int64_t n_mcu, int32_t* out) {
    BitReader br{data, nbytes};
    std::vector<int> pred(n_comps, 0);
    for (int64_t m = 0; m < n_mcu; ++m) {
        for (int j = 0; j < blocks_per_mcu; ++j) {
            int c = block_comp[j];
            const uint8_t* dc_sym = lut_sym + (int64_t)(2 * c) * 65536;
            const uint8_t* dc_len = lut_len + (int64_t)(2 * c) * 65536;
            const uint8_t* ac_sym = lut_sym + (int64_t)(2 * c + 1) * 65536;
            const uint8_t* ac_len = lut_len + (int64_t)(2 * c + 1) * 65536;
            int32_t* blk = out + (m * blocks_per_mcu + j) * 64;
            std::memset(blk, 0, 64 * sizeof(int32_t));
            // DC
            int w = br.peek16();
            int len = dc_len[w];
            if (len == 0) return -1;
            if (!br.ok(len)) return -2;
            int s = dc_sym[w];
            br.bitpos += len;
            if (!br.ok(s)) return -2;
            int bits = s ? (br.peek16() >> (16 - s)) : 0;
            br.bitpos += s;
            pred[c] += extend(bits, s);
            blk[0] = pred[c];
            // AC
            int k = 1;
            while (k < 64) {
                w = br.peek16();
                len = ac_len[w];
                if (len == 0) return -1;
                if (!br.ok(len)) return -2;
                int rs = ac_sym[w];
                br.bitpos += len;
                int r = rs >> 4, sz = rs & 15;
                if (sz == 0) {
                    if (r == 15) { k += 16; continue; }
                    break;  // EOB
                }
                k += r;
                if (k > 63) return -3;
                if (!br.ok(sz)) return -2;
                int v = br.peek16() >> (16 - sz);
                br.bitpos += sz;
                blk[k] = extend(v, sz);
                ++k;
            }
        }
    }
    return 0;
}
