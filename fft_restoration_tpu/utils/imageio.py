"""PNG image I/O without OpenCV/PIL.

The reference leans on OpenCV for imread/imwrite (/root/reference/serial.cpp:22,
gpu.cpp). This framework ships its own codec so the runtime has no OpenCV
dependency: a pure-Python PNG decoder/encoder on stdlib zlib, with an
optional C++ fast path (native/png_codec.cpp, loaded via ctypes) for the
hot unfilter/filter loops on large images.

API parity: `imread` returns BGR uint8 (H, W, 3) like cv::imread(IMREAD_COLOR);
`imwrite` takes BGR uint8.
"""

from __future__ import annotations

import os
import struct
import warnings
import zlib
from pathlib import Path

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------------------
# optional C++ fast path for scanline unfiltering (see native/png_codec.cpp)
_native = None


def _load_native():
    global _native
    if _native is not None:
        return _native
    import ctypes

    # FFT_NATIVE_DIR points at an out-of-tree build (e.g. the ASAN
    # variants tools/native_asan_fuzz.py compiles); no auto-build there.
    override = os.environ.get("FFT_NATIVE_DIR")
    native_dir = Path(override) if override else (
        Path(__file__).resolve().parent.parent / "native"
    )
    lib_path = native_dir / "libpngfilt.so"
    if not override and not lib_path.exists() and (native_dir / "png_codec.cpp").exists():
        # best-effort one-time build of the fast path
        import shutil
        import subprocess

        if shutil.which("make") and shutil.which("g++"):
            subprocess.run(
                ["make", "-C", str(native_dir)],
                capture_output=True,
                check=False,
            )
    if not lib_path.exists():
        _native = False
        return _native
    try:
        lib = ctypes.CDLL(str(lib_path))
        lib.unfilter_scanlines.restype = ctypes.c_int
        lib.unfilter_scanlines.argtypes = [
            ctypes.c_char_p,  # raw filtered data
            ctypes.POINTER(ctypes.c_uint8),  # out
            ctypes.c_int,  # height
            ctypes.c_int,  # stride (bytes per scanline, no filter byte)
            ctypes.c_int,  # bpp (bytes per pixel)
        ]
        lib.filter_scanlines_paeth.restype = ctypes.c_int
        lib.filter_scanlines_paeth.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),  # img
            ctypes.POINTER(ctypes.c_uint8),  # out (filtered, +1 byte/row)
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.png_get_size.restype = ctypes.c_int
        lib.png_get_size.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.decode_png_batch_rgb8.restype = ctypes.c_int
        lib.decode_png_batch_rgb8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        try:
            lib.jpeg_decode_scan.restype = ctypes.c_int
            lib.jpeg_decode_scan.argtypes = [
                ctypes.c_char_p,  # entropy data (unstuffed)
                ctypes.c_int64,  # nbytes
                ctypes.c_int,  # n_comps
                ctypes.POINTER(ctypes.c_uint8),  # lut_sym (2C, 65536)
                ctypes.POINTER(ctypes.c_uint8),  # lut_len
                ctypes.POINTER(ctypes.c_int32),  # block_comp
                ctypes.c_int,  # blocks_per_mcu
                ctypes.c_int64,  # n_mcu
                ctypes.POINTER(ctypes.c_int32),  # out coeffs
            ]
        except AttributeError:
            pass  # stale .so without the JPEG entry point
        _native = lib
    except OSError:
        _native = False
    return _native


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. Returns (height, stride) uint8."""
    expected = height * (stride + 1)
    if len(raw) != expected:
        raise ValueError(
            f"corrupt PNG: decompressed {len(raw)} bytes, expected {expected}"
        )
    lib = _load_native()
    if lib:
        import ctypes

        out = np.empty((height, stride), dtype=np.uint8)
        rc = lib.unfilter_scanlines(
            raw,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            height,
            stride,
            bpp,
        )
        if rc == 0:
            return out
        # fall through to Python on unexpected filter bytes

    data = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = data[:, 0]
    rows = data[:, 1:]
    if np.any((filters == 3) | (filters == 4)):
        warnings.warn(
            "decoding PNG with Average/Paeth filters on the pure-Python "
            "fallback (native libpngfilt.so unavailable) — this is a "
            "per-pixel loop and can take minutes on large images",
            RuntimeWarning,
            stacklevel=2,
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = filters[y]
        row = rows[y].copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub: out[x] = raw[x] + out[x-bpp] == cumsum mod 256
            # over each of the bpp byte lanes (vectorized; uint8 wraps).
            tail = stride - stride % bpp
            lanes = row[:tail].reshape(-1, bpp)
            np.cumsum(lanes, axis=0, dtype=np.uint8, out=lanes)
            out[y] = row
        elif f == 2:  # Up
            out[y] = (row.astype(np.int32) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = row
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
            out[y] = row
        else:
            raise ValueError(f"bad PNG filter {f} on row {y}")
    return out


# Adam7 pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _deinterlace_adam7(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reassemble an Adam7-interlaced image: the stream holds 7
    independently-filtered sub-images; unfilter each and scatter its
    pixels onto the (height, width*bpp) grid."""
    out = np.zeros((height, width, bpp), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        w_p = (width - x0 + dx - 1) // dx
        h_p = (height - y0 + dy - 1) // dy
        if w_p <= 0 or h_p <= 0:
            continue
        stride_p = w_p * bpp
        size = h_p * (stride_p + 1)
        sub = _unfilter(raw[pos : pos + size], h_p, stride_p, bpp)
        pos += size
        out[y0::dy, x0::dx] = sub.reshape(h_p, w_p, bpp)
    return out.reshape(height, width * bpp)


def _unpack_subbyte(rows: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(h, stride_bytes) packed scanlines -> (h, width) sample values.
    PNG packs sub-byte samples MSB-first within each byte (1/2/4 bpp)."""
    bits = np.unpackbits(rows, axis=1)
    fields = bits[:, : (bits.shape[1] // depth) * depth].reshape(
        rows.shape[0], -1, depth
    )
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (fields * weights).sum(axis=2).astype(np.uint8)[:, :width]


def _decode_subbyte_image(
    raw: bytes, width: int, height: int, depth: int, interlace: int
) -> np.ndarray:
    """Unfilter + unpack a 1/2/4-bit PNG image (gray or palette indices)
    -> (height, width) uint8 samples. Filtering operates on the packed
    bytes with bpp=1 (PNG spec: bpp rounds up to one byte)."""
    if interlace == 0:
        stride = (width * depth + 7) // 8
        return _unpack_subbyte(_unfilter(raw, height, stride, 1), width, depth)
    out = np.zeros((height, width), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        w_p = (width - x0 + dx - 1) // dx
        h_p = (height - y0 + dy - 1) // dy
        if w_p <= 0 or h_p <= 0:
            continue
        stride_p = (w_p * depth + 7) // 8
        size = h_p * (stride_p + 1)
        sub = _unfilter(raw[pos : pos + size], h_p, stride_p, 1)
        pos += size
        out[y0::dy, x0::dx] = _unpack_subbyte(sub, w_p, depth)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to an RGB(A)/gray uint8 array (H, W[, C])."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    trns = None
    while pos < len(data):
        try:
            (length,) = struct.unpack(">I", data[pos : pos + 4])
        except struct.error as e:
            raise ValueError(f"corrupt PNG: truncated chunk header: {e}") from e
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            try:
                width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                    ">IIBBBBB", chunk
                )
            except struct.error as e:
                raise ValueError(f"corrupt PNG: bad IHDR: {e}") from e
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(chunk, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if bit_depth in (1, 2, 4) and color_type not in (0, 3):
        raise ValueError(
            f"bit depth {bit_depth} is only valid for gray/palette PNGs "
            f"(color type {color_type})"
        )
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"bit depth {bit_depth} not supported")

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG: IDAT inflate failed: {e}") from e

    if bit_depth in (1, 2, 4):
        samples = _decode_subbyte_image(raw, width, height, bit_depth, interlace)
        if color_type == 0:
            # libpng's expand scaling: replicate the value across the
            # 8-bit range (255 / (2^d - 1) is exact for d in 1/2/4).
            samples = samples * np.uint8(255 // ((1 << bit_depth) - 1))
        img = samples[..., None]
    else:
        sample_bytes = bit_depth // 8
        bpp = channels * sample_bytes
        stride = width * bpp
        if interlace == 1:
            arr = _deinterlace_adam7(raw, width, height, bpp)
        else:
            arr = _unfilter(raw, height, stride, bpp)
        if bit_depth == 16:
            # 16-bit -> 8-bit with rounding: v8 = round(v16 * 255 / 65535),
            # which equals round(v16 / 257) (not a high-byte truncate).
            arr16 = arr.reshape(height, width, channels, 2)
            v16 = arr16[..., 0].astype(np.uint32) << 8 | arr16[..., 1]
            img = ((v16 * 255 + 32767) // 65535).astype(np.uint8)
            img = img.reshape(height, width, channels)
        else:
            img = arr.reshape(height, width, channels)

    if color_type == 3:  # palette
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        idx = img[..., 0]
        img = palette[idx]
        if trns is not None:
            lut = np.full(256, 255, np.uint8)
            lut[: min(len(trns), 256)] = trns[:256]
            img = np.dstack([img, lut[idx]])
    if img.shape[-1] == 1:
        img = img[..., 0]
    return img


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode a uint8 gray/(H,W)/RGB/RGBA array as PNG bytes (filter 0/2)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        img = img[..., None]
    elif img.shape[-1] == 2:  # grayscale + alpha (color type 4)
        color_type, channels = 4, 2
    elif img.shape[-1] == 3:
        color_type, channels = 2, 3
    elif img.shape[-1] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported channel count {img.shape[-1]}")
    height, width = img.shape[:2]

    flat = np.ascontiguousarray(img.reshape(height, width * channels))
    stride = width * channels
    lib = _load_native()
    if lib:
        import ctypes

        # Paeth predictor (filter 4) via the C++ fast path: better
        # compression than Up on natural images.
        filtered = np.empty((height, stride + 1), dtype=np.uint8)
        rc = lib.filter_scanlines_paeth(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            filtered.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            height,
            stride,
            channels,
        )
        lib = lib if rc == 0 else None
    if not lib:
        # Pure-Python fallback: filter type 2 (Up) for rows 1.. — cheap to
        # compute vectorized; row 0 uses filter 0.
        filtered = np.empty((height, stride + 1), dtype=np.uint8)
        filtered[:, 0] = 2
        filtered[0, 0] = 0
        filtered[0, 1:] = flat[0]
        if height > 1:
            filtered[1:, 1:] = flat[1:] - flat[:-1]
    payload = zlib.compress(filtered.tobytes(), compress_level)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", payload)
        + chunk(b"IEND", b"")
    )


def probe_size(path: str) -> tuple:
    """(height, width) from headers only, for any supported format.

    Raises ValueError on unknown/corrupt headers — callers (the CLI
    batch loader) use this to group frames and skip unreadable files."""
    data = Path(path).read_bytes()
    if data[:8] == _PNG_SIG:
        if len(data) < 24:
            raise ValueError("corrupt PNG: truncated IHDR")
        w, h = struct.unpack(">II", data[16:24])
        return h, w
    from fft_restoration_tpu.utils import formats

    if formats.sniff(data):
        return formats.probe_size(data)
    if data[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                raise ValueError("corrupt JPEG: expected marker")
            marker = data[pos + 1]
            if marker == 0xFF:  # fill byte padding
                pos += 1
                continue
            pos += 2
            if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            (seglen,) = struct.unpack(">H", data[pos : pos + 2])
            if marker in (0xC0, 0xC1, 0xC2):  # baseline/progressive: decodable
                _, h, w = struct.unpack(">BHH", data[pos + 2 : pos + 7])
                return h, w
            if marker in (0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                # dims are parseable but decode_jpeg will refuse; raise
                # HERE so batch grouping skips just this file instead of
                # failing (and discarding) its whole same-size group
                raise ValueError(
                    "only baseline and progressive Huffman JPEG are "
                    f"supported (SOF marker 0xFF{marker:02X})"
                )
            pos += seglen
        raise ValueError("corrupt JPEG: no SOF marker")
    raise ValueError(
        "unrecognised image format (PNG/JPEG/BMP/PNM/PFM/TIFF/"
        "WebP/HDR/RAS/JP2/EXR/GIF supported)"
    )


def decode_image_bgr(data: bytes) -> np.ndarray:
    """Decode image bytes to BGR uint8 (H, W, 3), like cv::imread(IMREAD_COLOR).

    Formats, dispatched on magic bytes: PNG (this codec), baseline +
    progressive JPEG (utils/jpeg.py), BMP, PBM/PGM/PPM, PFM,
    TIFF (none/LZW/deflate/PackBits, strips + tiles, chunky + planar),
    WebP, Radiance HDR, Sun Raster
    (utils/formats.py), scanline + tiled OpenEXR (utils/exr.py), JPEG 2000
    (utils/jp2.py), GIF (utils/gif.py), and AVIF via the from-scratch
    AV1 still decoder (utils/av1.py) — the full cv::imread
    surface the reference's drivers accept
    (/root/reference/serial.cpp:22). Channel
    canonicalisation: gray and gray+alpha replicate to 3 channels, RGBA
    drops alpha, 16-bit narrows to the high byte (cv::imread
    IMREAD_COLOR semantics). Decoder-internal failures
    (truncated/garbage streams) are normalised to ValueError."""
    try:
        if data[:2] == b"\xff\xd8":
            from fft_restoration_tpu.utils.jpeg import decode_jpeg

            img = decode_jpeg(data)
        elif data[:8] == _PNG_SIG:
            img = decode_png(data)
        else:
            from fft_restoration_tpu.utils import formats

            if formats.sniff(data) is None:
                raise ValueError(
                    "unrecognised image format (PNG/JPEG/BMP/PNM/PFM/TIFF/"
                    "WebP/HDR/RAS/JP2/EXR/GIF supported)"
                )
            img = formats.decode(data)
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(f"corrupt image data: {e}") from e
    if img.dtype == np.uint16:
        img = (img >> 8).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    elif img.shape[-1] == 2:  # grayscale + alpha (color type 4)
        img = np.repeat(img[..., :1], 3, axis=-1)
    elif img.shape[-1] == 4:
        img = img[..., :3]
    return img[..., ::-1].copy()  # RGB -> BGR


def imread(path: str) -> np.ndarray:
    """Read an image file as BGR uint8 (H, W, 3) — see decode_image_bgr."""
    return decode_image_bgr(Path(path).read_bytes())


def imread_batch(paths, threads: int = 8) -> np.ndarray:
    """Decode N same-sized PNGs into one (N, H, W, 3) BGR uint8 array.

    The batch data-loader for models/batched.py: decodes on a C++
    std::thread pool (native/png_codec.cpp decode_png_batch_rgb8) when
    the fast path is built, else serial Python. The reference has no
    batch loader — its drivers call cv::imread once per run
    (serial.cpp:22); this is the production-ingest counterpart.
    """
    paths = list(paths)
    if not paths:
        return np.empty((0, 0, 0, 3), np.uint8)
    blobs = [Path(p).read_bytes() for p in paths]
    lib = _load_native()
    if lib:
        import ctypes

        w = ctypes.c_int()
        h = ctypes.c_int()
        if lib.png_get_size(blobs[0], len(blobs[0]), ctypes.byref(w), ctypes.byref(h)) == 0:
            n = len(blobs)
            out = np.empty((n, h.value, w.value, 3), np.uint8)
            arr_t = ctypes.c_char_p * n
            len_t = ctypes.c_int64 * n
            datas = arr_t(*blobs)
            lens = len_t(*[len(b) for b in blobs])
            rc = lib.decode_png_batch_rgb8(
                datas,
                lens,
                n,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                w.value,
                h.value,
                threads,
            )
            if rc == 0:
                return out[..., ::-1].copy()  # RGB -> BGR
        # fall through on unsupported formats
    # thread the per-file decodes: the native scan/unfilter calls and
    # zlib release the GIL, so mixed JPEG/odd-PNG batches still scale
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max(1, threads)) as ex:
        return np.stack(list(ex.map(imread, paths)), axis=0)


def imwrite(path: str, img_bgr: np.ndarray) -> None:
    """Write a BGR uint8 (H, W, 3) or gray (H, W) image, format by extension.

    `.png` (default for unknown extensions), `.jpg`/`.jpeg` (baseline,
    quality 90), `.bmp`/`.dib`, `.ppm`/`.pgm`/`.pnm`, `.pam`, `.pbm`
    (gray only, cv2-exact binarisation), `.tif`/`.tiff`,
    `.jp2`/`.j2k` (lossless), `.exr`, `.hdr`/`.pic`, `.pfm`,
    `.ras`/`.sr`, `.webp` (lossless VP8L), `.gif` (exact palette when
    <= 256 colors) — the cv::imwrite extension surface (EXR/HDR store img/255; PFM stores raw 0..255 floats,
    matching how cv::imread rounds each back to the original uint8)."""
    img = np.asarray(img_bgr, dtype=np.uint8)
    if img.ndim == 3:
        img = img[..., ::-1]  # BGR -> RGB
    ext = Path(path).suffix.lower()
    if ext in (".jpg", ".jpeg"):
        from fft_restoration_tpu.utils.jpeg_encode import encode_jpeg

        blob = encode_jpeg(img)
    elif ext in (".bmp", ".dib"):
        from fft_restoration_tpu.utils import formats

        blob = formats.encode_bmp(img)
    elif ext in (".ppm", ".pgm", ".pnm"):
        from fft_restoration_tpu.utils import formats

        blob = formats.encode_pnm(img)
    elif ext == ".pam":
        from fft_restoration_tpu.utils import formats

        blob = formats.encode_pam(img)
    elif ext == ".pbm":
        from fft_restoration_tpu.utils import formats

        blob = formats.encode_pbm(img)
    elif ext in (".tif", ".tiff"):
        from fft_restoration_tpu.utils import formats

        blob = formats.encode_tiff(img)
    elif ext in (".jp2", ".j2k"):
        from fft_restoration_tpu.utils import jp2_encode

        enc = (jp2_encode.encode_jp2 if ext == ".jp2"
               else jp2_encode.encode_j2k)
        blob = enc(img)
    elif ext == ".exr":
        from fft_restoration_tpu.utils.exr import encode_exr

        blob = encode_exr(img.astype(np.float32) / 255.0)
    elif ext in (".hdr", ".pic"):
        from fft_restoration_tpu.utils import formats

        rgb = img if img.ndim == 3 else np.repeat(img[..., None], 3, -1)
        blob = formats.encode_hdr(rgb.astype(np.float32) / 255.0)
    elif ext == ".pfm":
        # raw 0..255 floats: cv::imread's PFM path rounds without a
        # 255 scale, so this is the layout that round-trips uint8
        from fft_restoration_tpu.utils import formats

        blob = formats.encode_pfm(img.astype(np.float32))
    elif ext in (".ras", ".sr"):
        from fft_restoration_tpu.utils import formats

        blob = formats.encode_ras(img)
    elif ext == ".webp":
        from fft_restoration_tpu.utils.webp_encode import encode_webp

        blob = encode_webp(img)
    elif ext == ".gif":
        from fft_restoration_tpu.utils.gif import encode_gif

        blob = encode_gif(img)
    else:
        blob = encode_png(img)
    Path(path).write_bytes(blob)
