"""BMP / PNM / TIFF codecs (pure NumPy, no OpenCV/PIL).

The reference ingests via cv::imread (/root/reference/serial.cpp:22), which
accepts BMP, PBM/PGM/PPM, and TIFF alongside PNG/JPEG. This module closes
that format gap for the framework's own loader (utils/imageio.py dispatches
here on magic bytes):

- BMP: Windows BITMAPINFOHEADER (and the larger V4/V5 headers), 8-bit
  paletted / 24-bit / 32-bit uncompressed (BI_RGB) and BI_BITFIELDS with
  the standard 8-bit masks; bottom-up and top-down row orders.
- PNM: P1-P6 (ASCII and binary bitmap/graymap/pixmap), maxval <= 65535
  (16-bit samples are big-endian per the spec and round to 8-bit).
- TIFF: uncompressed (Compression=1) baseline strips, 8-bit grayscale or
  RGB(A), both byte orders, PlanarConfiguration=1.

Everything decodes to uint8 gray (H, W) or RGB(A) (H, W, C) exactly like
utils/imageio.decode_png, so imread's gray/alpha/BGR canonicalisation is
shared. Encoders cover BMP (24-bit) and PPM/PGM binary — enough for
imwrite extension dispatch parity.
"""

from __future__ import annotations

import re
import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP


def _bmp_header(data: bytes):
    if len(data) < 54:
        raise ValueError("corrupt BMP: truncated header")
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pix_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"BMP header size {hdr_size} (OS/2 BMPs) not supported")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    return pix_off, hdr_size, w, h, bpp, compression


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed BMP to uint8 gray (H, W) or RGB(A) (H, W, C)."""
    pix_off, hdr_size, w, h, bpp, compression = _bmp_header(data)
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"corrupt BMP: bad dimensions {w}x{h}")
    if compression == 3 and bpp in (16, 32):
        # BI_BITFIELDS: only the canonical byte-aligned masks are
        # supported. The masks sit at absolute offset 54 for every
        # supported header (BITMAPINFOHEADER appends them after the
        # 40-byte header; V4/V5 embed them at the same file offset).
        masks = struct.unpack("<III", data[54:66])
        if bpp == 32 and masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise ValueError("BMP BI_BITFIELDS with non-standard masks not supported")
        if bpp == 16:
            raise ValueError("16-bit BMP not supported")
    elif compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"{bpp}-bit BMP not supported")

    palette = None
    if bpp == 8:
        # palette sits between the info header and the pixel array, BGRA entries
        pal_off = 14 + hdr_size
        n_entries = (pix_off - pal_off) // 4
        if n_entries <= 0:
            raise ValueError("corrupt BMP: 8-bit without palette")
        pal = np.frombuffer(data[pal_off : pal_off + 4 * n_entries], np.uint8)
        palette = pal.reshape(-1, 4)[:, [2, 1, 0]]  # BGRA -> RGB

    nbytes_px = bpp // 8
    stride = (w * nbytes_px + 3) & ~3  # rows padded to 4 bytes
    need = stride * h
    pix = data[pix_off : pix_off + need]
    if len(pix) < need:
        raise ValueError("corrupt BMP: truncated pixel array")
    rows = np.frombuffer(pix, np.uint8).reshape(h, stride)[:, : w * nbytes_px]
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        if rows.max(initial=0) >= len(palette):
            raise ValueError(
                f"corrupt BMP: palette index {int(rows.max())} >= "
                f"palette size {len(palette)}"
            )
        return palette[rows]
    img = rows.reshape(h, w, nbytes_px)
    if nbytes_px == 3:
        return img[..., ::-1].copy()  # BGR -> RGB
    # 32-bit BGRA -> RGBA
    return img[..., [2, 1, 0, 3]].copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode uint8 gray (H, W) or RGB (H, W, 3) as a 24-bit bottom-up BMP."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB->BGR
    pix = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40)
    return file_hdr + info + pix


# ---------------------------------------------------------------------------
# PNM (PBM/PGM/PPM)

_PNM_WS = re.compile(rb"\s+")


def _pnm_tokens(data: bytes):
    """Yield header tokens, skipping '#' comments (which run to EOL)."""
    pos = 0
    while pos < len(data):
        c = data[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = data.find(b"\n", pos)
            pos = len(data) if nl < 0 else nl + 1
        else:
            m = _PNM_WS.search(data, pos)
            end = m.start() if m else len(data)
            yield data[pos:end], end
            pos = end


def decode_pnm(data: bytes) -> np.ndarray:
    """Decode PNM (P1-P6) to uint8 gray (H, W) or RGB (H, W, 3)."""
    if len(data) < 2 or data[0:1] != b"P" or data[1] not in b"123456":
        raise ValueError("not a PNM file")
    kind = int(data[1:2])
    bitmap = kind in (1, 4)
    channels = 3 if kind in (3, 6) else 1
    n_hdr = 3 if bitmap else 4  # magic, w, h [, maxval]
    toks, end = [], 2
    for tok, end in _pnm_tokens(data[2:]):
        toks.append(tok)
        if len(toks) == n_hdr - 1:
            break
    if len(toks) < n_hdr - 1:
        raise ValueError("corrupt PNM: truncated header")
    try:
        w, h = int(toks[0]), int(toks[1])
        maxval = 1 if bitmap else int(toks[2])
    except ValueError as e:
        raise ValueError(f"corrupt PNM: bad header token: {e}") from e
    if w <= 0 or h <= 0 or not (1 <= maxval <= 65535):
        raise ValueError(f"corrupt PNM: bad geometry {w}x{h} maxval {maxval}")
    body = data[2 + end :]

    if kind in (1, 2, 3):  # ASCII formats
        # comments run from '#' to end of line and are legal anywhere
        # in plain PNM, including mid-raster
        body = re.sub(rb"#[^\n]*", b"", body)
        try:
            if kind == 1:
                # plain PBM needs NO separators between digits
                # (spec-conformant writers emit rows like '0110')
                digits = re.sub(rb"\s+", b"", body)
                if digits and not re.fullmatch(rb"[01]+", digits):
                    raise ValueError(f"non-bit byte in P1 raster")
                vals = np.frombuffer(digits, np.uint8).astype(np.int64) - ord("0")
            else:
                vals = np.array(
                    [int(t) for t in _PNM_WS.split(body.strip()) if t],
                    dtype=np.int64,
                )
        except ValueError as e:
            raise ValueError(f"corrupt PNM: bad ASCII sample: {e}") from e
        if kind == 1:
            vals = 1 - vals  # PBM: 1 = black
            maxval = 1
    else:  # binary: exactly one whitespace byte separates header from raster
        body = body[1:]
        if kind == 4:
            stride = (w + 7) // 8
            need = stride * h
            if len(body) < need:
                raise ValueError("corrupt PNM: truncated raster")
            bits = np.unpackbits(
                np.frombuffer(body[:need], np.uint8).reshape(h, stride), axis=1
            )[:, :w]
            return ((1 - bits) * 255).astype(np.uint8)
        sample = np.uint8 if maxval < 256 else np.dtype(">u2")
        need = w * h * channels * sample.itemsize if maxval >= 256 else w * h * channels
        if len(body) < need:
            raise ValueError("corrupt PNM: truncated raster")
        vals = np.frombuffer(body[:need], sample).astype(np.int64)

    need = w * h * channels
    if vals.size < need:
        raise ValueError("corrupt PNM: truncated raster")
    vals = vals[:need]
    # scale to 0..255 with rounding (identity when maxval == 255)
    img = ((vals * 255 + maxval // 2) // maxval).clip(0, 255).astype(np.uint8)
    img = img.reshape(h, w, channels)
    return img[..., 0] if channels == 1 else img


def encode_pnm(img: np.ndarray) -> bytes:
    """Encode uint8 gray as binary PGM (P5) or RGB as binary PPM (P6)."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 3 and img.shape[-1] == 4:
        img = img[..., :3]
    if img.ndim == 2:
        magic, h, w = b"P5", *img.shape
    elif img.ndim == 3 and img.shape[-1] == 3:
        magic, (h, w) = b"P6", img.shape[:2]
    else:
        raise ValueError(f"unsupported PNM shape {img.shape}")
    return magic + b"\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img).tobytes()


# ---------------------------------------------------------------------------
# TIFF (baseline, uncompressed)

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _tiff_ifd(data: bytes, bo: str):
    """Parse the first IFD into {tag: [values...]}."""
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("corrupt TIFF: bad IFD offset")
    (n,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(data):
            raise ValueError("corrupt TIFF: truncated IFD")
        tag, typ, cnt = struct.unpack(bo + "HHI", data[e : e + 8])
        size = _TIFF_TYPE_SIZE.get(typ, 0) * cnt
        if size == 0:
            continue
        if size <= 4:
            raw = data[e + 8 : e + 8 + size]
        else:
            (off,) = struct.unpack(bo + "I", data[e + 8 : e + 12])
            raw = data[off : off + size]
            if len(raw) < size:
                raise ValueError(f"corrupt TIFF: tag {tag} value out of range")
        if typ in (3, 8):
            vals = list(struct.unpack(bo + "%dH" % cnt, raw))
        elif typ in (4, 9):
            vals = list(struct.unpack(bo + "%dI" % cnt, raw))
        elif typ in (1, 6):
            vals = list(raw)
        else:
            vals = [raw]
        tags[tag] = vals
    return tags


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode an uncompressed baseline TIFF (first IFD) to uint8 gray/RGB(A)."""
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    tags = _tiff_ifd(data, bo)

    def one(tag, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    w, h = one(256), one(257)
    if not w or not h:
        raise ValueError("corrupt TIFF: missing dimensions")
    compression = one(259, 1)
    if compression != 1:
        raise ValueError(f"compressed TIFF (method {compression}) not supported")
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"TIFF bits-per-sample {bits} not supported (8 only)")
    spp = one(277, len(bits))
    if one(284, 1) != 1:
        raise ValueError("TIFF PlanarConfiguration=2 (planar) not supported")
    photometric = one(262, 1)
    if photometric not in (0, 1, 2):
        raise ValueError(
            f"TIFF PhotometricInterpretation {photometric} not supported "
            "(gray/RGB only)"
        )
    offsets = tags.get(273)
    if not offsets:
        raise ValueError("corrupt TIFF: missing StripOffsets")
    rows_per_strip = one(278, h)
    # Absent StripByteCounts (tag 279): derive per-strip sizes, clamping
    # the final strip to the rows actually remaining so a short last
    # strip doesn't trip the truncation check below.
    counts = tags.get(279) or [
        w * spp * max(0, min(rows_per_strip, h - i * rows_per_strip))
        for i in range(len(offsets))
    ]

    chunks = []
    for off, cnt in zip(offsets, counts):
        seg = data[off : off + cnt]
        if len(seg) < cnt:
            raise ValueError("corrupt TIFF: truncated strip")
        chunks.append(seg)
    raw = b"".join(chunks)
    need = w * h * spp
    if len(raw) < need:
        raise ValueError("corrupt TIFF: raster smaller than dimensions")
    img = np.frombuffer(raw[:need], np.uint8).reshape(h, w, spp)
    if photometric == 0:  # WhiteIsZero
        img = 255 - img
    if spp == 1:
        return img[..., 0].copy()
    if spp == 2:  # gray + alpha
        return img.copy()
    return img.copy()  # RGB / RGBA


def encode_tiff(img: np.ndarray) -> bytes:
    """Encode uint8 gray (H, W) or RGB (H, W, 3) as one uncompressed LE strip."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 3 and img.shape[-1] == 4:
        img = img[..., :3]
    spp = 1 if img.ndim == 2 else img.shape[-1]
    h, w = img.shape[:2]
    raster = np.ascontiguousarray(img).tobytes()
    # layout: 8-byte header | IFD | bits-per-sample array (rgb) | raster
    entries = []

    def entry(tag, typ, cnt, val):
        entries.append(struct.pack("<HHII", tag, typ, cnt, val))

    n_entries = 8
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n_entries + 4
    bps_off = after_ifd
    bps_blob = struct.pack("<3H", 8, 8, 8) if spp == 3 else b""
    raster_off = bps_off + len(bps_blob) + ((-len(bps_blob)) % 2)
    entry(256, 4, 1, w)  # ImageWidth
    entry(257, 4, 1, h)  # ImageLength
    if spp == 3:
        entry(258, 3, 3, bps_off)  # BitsPerSample -> offset
    else:
        entry(258, 3, 1, 8)
    entry(259, 3, 1, 1)  # Compression: none
    entry(262, 3, 1, 2 if spp == 3 else 1)  # Photometric: RGB / BlackIsZero
    entry(273, 4, 1, raster_off)  # StripOffsets
    entry(277, 3, 1, spp)  # SamplesPerPixel
    entry(279, 4, 1, len(raster))  # StripByteCounts
    ifd = struct.pack("<H", n_entries) + b"".join(entries) + struct.pack("<I", 0)
    pad = b"\x00" * (raster_off - bps_off - len(bps_blob))
    return b"II*\x00" + struct.pack("<I", ifd_off) + ifd + bps_blob + pad + raster


# ---------------------------------------------------------------------------
# magic-byte probing shared with imageio.imread / probe_size


def sniff(data: bytes):
    """Return 'bmp' | 'pnm' | 'tiff' | 'webp' | None from magic bytes."""
    if data[:2] == b"BM":
        return "bmp"
    if len(data) >= 2 and data[0:1] == b"P" and data[1] in b"123456":
        return "pnm"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    return None


def decode_webp(data: bytes) -> np.ndarray:
    """WebP -> uint8 RGB/RGBA. Full in-repo decoder (utils/webp.py):
    VP8L lossless and VP8 lossy keyframes, VP8X/ALPH alpha \u2014 the
    cv::imread WebP surface (/root/reference/serial.cpp:22), bit-exact
    against libwebp on both bitstreams."""
    from fft_restoration_tpu.utils.webp import decode_webp as _dec

    return _dec(data)


_DECODERS = {"bmp": decode_bmp, "pnm": decode_pnm, "tiff": decode_tiff,
             "webp": decode_webp}


def decode(data: bytes) -> np.ndarray:
    kind = sniff(data)
    if kind is None:
        raise ValueError("not a BMP/PNM/TIFF file")
    return _DECODERS[kind](data)


def probe_size(data: bytes):
    """(height, width) from headers only, for batch grouping."""
    kind = sniff(data)
    if kind == "bmp":
        _, _, w, h, _, _ = _bmp_header(data)
        return abs(h), w
    if kind == "pnm":
        toks = []
        for tok, _ in _pnm_tokens(data[2:]):
            toks.append(tok)
            if len(toks) == 2:
                return int(toks[1]), int(toks[0])
        raise ValueError("corrupt PNM: truncated header")
    if kind == "tiff":
        bo = "<" if data[:2] == b"II" else ">"
        tags = _tiff_ifd(data, bo)
        if 256 not in tags or 257 not in tags:
            raise ValueError("corrupt TIFF: missing dimensions")
        return tags[257][0], tags[256][0]
    if kind == "webp":
        from fft_restoration_tpu.utils.webp import probe_webp_size

        return probe_webp_size(data)
    raise ValueError("not a BMP/PNM/TIFF file")
