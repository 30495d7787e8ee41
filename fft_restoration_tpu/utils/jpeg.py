"""Baseline JPEG (JFIF) decoder — pure Python/NumPy, no OpenCV/PIL.

The reference ingests images through cv::imread
(/root/reference/serial.cpp:22), which accepts JPEG alongside PNG. This
module brings the framework's own codec to driver parity for the JPEG
case: baseline sequential DCT, 8-bit, grayscale or YCbCr (any common
subsampling), restart markers. Progressive/arithmetic/12-bit streams
raise ValueError with a clear message.

Decode pipeline: marker parse -> per-segment Huffman entropy decode
(canonical mincode/maxcode walk over an unpacked bit array) ->
dequantize + dezigzag -> batched 8x8 IDCT (one einsum over all blocks
of a component) -> chroma upsample -> YCbCr->RGB (JFIF/BT.601).

The entropy decode is a Python loop (inherently sequential); everything
after it is vectorized NumPy. ~1s/MP — ingest-grade, not a hot path.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

# DCT-II orthonormal basis; IDCT of block X is M.T @ X @ M with
# M[k, x] = c(k) * cos((2x+1) k pi / 16).
_K = np.arange(8, dtype=np.float64)
_M = np.cos((2.0 * _K[None, :] + 1.0) * _K[:, None] * np.pi / 16.0)
_M[0] *= 1.0 / np.sqrt(2.0)
_M *= 0.5


class _Huff:
    """Canonical Huffman table: mincode/maxcode/valptr walk (ITU T.81
    F.2.2.3), over counts-per-length + symbol list from a DHT segment."""

    def __init__(self, counts, symbols):
        self.mincode = np.zeros(17, np.int64)
        self.maxcode = np.full(17, -1, np.int64)
        self.valptr = np.zeros(17, np.int64)
        self.symbols = np.asarray(symbols, np.uint8)
        code = 0
        k = 0
        for length in range(1, 17):
            n = counts[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over a stuffing-stripped segment."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("corrupt JPEG: entropy data exhausted")
        b = self.bits[self.pos]
        self.pos += 1
        return int(b)

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("corrupt JPEG: entropy data exhausted")
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def decode(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if code <= table.maxcode[length]:
                return int(
                    table.symbols[table.valptr[length] + code - table.mincode[length]]
                )
        raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1: signed magnitude extension of an s-bit value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _strip_stuffing(data: bytes) -> bytes:
    return data.replace(b"\xff\x00", b"\xff")


def _upsample(plane: np.ndarray, factor: int, axis: int) -> np.ndarray:
    """Chroma upsampling. factor 2 = libjpeg 'fancy' triangular filter
    (jdsample.c h2v1/h2v2): out[2i] = (3*s[i] + s[i-1])/4,
    out[2i+1] = (3*s[i] + s[i+1])/4, edges replicated. Matches the
    default libjpeg/cv2 decode; nearest for other factors."""
    if factor == 1:
        return plane
    if factor != 2:
        return np.repeat(plane, factor, axis=axis)
    s = np.moveaxis(plane, axis, 0)
    prev = np.concatenate([s[:1], s[:-1]], axis=0)
    nxt = np.concatenate([s[1:], s[-1:]], axis=0)
    out = np.empty((2 * s.shape[0],) + s.shape[1:], s.dtype)
    out[0::2] = (3.0 * s + prev) * 0.25
    out[1::2] = (3.0 * s + nxt) * 0.25
    return np.moveaxis(out, 0, axis)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes -> uint8 RGB (H, W, 3) or gray (H, W)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    qtables = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart_interval = 0
    scan = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM: bare
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    raise ValueError("16-bit quantization tables not supported")
                qtables[tq] = np.frombuffer(seg[p : p + 64], np.uint8).astype(
                    np.int32
                )
                p += 64
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG not supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG is supported "
                f"(SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + nsym])
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, symbols)
                p += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scan_comps.append({"id": cs, "dc": tdta >> 4, "ac": tdta & 15})
            scan_start = pos + seglen
            # entropy data runs until the next non-RST marker
            p = scan_start
            while p < len(data) - 1:
                if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
                    0xD0 <= data[p + 1] <= 0xD7
                ):
                    break
                p += 1
            scan = (scan_comps, data[scan_start:p])
            pos = p
            continue
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("corrupt JPEG: missing SOF/SOS")
    scan_comps, entropy = scan
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    by_id = {c["id"]: i for i, c in enumerate(comps)}
    order = [by_id[sc["id"]] for sc in scan_comps]
    if sorted(order) != list(range(len(comps))):
        raise ValueError("non-interleaved scans not supported")

    # coefficient storage: (blocks_y, blocks_x, 64) per component
    coef = []
    for c in comps:
        coef.append(
            np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
        )

    # split on restart markers (byte-aligned in the raw stream)
    segments = []
    if restart_interval:
        segp = 0
        cur = bytearray()
        p = 0
        while p < len(entropy):
            if (
                entropy[p] == 0xFF
                and p + 1 < len(entropy)
                and 0xD0 <= entropy[p + 1] <= 0xD7
            ):
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            cur.append(entropy[p])
            p += 1
        segments.append(bytes(cur))
    else:
        segments = [entropy]

    n_mcu = mcux * mcuy
    mcu_idx = 0
    for seg_data in segments:
        reader = _BitReader(_strip_stuffing(seg_data))
        preds = [0] * len(comps)
        limit = (
            min(mcu_idx + restart_interval, n_mcu) if restart_interval else n_mcu
        )
        while mcu_idx < limit:
            my, mx = divmod(mcu_idx, mcux)
            for ci in order:
                c = comps[ci]
                sc = scan_comps[[s["id"] for s in scan_comps].index(c["id"])]
                dc_t = huff_dc[sc["dc"]]
                ac_t = huff_ac[sc["ac"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = np.zeros(64, np.int32)
                        s = reader.decode(dc_t)
                        diff = _extend(reader.read_bits(s), s)
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        kk = 1
                        while kk < 64:
                            rs = reader.decode(ac_t)
                            r, ssz = rs >> 4, rs & 15
                            if ssz == 0:
                                if r == 15:
                                    kk += 16
                                    continue
                                break  # EOB
                            kk += r
                            if kk > 63:
                                raise ValueError("corrupt JPEG: AC overflow")
                            blk[kk] = _extend(reader.read_bits(ssz), ssz)
                            kk += 1
                        coef[ci][my * c["v"] + v, mx * c["h"] + hh] = blk
            mcu_idx += 1

    # dequantize + dezigzag + batched IDCT per component
    planes = []
    for ci, c in enumerate(comps):
        q = qtables[c["tq"]]
        blocks = coef[ci] * q[None, None, :]
        spatial = np.zeros(blocks.shape[:2] + (64,), np.float64)
        spatial[..., ZIGZAG] = blocks
        spatial = spatial.reshape(blocks.shape[:2] + (8, 8))
        # IDCT: M.T @ X @ M over every block
        pix = np.einsum("ky,...kl,lx->...yx", _M, spatial, _M) + 128.0
        by, bx = pix.shape[:2]
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full resolution; 2x uses the triangular filter
        # libjpeg calls "fancy upsampling" (the default cv2/libjpeg
        # decode path), other factors use nearest
        plane = _upsample(plane, vmax // c["v"], axis=0)
        plane = _upsample(plane, hmax // c["h"], axis=1)
        planes.append(plane[: mcuy * vmax * 8, : mcux * hmax * 8])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:h, :w]
    if len(planes) != 3:
        raise ValueError(f"{len(planes)}-component JPEG not supported")
    y, cb, cr = (p[:h, :w] for p in planes)
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
