"""OpenEXR scanline codec tests (utils/exr.py, utils/exr_piz.py).

No EXR oracle exists in this environment (cv2 5.0 ships without the
codec, no OpenEXR module), so the anchors are:

- golden files constructed byte-by-byte HERE, straight from the
  published file layout and independent of encode_exr — these pin the
  header, offset-table, chunk and ZIP/RLE post-pass wire formats;
- encoder <-> decoder roundtrips across the full pixel-type x
  compression x line-order matrix (both sides written from the spec);
- algebraic inverses for the PIZ wavelet/Huffman primitives over
  adversarial distributions;
- truncation/garbage fuzz: every prefix of a valid file must raise
  ValueError, never crash.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fft_restoration_tpu.utils import exr
from fft_restoration_tpu.utils import exr_piz
from fft_restoration_tpu.utils import formats
from fft_restoration_tpu.utils.imageio import decode_image_bgr


def _rng(seed):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# hand-built golden files (independent of encode_exr)


def _attr(name: str, atype: str, payload: bytes) -> bytes:
    return (name.encode() + b"\x00" + atype.encode() + b"\x00"
            + struct.pack("<i", len(payload)) + payload)


def _chan(name: str, ptype: int) -> bytes:
    return name.encode() + b"\x00" + struct.pack("<iB3xii", ptype, 0, 1, 1)


def _minimal_header(chlist: bytes, comp: int, box: bytes,
                    line_order: int = 0) -> bytes:
    return b"".join([
        _attr("channels", "chlist", chlist + b"\x00"),
        _attr("compression", "compression", bytes([comp])),
        _attr("dataWindow", "box2i", box),
        _attr("displayWindow", "box2i", box),
        _attr("lineOrder", "lineOrder", bytes([line_order])),
        _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0)),
        _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0)),
        _attr("screenWindowWidth", "float", struct.pack("<f", 1.0)),
    ]) + b"\x00"


def test_golden_none_half_rgb():
    # 2x3 RGB half, NONE compression, built byte-by-byte: one chunk per
    # scanline, channels in alphabetical B, G, R order within each line.
    vals = np.arange(18, dtype=np.float32).reshape(2, 3, 3) / 16.0
    header = _minimal_header(
        _chan("B", 1) + _chan("G", 1) + _chan("R", 1),
        0, struct.pack("<4i", 0, 0, 2, 1),
    )
    chunks = []
    for y in range(2):
        payload = b"".join(
            vals[y, :, c].astype("<f2").tobytes() for c in (2, 1, 0)
        )
        chunks.append(struct.pack("<ii", y, len(payload)) + payload)
    start = 8 + len(header) + 16
    table = struct.pack("<2Q", start, start + len(chunks[0]))
    blob = exr.MAGIC + struct.pack("<i", 2) + header + table + b"".join(chunks)

    img, names = exr.decode_exr_float(blob)
    assert names == ["R", "G", "B"]
    np.testing.assert_array_equal(
        img, vals.astype(np.float16).astype(np.float32)
    )
    assert exr.probe_exr_size(blob) == (2, 3)
    # uint8 ingest contract: value*255, saturate, round
    u8 = exr.decode_exr(blob)
    np.testing.assert_array_equal(
        u8, np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
    )


def test_golden_zip_float_gray():
    # 3x4 single-channel float, ZIP: the pre-compression transform
    # (split-half deinterleave + delta-128) is re-derived here with
    # explicit loops, independent of the library's vectorized version.
    vals = (np.arange(12, dtype=np.float32).reshape(3, 4) - 6.0) / 4.0
    raw = b"".join(vals[y].astype("<f4").tobytes() for y in range(3))

    interleaved = bytearray(raw)
    half = (len(interleaved) + 1) // 2
    split = bytearray(len(interleaved))
    split[:half] = interleaved[0::2]
    split[half:] = interleaved[1::2]
    delta = bytearray(split)
    for i in range(len(delta) - 1, 0, -1):
        delta[i] = (delta[i] - delta[i - 1] + 128) & 0xFF
    payload = zlib.compress(bytes(delta))
    assert len(payload) < len(raw)

    header = _minimal_header(
        _chan("Z", 2), 3, struct.pack("<4i", 0, 0, 3, 2)
    )
    chunk = struct.pack("<ii", 0, len(payload)) + payload
    table = struct.pack("<Q", 8 + len(header) + 8)
    blob = exr.MAGIC + struct.pack("<i", 2) + header + table + chunk

    img, names = exr.decode_exr_float(blob)
    assert names == ["Z"]
    np.testing.assert_array_equal(img, vals)


def test_golden_rle_half_gray():
    # RLE golden: runs + literals encoded by hand per the signed-count
    # scheme, after the same split/delta pre-pass as ZIP.
    vals = np.array([[0.5] * 14 + [1.5, -2.0]], np.float32)
    raw = vals.astype("<f2").tobytes()
    half = (len(raw) + 1) // 2
    split = bytes(raw[0::2]) + bytes(raw[1::2])
    delta = bytearray(split)
    for i in range(len(delta) - 1, 0, -1):
        delta[i] = (delta[i] - delta[i - 1] + 128) & 0xFF

    payload = bytearray()
    i = 0
    while i < len(delta):
        run = 1
        while i + run < len(delta) and delta[i + run] == delta[i] and run < 127:
            run += 1
        if run >= 2:
            payload.append(run - 1)
            payload.append(delta[i])
            i += run
        else:
            payload.append(256 - 1)
            payload.append(delta[i])
            i += 1
    assert len(payload) < len(raw), "test vector must actually compress"

    header = _minimal_header(
        _chan("Y", 1), 1, struct.pack("<4i", 0, 0, 15, 0)
    )
    chunk = struct.pack("<ii", 0, len(payload)) + bytes(payload)
    table = struct.pack("<Q", 8 + len(header) + 8)
    blob = exr.MAGIC + struct.pack("<i", 2) + header + table + chunk
    img, names = exr.decode_exr_float(blob)
    assert names == ["Y"]
    np.testing.assert_array_equal(
        img, vals[0].astype(np.float16).astype(np.float32)[None]
    )


# ---------------------------------------------------------------------------
# roundtrip matrix


@pytest.mark.parametrize("compression", ["none", "rle", "zips", "zip", "piz"])
@pytest.mark.parametrize("pixel_type", ["half", "float", "uint"])
def test_roundtrip_matrix(pixel_type, compression):
    img = (_rng(11).random((21, 13, 3)) * 3).astype(np.float32)
    if pixel_type == "uint":
        img = np.rint(img * 500).astype(np.float32)
    blob = exr.encode_exr(img, pixel_type, compression)
    out, names = exr.decode_exr_float(blob)
    if pixel_type == "half":
        ref = img.astype(np.float16).astype(np.float32)
    elif pixel_type == "uint":
        ref = img.astype(np.uint32).astype(np.float32)
    else:
        ref = img
    assert names == ["R", "G", "B"]
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("compression", ["none", "zip", "piz"])
def test_roundtrip_line_orders_agree(compression):
    img = _rng(5).random((37, 9)).astype(np.float32)
    inc = exr.encode_exr(img, "float", compression, "increasing")
    dec = exr.encode_exr(img, "float", compression, "decreasing")
    a, _ = exr.decode_exr_float(inc)
    b, _ = exr.decode_exr_float(dec)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, img)


def test_roundtrip_rgba_and_shapes():
    for shape in [(1, 1), (1, 7), (16, 16), (17, 1), (33, 47)]:
        img = _rng(sum(shape)).random(shape).astype(np.float32)
        out, _ = exr.decode_exr_float(exr.encode_exr(img, "float", "zip"))
        np.testing.assert_array_equal(out, img)
    rgba = _rng(9).random((12, 10, 4)).astype(np.float32)
    out, names = exr.decode_exr_float(exr.encode_exr(rgba, "float", "piz"))
    assert names == ["R", "G", "B", "A"]
    np.testing.assert_array_equal(out, rgba)


def test_incompressible_blocks_stored_raw():
    # Random half bits don't compress; encoder must fall back to raw
    # storage per block and the decoder must detect it by size.
    img = _rng(13).random((40, 31)).astype(np.float32)
    blob = exr.encode_exr(img, "float", "zip")
    out, _ = exr.decode_exr_float(blob)
    np.testing.assert_array_equal(out, img)


def test_nonzero_data_window_origin():
    vals = _rng(17).random((4, 5)).astype(np.float32)
    header = _minimal_header(
        _chan("Y", 2), 0, struct.pack("<4i", 10, -3, 14, 0)
    )
    chunks, offs = [], []
    at = 8 + len(header) + 8 * 4
    for y in range(4):
        payload = vals[y].astype("<f4").tobytes()
        offs.append(at)
        chunks.append(struct.pack("<ii", y - 3, len(payload)) + payload)
        at += len(chunks[-1])
    blob = (exr.MAGIC + struct.pack("<i", 2) + header
            + struct.pack("<4Q", *offs) + b"".join(chunks))
    img, _ = exr.decode_exr_float(blob)
    np.testing.assert_array_equal(img, vals)
    assert exr.probe_exr_size(blob) == (4, 5)


def test_zeroed_offset_table_sequential_fallback():
    img = _rng(19).random((9, 6)).astype(np.float32)
    blob = bytearray(exr.encode_exr(img, "float", "zips"))
    hdr = exr._parse_header(bytes(blob))
    n_blocks = 9
    blob[hdr["header_end"]:hdr["header_end"] + 8 * n_blocks] = b"\x00" * 72
    out, _ = exr.decode_exr_float(bytes(blob))
    np.testing.assert_array_equal(out, img)


# ---------------------------------------------------------------------------
# channel layouts and rejection paths


def test_single_arbitrary_channel_is_gray():
    img = _rng(23).random((6, 8)).astype(np.float32)
    blob = exr.encode_exr(img, "float", "none")
    # rename the Y channel to 'depth.Z' in the header
    blob = blob.replace(b"Y\x00" + struct.pack("<iB3xii", 2, 0, 1, 1),
                        b"Z\x00" + struct.pack("<iB3xii", 2, 0, 1, 1), 1)
    out, names = exr.decode_exr_float(blob)
    assert names == ["Z"]
    np.testing.assert_array_equal(out, img)


def test_unsupported_layouts_and_flags():
    img = np.zeros((4, 4), np.float32)
    good = exr.encode_exr(img, "half", "none")

    # luminance/chroma: Y + RY + BY channel set is rejected
    header = _minimal_header(
        _chan("BY", 1) + _chan("RY", 1) + _chan("Y", 1),
        0, struct.pack("<4i", 0, 0, 3, 3),
    )
    blob = exr.MAGIC + struct.pack("<i", 2) + header + struct.pack("<4Q", 0, 0, 0, 0)
    with pytest.raises(ValueError, match="channel layout"):
        exr.decode_exr_float(blob + b"\x00" * 64)

    # version flags: deep / multipart rejected; tiled flag without a
    # 'tiles' attribute is corrupt (tiled files themselves now decode)
    for flag, msg in ((0x800, "deep"), (0x1000, "multi-part"),
                      (0x200, "without 'tiles' attribute")):
        bad = bytearray(good)
        bad[4:8] = struct.pack("<i", 2 | flag)
        with pytest.raises(ValueError, match=msg):
            exr.decode_exr_float(bytes(bad))

    # unknown compression id (10; the whole 0-9 matrix decodes now)
    bad = bytearray(good)
    idx = bad.index(b"compression\x00compression\x00")
    bad[idx + len(b"compression\x00compression\x00") + 4] = 10
    with pytest.raises(ValueError, match="compression 10 not supported"):
        exr.decode_exr_float(bytes(bad))


def test_truncation_fuzz_never_crashes():
    img = _rng(29).random((7, 5, 3)).astype(np.float32)
    for comp in ("none", "zip", "rle", "piz"):
        blob = exr.encode_exr(img, "half", comp)
        for cut in range(0, len(blob), 7):
            with pytest.raises(ValueError):
                exr.decode_exr_float(blob[:cut])
    # bit flips in the header region must never escape ValueError
    blob = bytearray(exr.encode_exr(img, "half", "zip"))
    for pos in range(8, min(120, len(blob))):
        bad = bytearray(blob)
        bad[pos] ^= 0xFF
        try:
            exr.decode_exr_float(bytes(bad))
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# PIZ primitives


def test_piz_wavelet_primitives_invert():
    rng = _rng(31)
    a = rng.integers(0, 1 << 14, 4096).astype(np.uint16)
    b = rng.integers(0, 1 << 14, 4096).astype(np.uint16)
    l, h = exr_piz._wenc14(a, b)
    a2, b2 = exr_piz._wdec14(l, h)
    np.testing.assert_array_equal(a, a2)
    np.testing.assert_array_equal(b, b2)

    a = rng.integers(0, 1 << 16, 4096).astype(np.uint16)
    b = rng.integers(0, 1 << 16, 4096).astype(np.uint16)
    l, h = exr_piz._wenc16(a, b)
    a2, b2 = exr_piz._wdec16(l, h)
    np.testing.assert_array_equal(a, a2)
    np.testing.assert_array_equal(b, b2)


@pytest.mark.parametrize("shape", [(1, 1), (1, 9), (8, 8), (13, 7), (32, 57)])
def test_piz_wavelet_2d_inverts(shape):
    for maxv in (100, 1 << 15):  # 14-bit and modular 16-bit paths
        hi = min(maxv + 1, 1 << 16)
        data = _rng(shape[0] * 100 + shape[1]).integers(
            0, hi, shape
        ).astype(np.uint16)
        fwd = exr_piz._wav2_transform(data.copy(), maxv, inverse=False)
        back = exr_piz._wav2_transform(fwd.copy(), maxv, inverse=True)
        np.testing.assert_array_equal(back, data)


def test_piz_huffman_roundtrip_distributions():
    rng = _rng(37)
    cases = [
        np.zeros(1000, np.uint16),                        # one symbol
        np.full(300, 65535, np.uint16),                   # top symbol runs
        rng.integers(0, 65536, 4096).astype(np.uint16),   # uniform
        np.repeat(rng.integers(0, 50, 64), 300).astype(np.uint16),  # runs
        np.arange(3000, dtype=np.uint16),                 # all distinct
        np.array([7], np.uint16),                         # single sample
    ]
    for data in cases:
        enc = exr_piz._huf_compress(data)
        out = exr_piz._huf_decompress(enc, data.size)
        np.testing.assert_array_equal(out, data)


def test_piz_block_roundtrip_mixed_channels():
    # HALF + FLOAT channels in one block exercise the 1- and 2-halfword
    # interleavings together.
    rng = _rng(41)
    w, rows = 19, 16
    half_rows = rng.random((rows, w)).astype("<f2")
    float_rows = rng.random((rows, w)).astype("<f4")
    raw = b"".join(
        half_rows[r].tobytes() + float_rows[r].tobytes() for r in range(rows)
    )
    chans = [("H", 1), ("Z", 2)]
    blk = exr_piz.piz_compress(np.frombuffer(raw, np.uint8), chans, w, rows)
    out = exr_piz.piz_decompress(blk, chans, w, rows, len(raw))
    assert out.tobytes() == raw


def test_piz_corrupt_blocks_raise():
    img = _rng(43).random((8, 8)).astype(np.float32)
    blob = exr.encode_exr(img, "half", "piz")
    hdr = exr._parse_header(blob)
    # find the chunk payload and corrupt its Huffman area
    at = struct.unpack("<Q", blob[hdr["header_end"]:hdr["header_end"] + 8])[0]
    bad = bytearray(blob)
    for pos in range(at + 8, min(at + 48, len(bad))):
        b2 = bytearray(blob)
        b2[pos] ^= 0x55
        try:
            exr.decode_exr_float(bytes(b2))
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# ingest integration


def test_imread_integration(tmp_path):
    img = (_rng(47).random((14, 11, 3))).astype(np.float32)
    p = tmp_path / "x.exr"
    p.write_bytes(exr.encode_exr(img, "half", "zip"))
    bgr = decode_image_bgr(p.read_bytes())
    ref = np.clip(
        np.rint(img.astype(np.float16).astype(np.float32) * 255), 0, 255
    ).astype(np.uint8)[..., ::-1]
    np.testing.assert_array_equal(bgr, ref)
    assert formats.sniff(p.read_bytes()) == "exr"
    assert formats.probe_size(p.read_bytes()) == (14, 11)


def test_gray_y_file_replicates_to_bgr():
    img = _rng(53).random((9, 9)).astype(np.float32)
    bgr = decode_image_bgr(exr.encode_exr(img, "float", "rle"))
    assert bgr.shape == (9, 9, 3)
    assert (bgr[..., 0] == bgr[..., 1]).all() and (bgr[..., 1] == bgr[..., 2]).all()


def test_piz_numpy_scalar_runs_do_not_poison_bitwriter():
    # Regression: run counts arrive as NumPy int64 from the run-length
    # scan; if they infect the bit accumulator it overflows at 64 bits
    # on real-image-sized blocks (caught driving a 640x330 fixture).
    rng = _rng(59)
    img = rng.integers(0, 256, (40, 160, 3)).astype(np.float32) / 255.0
    blob = exr.encode_exr(img, "half", "piz")
    out, _ = exr.decode_exr_float(blob)
    np.testing.assert_array_equal(
        out, img.astype(np.float16).astype(np.float32)
    )


def test_piz_wavelet_matches_openexr_transcription():
    """_wav2_transform vs a direct transcription of OpenEXR's
    ImfWav.cpp wav2Encode (the de-facto spec): the leftover column/row
    rule is `extent & p`, which diverges from naive lattice-remainder
    logic on odd and non-pow2 dims (round-4 review finding)."""
    from fft_restoration_tpu.utils.exr_piz import (
        _wav2_transform,
        _wenc14,
        _wenc16,
    )

    def enc1(f, a, b):
        l, h = f(np.array([a], np.uint16), np.array([b], np.uint16))
        return int(l[0]), int(h[0])

    def ref_encode(a, maxv):
        ny, nx = a.shape
        buf = a.flatten().astype(np.uint16)
        f = _wenc14 if maxv < (1 << 14) else _wenc16
        n, p, p2 = min(nx, ny), 1, 2
        while p2 <= n:
            py, ey = 0, (ny - p2) * nx
            oy1, oy2 = p * nx, p2 * nx
            while py <= ey:
                px, ex = py, py + (nx - p2)
                while px <= ex:
                    q01, q10 = px + p, px + oy1
                    q11 = q10 + p
                    i00, i10 = enc1(f, buf[px], buf[q10])
                    i01, i11 = enc1(f, buf[q01], buf[q11])
                    i00, i01 = enc1(f, i00, i01)
                    i10, i11 = enc1(f, i10, i11)
                    buf[px], buf[q01], buf[q10], buf[q11] = i00, i01, i10, i11
                    px += p2
                if nx & p:
                    q10 = px + oy1
                    buf[px], buf[q10] = enc1(f, buf[px], buf[q10])
                py += oy2
            if ny & p:
                px, ex = py, py + (nx - p2)
                while px <= ex:
                    buf[px], buf[px + p] = enc1(f, buf[px], buf[px + p])
                    px += p2
            p, p2 = p2, p2 << 1
        return buf.reshape(ny, nx)

    rng = np.random.default_rng(0)
    for ny, nx in [(3, 3), (5, 7), (6, 6), (16, 5), (1, 9), (13, 17)]:
        for maxv in (1000, 60000):
            a = rng.integers(0, maxv + 1, (ny, nx)).astype(np.uint16)
            ref = ref_encode(a.copy(), maxv)
            mine = _wav2_transform(a.copy(), maxv, inverse=False)
            np.testing.assert_array_equal(mine, ref)
            back = _wav2_transform(ref.copy(), maxv, inverse=True)
            np.testing.assert_array_equal(back, a)


# ---------------------------------------------------------------------------
# tiled files


def _tiled_header(chlist: bytes, comp: int, box: bytes,
                  txs: int, tys: int, mode: int) -> bytes:
    return b"".join([
        _attr("channels", "chlist", chlist + b"\x00"),
        _attr("compression", "compression", bytes([comp])),
        _attr("dataWindow", "box2i", box),
        _attr("displayWindow", "box2i", box),
        _attr("lineOrder", "lineOrder", bytes([0])),
        _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0)),
        _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0)),
        _attr("screenWindowWidth", "float", struct.pack("<f", 1.0)),
        _attr("tiles", "tiledesc", struct.pack("<IIB", txs, tys, mode)),
    ]) + b"\x00"


def _assemble_tiled(header: bytes, chunks: list) -> bytes:
    start = 8 + len(header) + 8 * len(chunks)
    offsets, at = [], start
    for c in chunks:
        offsets.append(at)
        at += len(c)
    table = struct.pack(f"<{len(chunks)}Q", *offsets)
    return (exr.MAGIC + struct.pack("<i", 2 | 0x200) + header + table
            + b"".join(chunks))


@pytest.mark.parametrize("compression", ["none", "rle", "zips", "zip", "piz"])
@pytest.mark.parametrize("pixel_type", ["half", "float", "uint"])
def test_tiled_roundtrip_matrix(pixel_type, compression):
    img = _rng(41).random((21, 34, 3)).astype(np.float32)
    if pixel_type == "uint":
        img = (img * 4000).astype(np.float32)
    ref, _ = exr.decode_exr_float(exr.encode_exr(img, pixel_type, compression))
    for tiles in [(16, 16), (34, 21), (5, 7), (1, 1), (64, 64)]:
        blob = exr.encode_exr(img, pixel_type, compression, tiles=tiles)
        got, names = exr.decode_exr_float(blob)
        assert names == ["R", "G", "B"]
        assert exr.probe_exr_size(blob) == (21, 34)
        np.testing.assert_array_equal(got, ref)


def test_tiled_golden_one_level():
    # 3x5 single-channel float, 2x2 tiles (cx=3, cy=2), NONE compression,
    # built byte-by-byte independent of encode_exr.
    vals = (np.arange(15, dtype=np.float32).reshape(3, 5) - 7.0) / 4.0
    header = _tiled_header(_chan("Y", 2), 0,
                           struct.pack("<4i", 0, 0, 4, 2), 2, 2, 0)
    chunks = []
    for dy in range(2):
        for dx in range(3):
            tw = min(2, 5 - dx * 2)
            th = min(2, 3 - dy * 2)
            payload = b"".join(
                vals[dy * 2 + r, dx * 2:dx * 2 + tw].astype("<f4").tobytes()
                for r in range(th)
            )
            chunks.append(struct.pack("<5i", dx, dy, 0, 0, len(payload))
                          + payload)
    blob = _assemble_tiled(header, chunks)
    img, names = exr.decode_exr_float(blob)
    assert names == ["Y"]
    np.testing.assert_array_equal(img, vals)
    assert exr.probe_exr_size(blob) == (3, 5)


@pytest.mark.parametrize("rounding", [0, 1])
def test_tiled_mipmap_reads_level0(rounding):
    # 5x4 gray float, 2x2 tiles, MIPMAP: level sizes (w) 5->2->1 with
    # ROUND_DOWN (3 levels), 5->3->2->1 with ROUND_UP (4 levels). The
    # decoder must size the offset table for ALL levels but return
    # level (0,0) only.
    h, w = 4, 5
    vals = _rng(43).random((h, w)).astype(np.float32)
    header = _tiled_header(_chan("Y", 2), 0,
                           struct.pack("<4i", 0, 0, w - 1, h - 1),
                           2, 2, 1 | (rounding << 4))
    n_levels = exr._num_levels(max(w, h), rounding)
    assert n_levels == (3 if rounding == 0 else 4)
    chunks = []
    for l in range(n_levels):
        lw, lh = exr._level_size(w, l, rounding), exr._level_size(h, l, rounding)
        for dy in range((lh + 1) // 2):
            for dx in range((lw + 1) // 2):
                tw, th = min(2, lw - dx * 2), min(2, lh - dy * 2)
                if l == 0:
                    payload = b"".join(
                        vals[dy * 2 + r, dx * 2:dx * 2 + tw]
                        .astype("<f4").tobytes() for r in range(th)
                    )
                else:  # mip levels carry dummy data the reader must skip
                    payload = b"\xEE" * (4 * tw * th)
                chunks.append(
                    struct.pack("<5i", dx, dy, l, l, len(payload)) + payload
                )
    blob = _assemble_tiled(header, chunks)
    img, _ = exr.decode_exr_float(blob)
    np.testing.assert_array_equal(img, vals)


def test_tiled_ripmap_reads_level0():
    # 4x2 gray float, 2x2 tiles, RIPMAP ROUND_DOWN: x levels 4->2->1,
    # y levels 2->1; 8 chunks across the (lx, ly) grid.
    h, w = 2, 4
    vals = _rng(47).random((h, w)).astype(np.float32)
    header = _tiled_header(_chan("Y", 2), 0,
                           struct.pack("<4i", 0, 0, w - 1, h - 1), 2, 2, 2)
    chunks = []
    n_chunks = 0
    for ly in range(exr._num_levels(h, 0)):
        for lx in range(exr._num_levels(w, 0)):
            lw, lh = exr._level_size(w, lx, 0), exr._level_size(h, ly, 0)
            for dy in range((lh + 1) // 2):
                for dx in range((lw + 1) // 2):
                    tw, th = min(2, lw - dx * 2), min(2, lh - dy * 2)
                    if (lx, ly) == (0, 0):
                        payload = b"".join(
                            vals[dy * 2 + r, dx * 2:dx * 2 + tw]
                            .astype("<f4").tobytes() for r in range(th)
                        )
                    else:
                        payload = b"\xEE" * (4 * tw * th)
                    chunks.append(
                        struct.pack("<5i", dx, dy, lx, ly, len(payload))
                        + payload
                    )
                    n_chunks += 1
    assert n_chunks == 8
    blob = _assemble_tiled(header, chunks)
    img, _ = exr.decode_exr_float(blob)
    np.testing.assert_array_equal(img, vals)


def test_tiled_zeroed_offset_table_sequential_fallback():
    img = _rng(53).random((9, 11)).astype(np.float32)
    blob = bytearray(exr.encode_exr(img, "float", "zip", tiles=(4, 4)))
    table_at = exr._parse_header(bytes(blob))["header_end"]
    n = 3 * 3
    blob[table_at:table_at + 8 * n] = b"\x00" * (8 * n)
    got, _ = exr.decode_exr_float(bytes(blob))
    ref, _ = exr.decode_exr_float(exr.encode_exr(img, "float", "zip"))
    np.testing.assert_array_equal(got, ref)


def test_tiled_corruption_raises():
    img = _rng(59).random((6, 6)).astype(np.float32)
    good = exr.encode_exr(img, "float", "none", tiles=(4, 4))

    def chunk_hdr_at(blob, dx, dy):
        tw, th = min(4, 6 - dx * 4), min(4, 6 - dy * 4)
        return blob.index(struct.pack("<5i", dx, dy, 0, 0, tw * th * 4))

    # duplicate tile: rewrite (1,1)'s coords to (0,0)
    bad = bytearray(good)
    at = chunk_hdr_at(bad, 1, 1)
    bad[at:at + 8] = struct.pack("<2i", 0, 0)
    with pytest.raises(ValueError, match="duplicate tile|missing tiles|size mismatch"):
        exr.decode_exr_float(bytes(bad))

    # tile coordinates outside the image
    bad = bytearray(good)
    at = chunk_hdr_at(bad, 1, 0)
    bad[at:at + 8] = struct.pack("<2i", 7, 0)
    with pytest.raises(ValueError, match="outside image"):
        exr.decode_exr_float(bytes(bad))

    # level out of range for ONE_LEVEL
    bad = bytearray(good)
    at = chunk_hdr_at(bad, 0, 1)
    bad[at + 8:at + 16] = struct.pack("<2i", 1, 1)
    with pytest.raises(ValueError, match="level .* out of range"):
        exr.decode_exr_float(bytes(bad))

    # truncation anywhere must raise, never crash
    for cut in range(0, len(good), 11):
        with pytest.raises(ValueError):
            exr.decode_exr_float(good[:cut])

    # corrupt tiledesc: zero tile size / bad mode
    for desc in (struct.pack("<IIB", 0, 4, 0), struct.pack("<IIB", 4, 4, 3)):
        bad = good.replace(struct.pack("<IIB", 4, 4, 0), desc, 1)
        with pytest.raises(ValueError, match="bad tile"):
            exr.decode_exr_float(bad)


def test_tiled_imread_integration(tmp_path):
    # A tiled EXR flows through the generic ingest surface like any
    # other format: decode_image_bgr maps RGB -> BGR uint8.
    img = _rng(61).random((10, 13, 3)).astype(np.float32)
    blob = exr.encode_exr(img, "half", "piz", tiles=(8, 8))
    assert formats.probe_size(blob) == (10, 13)
    bgr = decode_image_bgr(blob)
    ref = decode_image_bgr(exr.encode_exr(img, "half", "piz"))
    np.testing.assert_array_equal(bgr, ref)


# ---------------------------------------------------------------------------
# PXR24 compression


def _f24_quantize(img: np.ndarray) -> np.ndarray:
    from fft_restoration_tpu.utils.exr_pxr24 import _f32_bits_to_f24
    bits = _f32_bits_to_f24(img.view(np.uint32).reshape(img.shape))
    return (bits.astype(np.uint32) << 8).view(np.float32)


def test_pxr24_lossless_types():
    img = _rng(71).random((23, 31, 3)).astype(np.float32)
    for pt, scale in (("half", 1.0), ("uint", 9000.0)):
        a = (img * scale).astype(np.float32)
        ref, _ = exr.decode_exr_float(exr.encode_exr(a, pt, "none"))
        got, _ = exr.decode_exr_float(exr.encode_exr(a, pt, "pxr24"))
        np.testing.assert_array_equal(got, ref)


def test_pxr24_float_is_float24_quantization():
    img = (_rng(73).random((19, 17)) * 7 - 3).astype(np.float32)
    got, _ = exr.decode_exr_float(exr.encode_exr(img, "float", "pxr24"))
    np.testing.assert_array_equal(got, _f24_quantize(img))
    # tiled agrees with scanline bit-for-bit
    gt, _ = exr.decode_exr_float(
        exr.encode_exr(img, "float", "pxr24", tiles=(6, 5)))
    np.testing.assert_array_equal(gt, got)


def test_pxr24_float24_specials():
    from fft_restoration_tpu.utils.exr_pxr24 import _f32_bits_to_f24
    vals = np.array([np.inf, -np.inf, np.nan, 0.0, -0.0,
                     np.float32(3.4e38), 1e-42], np.float32)
    f24 = _f32_bits_to_f24(vals.view(np.uint32))
    back = (f24.astype(np.uint32) << 8).view(np.float32)
    assert back[0] == np.inf and back[1] == -np.inf
    assert np.isnan(back[2])                      # NaN stays NaN
    assert back[3] == 0.0 and back[4] == 0.0
    assert np.signbit(back[4])
    assert np.isfinite(back[5])                   # near-FLT_MAX: no overflow
    assert back[6] >= 0.0                         # denormal survives shifted


def test_pxr24_golden():
    # 1x4 single-channel half, built by hand: per-row per-channel pixel
    # deltas (first vs 0), split MSB-plane-then-LSB-plane, zlib.
    vals = np.array([[0.5, 0.75, -1.0, 0.5]], np.float32)
    pix = vals.astype("<f2").view(np.uint16)[0]
    diffs = [(int(pix[i]) - (int(pix[i - 1]) if i else 0)) & 0xFFFF
             for i in range(4)]
    tmp = bytes([d >> 8 for d in diffs]) + bytes([d & 0xFF for d in diffs])
    payload = zlib.compress(tmp)
    header = _minimal_header(_chan("Y", 1), 5, struct.pack("<4i", 0, 0, 3, 0))
    chunk = struct.pack("<ii", 0, len(payload)) + payload
    table = struct.pack("<Q", 8 + len(header) + 8)
    blob = exr.MAGIC + struct.pack("<i", 2) + header + table + chunk
    img, _ = exr.decode_exr_float(blob)
    np.testing.assert_array_equal(img, vals)


# ---------------------------------------------------------------------------
# B44 / B44A compression


def test_b44_unpack14_matches_loop_transcription():
    # Independent re-derivation of the 14-byte wire layout with plain
    # loops; the module's vectorized unpack must agree bit-for-bit.
    from fft_restoration_tpu.utils import exr_b44

    def ref_unpack14(b):
        s = [0] * 16
        s[0] = (b[0] << 8) | b[1]
        shift = b[2] >> 2
        bias = 0x20 << shift
        c = [((b[2] << 4) | (b[3] >> 4)) & 0x3F,
             ((b[3] << 2) | (b[4] >> 6)) & 0x3F,
             b[4] & 0x3F,
             b[5] >> 2,
             ((b[5] << 4) | (b[6] >> 4)) & 0x3F,
             ((b[6] << 2) | (b[7] >> 6)) & 0x3F,
             b[7] & 0x3F,
             b[8] >> 2,
             ((b[8] << 4) | (b[9] >> 4)) & 0x3F,
             ((b[9] << 2) | (b[10] >> 6)) & 0x3F,
             b[10] & 0x3F,
             b[11] >> 2,
             ((b[11] << 4) | (b[12] >> 4)) & 0x3F,
             ((b[12] << 2) | (b[13] >> 6)) & 0x3F,
             b[13] & 0x3F]
        for k, (i, j) in enumerate(exr_b44._CHAIN):
            s[i] = (s[j] + (c[k] << shift) - bias) & 0xFFFF
        return [v & 0x7FFF if v & 0x8000 else ~v & 0xFFFF for v in s]

    rng = _rng(79)
    blocks = rng.integers(0, 256, (64, 14)).astype(np.uint8)
    blocks[:, 2] &= 0x33  # keep every block in the 14-byte regime
    got = exr_b44._unpack14(blocks)
    for row, b in zip(got, blocks):
        np.testing.assert_array_equal(row, np.array(ref_unpack14(
            [int(v) for v in b]), np.uint16))


def test_b44_anchor_pixels_exact():
    # t[0] of every 4x4 block is stored at full 16-bit precision, so
    # pixels at (4i, 4j) survive bit-exact even on adversarial data.
    img = (_rng(83).random((21, 26)) * 100 - 50).astype(np.float32)
    ref = img.astype(np.float16).astype(np.float32)
    for comp in ("b44", "b44a"):
        got, _ = exr.decode_exr_float(exr.encode_exr(img, "half", comp))
        np.testing.assert_array_equal(got[0::4, 0::4], ref[0::4, 0::4])


def test_b44_smooth_data_bound_and_verbatim_types():
    y, x = np.mgrid[0:48, 0:37]
    img = (0.3 + 0.5 * np.sin(x / 17.0) * np.cos(y / 23.0)).astype(np.float32)
    ref = img.astype(np.float16).astype(np.float32)
    for comp in ("b44", "b44a"):
        got, _ = exr.decode_exr_float(exr.encode_exr(img, "half", comp))
        assert np.abs(got - ref).max() < 0.05  # lossy, but bounded
        # float/uint channels are stored verbatim inside b44 streams
        for pt in ("float", "uint"):
            a = img * 100 if pt == "uint" else img
            r, _ = exr.decode_exr_float(exr.encode_exr(a, pt, "none"))
            g, _ = exr.decode_exr_float(exr.encode_exr(a, pt, comp))
            np.testing.assert_array_equal(g, r)
        # tiled stream agrees with the scanline stream where blocks align
        gt, _ = exr.decode_exr_float(
            exr.encode_exr(img, "half", comp, tiles=(16, 16)))
        np.testing.assert_array_equal(gt[:16, :16], got[:16, :16])


def test_b44a_flat_blocks_exact_and_smaller():
    flat = np.full((32, 32), 0.625, np.float32)
    enc_a = exr.encode_exr(flat, "half", "b44a")
    enc_b = exr.encode_exr(flat, "half", "b44")
    got, _ = exr.decode_exr_float(enc_a)
    np.testing.assert_array_equal(got, flat)
    gotb, _ = exr.decode_exr_float(enc_b)
    np.testing.assert_array_equal(gotb, flat)  # flat is exact in b44 too
    assert len(enc_a) < len(enc_b)             # 3-byte vs 14-byte blocks


def test_b44_specials_flush_to_zero():
    sp = np.zeros((4, 4), np.float32)
    sp[0, 0], sp[1, 1], sp[2, 2] = np.inf, np.nan, -np.inf
    got, _ = exr.decode_exr_float(exr.encode_exr(sp, "half", "b44"))
    np.testing.assert_array_equal(got, np.zeros((4, 4), np.float32))


def test_b44_golden_flat_block_file():
    # Hand-built single 3-byte flat block: t0 = 0.5h | 0x8000, marker
    # byte 0xFC. 4x4 single-channel half, B44A (id 7).
    half_bits = int(np.float16(0.5).view(np.uint16))
    t0 = half_bits | 0x8000
    payload = bytes([t0 >> 8, t0 & 0xFF, 0xFC])
    header = _minimal_header(_chan("Y", 1), 7, struct.pack("<4i", 0, 0, 3, 3))
    chunk = struct.pack("<ii", 0, len(payload)) + payload
    table = struct.pack("<Q", 8 + len(header) + 8)
    blob = exr.MAGIC + struct.pack("<i", 2) + header + table + chunk
    img, _ = exr.decode_exr_float(blob)
    np.testing.assert_array_equal(img, np.full((4, 4), 0.5, np.float32))


def test_pxr24_b44_corruption_raises():
    img = _rng(89).random((9, 9)).astype(np.float32)
    for comp in ("pxr24", "b44", "b44a"):
        blob = exr.encode_exr(img, "half", comp)
        for cut in range(0, len(blob), 13):
            with pytest.raises(ValueError):
                exr.decode_exr_float(blob[:cut])
    # trailing garbage inside a B44 chunk
    blob = bytearray(exr.encode_exr(img, "half", "b44"))
    hdr = exr._parse_header(bytes(blob))
    at = int(np.frombuffer(bytes(blob), "<u8", 1, hdr["header_end"])[0])
    y, size = struct.unpack("<ii", bytes(blob[at:at + 8]))
    blob[at + 4:at + 8] = struct.pack("<i", size + 2)
    blob[at + 8 + size:at + 8 + size] = b"\x00\x00"
    with pytest.raises(ValueError, match="trailing|size mismatch|truncated"):
        exr.decode_exr_float(bytes(blob))
