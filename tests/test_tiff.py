"""Extended TIFF decode coverage (utils/formats.py:decode_tiff).

The reference ingests with cv::imread (/root/reference/serial.cpp:22);
this environment's cv2 5.0 links libtiff, so every case here is pinned
bit-exact against a live cv2 oracle: compressions none/LZW/deflate/
PackBits, Predictor 2, 16-bit narrowing (gray truncates, color rounds
v*255/65535 — both measured), palette, bilevel, strip/tile layouts,
chunky/planar order, both byte orders, and the RGBA unassociated-alpha
premultiplication ((v*a + 127)/255) of libtiff's RGBA path. cv2-
refused inputs (32-bit samples) must raise the documented ValueError.

cv2/PIL write the fixtures (tests may import them; the framework may
not); planar/tiled files are hand-built with a minimal IFD writer.
"""

from __future__ import annotations

import io
import struct
import zlib

import cv2
import numpy as np
import pytest
from PIL import Image

from fft_restoration_tpu.utils import formats
from fft_restoration_tpu.utils.imageio import decode_image_bgr


def _rng(seed):
    return np.random.default_rng(seed)


def _cv2_bgr(blob: bytes):
    return cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)


def _mine_bgr(blob: bytes):
    got = formats.decode_tiff(blob)
    if got.ndim == 2:
        return np.stack([got] * 3, -1)
    if got.shape[-1] == 2:
        return np.stack([got[..., 0]] * 3, -1)
    return got[..., :3][..., ::-1].copy()


def _assert_cv2_parity(blob: bytes):
    ref = _cv2_bgr(blob)
    assert ref is not None, "oracle refused a fixture this test built"
    np.testing.assert_array_equal(_mine_bgr(blob), ref)


# ---------------------------------------------------------------------------
# cv2-written fixtures: compression x depth x layout matrix


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
@pytest.mark.parametrize("shape", [(31, 29, 3), (97, 211)])
def test_cv2_written_8bit(comp, shape):
    img = _rng(sum(shape) + comp).integers(0, 256, shape).astype(np.uint8)
    ok, buf = cv2.imencode(".tiff", img, [cv2.IMWRITE_TIFF_COMPRESSION, comp])
    assert ok
    _assert_cv2_parity(bytes(buf))


def test_cv2_lzw_code_width_growth():
    # noise large enough to push LZW through 9->10->11->12-bit codes
    # and a table Clear; cv2's writer also sets Predictor=2 here, so
    # this pins the predictor path too.
    img = _rng(13).integers(0, 256, (200, 173, 3)).astype(np.uint8)
    ok, buf = cv2.imencode(".tiff", img, [cv2.IMWRITE_TIFF_COMPRESSION, 5])
    assert ok
    tags = formats._tiff_ifd(bytes(buf), "<")
    assert tags.get(317) == [2], "fixture must exercise Predictor 2"
    assert tags[279][0] > 3000, "fixture must exceed the 9-bit code space"
    _assert_cv2_parity(bytes(buf))


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
@pytest.mark.parametrize("shape", [(41, 37), (33, 29, 3)])
def test_cv2_written_16bit(comp, shape):
    # 16->8: gray truncates to the high byte, color rounds v*255/65535
    # (cv2's two internal paths, both measured and pinned).
    img = _rng(sum(shape) * comp).integers(0, 65536, shape).astype(np.uint16)
    ok, buf = cv2.imencode(".tiff", img, [cv2.IMWRITE_TIFF_COMPRESSION, comp])
    assert ok
    _assert_cv2_parity(bytes(buf))


# ---------------------------------------------------------------------------
# PIL-written fixtures: palette, bilevel, RGBA


def _pil_tiff(img: Image.Image, **kw) -> bytes:
    b = io.BytesIO()
    img.save(b, "TIFF", **kw)
    return b.getvalue()


def test_palette_plain_and_lzw():
    rng = _rng(17)
    pimg = Image.fromarray(rng.integers(0, 256, (23, 31)).astype(np.uint8),
                           "P")
    pimg.putpalette(rng.integers(0, 256, 768).astype(np.uint8).tolist())
    _assert_cv2_parity(_pil_tiff(pimg))
    _assert_cv2_parity(_pil_tiff(pimg, compression="tiff_lzw"))


def test_bilevel_default_bits():
    # PIL omits BitsPerSample for 1-bit files: the spec default is 1.
    bil = Image.fromarray(_rng(19).integers(0, 2, (19, 43)).astype(bool))
    blob = _pil_tiff(bil)
    assert 258 not in formats._tiff_ifd(blob, "<")
    _assert_cv2_parity(blob)


def test_gray_alpha_is_not_premultiplied():
    arr = np.zeros((3, 256, 2), np.uint8)
    arr[..., 0] = np.arange(256)
    arr[..., 1] = 119
    blob = _pil_tiff(Image.fromarray(arr, "LA"))
    _assert_cv2_parity(blob)  # cv2's scanline path ignores the alpha


def test_rgba_unassociated_alpha_premultiplies():
    rng = _rng(23)
    arr = rng.integers(0, 256, (13, 11, 4)).astype(np.uint8)
    blob = _pil_tiff(Image.fromarray(arr, "RGBA"), compression="tiff_lzw")
    assert formats._tiff_ifd(blob, "<").get(338) == [2]  # unassociated
    _assert_cv2_parity(blob)
    # and the raw decode carries the premultiplied RGB + original alpha
    got = formats.decode_tiff(blob)
    a = arr[..., 3:].astype(np.uint16)
    want = ((arr[..., :3].astype(np.uint16) * a + 127) // 255).astype(np.uint8)
    np.testing.assert_array_equal(got[..., :3], want)
    np.testing.assert_array_equal(got[..., 3], arr[..., 3])


# ---------------------------------------------------------------------------
# hand-built layouts: planar, tiles, byte order


def build_tiff(w, h, spp, bits, comp, photometric, segments, seg_tags,
               bo="<", extra_tags=()):
    """Minimal IFD writer: header | IFD | oversize values | segments."""
    entries = [(256, 4, [w]), (257, 4, [h]), (258, 3, [bits] * spp),
               (259, 3, [comp]), (262, 3, [photometric]), (277, 3, [spp]),
               (seg_tags[0], 4, ["SEGS"]),
               (seg_tags[1], 4, [len(s) for s in segments])]
    entries += [list(t) for t in extra_tags]
    entries.sort(key=lambda e: e[0])

    def val_bytes(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack(bo + fmt, v) for v in vals)

    base = 8 + 2 + 12 * len(entries) + 4
    sizes = [
        len(val_bytes(t, [0] * len(segments) if v == ["SEGS"] else v))
        for _, t, v in entries
    ]
    ovf_size = sum(s for s in sizes if s > 4)
    seg_offs, at = [], base + ovf_size
    for s in segments:
        seg_offs.append(at)
        at += len(s)
    ovf, body = b"", b""
    for tag, typ, vals in entries:
        if vals == ["SEGS"]:
            vals = seg_offs
        vb = val_bytes(typ, vals)
        if len(vb) <= 4:
            body += (struct.pack(bo + "HHI", tag, typ, len(vals))
                     + vb.ljust(4, b"\x00"))
        else:
            body += (struct.pack(bo + "HHI", tag, typ, len(vals))
                     + struct.pack(bo + "I", base + len(ovf)))
            ovf += vb
    hdr = (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(bo + "I", 8)
    return (hdr + struct.pack(bo + "H", len(entries)) + body
            + struct.pack(bo + "I", 0) + ovf + b"".join(segments))


def test_planar_configuration_2():
    img = _rng(29).integers(0, 256, (13, 21, 3)).astype(np.uint8)
    segs = [img[..., c].tobytes() for c in range(3)]
    blob = build_tiff(21, 13, 3, 8, 1, 2, segs, (273, 279),
                      extra_tags=((284, 3, [2]), (278, 4, [13])))
    _assert_cv2_parity(blob)
    # planar + multiple strips per plane + PackBits
    def pb(raw):
        out = bytearray()
        for i in range(0, len(raw), 128):
            lit = raw[i:i + 128]
            out.append(len(lit) - 1)
            out += lit
        return bytes(out)

    segs = []
    for c in range(3):
        segs.append(pb(img[:7, :, c].tobytes()))
        segs.append(pb(img[7:, :, c].tobytes()))
    blob = build_tiff(21, 13, 3, 8, 32773, 2, segs, (273, 279),
                      extra_tags=((284, 3, [2]), (278, 4, [7])))
    _assert_cv2_parity(blob)


def test_tiled_chunky_and_planar():
    img = _rng(31).integers(0, 256, (13, 21, 3)).astype(np.uint8)
    padded = np.zeros((16, 32, 3), np.uint8)
    padded[:13, :21] = img
    tiles = [zlib.compress(padded[:, k * 16:(k + 1) * 16, :].tobytes())
             for k in range(2)]
    blob = build_tiff(21, 13, 3, 8, 8, 2, tiles, (324, 325),
                      extra_tags=((322, 4, [16]), (323, 4, [16])))
    _assert_cv2_parity(blob)
    # planar tiles: all tiles of channel 0, then 1, then 2
    tiles = [zlib.compress(padded[:, k * 16:(k + 1) * 16, c].tobytes())
             for c in range(3) for k in range(2)]
    blob = build_tiff(21, 13, 3, 8, 8, 2, tiles, (324, 325),
                      extra_tags=((322, 4, [16]), (323, 4, [16]),
                                  (284, 3, [2])))
    _assert_cv2_parity(blob)


def test_big_endian_deflate():
    g = _rng(37).integers(0, 256, (9, 14)).astype(np.uint8)
    blob = build_tiff(14, 9, 1, 8, 8, 1, [zlib.compress(g.tobytes())],
                      (273, 279), bo=">")
    _assert_cv2_parity(blob)
    np.testing.assert_array_equal(formats.decode_tiff(blob), g)


def test_white_is_zero():
    g = _rng(41).integers(0, 256, (7, 9)).astype(np.uint8)
    blob = build_tiff(9, 7, 1, 8, 1, 0, [g.tobytes()], (273, 279))
    _assert_cv2_parity(blob)
    np.testing.assert_array_equal(formats.decode_tiff(blob), 255 - g)


# ---------------------------------------------------------------------------
# contract errors and fuzz


def test_float_tiff_rejected_like_cv2():
    f = (np.arange(12, dtype=np.float32).reshape(3, 4) / 6 - 0.5)
    ok, buf = cv2.imencode(".tiff", f)
    assert ok
    assert _cv2_bgr(bytes(buf)) is None  # cv2's own reader refuses it
    with pytest.raises(ValueError, match="32-bit"):
        formats.decode_tiff(bytes(buf))


def test_unsupported_knobs_raise():
    g = _rng(43).integers(0, 256, (5, 6)).astype(np.uint8)
    base = lambda **kw: build_tiff(6, 5, 1, 8, 1, 1, [g.tobytes()],
                                   (273, 279), **kw)
    with pytest.raises(ValueError, match="SOI"):
        # compression 7 is supported now, but a strip that isn't a JPEG
        # stream is a contract error
        formats.decode_tiff(
            build_tiff(6, 5, 1, 8, 7, 1, [g.tobytes()], (273, 279)))
    with pytest.raises(ValueError, match="compression 6"):
        formats.decode_tiff(
            build_tiff(6, 5, 1, 8, 6, 1, [g.tobytes()], (273, 279)))
    with pytest.raises(ValueError, match="FillOrder"):
        formats.decode_tiff(base(extra_tags=((266, 3, [2]),)))
    with pytest.raises(ValueError, match="predictor 3"):
        formats.decode_tiff(base(extra_tags=((317, 3, [3]),)))
    with pytest.raises(ValueError, match="ColorMap"):
        formats.decode_tiff(
            build_tiff(6, 5, 1, 8, 1, 3, [g.tobytes()], (273, 279)))


def test_truncation_and_corrupt_streams_raise():
    img = _rng(47).integers(0, 256, (24, 31, 3)).astype(np.uint8)
    for comp in (5, 8, 32773):
        ok, buf = cv2.imencode(".tiff", img,
                               [cv2.IMWRITE_TIFF_COMPRESSION, comp])
        blob = bytes(buf)
        for cut in range(8, len(blob), 97):
            try:
                formats.decode_tiff(blob[:cut])
            except ValueError:
                pass  # must raise ValueError or decode a prefix, never crash


def test_imread_integration(tmp_path):
    img = _rng(53).integers(0, 256, (19, 23, 3)).astype(np.uint8)
    ok, buf = cv2.imencode(".tiff", img, [cv2.IMWRITE_TIFF_COMPRESSION, 5])
    p = tmp_path / "x.tif"
    p.write_bytes(bytes(buf))
    ref = cv2.imread(str(p), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(decode_image_bgr(p.read_bytes()), ref)
    assert formats.probe_size(bytes(buf)) == (19, 23)


# ---------------------------------------------------------------------------
# CCITT fax compressions (2=MH, 3=G3, 4=G4) — utils/fax.py


def _fax_blob(bw: np.ndarray, compression: str) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(bw.astype(np.uint8) * 255).convert("1").save(
        buf, format="TIFF", compression=compression
    )
    return buf.getvalue()


@pytest.mark.parametrize("compression", ["group4", "group3", "tiff_ccitt"])
def test_fax_textured_bilevel_bit_exact(compression):
    # diagonal bands + noise: exercises all three 2D modes (V/H/P) and
    # the 1D run tables; decode must be bit-exact vs cv2 (lossless).
    rng = _rng(5)
    drift = np.cumsum(rng.integers(0, 2, (61,)))[:, None]
    bw = (drift + np.arange(203)[None, :]) % 7 < 3
    bw[17] = False  # an all-white row (empty transition list)
    bw[18] = True   # an all-black row (first white run of length 0)
    _assert_cv2_parity(_fax_blob(bw, compression))


@pytest.mark.parametrize("compression", ["group4", "group3"])
def test_fax_run_table_sweep(compression):
    # One black run of length k per row, sweeping every terminating
    # code (0-63), every makeup bucket (64..1728) and the extended
    # makeups (1792..2560): any wrong T.4 table entry shifts a run and
    # breaks bit-exactness. The white runs sweep width-k in lockstep.
    runs = list(range(0, 64)) + list(range(64, 1729, 64)) + list(
        range(1792, 2561, 64)
    ) + [2600, 2623]
    w = 2624
    bw = np.zeros((len(runs), w), bool)
    for y, k in enumerate(runs):
        bw[y, :k] = True
    _assert_cv2_parity(_fax_blob(bw, compression))


def test_fax_white_is_zero_photometric():
    # PIL writes MinIsBlack; fax scanners write MinIsWhite. Patch the
    # PhotometricInterpretation entry to 0 and require cv2 parity.
    blob = bytearray(_fax_blob(_rng(7).random((40, 120)) < 0.4, "group4"))
    (ifd,) = struct.unpack("<I", blob[4:8])
    (n,) = struct.unpack("<H", blob[ifd : ifd + 2])
    hit = False
    for i in range(n):
        e = ifd + 2 + 12 * i
        if struct.unpack("<H", blob[e : e + 2])[0] == 262:
            blob[e + 8 : e + 12] = struct.pack("<I", 0)
            hit = True
    assert hit
    _assert_cv2_parity(bytes(blob))


def test_fax_corrupt_streams_raise():
    blob = _fax_blob(_rng(9).random((32, 64)) < 0.5, "group4")
    from fft_restoration_tpu.utils.fax import decode_g4

    with pytest.raises(ValueError):
        # VR3 with the reference edge at width: a1 lands past the row
        decode_g4(b"\x06" * 8, 64, 32)
    with pytest.raises(ValueError):
        decode_g4(b"\x00" * 8, 64, 32)  # EOL-class zeros mid-G4
    # zero out the heart of the strip payload inside a real file: the
    # rows degrade to EOL-class zero bits mid-G4, which is a framing
    # error (decode must raise, never loop or crash)
    bo = "<" if blob[:2] == b"II" else ">"
    off = formats._tiff_ifd(blob, bo)[273][0]
    wrecked = bytearray(blob)
    wrecked[off + 4 : off + 24] = b"\x00" * 20
    with pytest.raises(ValueError):
        formats.decode_tiff(bytes(wrecked))
    with pytest.raises(ValueError):
        # fax on non-bilevel data is a contract error
        from fft_restoration_tpu.utils.fax import decode_mh

        decode_mh(b"\x35" * 4, 0, 4)


# ---------------------------------------------------------------------------
# JPEG-in-TIFF (compression 7, TTN2) — per-strip JPEG + JPEGTables


def _jpeg_tiff_blob(arr: np.ndarray, **kw) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(
        buf, format="TIFF", compression="jpeg", quality=92, **kw
    )
    return buf.getvalue()


@pytest.fixture(scope="module")
def photo_rgb():
    rng = _rng(11)
    y, x = np.mgrid[:80, :120]
    base = 128 + 60 * np.sin(x / 9.0) + 50 * np.cos(y / 7.0) + rng.random(
        (80, 120)
    ) * 30
    return np.clip(
        np.stack([base, np.roll(base, 7, 0), 255 - base], -1), 0, 255
    ).astype(np.uint8)


def test_jpeg_in_tiff_rgb(photo_rgb):
    # PIL/libtiff writes photometric=2 with an untransformed RGB JPEG
    # stream (component ids 'R','G','B') and shared JPEGTables (347).
    blob = _jpeg_tiff_blob(photo_rgb)
    ref = _cv2_bgr(blob)
    assert np.abs(
        _mine_bgr(blob).astype(int) - ref.astype(int)
    ).max() <= 1  # IDCT rounding only: stream is RGB, no chroma loss


def test_jpeg_in_tiff_multistrip(photo_rgb):
    blob = _jpeg_tiff_blob(photo_rgb, strip_size=2048)
    bo = "<" if blob[:2] == b"II" else ">"
    assert len(formats._tiff_ifd(blob, bo).get(273, [])) > 1
    ref = _cv2_bgr(blob)
    assert np.abs(_mine_bgr(blob).astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_in_tiff_gray(photo_rgb):
    blob = _jpeg_tiff_blob(photo_rgb[..., 0])
    ref = _cv2_bgr(blob)
    assert np.abs(_mine_bgr(blob).astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_in_tiff_corrupt_raises(photo_rgb):
    blob = bytearray(_jpeg_tiff_blob(photo_rgb))
    bo = "<" if blob[:2] == b"II" else ">"
    tags = formats._tiff_ifd(bytes(blob), bo)
    off = tags[273][0]
    blob[off] = 0x00  # strip no longer starts with SOI
    with pytest.raises(ValueError):
        formats.decode_tiff(bytes(blob))
