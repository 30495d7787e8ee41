"""BMP / PNM / TIFF codec parity (utils/formats.py).

The reference accepts whatever cv::imread reads (/root/reference/serial.cpp:22).
These tests validate our decoders bit-for-bit against OpenCV's own
encoders/decoders where cv2 is available, plus self round-trips and
corrupt-input behavior (clean ValueError, never a crash)."""

import numpy as np
import pytest

from fft_restoration_tpu.utils import formats
from fft_restoration_tpu.utils.imageio import imread, imwrite

cv2 = pytest.importorskip("cv2")


def _rgb(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _gray(h, w, seed=1):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


# ---------------------------------------------------------------------------
# BMP


@pytest.mark.parametrize("shape", [(13, 17), (32, 32), (5, 3)])
def test_bmp_decode_matches_cv2_encode(shape, tmp_path):
    img = _rgb(*shape)
    p = tmp_path / "x.bmp"
    assert cv2.imwrite(str(p), img[..., ::-1])  # cv2 takes BGR
    got = formats.decode_bmp(p.read_bytes())
    np.testing.assert_array_equal(got, img)


def test_bmp_gray8_paletted_matches_cv2(tmp_path):
    img = _gray(11, 23)
    p = tmp_path / "g.bmp"
    assert cv2.imwrite(str(p), img)
    got = formats.decode_bmp(p.read_bytes())
    ref = cv2.imread(str(p), cv2.IMREAD_COLOR)[..., ::-1]
    np.testing.assert_array_equal(got, ref)


def test_bmp_encode_read_by_cv2(tmp_path):
    img = _rgb(9, 31)
    blob = formats.encode_bmp(img)
    p = tmp_path / "e.bmp"
    p.write_bytes(blob)
    ref = cv2.imread(str(p), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(ref[..., ::-1], img)


def test_bmp_roundtrip_odd_stride():
    # widths whose 3-byte rows are not 4-aligned exercise row padding
    for w in (1, 2, 3, 5, 6, 7):
        img = _rgb(4, w, seed=w)
        np.testing.assert_array_equal(formats.decode_bmp(formats.encode_bmp(img)), img)


def test_bmp_top_down():
    img = _rgb(6, 4)
    blob = bytearray(formats.encode_bmp(img))
    # flip height sign to top-down and reverse the raster rows
    import struct

    h = struct.unpack("<i", blob[22:26])[0]
    blob[22:26] = struct.pack("<i", -h)
    stride = (4 * 3 + 3) & ~3
    pix = np.frombuffer(bytes(blob[54:]), np.uint8).reshape(h, stride)
    blob[54:] = pix[::-1].tobytes()
    np.testing.assert_array_equal(formats.decode_bmp(bytes(blob)), img)


def test_bmp_corrupt():
    with pytest.raises(ValueError):
        formats.decode_bmp(b"BM" + b"\x00" * 10)
    with pytest.raises(ValueError):
        formats.decode_bmp(b"XX" + b"\x00" * 60)
    good = formats.encode_bmp(_rgb(8, 8))
    with pytest.raises(ValueError):
        formats.decode_bmp(good[: len(good) // 2])  # truncated pixels


# ---------------------------------------------------------------------------
# PNM


@pytest.mark.parametrize("ext", ["ppm", "pgm"])
def test_pnm_decode_matches_cv2_encode(ext, tmp_path):
    img = _rgb(14, 9) if ext == "ppm" else _gray(14, 9)
    p = tmp_path / f"x.{ext}"
    assert cv2.imwrite(str(p), img[..., ::-1] if ext == "ppm" else img)
    got = formats.decode_pnm(p.read_bytes())
    np.testing.assert_array_equal(got, img)


def test_pnm_encode_read_by_cv2(tmp_path):
    img = _rgb(7, 12)
    p = tmp_path / "e.ppm"
    p.write_bytes(formats.encode_pnm(img))
    ref = cv2.imread(str(p), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(ref[..., ::-1], img)


def test_pnm_ascii_variants():
    # P2 ASCII graymap with a comment line
    body = b"P2\n# a comment\n3 2\n255\n0 128 255\n 10 20 30\n"
    got = formats.decode_pnm(body)
    np.testing.assert_array_equal(got, [[0, 128, 255], [10, 20, 30]])
    # P3 ASCII pixmap
    body = b"P3 2 1 255  1 2 3  4 5 6"
    np.testing.assert_array_equal(formats.decode_pnm(body), [[[1, 2, 3], [4, 5, 6]]])
    # P1 bitmap: 1 = black
    body = b"P1\n3 1\n0 1 0\n"
    np.testing.assert_array_equal(formats.decode_pnm(body), [[255, 0, 255]])


def test_pnm_p4_bitmap():
    # P4: packed bits, 1 = black, rows byte-aligned
    body = b"P4\n10 2\n" + bytes([0b10101010, 0b01000000, 0b11111111, 0b11000000])
    got = formats.decode_pnm(body)
    assert got.shape == (2, 10)
    np.testing.assert_array_equal(
        got[0], [0, 255, 0, 255, 0, 255, 0, 255, 255, 0]
    )
    np.testing.assert_array_equal(got[1], [0] * 10)


def test_pnm_16bit_scales():
    # P5 maxval 65535: big-endian 16-bit samples round to 8-bit
    body = b"P5\n2 1\n65535\n" + (65535).to_bytes(2, "big") + (0).to_bytes(2, "big")
    np.testing.assert_array_equal(formats.decode_pnm(body), [[255, 0]])


def test_pnm_nondefault_maxval():
    body = b"P2\n2 1\n100\n0 100\n"
    np.testing.assert_array_equal(formats.decode_pnm(body), [[0, 255]])


def test_pnm_corrupt():
    for bad in (b"P5\n3 3\n255\n\x00\x00", b"P2\n3\n", b"P7\n", b"P2\n2 1\n255\nxx yy\n"):
        with pytest.raises(ValueError):
            formats.decode_pnm(bad)


# ---------------------------------------------------------------------------
# TIFF


@pytest.mark.parametrize("gray", [False, True])
def test_tiff_roundtrip_and_cv2(gray, tmp_path):
    img = _gray(10, 21) if gray else _rgb(10, 21)
    blob = formats.encode_tiff(img)
    np.testing.assert_array_equal(formats.decode_tiff(blob), img)
    p = tmp_path / "x.tif"
    p.write_bytes(blob)
    ref = cv2.imread(str(p), cv2.IMREAD_COLOR)[..., ::-1]
    want = np.repeat(img[..., None], 3, -1) if gray else img
    np.testing.assert_array_equal(ref, want)


def test_tiff_decode_cv2_uncompressed(tmp_path):
    img = _rgb(8, 8)
    p = tmp_path / "c.tif"
    assert cv2.imwrite(
        str(p), img[..., ::-1], [cv2.IMWRITE_TIFF_COMPRESSION, 1]
    )  # 1 = none
    got = formats.decode_tiff(p.read_bytes())
    np.testing.assert_array_equal(got[..., :3], img)


def test_tiff_big_endian():
    img = _gray(4, 4)
    blob = bytearray(formats.encode_tiff(img))
    # hand-build a big-endian variant of the same single-strip file
    import struct

    le = bytes(blob)
    tags = formats._tiff_ifd(le, "<")
    be = b"MM\x00*" + struct.pack(">I", 8)
    entries = b""
    for tag in (256, 257, 258, 259, 262, 273, 277, 279):
        v = tags[tag][0]
        typ = 3 if tag in (258, 259, 262, 277) else 4
        body = (
            struct.pack(">HH", v, 0) if typ == 3 else struct.pack(">I", v)
        )
        entries += struct.pack(">HHI", tag, typ, 1) + body
    be += struct.pack(">H", 8) + entries + struct.pack(">I", 0)
    # place the strip where the LE file put it (offset tag value is reused)
    off = tags[273][0]
    be = be.ljust(off, b"\x00") + le[off : off + tags[279][0]]
    np.testing.assert_array_equal(formats.decode_tiff(be), img)


def test_tiff_corrupt():
    with pytest.raises(ValueError):
        formats.decode_tiff(b"II*\x00\xff\xff\xff\xff")
    good = formats.encode_tiff(_rgb(6, 6))
    with pytest.raises(ValueError):
        formats.decode_tiff(good[:-20])  # truncated strip


# ---------------------------------------------------------------------------
# imread / imwrite / probe_size dispatch


@pytest.mark.parametrize("ext", ["bmp", "ppm", "pgm", "tif"])
def test_imread_imwrite_roundtrip(ext, tmp_path):
    img_bgr = _rgb(12, 15)[..., ::-1].copy()
    p = tmp_path / f"rt.{ext}"
    imwrite(str(p), img_bgr)
    got = imread(str(p))
    if ext == "pgm":
        # gray write path: imwrite writes the BGR->RGB'd planes as PPM
        # because the array is 3-channel; just assert the round trip
        np.testing.assert_array_equal(got, img_bgr)
    else:
        np.testing.assert_array_equal(got, img_bgr)


def test_imread_matches_cv2_for_all_formats(tmp_path):
    img = _rgb(16, 20)
    for ext in ("bmp", "ppm"):
        p = tmp_path / f"m.{ext}"
        assert cv2.imwrite(str(p), img[..., ::-1])
        ours = imread(str(p))
        ref = cv2.imread(str(p), cv2.IMREAD_COLOR)
        np.testing.assert_array_equal(ours, ref)


def test_probe_size_new_formats(tmp_path):
    from fft_restoration_tpu.utils.imageio import probe_size

    img = _rgb(23, 41)
    for ext, enc in (
        ("bmp", formats.encode_bmp),
        ("ppm", formats.encode_pnm),
        ("tif", formats.encode_tiff),
    ):
        p = tmp_path / f"s.{ext}"
        p.write_bytes(enc(img))
        assert probe_size(str(p)) == (23, 41)


def test_imread_unknown_format(tmp_path):
    p = tmp_path / "x.dat"
    p.write_bytes(b"\x00\x01\x02\x03 not an image")
    with pytest.raises(ValueError, match="unrecognised image format"):
        imread(str(p))


# ---------------------------------------------------------------------------
# robustness: corrupt/truncated inputs raise ValueError, never crash


def test_truncation_fuzz():
    """Every prefix-truncation of a valid file either decodes or raises
    ValueError — no IndexError/struct.error/segfault escapes."""
    img = _rgb(9, 11)
    blobs = [
        formats.encode_bmp(img),
        formats.encode_pnm(img),
        formats.encode_tiff(img),
    ]
    for blob in blobs:
        for cut in range(0, len(blob), max(1, len(blob) // 37)):
            try:
                formats.decode(blob[:cut])
            except ValueError:
                pass


def test_random_bytes_fuzz():
    rng = np.random.default_rng(5)
    for i in range(200):
        blob = rng.integers(0, 256, rng.integers(1, 200), dtype=np.uint8).tobytes()
        try:
            formats.decode(blob)
        except ValueError:
            pass
    # forced magics with garbage bodies
    for magic in (b"BM", b"P5\n", b"II*\x00", b"MM\x00*"):
        for i in range(50):
            blob = magic + rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
            try:
                formats.decode(blob)
            except ValueError:
                pass


def test_pnm_p1_unseparated_and_raster_comments():
    """Code-review regressions: P1 digits need no separators, and '#'
    comments are legal mid-raster in every plain format."""
    got = formats.decode_pnm(b"P1\n4 2\n0110\n1001\n")
    np.testing.assert_array_equal(
        got, [[255, 0, 0, 255], [0, 255, 255, 0]]
    )
    got = formats.decode_pnm(b"P2\n2 2\n255\n0 64\n# note 99\n128 255\n")
    np.testing.assert_array_equal(got, [[0, 64], [128, 255]])


def test_bmp_palette_index_out_of_range():
    import struct as _s

    img = _gray(4, 4)
    # hand-build an 8-bit BMP with a 2-entry palette but index 200
    pal = b"\x00\x00\x00\x00" + b"\xff\xff\xff\x00"
    stride = (4 + 3) & ~3
    pix = bytes([200] * stride * 4)
    info = _s.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 0, len(pix), 0, 0, 2, 0)
    hdr = _s.pack("<2sIHHI", b"BM", 14 + 40 + len(pal) + len(pix), 0, 0,
                  14 + 40 + len(pal))
    with pytest.raises(ValueError, match="palette index"):
        formats.decode_bmp(hdr + info + pal + pix)


def test_tiff_unsupported_photometric():
    blob = bytearray(formats.encode_tiff(_gray(4, 4)))
    # rewrite the Photometric tag value to 5 (CMYK separation; palette
    # decodes since round 4, tests/test_tiff.py)
    import struct as _s

    n = _s.unpack("<H", blob[8:10])[0]
    for i in range(n):
        e = 10 + 12 * i
        tag = _s.unpack("<H", blob[e : e + 2])[0]
        if tag == 262:
            blob[e + 8 : e + 10] = _s.pack("<H", 5)
    with pytest.raises(ValueError, match="PhotometricInterpretation"):
        formats.decode_tiff(bytes(blob))


def test_webp_sniffed_and_routed_to_decoder():
    """cv::imread accepts WebP (serial.cpp:22); sniff recognises the
    container and formats.decode routes it to the in-repo VP8/VP8L
    decoder (utils/webp.py). Garbage payloads fail with a clean
    ValueError, full parity lives in tests/test_webp.py."""
    import pytest

    from fft_restoration_tpu.utils import formats

    blob = b"RIFF" + b"\x2a\x00\x00\x00" + b"WEBPVP8 " + b"\x00" * 20
    assert formats.sniff(blob) == "webp"
    with pytest.raises(ValueError, match="corrupt WebP"):
        formats.decode(blob)

    img = _rgb(24, 16, seed=9)
    ok, enc = cv2.imencode(".webp", img[..., ::-1])
    assert ok
    got = formats.decode(enc.tobytes())
    ref = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]
    np.testing.assert_array_equal(got[..., :3], ref)

    from fft_restoration_tpu.utils.imageio import decode_image_bgr

    np.testing.assert_array_equal(
        decode_image_bgr(enc.tobytes()), ref[..., ::-1]
    )
