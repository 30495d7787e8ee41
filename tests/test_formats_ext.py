"""PFM / Radiance HDR / Sun Raster codec parity, and the JPEG-2000 /
OpenEXR contract errors (utils/formats.py).

cv::imread accepts these alongside PNG/JPEG/BMP/PNM/TIFF/WebP
(/root/reference/serial.cpp:22). Decoder semantics were pinned
empirically against the env's cv2 5.0 (see the probe notes in
utils/formats.py); where this cv2 build itself fails (gray 'Pf' PFM hits
an internal imread bug, type-2 RLE rasters are rejected) the tests pin
the spec behavior with hand-built expectations instead.
"""

import struct

import numpy as np
import pytest

from fft_restoration_tpu.utils import formats
from fft_restoration_tpu.utils.imageio import decode_image_bgr, probe_size

cv2 = pytest.importorskip("cv2")


# ---------------------------------------------------------------------------
# builders


def _pfm_bytes(img, scale=-1.0):
    color = img.ndim == 3
    hdr = (b"PF\n" if color else b"Pf\n") + (
        f"{img.shape[1]} {img.shape[0]}\n{scale}\n".encode()
    )
    dt = "<f4" if scale < 0 else ">f4"
    return hdr + np.flipud(img).astype(dt).tobytes()


def _rgbe_px(p):
    m = float(max(p))
    if m < 1e-32:
        return np.zeros(4, np.uint8)
    _, e = np.frexp(m)
    s = 256.0 / 2.0**e
    return np.array([int(p[0] * s), int(p[1] * s), int(p[2] * s), e + 128],
                    np.uint8)


def _rgbe_img(img):
    h, w = img.shape[:2]
    return np.stack(
        [np.stack([_rgbe_px(img[y, x]) for x in range(w)]) for y in range(h)]
    )


def _hdr_bytes(rgbe, rle=False):
    h, w = rgbe.shape[:2]
    out = bytearray(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
    out += f"-Y {h} +X {w}\n".encode()
    for y in range(h):
        if not rle:
            out += rgbe[y].tobytes()
            continue
        out += bytes([2, 2, w >> 8, w & 0xFF])
        for c in range(4):
            comp, x = rgbe[y, :, c], 0
            while x < w:
                run = 1
                while x + run < w and comp[x + run] == comp[x] and run < 127:
                    run += 1
                if run >= 3:
                    out += bytes([128 + run, comp[x]])
                    x += run
                else:
                    j = x
                    while j < w and j - x < 128 and not (
                        j + 2 < w and comp[j] == comp[j + 1] == comp[j + 2]
                    ):
                        j += 1
                    out += bytes([j - x]) + comp[x:j].tobytes()
                    x = j
    return bytes(out)


def _rgbe_expected_u8(rgbe):
    e = rgbe[..., 3].astype(np.int32)
    v = rgbe[..., :3].astype(np.float32) * np.where(
        e == 0, 0.0, np.exp2((e - 136).astype(np.float32))
    )[..., None]
    return np.clip(np.rint(v * 255.0), 0, 255).astype(np.uint8)


def _ras_bytes(raster_rows, w, h, depth, rtype=1, palette=b"", maptype=0):
    hdr = struct.pack(
        ">8i", 0x59A66A95, w, h, depth, len(raster_rows), rtype,
        maptype, len(palette),
    )
    return hdr + palette + raster_rows


def _ras_rows(pixels_bytes_per_row):
    return b"".join(
        r + (b"\x00" if len(r) % 2 else b"") for r in pixels_bytes_per_row
    )


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# PFM


@pytest.mark.parametrize("scale", [-1.0, -4.0, 2.0])
def test_pfm_color_matches_cv2(tmp_path, scale):
    img = (_rng(3).random((7, 5, 3)) * 300.0 - 20.0).astype(np.float32)
    blob = _pfm_bytes(img, scale)
    p = tmp_path / "t.pfm"
    p.write_bytes(blob)
    ref = cv2.imread(str(p), cv2.IMREAD_COLOR)
    assert ref is not None
    got = decode_image_bgr(blob)
    np.testing.assert_array_equal(got, ref)


def test_pfm_gray_spec():
    # this env's cv2 imread fails on gray PFM (internal imread bug);
    # pin the spec: value/|scale|, saturate-round, bottom-up rows
    img = np.array([[0.2, 1.5, 100.4], [0.5, 254.5, 300.0]], np.float32)
    got = formats.decode_pfm(_pfm_bytes(img, -2.0))
    exp = np.clip(np.rint(img / 2.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, exp)
    assert got.ndim == 2


def test_pfm_probe_and_errors():
    img = np.ones((4, 6, 3), np.float32)
    blob = _pfm_bytes(img)
    assert probe_size_bytes(blob) == (4, 6)
    with pytest.raises(ValueError, match="truncated"):
        formats.decode_pfm(blob[:-8])
    with pytest.raises(ValueError, match="scale|geometry"):
        formats.decode_pfm(b"PF\n6 4\n0.0\n" + b"\x00" * 400)
    with pytest.raises(ValueError, match="not a PFM"):
        formats.decode_pfm(b"QX junk")


def probe_size_bytes(blob, tmp_path=None):
    return formats.probe_size(blob)


# ---------------------------------------------------------------------------
# Radiance HDR


@pytest.mark.parametrize("rle", [False, True])
def test_hdr_matches_cv2(tmp_path, rle):
    img = (_rng(5).random((6, 16, 3)) * 3.0).astype(np.float32)
    img[0, 0] = 0.0
    rgbe = _rgbe_img(img)
    blob = _hdr_bytes(rgbe, rle=rle)
    p = tmp_path / "t.hdr"
    p.write_bytes(blob)
    ref = cv2.imread(str(p), cv2.IMREAD_COLOR)
    assert ref is not None
    got = decode_image_bgr(blob)
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(got[..., ::-1], _rgbe_expected_u8(rgbe))


def test_hdr_old_style_rle_spec():
    # old-style (1,1,1,count) repeat markers: 4 distinct pixels then a
    # 4-repeat of the last one
    px = np.array(
        [[40, 50, 60, 130], [10, 20, 30, 129], [7, 7, 7, 128],
         [90, 10, 5, 131]],
        np.uint8,
    )
    row = px.tobytes() + bytes([1, 1, 1, 4])
    blob = (
        b"#?RADIANCE\n\n" + b"-Y 1 +X 8\n" + row
    )
    got = formats.decode_hdr(blob)
    rgbe = np.concatenate([px, np.repeat(px[3:], 4, axis=0)])[None]
    np.testing.assert_array_equal(got, _rgbe_expected_u8(rgbe))


def test_hdr_probe_and_errors():
    img = np.ones((3, 9, 3), np.float32)
    blob = _hdr_bytes(_rgbe_img(img))
    assert formats.probe_size(blob) == (3, 9)
    with pytest.raises(ValueError, match="truncated"):
        formats.decode_hdr(blob[:-5])
    with pytest.raises(ValueError, match="orientation"):
        formats.decode_hdr(b"#?RADIANCE\n\n+Y 2 +X 2\n" + b"\x00" * 32)
    with pytest.raises(ValueError, match="format"):
        formats.decode_hdr(b"#?RADIANCE\nFORMAT=32-bit_rle_xyze\n\n-Y 1 +X 1\n" + b"\x00" * 4)


# ---------------------------------------------------------------------------
# Sun Raster


def test_ras_24bit_matches_cv2(tmp_path):
    img = _rng(7).integers(0, 256, (5, 7, 3), dtype=np.uint8)  # RGB
    rows = _ras_rows([img[y][..., ::-1].tobytes() for y in range(5)])
    blob = _ras_bytes(rows, 7, 5, 24)
    p = tmp_path / "t.ras"
    p.write_bytes(blob)
    ref = cv2.imread(str(p), cv2.IMREAD_COLOR)
    assert ref is not None
    np.testing.assert_array_equal(decode_image_bgr(blob), ref)
    np.testing.assert_array_equal(formats.decode_ras(blob), img)


def test_ras_32bit_matches_cv2(tmp_path):
    img = _rng(8).integers(0, 256, (3, 4, 3), dtype=np.uint8)
    rows = _ras_rows(
        [
            b"".join(
                bytes([0, img[y, x, 2], img[y, x, 1], img[y, x, 0]])
                for x in range(4)
            )
            for y in range(3)
        ]
    )
    blob = _ras_bytes(rows, 4, 3, 32)
    p = tmp_path / "t.ras"
    p.write_bytes(blob)
    ref = cv2.imread(str(p), cv2.IMREAD_COLOR)
    assert ref is not None
    np.testing.assert_array_equal(decode_image_bgr(blob), ref)


def test_ras_gray_palette_onebit_match_cv2(tmp_path):
    g = np.array([[0, 128, 255], [10, 20, 30]], np.uint8)
    rows = _ras_rows([g[y].tobytes() for y in range(2)])
    blob = _ras_bytes(rows, 3, 2, 8)
    p = tmp_path / "g.ras"
    p.write_bytes(blob)
    ref = cv2.imread(str(p), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(decode_image_bgr(blob), ref)

    pal = bytes(range(256)) + bytes((i * 2) % 256 for i in range(256)) + bytes(
        255 - i for i in range(256)
    )
    blob = _ras_bytes(rows, 3, 2, 8, palette=pal, maptype=1)
    p = tmp_path / "p.ras"
    p.write_bytes(blob)
    ref = cv2.imread(str(p), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(decode_image_bgr(blob), ref)

    bits = np.array([[1, 0, 1], [0, 1, 0]], np.uint8)
    rows = _ras_rows([np.packbits(bits[y]).tobytes() for y in range(2)])
    blob = _ras_bytes(rows, 3, 2, 1)
    p = tmp_path / "b.ras"
    p.write_bytes(blob)
    ref = cv2.imread(str(p), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(decode_image_bgr(blob), ref)


def test_ras_rle_spec():
    # this cv2 build rejects type-2 rasters outright; pin the published
    # byte-RLE spec: 0x80 0x00 = literal 0x80, 0x80 n v = n+1 copies
    img = _rng(9).integers(0, 256, (2, 3, 3), dtype=np.uint8)
    img[0, :] = (128, 7, 7)  # exercise the literal-0x80 and run paths
    raw = _ras_rows([img[y][..., ::-1].tobytes() for y in range(2)])

    enc = bytearray()
    i = 0
    while i < len(raw):
        run = 1
        while i + run < len(raw) and raw[i + run] == raw[i] and run < 256:
            run += 1
        if run >= 2:
            enc += bytes([0x80, run - 1, raw[i]])
            i += run
        elif raw[i] == 0x80:
            enc += bytes([0x80, 0])
            i += 1
        else:
            enc.append(raw[i])
            i += 1
    blob = _ras_bytes(bytes(enc), 3, 2, 24, rtype=2)
    np.testing.assert_array_equal(formats.decode_ras(blob), img)


def test_ras_probe_and_errors():
    g = np.zeros((2, 4), np.uint8)
    blob = _ras_bytes(_ras_rows([g[y].tobytes() for y in range(2)]), 4, 2, 8)
    assert formats.probe_size(blob) == (2, 4)
    with pytest.raises(ValueError, match="truncated"):
        formats.decode_ras(blob[:-3])
    with pytest.raises(ValueError, match="depth"):
        formats.decode_ras(_ras_bytes(b"\x00" * 8, 2, 2, 16))
    with pytest.raises(ValueError, match="type"):
        formats.decode_ras(_ras_bytes(b"\x00" * 8, 2, 2, 8, rtype=3))


# ---------------------------------------------------------------------------
# contract errors + dispatch


@pytest.mark.parametrize(
    "ext", [".hdr", ".pic", ".pfm", ".ras", ".sr"]
)
def test_encode_hdr_pfm_ras_round_trip(tmp_path, ext):
    # imwrite's float/raster encoders (round 4): uint8 BGR must
    # round-trip exactly through both this repo's decoder and cv2.
    from fft_restoration_tpu.utils.imageio import imread, imwrite

    rng = np.random.default_rng(41)
    bgr = (rng.random((37, 51, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / ("t" + ext))
    imwrite(p, bgr)
    assert np.array_equal(imread(p), bgr)
    assert np.array_equal(cv2.imread(p, cv2.IMREAD_COLOR), bgr)


def test_encode_hdr_narrow_uses_flat_scanlines(tmp_path):
    # w < 8 falls back to flat RGBE rows (the RLE marker would be
    # ambiguous); both decoders must still read it.
    from fft_restoration_tpu.utils.imageio import imread, imwrite

    rng = np.random.default_rng(43)
    bgr = (rng.random((20, 5, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "thin.hdr")
    imwrite(p, bgr)
    assert np.array_equal(imread(p), bgr)
    assert np.array_equal(cv2.imread(p, cv2.IMREAD_COLOR), bgr)


def test_encode_ras_gray_and_odd_width(tmp_path):
    from fft_restoration_tpu.utils import formats

    rng = np.random.default_rng(47)
    gray = (rng.random((12, 13)) * 255).astype(np.uint8)  # odd row pad
    blob = formats.encode_ras(gray)
    assert np.array_equal(formats.decode_ras(blob), gray)
    # this cv2 build's RAS reader returns zeros for 8-bit gray (its own
    # imwrite->imread round-trip fails the same way), so pin the writer
    # instead: identical header fields + raster to cv2's own encoder.
    p = str(tmp_path / "cv.ras")
    assert cv2.imwrite(p, gray)
    theirs = open(p, "rb").read()
    assert theirs[:32] == blob[:32]  # identical header fields
    mine_rows = np.frombuffer(blob[32:], np.uint8).reshape(12, 14)
    cv_rows = np.frombuffer(theirs[32:], np.uint8).reshape(12, 14)
    # cv2 leaves the row-pad byte uninitialized; compare payload columns
    assert np.array_equal(mine_rows[:, :13], cv_rows[:, :13])


def test_corrupt_jp2_is_a_value_error():
    # JP2 decodes for real since round 4 (tests/test_jp2.py); a garbage
    # body behind the magic must fail cleanly, not crash.
    jp2 = b"\x00\x00\x00\x0cjP  \r\n\x87\n" + b"\x00" * 32
    j2k = b"\xff\x4f\xff\x51" + b"\x00" * 32
    for blob in (jp2, j2k):
        with pytest.raises(ValueError):
            decode_image_bgr(blob)
        with pytest.raises(ValueError):
            formats.probe_size(blob)


def test_corrupt_exr_is_a_value_error():
    # EXR decodes for real since round 4 (tests/test_exr.py); a garbage
    # body behind the magic must fail cleanly, not crash.
    exr = b"\x76\x2f\x31\x01" + b"\x00" * 32
    with pytest.raises(ValueError, match="corrupt EXR|not supported"):
        decode_image_bgr(exr)
    with pytest.raises(ValueError, match="corrupt EXR|not supported"):
        formats.probe_size(exr)


def test_truncation_fuzz_never_crashes():
    img = (_rng(11).random((4, 8, 3)) * 2).astype(np.float32)
    blobs = [
        _pfm_bytes(img),
        _hdr_bytes(_rgbe_img(img), rle=True),
        _ras_bytes(
            _ras_rows(
                [(img[y] * 80).astype(np.uint8).tobytes() for y in range(4)]
            ),
            8, 4, 24,
        ),
    ]
    for blob in blobs:
        for cut in range(0, len(blob), 7):
            try:
                formats.decode(blob[:cut])
            except ValueError:
                pass


# ---------------------------------------------------------------------------
# PAM (P7), .pbm/.dib write aliases, AVIF contract (round 4: the rest of
# this environment's cv::imread/imwrite extension surface)


def test_pam_encode_matches_cv2_bytes():
    import cv2

    rng = _rng(21)
    bgr = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    ok, ref = cv2.imencode(".pam", bgr)
    assert ok
    # imwrite-style call: encode_pam takes RGB and stores cv2's BGR bytes
    assert formats.encode_pam(bgr[..., ::-1]) == bytes(ref)
    gray = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    ok, refg = cv2.imencode(".pam", gray)
    assert formats.encode_pam(gray) == bytes(refg)


def test_pam_decode_matches_cv2():
    import cv2

    rng = _rng(22)
    bgr = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    ok, enc = cv2.imencode(".pam", bgr)
    blob = bytes(enc)
    assert formats.sniff(blob) == "pam"
    np.testing.assert_array_equal(decode_image_bgr(blob), bgr)
    assert formats.probe_size(blob) == (6, 9)


def test_pam_16bit_and_corrupt():
    # maxval 65535 big-endian scales like PNM; short raster raises
    raster = np.arange(12, dtype=">u2") * 5000
    blob = (
        b"P7\nWIDTH 4\nHEIGHT 3\nDEPTH 1\nMAXVAL 65535\nENDHDR\n"
        + raster.tobytes()
    )
    out = formats.decode(blob)
    assert out.shape == (3, 4)
    with pytest.raises(ValueError, match="truncated raster"):
        formats.decode(blob[:-3])
    with pytest.raises(ValueError, match="bad header|geometry"):
        formats.decode(b"P7\nWIDTH 0\nHEIGHT 3\nDEPTH 1\nMAXVAL 255\nENDHDR\n")


def test_pbm_encode_matches_cv2_bytes():
    import cv2

    gray = np.array([[0, 1, 127, 128, 200, 255], [255, 0, 0, 3, 9, 0]], np.uint8)
    ok, ref = cv2.imencode(".pbm", gray)
    assert ok
    assert formats.encode_pbm(gray) == bytes(ref)
    with pytest.raises(ValueError, match="grayscale"):
        formats.encode_pbm(np.zeros((2, 2, 3), np.uint8))


def test_imwrite_pam_pbm_dib_roundtrip(tmp_path):
    import cv2

    from fft_restoration_tpu.utils.imageio import imread, imwrite

    rng = _rng(23)
    bgr = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
    for ext in ("pam", "dib"):
        p = str(tmp_path / f"x.{ext}")
        imwrite(p, bgr)
        np.testing.assert_array_equal(imread(p), bgr, err_msg=ext)
        np.testing.assert_array_equal(cv2.imread(p, cv2.IMREAD_COLOR), bgr, err_msg=ext)
    gray = rng.integers(0, 256, (7, 11), dtype=np.uint8)
    p = str(tmp_path / "x.pbm")
    imwrite(p, gray)
    ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(imread(p)[..., 0], ref)


def test_avif_decodes_via_av1(tmp_path):
    """AVIF flows through the from-scratch AV1 decoder (round 5); the
    old rejection contract is gone.  Deep parity lives in test_av1.py."""
    import cv2

    img = np.zeros((8, 8, 3), np.uint8)
    img[:, 4:] = 200
    ok, enc = cv2.imencode(".avif", img, [cv2.IMWRITE_AVIF_QUALITY, 80])
    assert ok
    blob = bytes(enc)
    assert formats.sniff(blob) == "avif"
    ref = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(decode_image_bgr(blob), ref)
    assert formats.probe_size(blob) == (8, 8)
