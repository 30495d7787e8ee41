"""Ingest robustness fuzz: every supported format under truncation and
random single-byte corruption.

Contract (matching cv::imread's, /root/reference/serial.cpp:22, which
returns an empty Mat instead of crashing): decode_image_bgr(data) either
returns a valid (H, W, 3) uint8 array or raises ValueError — never any
other exception, never a pathological allocation from a corrupt size
field. The CLI batch driver and serve.py both rely on this to skip bad
files cleanly.
"""

import numpy as np
import pytest

from fft_restoration_tpu.utils.imageio import decode_image_bgr, encode_png

MAX_PIXELS = 1 << 30  # decoders reject sizes above this (cv2 parity)


def _fixture(rng):
    return (rng.random((16, 16, 3)) * 255).astype(np.uint8)


def _encoders():
    """(name, encode(img_rgb_uint8) -> bytes) for every ingest format."""
    import cv2

    def cv(ext, params=()):
        def enc(img):
            ok, blob = cv2.imencode(ext, img[..., ::-1], list(params))
            assert ok
            return bytes(blob)

        return enc

    def hdr_enc(img):
        ok, blob = cv2.imencode(".hdr", img[..., ::-1].astype(np.float32) / 255.0)
        assert ok
        return bytes(blob)

    def pfm_enc(img):
        ok, blob = cv2.imencode(".pfm", img[..., ::-1].astype(np.float32) / 255.0)
        assert ok
        return bytes(blob)

    return [
        ("png", lambda img: encode_png(img[..., ::-1])),
        ("jpeg", cv(".jpg", [int(__import__("cv2").IMWRITE_JPEG_QUALITY), 90])),
        ("bmp", cv(".bmp")),
        ("ppm", cv(".ppm")),
        ("tiff", cv(".tiff")),
        ("webp_lossy", cv(".webp", [int(__import__("cv2").IMWRITE_WEBP_QUALITY), 75])),
        ("webp_lossless", cv(".webp", [int(__import__("cv2").IMWRITE_WEBP_QUALITY), 101])),
        ("pfm", pfm_enc),
        ("hdr", hdr_enc),
        ("ras", cv(".ras")),
        ("jp2", _jp2_enc),
        ("exr", _exr_enc),
        ("gif", _gif_enc),
        ("pam", cv(".pam")),
        ("tiff_g4", _fax_tiff_enc),
        ("tiff_jpeg", _jpeg_tiff_enc),
        ("avif", cv(".avif", [int(__import__("cv2").IMWRITE_AVIF_QUALITY), 60])),
    ]


def _fax_tiff_enc(img):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        ((img[..., 0] > 127).astype(np.uint8)) * 255
    ).convert("1").save(buf, format="TIFF", compression="group4")
    return buf.getvalue()


def _jpeg_tiff_enc(img):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="TIFF", compression="jpeg", quality=90)
    return buf.getvalue()


def _jp2_enc(img):
    from fft_restoration_tpu.utils.jp2_encode import encode_jp2

    return encode_jp2(img)


def _exr_enc(img):
    from fft_restoration_tpu.utils.exr import encode_exr

    return encode_exr(img.astype(np.float32) / 255.0)


def _gif_enc(img):
    from fft_restoration_tpu.utils.gif import encode_gif

    return encode_gif(img)


def _assert_contract(blob, what):
    try:
        out = decode_image_bgr(blob)
    except ValueError:
        return
    assert isinstance(out, np.ndarray) and out.ndim == 3 and out.shape[-1] == 3, what
    assert out.shape[0] * out.shape[1] <= MAX_PIXELS, what


@pytest.mark.parametrize("name,enc", _encoders(), ids=lambda p: p if isinstance(p, str) else "")
def test_truncation_never_crashes(name, enc):
    rng = np.random.default_rng(7)
    blob = enc(_fixture(rng))
    cuts = sorted(set(range(0, len(blob), max(1, len(blob) // 64))) | {len(blob) - 1})
    for cut in cuts:
        _assert_contract(blob[:cut], f"{name} truncated at {cut}/{len(blob)}")


@pytest.mark.parametrize("name,enc", _encoders(), ids=lambda p: p if isinstance(p, str) else "")
def test_byteflip_never_crashes(name, enc):
    rng = np.random.default_rng(11)
    blob = bytearray(enc(_fixture(rng)))
    for _ in range(300):
        pos = int(rng.integers(len(blob)))
        old = blob[pos]
        blob[pos] = int(rng.integers(256))
        _assert_contract(bytes(blob), f"{name} byte {pos}: {old}->{blob[pos]}")
        blob[pos] = old


def test_huge_header_dims_rejected_not_allocated():
    """A corrupt size field must raise ValueError, not attempt a
    multi-GB allocation (cv::imread's CV_IO_MAX_IMAGE_PIXELS analog)."""
    # PNM with absurd dimensions: tiny payload, giant header
    blob = b"P6\n1000000 1000000\n255\n" + b"\x00" * 64
    with pytest.raises(ValueError):
        decode_image_bgr(blob)
    # BMP with a 2^30 x 2^30 header
    import struct

    info = struct.pack("<IiiHHIIiiII", 40, 1 << 30, 1 << 30, 1, 24, 0, 0, 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 64, 0, 0, 14 + 40)
    with pytest.raises(ValueError):
        decode_image_bgr(hdr + info + b"\x00" * 64)
