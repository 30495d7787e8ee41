"""Native WebP decoder (native/webp_codec.cpp) vs pure-Python parity.

The C++ decoder is a port of utils/webp.py's VP8L decoder and
utils/webp_vp8.py's VP8 decoder; these tests hold the two bit-identical
on both bitstream families and verify the dispatch actually takes the
native path (decode_webp falls back to Python silently on native error,
so parity through decode_webp alone would be vacuous).

Skips cleanly when the .so could not be built (pure Python remains the
always-working path, exercised by tests/test_webp.py).
"""

import numpy as np
import pytest

from fft_restoration_tpu.utils import webp as webp_mod
from fft_restoration_tpu.utils.webp import decode_webp

cv2 = pytest.importorskip("cv2")

_lib = webp_mod._load_webp_native()
pytestmark = pytest.mark.skipif(
    not _lib, reason="native/libwebpdec.so not built (pure-Python path only)"
)


def _chunks(blob):
    """RIFF container -> {fourcc: payload} (simple + VP8X forms)."""
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    out, pos = {}, 12
    while pos + 8 <= len(blob):
        fourcc = blob[pos : pos + 4]
        size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        out[fourcc] = blob[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    return out


def _encode(img_bgr, params):
    ok, enc = cv2.imencode(".webp", img_bgr, params)
    assert ok
    return enc.tobytes()


def _pure(monkeypatch):
    """Force decode_webp onto the pure-Python path."""
    monkeypatch.setattr(webp_mod, "_native_lib", False)


# ---------------------------------------------------------------------------
# VP8 (lossy): direct native call vs pure decoder, bit-exact


@pytest.mark.parametrize("q", [10, 55, 95])
@pytest.mark.parametrize("shape", [(33, 47), (64, 80), (120, 160)])
def test_vp8_native_matches_pure(q, shape):
    rng = np.random.default_rng(q + shape[0])
    img = rng.integers(0, 256, (*shape, 3), np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 1.5)
    payload = _chunks(_encode(img, [cv2.IMWRITE_WEBP_QUALITY, q]))[b"VP8 "]

    native = webp_mod._native_vp8(payload, shape[0], shape[1])
    assert native is not None, "native VP8 decode reported an error"

    from fft_restoration_tpu.utils.webp_vp8 import decode_vp8

    np.testing.assert_array_equal(native, decode_vp8(payload))


# ---------------------------------------------------------------------------
# VP8L (lossless): direct native call vs pure decoder, bit-exact


@pytest.mark.parametrize("shape", [(21, 13), (64, 64), (90, 133)])
def test_vp8l_native_matches_pure(shape):
    rng = np.random.default_rng(shape[1])
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    img = np.stack(
        [
            (yy * 3 + xx).astype(np.uint8),
            rng.integers(0, 256, shape, np.uint8),
            (xx * 7).astype(np.uint8),
        ],
        -1,
    )
    payload = _chunks(_encode(img, [cv2.IMWRITE_WEBP_QUALITY, 101]))[b"VP8L"]

    native = webp_mod._native_vp8l(payload, shape[0], shape[1])
    assert native is not None, "native VP8L decode reported an error"

    pure = webp_mod._argb_to_rgba(webp_mod._VP8LDecoder(payload).decode())
    np.testing.assert_array_equal(native, pure)


def test_vp8l_paletted_native_matches_pure():
    rng = np.random.default_rng(0)
    palette = rng.integers(0, 256, (7, 3), np.uint8)
    img = palette[rng.integers(0, 7, (40, 56))]
    payload = _chunks(_encode(img, [cv2.IMWRITE_WEBP_QUALITY, 101]))[b"VP8L"]
    native = webp_mod._native_vp8l(payload, 40, 56)
    assert native is not None
    pure = webp_mod._argb_to_rgba(webp_mod._VP8LDecoder(payload).decode())
    np.testing.assert_array_equal(native, pure)


# ---------------------------------------------------------------------------
# ALPH chunk (lossy + alpha): all filter methods


@pytest.mark.parametrize("pil_method", [0, 3, 6])
def test_alpha_native_matches_pure(pil_method, monkeypatch):
    PIL_Image = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(pil_method)
    rgba = rng.integers(0, 256, (48, 40, 4), np.uint8)
    import io

    buf = io.BytesIO()
    PIL_Image.fromarray(rgba, "RGBA").save(
        buf, "WEBP", quality=80, method=pil_method
    )
    chunks = _chunks(buf.getvalue())
    if b"ALPH" not in chunks:
        pytest.skip("encoder produced no ALPH chunk")
    alph = chunks[b"ALPH"]

    native = webp_mod._native_alpha(alph, 48, 40)
    assert native is not None, "native ALPH decode reported an error"

    _pure(monkeypatch)
    pure = webp_mod._decode_alpha(alph, 48, 40)
    np.testing.assert_array_equal(native, pure)


# ---------------------------------------------------------------------------
# End-to-end dispatch: decode_webp native output == forced-pure output


@pytest.mark.parametrize(
    "params",
    [
        [cv2.IMWRITE_WEBP_QUALITY, 40],
        [cv2.IMWRITE_WEBP_QUALITY, 101],
    ],
)
def test_decode_webp_end_to_end_parity(params, monkeypatch):
    rng = np.random.default_rng(9)
    img = cv2.GaussianBlur(rng.integers(0, 256, (72, 96, 3), np.uint8), (3, 3), 1)
    blob = _encode(img, params)

    native_out = decode_webp(blob)
    _pure(monkeypatch)
    pure_out = decode_webp(blob)
    np.testing.assert_array_equal(native_out, pure_out)


def test_corrupt_stream_error_messages_preserved(monkeypatch):
    """Native rc!=0 falls back to Python so corrupt streams keep their
    precise ValueError messages (the documented contract)."""
    img = np.full((16, 16, 3), 128, np.uint8)
    blob = _encode(img, [cv2.IMWRITE_WEBP_QUALITY, 80])
    truncated = blob[: len(blob) - (len(blob) - 24) // 2]
    # fix the RIFF size so the container parses and the bitstream is cut
    bad = bytearray(truncated)
    bad[4:8] = (len(bad) - 8).to_bytes(4, "little")
    with pytest.raises(ValueError):
        decode_webp(bytes(bad))


def test_fft_webp_pure_env_forces_python(monkeypatch):
    monkeypatch.setenv("FFT_WEBP_PURE", "1")
    monkeypatch.setattr(webp_mod, "_native_lib", None)  # reset cache
    assert webp_mod._load_webp_native() is False
    monkeypatch.setattr(webp_mod, "_native_lib", None)
