"""GIF codec (utils/gif.py) parity with OpenCV 5.0 / PIL.

This environment's cv::imread decodes GIF and cv::imencode writes it,
so both sides are part of the imread/imwrite surface the framework
covers (/root/reference/serial.cpp:22). PIL generates the decode
fixtures (its GIF writer is an independent implementation); cv2 is the
decode oracle.
"""

import io

import numpy as np
import pytest

from fft_restoration_tpu.utils.gif import decode_gif, encode_gif, probe_gif_size
from fft_restoration_tpu.utils.imageio import decode_image_bgr

cv2 = pytest.importorskip("cv2")
Image = pytest.importorskip("PIL.Image")


def _pil_gif(img_rgb, **save_kw):
    buf = io.BytesIO()
    Image.fromarray(img_rgb).save(buf, "GIF", **save_kw)
    return buf.getvalue()


def _cv2_rgb(blob):
    out = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)
    assert out is not None
    return out[..., ::-1]


# ---------------------------------------------------------------------------
# decode parity


@pytest.mark.parametrize("interlace", [False, True])
def test_decode_matches_cv2(interlace, rng):
    img = (rng.random((33, 47, 3)) * 255).astype(np.uint8)
    blob = _pil_gif(img, interlace=interlace)
    ours = decode_gif(blob)
    np.testing.assert_array_equal(ours, _cv2_rgb(blob))


def test_decode_gray_source(rng):
    gray = (rng.random((16, 21)) * 255).astype(np.uint8)
    blob = _pil_gif(gray)
    np.testing.assert_array_equal(decode_gif(blob), _cv2_rgb(blob))


def test_multiframe_decodes_first_frame(rng):
    frames = [
        Image.fromarray((rng.random((12, 15, 3)) * 255).astype(np.uint8))
        for _ in range(4)
    ]
    buf = io.BytesIO()
    frames[0].save(buf, "GIF", save_all=True, append_images=frames[1:])
    blob = buf.getvalue()
    np.testing.assert_array_equal(decode_gif(blob)[..., :3], _cv2_rgb(blob))


def test_transparency_matches_cv2(rng):
    img = (rng.random((14, 18, 3)) * 255).astype(np.uint8)
    pal = Image.fromarray(img).convert("P", palette=Image.Palette.ADAPTIVE, colors=8)
    buf = io.BytesIO()
    pal.save(buf, "GIF", transparency=3)
    blob = buf.getvalue()
    ours = decode_gif(blob)
    assert ours.shape[-1] == 4  # transparent index present -> RGBA
    # IMREAD_COLOR drops alpha but keeps the palette color underneath
    np.testing.assert_array_equal(ours[..., :3], _cv2_rgb(blob))
    unchanged = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(ours[..., 3], unchanged[..., 3])


def test_dispatch_and_probe(rng):
    img = (rng.random((9, 13, 3)) * 255).astype(np.uint8)
    blob = _pil_gif(img)
    bgr = decode_image_bgr(blob)
    np.testing.assert_array_equal(bgr[..., ::-1], decode_gif(blob)[..., :3])
    assert probe_gif_size(blob) == (9, 13)

    from fft_restoration_tpu.utils import formats

    assert formats.sniff(blob) == "gif"


def test_frame_smaller_than_screen_matches_cv2(rng):
    """Hand-crafted: 10x8 screen, 4x3 frame at (2, 1), bg index 1."""
    import struct

    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (3, 4), dtype=np.uint8)
    from fft_restoration_tpu.utils.gif import _lzw_encode

    lzw = _lzw_encode(idx.reshape(-1), 2)
    blob = bytearray(b"GIF89a")
    blob += struct.pack("<HHBBB", 8, 10, 0x80 | 1, 1, 0)  # 4-entry GCT
    blob += pal.tobytes()
    blob += struct.pack("<BHHHHB", 0x2C, 2, 1, 4, 3, 0)
    blob.append(2)  # LZW min code size
    blob.append(len(lzw))
    blob += lzw
    blob += b"\x00\x3b"
    blob = bytes(blob)
    ref = _cv2_rgb(blob)
    assert ref.shape == (10, 8, 3)
    np.testing.assert_array_equal(decode_gif(blob), ref)


# ---------------------------------------------------------------------------
# encode


def test_encode_lossless_roundtrip_256_colors(rng):
    img = rng.integers(0, 256, (25, 31, 3), dtype=np.uint8)
    img = (img // 32) * 32  # <= 512 distinct... force <= 256:
    img[..., 2] = img[..., 0]  # collapse one channel
    assert len(np.unique(img.reshape(-1, 3), axis=0)) <= 256
    blob = encode_gif(img)
    np.testing.assert_array_equal(decode_gif(blob), img)
    np.testing.assert_array_equal(_cv2_rgb(blob), img)
    pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    np.testing.assert_array_equal(pil, img)


def test_encode_gray_roundtrip(rng):
    gray = (rng.random((17, 12)) * 255).astype(np.uint8)
    blob = encode_gif(gray)
    np.testing.assert_array_equal(decode_gif(blob), np.repeat(gray[..., None], 3, -1))


def test_encode_quantizes_above_256(rng):
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    blob = encode_gif(img)
    out = decode_gif(blob)
    assert out.shape == img.shape
    # median-cut on uniform noise: palette error bounded well under 64
    err = np.abs(out.astype(np.int32) - img.astype(np.int32)).mean()
    assert err < 40, err
    # and cv2 agrees with our own decode
    np.testing.assert_array_equal(_cv2_rgb(blob), out)


def test_imwrite_gif(tmp_path, rng):
    from fft_restoration_tpu.utils.imageio import imread, imwrite

    img = ((rng.random((11, 13, 3)) * 8).astype(np.uint8)) * 32
    p = str(tmp_path / "x.gif")
    imwrite(p, img)  # imwrite takes BGR
    np.testing.assert_array_equal(imread(p), img)
    np.testing.assert_array_equal(cv2.imread(p, cv2.IMREAD_COLOR), img)


def test_lzw_stress_dictionary_reset(rng):
    """An image large enough to overflow the 4096-entry LZW table
    exercises the encoder's clear-code reset and the decoder's rebuild."""
    img = rng.integers(0, 256, (128, 200), dtype=np.uint8)
    blob = encode_gif(img)
    np.testing.assert_array_equal(decode_gif(blob)[..., 0], img)
    np.testing.assert_array_equal(_cv2_rgb(blob)[..., 0], img)


# ---------------------------------------------------------------------------
# corrupt-input contract (the dedicated fuzz matrix also covers gif once
# it is in tests/test_ingest_fuzz.py)


def test_corrupt_gif_raises_valueerror(rng):
    img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    blob = bytearray(encode_gif(img))
    for cut in range(0, len(blob), 7):
        try:
            out = decode_gif(bytes(blob[:cut]))
            assert isinstance(out, np.ndarray)
        except ValueError:
            pass
    for _ in range(200):
        pos = int(rng.integers(len(blob)))
        old = blob[pos]
        blob[pos] = int(rng.integers(256))
        try:
            out = decode_gif(bytes(blob))
            assert isinstance(out, np.ndarray)
        except ValueError:
            pass
        blob[pos] = old


# ---------------------------------------------------------------------------
# native fast lane (native/gif_codec.cpp): bit-exact vs the pure path


def test_native_pure_parity(rng, monkeypatch):
    from fft_restoration_tpu.utils import gif as gif_mod

    if not gif_mod._load_gif_native():
        pytest.skip("native/libgifdec.so not built")
    img = rng.integers(0, 256, (96, 130), dtype=np.uint8)
    blob = encode_gif(img)  # native encoder
    native = decode_gif(blob)
    monkeypatch.setattr(gif_mod, "_native_lib", False)
    pure = decode_gif(blob)
    np.testing.assert_array_equal(native, pure)
    blob_pure = encode_gif(img)  # pure encoder
    assert blob_pure == blob  # encoders agree byte-for-byte
