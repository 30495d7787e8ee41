"""PNG codec parity with OpenCV's imread on the reference fixtures."""

import numpy as np
import pytest

from fft_restoration_tpu.utils.imageio import imread, imwrite, encode_png, decode_png

cv2 = pytest.importorskip("cv2")


def test_decode_matches_cv2_car():
    ours = imread("/root/reference/input/car_blurred.png")
    ref = cv2.imread("/root/reference/input/car_blurred.png", cv2.IMREAD_COLOR)
    assert np.array_equal(ours, ref)


def test_roundtrip(tmp_path, rng):
    img = (rng.random((37, 61, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    imwrite(p, img)
    assert np.array_equal(imread(p), img)
    # cv2 can read what we write
    assert np.array_equal(cv2.imread(p, cv2.IMREAD_COLOR), img)


def test_gray_roundtrip(rng):
    img = (rng.random((16, 24)) * 255).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)
