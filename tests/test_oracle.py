"""Oracle correctness: FFT vs np.fft, PSF vs cv2, Lab vs cv2, pipeline
self-consistency vs a float64 np.fft prototype (the reference's
others/fft_image_restoration.py lineage, SURVEY.md §4 cross-validation)."""

import numpy as np
import pytest

from fft_restoration_tpu.oracle.serial import (
    fft_radix2,
    dft_naive,
    dft2d,
    wiener_deblur,
    restore_channels,
)
from fft_restoration_tpu.oracle.psf import motion_blur_kernel_oracle
from fft_restoration_tpu.oracle.color import bgr_to_lab, lab_to_bgr, apply_white_balance
from fft_restoration_tpu.utils.padding import next_power_of_two

cv2 = pytest.importorskip("cv2")


@pytest.mark.parametrize("n", [2, 4, 8, 64, 256, 1024])
def test_fft_radix2_matches_npfft(rng, n):
    x = (rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))).astype(
        np.complex64
    )
    ours = fft_radix2(x, inverse=False)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(ours - ref).max() / scale < 1e-5


@pytest.mark.parametrize("n", [2, 16, 128])
def test_fft_radix2_roundtrip(rng, n):
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))).astype(
        np.complex64
    )
    y = fft_radix2(fft_radix2(x, inverse=False), inverse=True) / n
    assert np.abs(y - x).max() < 1e-4


def test_dft_naive_matches_npfft(rng):
    x = (rng.standard_normal((3, 12))).astype(np.complex64)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert np.abs(dft_naive(x, False) - ref).max() < 1e-4


def test_dft2d_matches_npfft2(rng):
    x = (rng.standard_normal((16, 32)) + 1j * rng.standard_normal((16, 32))).astype(
        np.complex64
    )
    ref = np.fft.fft2(x.astype(np.complex128))
    assert np.abs(dft2d(x, False) - ref).max() / np.abs(ref).max() < 1e-5


@pytest.mark.parametrize(
    "size,angle", [(50, 30.0), (40, 45.0), (7, 13.5), (64, 77.0), (31, -22.0)]
)
def test_psf_matches_cv2(size, angle):
    k = np.zeros((size, size), np.float32)
    c = (size // 2, size // 2)
    k[c[1], :] = 1.0 / size
    rot = cv2.getRotationMatrix2D(c, angle, 1)
    ref = cv2.warpAffine(k, rot, (size, size))
    ours = motion_blur_kernel_oracle(size, angle)
    assert np.abs(ours - ref).max() < 1e-6


def test_lab_close_to_cv2(small_bgr):
    lab_cv = cv2.cvtColor(small_bgr, cv2.COLOR_BGR2Lab)
    lab_us = bgr_to_lab(small_bgr)
    # cv2 5.0's float Lab path is table-based and quantized to 1/64;
    # we use the exact analytic formulas (see oracle/color.py docstring).
    assert np.abs(lab_cv[..., 0] - lab_us[..., 0]).max() < 0.25
    assert np.abs(lab_cv[..., 1:] - lab_us[..., 1:]).max() < 0.5


def test_lab_roundtrip(small_bgr):
    back = lab_to_bgr(bgr_to_lab(small_bgr))
    assert np.abs(back - small_bgr).max() < 1e-5


def test_white_balance_gain():
    lab_orig = np.zeros((4, 4, 3), np.float32)
    lab_orig[..., 0] = 50.0
    lab_deblur = np.zeros((4, 4, 3), np.float32)
    lab_deblur[..., 0] = 25.0
    out = apply_white_balance(lab_deblur, lab_orig)
    assert np.allclose(out[..., 0], 50.0, atol=1e-3)
    # clamps at 100
    lab_deblur[..., 0] = 80.0
    lab_orig[..., 0] = 99999.0
    out = apply_white_balance(lab_deblur, lab_orig)
    assert out[..., 0].max() <= 100.0


def _proto_restore(ch, psf, K=0.01):
    """float64 np.fft prototype of the padded Wiener pipeline."""
    h, w = ch.shape
    ph, pw = next_power_of_two(h), next_power_of_two(w)
    img_p = np.zeros((ph, pw))
    img_p[:h, :w] = ch
    psf_p = np.zeros((ph, pw))
    psf_p[: psf.shape[0], : psf.shape[1]] = psf
    G = np.fft.fft2(img_p)
    H = np.fft.fft2(psf_p)
    F = G * np.conj(H) / (np.abs(H) ** 2 + K)
    r = np.real(np.fft.ifft2(F))
    r = (r - r.min()) / (r.max() - r.min())
    return r[:h, :w].astype(np.float32)


def test_pipeline_matches_float64_prototype(rng):
    img = rng.random((48, 56)).astype(np.float32)
    psf = motion_blur_kernel_oracle(9, 30.0)
    ours = restore_channels(img[None], psf)[0]
    proto = _proto_restore(img, psf)
    mse = np.mean((ours - proto) ** 2)
    assert 10 * np.log10(1.0 / mse) > 60.0


def test_wiener_deblur_output_range():
    # own RNG: the shared session fixture makes inputs order-dependent,
    # and float32 (x - lo) * (1 / (hi - lo)) can land 1 ULP off 1.0
    local = np.random.default_rng(123)
    img = local.random((32, 32)).astype(np.float32)
    psf = motion_blur_kernel_oracle(5, 10.0)
    out = wiener_deblur(img, psf)
    assert out.shape == (32, 32)
    assert out.min() == 0.0
    assert abs(out.max() - 1.0) < 1e-5
