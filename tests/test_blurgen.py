"""Blur generator: the forward problem the pipeline inverts.

End-to-end inverse-problem test (the reference validates its algorithm
the same way: notebook-blurred inputs -> restore -> PSNR,
others/fft_image_restoration.py:95-99)."""

import numpy as np

from fft_restoration_tpu.models.pipeline import WienerDeblurPipeline
from fft_restoration_tpu.utils.blurgen import blur_image
from fft_restoration_tpu.utils.verify import psnr


def _sharp_test_image(h=64, w=64):
    """Synthetic sharp image with structure (checkers + gradient)."""
    y, x = np.mgrid[0:h, 0:w]
    base = ((x // 8 + y // 8) % 2) * 180.0 + 40.0
    grad = (x / w) * 30.0
    img = np.stack([base + grad, base, 255 - base], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_blur_reduces_detail_then_restore_recovers():
    sharp = _sharp_test_image()
    blurred = blur_image(sharp, 9, 30.0)
    # blur must actually blur
    psnr_blurred = psnr(sharp / 255.0, blurred / 255.0)
    assert psnr_blurred < 30.0

    restored = WienerDeblurPipeline(white_balance=False).restore(blurred, 9, 30.0)
    # The reference's PSF is neither fftshifted nor re-normalized
    # (utils.hpp:15-24), which shifts the restoration by ~(size/2, size/2)
    # px (SURVEY.md §7 contract 2) — undo the known shift, then the
    # restored image must correlate with the sharp original far better
    # than the blurred input does.
    shift = 9 // 2
    for c in range(3):
        a = sharp[..., c].astype(np.float64)
        b = np.roll(restored[..., c].astype(np.float64), (-shift, -shift), (0, 1))
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        blurred_corr = np.corrcoef(
            a.ravel(), blurred[..., c].astype(np.float64).ravel()
        )[0, 1]
        assert corr > max(blurred_corr, 0.9)


def test_blur_preserves_brightness():
    sharp = _sharp_test_image()
    blurred = blur_image(sharp, 7, 45.0)
    assert abs(float(blurred.mean()) - float(sharp.mean())) < 3.0
