"""Blurred test-input generator — the fixture factory.

Counterpart of the reference's others/gen_blurred_img.ipynb (cell 1,
SURVEY.md §3.5): synthesize a motion-blurred image from a sharp one by
frequency-domain convolution with a known PSF — the forward problem the
Wiener pipeline inverts. The notebook's recipe is preserved: build the
centered PSF, roll it to the corner, multiply spectra, clip to uint8.

Runs on the host in NumPy float64 (fixture generation is offline; exact
reproducibility beats speed here).
"""

from __future__ import annotations

import numpy as np

from fft_restoration_tpu.oracle.psf import make_psf_oracle


def blur_image(
    img_bgr: np.ndarray, psf_length: int, psf_angle: float,
    psf_type: str = "motion",
) -> np.ndarray:
    """uint8 BGR (H, W, 3) -> blurred uint8 BGR (psf_type: 'motion'
    default, 'gaussian' with psf_angle as sigma, 'disk' defocus).

    Per channel: zero-pad the PSF to the image size with its center at
    the image center, np.roll it to the corner (so the convolution is
    shift-free), multiply spectra, inverse transform, clip to [0, 255].
    """
    img = np.asarray(img_bgr, np.float64)
    h, w = img.shape[:2]
    psf = make_psf_oracle(psf_type, psf_length, psf_angle).astype(np.float64)
    # normalize so the blur preserves brightness (the notebook's PSF is
    # sum-normalized before convolution)
    s = psf.sum()
    if s != 0:
        psf = psf / s
    psf_full = np.zeros((h, w))
    cy, cx = psf.shape[0] // 2, psf.shape[1] // 2
    top, left = h // 2 - cy, w // 2 - cx
    psf_full[top : top + psf.shape[0], left : left + psf.shape[1]] = psf
    psf_corner = np.roll(psf_full, (-(h // 2), -(w // 2)), axis=(0, 1))
    H = np.fft.fft2(psf_corner)

    out = np.empty_like(img)
    for c in range(img.shape[2]):
        spec = np.fft.fft2(img[..., c]) * H
        out[..., c] = np.real(np.fft.ifft2(spec))
    return np.clip(out, 0, 255).astype(np.uint8)


def make_fixture(
    src_path: str, dst_path: str, psf_length: int, psf_angle: float
) -> None:
    """Read a sharp PNG, write its blurred counterpart."""
    from fft_restoration_tpu.utils.imageio import imread, imwrite

    imwrite(dst_path, blur_image(imread(src_path), psf_length, psf_angle))
