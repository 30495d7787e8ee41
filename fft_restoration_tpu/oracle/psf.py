"""Motion-blur PSF synthesis — oracle replication of OpenCV semantics.

The reference builds the PSF as a horizontal line of 1/size through the
kernel center, then rotates it with getRotationMatrix2D + warpAffine
bilinear, WITHOUT re-normalizing afterwards (/root/reference/utils.hpp:15-24).
The rotated line is NOT fftshifted to the corner either — both quirks are
part of the observed output and are preserved (SURVEY.md §7 contract #2).

warpAffine semantics replicated (validated against cv2 5.0 to ~5e-8 max
abs diff in tests/test_psf.py):
  * rotation matrix computed in float64 exactly as getRotationMatrix2D;
  * the affine is inverted (invertAffineTransform) since warpAffine maps
    dst -> src;
  * exact (unquantized) inverse-map bilinear sampling with float64
    coordinates and float32 accumulation, constant-0 border.
    (OpenCV <= 4.x quantized sample positions to 1/32 px via its fixed
    point INTER_BITS scheme; OpenCV 5 — the version in this environment —
    uses exact float coordinates, which is what we match.)
"""

from __future__ import annotations

import math

import numpy as np


def get_rotation_matrix_2d(center: tuple, angle_deg: float, scale: float = 1.0) -> np.ndarray:
    """float64 2x3 rotation matrix, exactly cv2.getRotationMatrix2D."""
    angle = angle_deg * math.pi / 180.0
    alpha = math.cos(angle) * scale
    beta = math.sin(angle) * scale
    cx, cy = float(center[0]), float(center[1])
    return np.array(
        [
            [alpha, beta, (1.0 - alpha) * cx - beta * cy],
            [-beta, alpha, beta * cx + (1.0 - alpha) * cy],
        ],
        dtype=np.float64,
    )


def invert_affine(m: np.ndarray) -> np.ndarray:
    """cv2.invertAffineTransform in float64."""
    d = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    d = 1.0 / d if d != 0.0 else 0.0
    a11 = m[1, 1] * d
    a12 = -m[0, 1] * d
    a21 = -m[1, 0] * d
    a22 = m[0, 0] * d
    b1 = -a11 * m[0, 2] - a12 * m[1, 2]
    b2 = -a21 * m[0, 2] - a22 * m[1, 2]
    return np.array([[a11, a12, b1], [a21, a22, b2]], dtype=np.float64)


def warp_affine_linear(src: np.ndarray, m: np.ndarray, dsize: tuple) -> np.ndarray:
    """cv2.warpAffine(src, M, dsize, INTER_LINEAR, BORDER_CONSTANT 0) for
    float32 single-channel images (exact bilinear, see module docstring)."""
    src = np.asarray(src, dtype=np.float32)
    w_out, h_out = int(dsize[0]), int(dsize[1])
    im = invert_affine(m)

    x = np.arange(w_out, dtype=np.float64)[None, :]
    y = np.arange(h_out, dtype=np.float64)[:, None]
    sx = im[0, 0] * x + im[0, 1] * y + im[0, 2]
    sy = im[1, 0] * x + im[1, 1] * y + im[1, 2]
    xi = np.floor(sx).astype(np.int64)
    yi = np.floor(sy).astype(np.int64)
    fx = (sx - xi).astype(np.float32)
    fy = (sy - yi).astype(np.float32)

    h_in, w_in = src.shape

    def sample(yy: np.ndarray, xx: np.ndarray) -> np.ndarray:
        valid = (yy >= 0) & (yy < h_in) & (xx >= 0) & (xx < w_in)
        yc = np.clip(yy, 0, h_in - 1)
        xc = np.clip(xx, 0, w_in - 1)
        return np.where(valid, src[yc, xc], np.float32(0.0))

    s00 = sample(yi, xi)
    s01 = sample(yi, xi + 1)
    s10 = sample(yi + 1, xi)
    s11 = sample(yi + 1, xi + 1)

    wx0 = np.float32(1.0) - fx
    wy0 = np.float32(1.0) - fy
    out = (
        s00 * (wy0 * wx0)
        + s01 * (wy0 * fx)
        + s10 * (fy * wx0)
        + s11 * (fy * fx)
    ).astype(np.float32)
    return out


def motion_blur_kernel_oracle(size: int, angle_deg: float) -> np.ndarray:
    """motionBlurKernel oracle (utils.hpp:15-24): horizontal line of 1/size
    through (size/2, size/2), rotated by angle_deg CCW, bilinear, no
    re-normalization."""
    kernel = np.zeros((size, size), dtype=np.float32)
    center = (size // 2, size // 2)  # (x, y) integer center, as cv::Point
    kernel[center[1], :] = np.float32(1.0 / size)
    rot = get_rotation_matrix_2d(center, angle_deg, 1.0)
    return warp_affine_linear(kernel, rot, (size, size))


def gaussian_kernel_oracle(size: int, sigma: float) -> np.ndarray:
    """NumPy twin of ops.psf.gaussian_kernel (float32-matching math)."""
    sigma = max(float(sigma), 1e-3)
    c = float(size // 2)
    x = (np.arange(size, dtype=np.float32)[None, :] - c)
    y = (np.arange(size, dtype=np.float32)[:, None] - c)
    g = np.exp(-(x * x + y * y) / np.float32(2.0 * sigma * sigma))
    return (g / g.sum()).astype(np.float32)


def disk_kernel_oracle(size: int) -> np.ndarray:
    """NumPy twin of ops.psf.disk_kernel."""
    c = float(size // 2)
    r = size / 2.0
    x = np.arange(size, dtype=np.float32)[None, :] - c
    y = np.arange(size, dtype=np.float32)[:, None] - c
    d = np.sqrt(x * x + y * y)
    w = np.clip(r + 0.5 - d, 0.0, 1.0)
    return (w / w.sum()).astype(np.float32)


def make_psf_oracle(psf_type, size: int, param: float) -> np.ndarray:
    """Oracle-side PSF family dispatcher (ops.psf.make_psf twin).
    Like the device side, a concrete (size, size) ndarray passes
    through verbatim (the --psf-file surface)."""
    if not isinstance(psf_type, str):
        kernel = np.asarray(psf_type, np.float32)
        if kernel.shape != (size, size):
            raise ValueError(
                f"custom PSF kernel shape {kernel.shape} != ({size}, {size})"
            )
        return kernel
    if psf_type == "motion":
        return motion_blur_kernel_oracle(size, param)
    if psf_type == "gaussian":
        return gaussian_kernel_oracle(size, param)
    if psf_type == "disk":
        return disk_kernel_oracle(size)
    raise ValueError(f"unknown psf type {psf_type!r}")
