"""Blind motion-PSF estimation from the blurred image (cepstral method).

The reference requires the user to KNOW the blur parameters — every
driver takes <psf-length> <psf-angle> positionals
(/root/reference/serial.cpp:12-18) and the fixtures' parameters are
documented in the README. This module removes that requirement: a
linear motion blur of length L multiplies the image spectrum by a
sinc-like transfer function whose periodic zeros put strong NEGATIVE
peaks into the cepstrum

    C = IFFT( log |FFT(image)|^2 )

at distance L along the blur direction (Cannon, "Blind deconvolution
of spatially invariant image blurs with phase", IEEE TASSP 1976 — the
classic cepstral blur-identification result). Estimating (L, angle) is
therefore: window the image, one FFT, log-power, one IFFT, argmin over
an annulus.

TPU-native: the whole estimator is ONE jit graph on the SoA fft2d
backends (no complex dtype), with the Hann window and the annulus mask
baked as constants; only the final argmin index is converted to
(length, angle) on the host. The y-down image convention mirrors the
cepstral angle, so the returned angle is (-atan2) mod 180 — calibrated
against utils/blurgen.py syntheses (tests/test_estimate.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from fft_restoration_tpu.ops.fft import fft2d
from fft_restoration_tpu.utils.padding import next_power_of_two


def _annulus_mask(hp: int, wp: int, r_min: float, r_max: float) -> np.ndarray:
    yy, xx = np.mgrid[-(hp // 2) : hp - hp // 2, -(wp // 2) : wp - wp // 2]
    r = np.hypot(yy, xx)
    return (r >= r_min) & (r <= r_max)


@functools.partial(
    jax.jit, static_argnames=("hp", "wp", "r_min", "r_max", "fft_backend")
)
def _cepstral_peak(
    gray: jnp.ndarray,
    *,
    hp: int,
    wp: int,
    r_min: float,
    r_max: float,
    fft_backend: str,
):
    """(H, W) float32 grayscale -> (flat argmin index over the shifted
    (hp, wp) cepstrum, peak value, cepstrum origin value)."""
    h, w = gray.shape
    wy = np.hanning(h).astype(np.float32)
    wx = np.hanning(w).astype(np.float32)
    g = (gray - jnp.mean(gray)) * jnp.asarray(wy)[:, None] * jnp.asarray(
        wx
    )[None, :]
    g = jnp.pad(g, ((0, hp - h), (0, wp - w)))
    f_re, f_im = fft2d(g, jnp.zeros_like(g), False, fft_backend)
    # log2 instead of ln: same argmin (positive scale), native TPU unit
    p = jnp.log2(f_re * f_re + f_im * f_im + jnp.float32(1e-12))
    c_re, _ = fft2d(p, jnp.zeros_like(p), True, fft_backend)
    c = jnp.roll(c_re, (hp // 2, wp // 2), axis=(0, 1))  # fftshift
    mask = jnp.asarray(_annulus_mask(hp, wp, r_min, r_max))
    cm = jnp.where(mask, c, jnp.inf)
    idx = jnp.argmin(cm)
    # robust annulus statistics for the confidence z-score: how far the
    # peak sits below the cepstrum's own noise floor
    vals = jnp.where(mask, c, jnp.nan)
    med = jnp.nanmedian(vals)
    mad = jnp.nanmedian(jnp.abs(vals - med)) + jnp.float32(1e-12)
    return idx, cm.reshape(-1)[idx], med, mad


# confidence z-score below which the frame likely carries no linear
# motion blur (sharp structured scene measured ~10; blurred 18-69)
_CONF_WARN = 14.0


def estimate_motion_psf(
    img_bgr: np.ndarray,
    *,
    fft_backend: str = "matmul",
    max_length: int | None = None,
) -> tuple[int, float, float]:
    """Estimate (length, angle_deg, confidence) of a linear motion blur
    from a blurred uint8/float BGR image.

    length is in the CLI's psf-length units (the PSF side synthesized
    by ops/psf.motion_blur_kernel); angle is in [0, 180) degrees, the
    same convention the CLI positionals take (the PSF is symmetric, so
    angle is defined mod 180). confidence is a robust z-score: how many
    MAD-sigmas the cepstral peak sits below the annulus median —
    measured 18-69 on most linearly blurred frames (fixtures 50-55)
    vs ~10 on a sharp structured scene; long oblique blurs can dip to
    ~13 (correct estimate, spread peak), so _CONF_WARN=14 is a warning
    threshold, not a rejection — the CLI proceeds with the estimate
    either way and only prints a note.
    """
    img = np.asarray(img_bgr)
    if img.ndim == 3:
        gray = img.astype(np.float32).mean(axis=-1)
    else:
        gray = img.astype(np.float32)
    h, w = gray.shape
    if min(h, w) < 12:
        # r_max = min(h,w)//3 must clear r_min=3 or the annulus is
        # empty and the argmin returns garbage (the fftshift origin)
        raise ValueError(
            f"image too small for blur estimation (min dim {min(h, w)} "
            f"< 12)"
        )
    hp, wp = next_power_of_two(h), next_power_of_two(w)
    r_max = float(
        min(min(h, w) // 3, max_length if max_length else 10**9)
    )
    idx, peak, med, mad = _cepstral_peak(
        jnp.asarray(gray), hp=hp, wp=wp, r_min=3.0, r_max=r_max,
        fft_backend=fft_backend,
    )
    iy, ix = np.unravel_index(int(idx), (hp, wp))
    dy, dx = iy - hp // 2, ix - wp // 2
    length = int(round(float(np.hypot(dy, dx))))
    # y points down in image coords -> the cepstral angle is mirrored
    angle = float((-np.degrees(np.arctan2(dy, dx))) % 180.0)
    conf = float((med - peak) / (1.4826 * mad))
    if not np.isfinite(conf):
        conf = 0.0  # degenerate cepstrum (constant frame): no blur signal
    return length, angle, conf


@jax.jit
def _noise_stats(gray: jnp.ndarray):
    """(H, W) float32 in [0,1] -> (noise sigma, signal variance).

    Immerkaer's fast noise-variance estimator (PRL 1996): the 3x3 mask
    [[1,-2,1],[-2,4,-2],[1,-2,1]] annihilates locally-linear image
    structure, so its response is ~pure noise; for gaussian noise
    sigma = sqrt(pi/2) * mean|I*N| / 6. One shift-stencil pass +
    reductions — a single cheap jit graph, like the cepstral estimator.
    """
    c = gray[1:-1, 1:-1]
    u, d = gray[:-2, 1:-1], gray[2:, 1:-1]
    l, r = gray[1:-1, :-2], gray[1:-1, 2:]
    ul, ur = gray[:-2, :-2], gray[:-2, 2:]
    dl, dr = gray[2:, :-2], gray[2:, 2:]
    lap = 4.0 * c - 2.0 * (u + d + l + r) + (ul + ur + dl + dr)
    sigma = (
        jnp.sqrt(jnp.float32(np.pi / 2.0)) * jnp.mean(jnp.abs(lap)) / 6.0
    )
    return sigma, jnp.var(gray)


def estimate_noise_K(
    img_bgr: np.ndarray, *, k_min: float = 1e-4, k_max: float = 0.5
) -> tuple[float, float]:
    """Noise-adaptive Wiener regularization: estimate the noise sigma
    (Immerkaer) and return (sigma, K) with K = the noise-to-signal
    power ratio sigma^2 / max(var - sigma^2, eps) — the quantity the
    Wiener filter's K term stands in for (the reference hardcodes
    K=0.01, serial.cpp:28). K is clamped to [k_min, k_max] and rounded
    to 2 significant digits (stable co-batch keys in serve.py; the
    filter is insensitive at that granularity).

    Works on uint8 or float BGR/gray frames; the blur itself helps —
    a blurred image has little high-frequency content, so the stencil
    response is dominated by the noise being estimated.
    """
    img = np.asarray(img_bgr)
    gray = (
        img.astype(np.float32).mean(axis=-1) if img.ndim == 3
        else img.astype(np.float32)
    )
    if img.dtype == np.uint8:
        gray = gray / np.float32(255.0)
    if min(gray.shape) < 3:
        raise ValueError(
            f"image too small for noise estimation (min dim "
            f"{min(gray.shape)} < 3)"
        )
    sigma, var = (float(v) for v in _noise_stats(jnp.asarray(gray)))
    k = (sigma * sigma) / max(var - sigma * sigma, 1e-8)
    k = min(max(k, k_min), k_max)
    # 2 significant digits
    from math import floor, log10

    k = round(k, 1 - floor(log10(k)))
    return sigma, float(k)
