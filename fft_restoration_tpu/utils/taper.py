"""Edge-taper window synthesis (host-side NumPy, shared by both sides).

The restoration model is CIRCULAR convolution (utils/blurgen.py;
/root/reference/others/gen_blurred_img.ipynb cell 1), but real photos
are not circularly blurred: the left edge does not continue from the
right edge, so the implied wrap discontinuity rings through the
deconvolution (visible as the border bands on the car/cat fixtures).
Edge tapering blends the frame toward its own circular blur inside a
border band, making the periodic extension smooth BEFORE the forward
FFT — the classic companion of frequency-domain deconvolution
(MATLAB's edgetaper; Lagendijk & Biemond, "Iterative Identification
and Restoration of Images", ch. 4).

This module owns only the window: raised-cosine ramps of width
band = min(psf_side, (live-1)//2) at the four LIVE-image borders, 1 in
the interior, 0 in the DFT pad region (so the pad fills with the pure
circular blur — a smooth continuation instead of a zero cliff). It is
plain NumPy so the jit pipeline (models/edgetaper.py) and the serial
oracle (oracle/edgetaper.py) bake bit-identical coefficients.
"""

from __future__ import annotations

import numpy as np


def taper_window_1d(n_live: int, n_pad: int, band: int) -> np.ndarray:
    """(n_pad,) float32: cosine ramp up over `band` samples, 1 in the
    middle, ramp down over `band`, 0 beyond n_live."""
    if n_pad < n_live:
        raise ValueError(f"pad extent {n_pad} < live extent {n_live}")
    b = int(min(band, max((n_live - 1) // 2, 0)))
    w = np.zeros(n_pad, np.float64)
    w[:n_live] = 1.0
    if b > 0:
        ramp = 0.5 - 0.5 * np.cos(np.pi * (np.arange(b) + 0.5) / b)
        w[:b] = ramp
        w[n_live - b : n_live] = ramp[::-1]
    return w.astype(np.float32)


def taper_windows(
    h: int, w: int, hp: int, wp: int, psf_side: int
) -> tuple[np.ndarray, np.ndarray]:
    """The two 1D factors of the separable 2D window alpha = wy ⊗ wx
    for a (h, w) live image inside (hp, wp) DFT extents. Kept as 1D
    vectors so the outer product forms on device (an (hp, wp) f32
    constant would bake 67 MB into a 4096² jit graph)."""
    band = max(int(psf_side), 1)
    return taper_window_1d(h, hp, band), taper_window_1d(w, wp, band)
