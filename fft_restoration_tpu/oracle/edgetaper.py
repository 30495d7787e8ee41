"""Edge tapering, serial NumPy side (the parity twin of
models/edgetaper.py).

Same math: tapered = alpha * x + (1 - alpha) * blur(x) with the window
coefficients of utils/taper.py (bit-identical on both sides) and blur =
circular convolution with the corner-anchored PSF via np.fft in float64
— the oracle's usual accuracy convention (cf. the f64 prototype checks
in tests/test_oracle.py). Enabled by restore_channels(edgetaper=True);
the CLI's --edgetaper turns it on on BOTH sides so differential
verification keeps running.
"""

from __future__ import annotations

import numpy as np

from fft_restoration_tpu.utils.taper import taper_windows


def edge_taper_channels(
    channels_padded: np.ndarray,
    psf: np.ndarray,
    live_hw: tuple[int, int],
) -> np.ndarray:
    """Taper (C, Hp, Wp) zero-padded float32 planes whose live image is
    the top-left live_hw = (h, w) extent."""
    x = np.asarray(channels_padded, np.float64)
    hp, wp = x.shape[-2:]
    h, w = live_hw
    wy, wx = taper_windows(h, w, hp, wp, psf.shape[-1])
    alpha = wy.astype(np.float64)[:, None] * wx.astype(np.float64)[None, :]

    pp = np.zeros((hp, wp), np.float64)
    pp[: psf.shape[0], : psf.shape[1]] = psf
    H = np.fft.fft2(pp)
    blurred = np.real(np.fft.ifft2(np.fft.fft2(x, axes=(-2, -1)) * H,
                                   axes=(-2, -1)))
    return (alpha * x + (1.0 - alpha) * blurred).astype(np.float32)
