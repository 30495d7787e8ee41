"""Power-of-two padding helpers.

TPU-native counterpart of the reference's header-only utilities
(/root/reference/utils.hpp:27-52 — nextPowerOfTwo, autoPadToPowerOfTwo,
isPowerOfTwo). Pure shape logic runs on the host; the actual zero-pad is
done inside the jit graph (models/pipeline.py:_pad2d) so XLA can fuse it.
"""

from __future__ import annotations

import numpy as np


def is_power_of_two(n: int) -> bool:
    """True iff n is a positive power of two (utils.hpp:50-52)."""
    return n > 0 and (n & (n - 1)) == 0


def next_power_of_two(n: int) -> int:
    """Smallest power of two >= n (utils.hpp:27-31)."""
    p = 1
    while p < n:
        p <<= 1
    return p


def pad_to_power_of_two(src: np.ndarray) -> np.ndarray:
    """Zero-pad the last two dims (H, W) up to the next powers of two.

    Host-side NumPy counterpart of autoPadToPowerOfTwo (utils.hpp:40-47):
    pads on the bottom/right only, constant 0.
    """
    h, w = src.shape[-2], src.shape[-1]
    nh, nw = next_power_of_two(h), next_power_of_two(w)
    if nh == h and nw == w:
        return src
    pad = [(0, 0)] * (src.ndim - 2) + [(0, nh - h), (0, nw - w)]
    return np.pad(src, pad, mode="constant")
