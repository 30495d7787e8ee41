"""Spectral megakernel vs the unfused composition (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from fft_restoration_tpu.ops.pallas.fft_kernel import fft_rows_pallas
from fft_restoration_tpu.ops.pallas.wiener import wiener_pallas
from fft_restoration_tpu.ops.pallas.wiener_spectral import wiener_spectral_rows_pallas


def test_megakernel_matches_unfused(rng):
    n = 64
    a_re = jnp.asarray(rng.standard_normal((3, 16, n)).astype(np.float32))
    a_im = jnp.asarray(rng.standard_normal((3, 16, n)).astype(np.float32))
    h_re = jnp.asarray(rng.standard_normal((16, n)).astype(np.float32))
    h_im = jnp.asarray(rng.standard_normal((16, n)).astype(np.float32))
    K = 0.01

    fused = wiener_spectral_rows_pallas((a_re, a_im), (h_re, h_im), K)

    G = fft_rows_pallas(a_re, a_im, False, ordering="revorder")
    F = wiener_pallas(G, (h_re, h_im), K)
    unfused = fft_rows_pallas(F[0], F[1], True, ordering="revorder")

    assert np.abs(np.asarray(fused[0]) - np.asarray(unfused[0])).max() < 1e-3
    assert np.abs(np.asarray(fused[1]) - np.asarray(unfused[1])).max() < 1e-3
