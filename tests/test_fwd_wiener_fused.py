"""Half-fused forward+Wiener kernel vs the unfused composition."""

import numpy as np

import jax.numpy as jnp

from fft_restoration_tpu.ops.pallas.fft_kernel import fft_rows_pallas
from fft_restoration_tpu.ops.pallas.wiener import wiener_pallas
from fft_restoration_tpu.ops.pallas.wiener_spectral import fwd_wiener_rows_pallas


def test_fwd_wiener_fused_matches_unfused(rng):
    n, m = 64, 16
    a_re = jnp.asarray(rng.standard_normal((3, m, n)).astype(np.float32))
    a_im = jnp.asarray(rng.standard_normal((3, m, n)).astype(np.float32))
    h_re = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    h_im = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    fused = fwd_wiener_rows_pallas((a_re, a_im), (h_re, h_im), 0.01)
    G = fft_rows_pallas(a_re, a_im, False, ordering="revorder")
    ref = wiener_pallas(G, (h_re, h_im), 0.01)
    assert np.abs(np.asarray(fused[0]) - np.asarray(ref[0])).max() < 1e-5
    assert np.abs(np.asarray(fused[1]) - np.asarray(ref[1])).max() < 1e-5


def test_fused_ragged_rows(rng):
    # m not a multiple of block_rows exercises the pad path
    n, m = 32, 12
    a_re = jnp.asarray(rng.standard_normal((2, m, n)).astype(np.float32))
    a_im = jnp.asarray(rng.standard_normal((2, m, n)).astype(np.float32))
    h = (
        jnp.asarray(rng.standard_normal((m, n)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((m, n)).astype(np.float32)),
    )
    fused = fwd_wiener_rows_pallas((a_re, a_im), h, 0.05, block_rows=8)
    G = fft_rows_pallas(a_re, a_im, False, ordering="revorder")
    ref = wiener_pallas(G, h, 0.05)
    assert np.abs(np.asarray(fused[0]) - np.asarray(ref[0])).max() < 1e-5
