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


def test_spectral_rows_t_matches_pair(rng):
    """wiener_spectral_rows_t (one kernel, transposed writes) vs the
    half-fused pair, both engines, including the None fallback gate."""
    from fft_restoration_tpu.ops.pallas.wiener_spectral import (
        fwd_wiener_rows_pallas,
        wiener_spectral_rows_t,
    )

    m, n = 128, 256
    K = 0.01
    for engine in ("roll", "mxu"):
        a = rng.standard_normal((2, m, n)).astype(np.float32)
        h = rng.standard_normal((m, n)).astype(np.float32)
        ar, ai = fft_rows_pallas(
            jnp.asarray(a), None, False, ordering="revorder",
            transposed_output=True, engine=engine,
        )
        hr, hi = fft_rows_pallas(
            jnp.asarray(h), None, False, ordering="revorder",
            transposed_output=True, engine=engine,
        )
        hr, hi = fft_rows_pallas(hr, hi, False, ordering="revorder", engine=engine)
        out = wiener_spectral_rows_t((ar, ai), (hr, hi), K, engine=engine)
        assert out is not None

        F = fwd_wiener_rows_pallas((ar, ai), (hr, hi), K, engine=engine)
        pr, pi = fft_rows_pallas(
            F[0], F[1], True, ordering="revorder", transposed_output=True,
            engine=engine,
        )
        scale = max(np.abs(np.asarray(pr)).max(), 1.0)
        assert np.abs(np.asarray(out[0]) - np.asarray(pr)).max() / scale < 1e-5
        assert np.abs(np.asarray(out[1]) - np.asarray(pi)).max() / scale < 1e-5


def test_spectral_rows_t_fallback_on_unaligned(rng):
    """Shapes violating the 128-alignment constraints return None."""
    from fft_restoration_tpu.ops.pallas.wiener_spectral import (
        wiener_spectral_rows_t,
    )

    a = jnp.asarray(rng.standard_normal((50, 256)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((50, 256)).astype(np.float32))
    # m=50 is not 128-aligned
    assert wiener_spectral_rows_t((a, a), (h, h), 0.01) is None
