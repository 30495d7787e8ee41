"""MXU-hybrid FFT engine parity (ops/pallas/fft_kernel.py engine='mxu').

The hybrid engine keeps the outer DIF/DIT roll-stages and replaces the
inner 7 with a per-128-lane-group DFT matmul on the MXU. Its spectrum
ordering ("hybrid order": group index bit-reversed, position-in-group
natural) differs from plain revorder, so these tests pin:
  * forward == np.fft up to the analytic hybrid permutation,
  * unscaled inverse round trip,
  * fwd_wiener fused kernel equivalence against the roll engine's
    restoration-level output,
  * full fused pipeline (engine='mxu') vs oracle at reference tiers,
  * engine resolution rules (fallbacks for natural ordering / small n).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fft_restoration_tpu.ops.pallas.fft_kernel import (
    _MXU_INNER,
    _resolve_engine,
    fft_rows_pallas,
    fft_rows_packed_out,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def hybrid_permutation(n: int) -> np.ndarray:
    """perm such that fwd_mxu(x)[..., pos] lists DFT bins in hybrid
    order: bin k lands at position rev_b(k mod G) * 128 + k // G,
    G = n // 128, b = log2(G)."""
    g_count = n // _MXU_INNER
    bits = g_count.bit_length() - 1

    def rev(v):
        r = 0
        for _ in range(bits):
            r = (r << 1) | (v & 1)
            v >>= 1
        return r

    pos = np.empty(n, np.int64)
    for k in range(n):
        g = rev(k % g_count) if g_count > 1 else 0
        pos[k] = g * _MXU_INNER + k // g_count
    return pos


@pytest.mark.parametrize("n", [128, 256, 2048])
def test_mxu_forward_matches_npfft_up_to_hybrid_order(rng, n):
    x = rng.standard_normal((8, n)).astype(np.float32)
    xi = rng.standard_normal((8, n)).astype(np.float32)
    fr, fi = fft_rows_pallas(
        jnp.asarray(x), jnp.asarray(xi), False, ordering="revorder", engine="mxu"
    )
    got = np.asarray(fr) + 1j * np.asarray(fi)
    ref = np.fft.fft(x + 1j * xi, axis=-1)
    pos = hybrid_permutation(n)
    want = np.empty_like(ref)
    want[:, pos] = ref
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4 * np.abs(ref).max())


@pytest.mark.parametrize("n", [128, 1024])
def test_mxu_roundtrip_unscaled(rng, n):
    x = rng.standard_normal((16, n)).astype(np.float32)
    xi = rng.standard_normal((16, n)).astype(np.float32)
    fr, fi = fft_rows_pallas(
        jnp.asarray(x), jnp.asarray(xi), False, ordering="revorder", engine="mxu"
    )
    br, bi = fft_rows_pallas(fr, fi, True, ordering="revorder", engine="mxu")
    np.testing.assert_allclose(np.asarray(br) / n, x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bi) / n, xi, atol=1e-4)


def test_mxu_real_input_and_transposed(rng):
    x = rng.standard_normal((64, 256)).astype(np.float32)
    fr, fi = fft_rows_pallas(
        jnp.asarray(x), None, False, ordering="revorder", engine="mxu",
        transposed_output=True,
    )
    rr, ri = fft_rows_pallas(
        jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)), False,
        ordering="revorder", engine="mxu",
    )
    np.testing.assert_allclose(np.asarray(fr), np.asarray(rr).T, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(ri).T, atol=1e-5)


def test_mxu_packed_out_roundtrip(rng):
    p, m, n = 2, 128, 256
    re = rng.standard_normal((p, m, n)).astype(np.float32)
    im = rng.standard_normal((p, m, n)).astype(np.float32)
    fr, fi = fft_rows_pallas(
        jnp.asarray(re), jnp.asarray(im), False, ordering="revorder", engine="mxu"
    )
    out = fft_rows_packed_out(fr, fi, True, ordering="revorder", engine="mxu")
    np.testing.assert_allclose(np.asarray(out[0::2]) / n, re, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1::2]) / n, im, atol=1e-4)


def test_resolve_engine_rules():
    assert _resolve_engine("mxu", 2048, "revorder") == "mxu"
    assert _resolve_engine("mxu", 64, "revorder") == "roll"  # sub-lane width
    assert _resolve_engine("mxu", 2048, "natural") == "roll"  # needs revorder
    assert _resolve_engine("roll", 2048, "revorder") == "roll"
    assert _resolve_engine("auto", 2048, "revorder") == "mxu"
    assert _resolve_engine("auto", 2048, "natural") == "roll"
    with pytest.raises(ValueError):
        _resolve_engine("warp", 2048, "revorder")


def test_fused_wiener_engines_agree(rng):
    from fft_restoration_tpu.ops.pallas.wiener_spectral import (
        fwd_wiener_rows_pallas,
    )

    m, n = 64, 256
    # build spectra with each engine from the same spatial inputs
    a = rng.standard_normal((2, m, n)).astype(np.float32)
    h = rng.standard_normal((m, n)).astype(np.float32)
    out = {}
    for eng in ("roll", "mxu"):
        ar, ai = fft_rows_pallas(
            jnp.asarray(a), None, False, ordering="revorder",
            transposed_output=True, engine=eng,
        )
        hr, hi = fft_rows_pallas(
            jnp.asarray(h), None, False, ordering="revorder",
            transposed_output=True, engine=eng,
        )
        hr, hi = fft_rows_pallas(hr, hi, False, ordering="revorder", engine=eng)
        fr, fi = fwd_wiener_rows_pallas((ar, ai), (hr, hi), 0.01, engine=eng)
        # complete the 2D inverse so the engines' (different) spectral
        # orderings cancel out and the spatial results can be compared
        br, bi = fft_rows_pallas(
            fr, fi, True, ordering="revorder", transposed_output=True, engine=eng
        )
        br, bi = fft_rows_pallas(br, bi, True, ordering="revorder", engine=eng)
        out[eng] = np.asarray(br)
    scale = np.abs(out["roll"]).max()
    np.testing.assert_allclose(out["mxu"], out["roll"], atol=2e-4 * scale)


def test_pipeline_mxu_vs_oracle(rng):
    """Full fused pipeline with the MXU engine against the serial oracle
    at the reference's own verification tiers."""
    from fft_restoration_tpu.models.pipeline import WienerDeblurPipeline
    from fft_restoration_tpu.oracle.psf import motion_blur_kernel_oracle
    from fft_restoration_tpu.oracle.serial import restore_channels as oracle_channels
    from fft_restoration_tpu.utils.verify import channels_equal

    img = (rng.random((96, 160, 3)) * 255).astype(np.uint8)
    # 96x160 pads to 128x256: the row passes (n=256, n=128) both take the
    # MXU path
    pipe = WienerDeblurPipeline(fft_backend="pallas", fft_engine="mxu")
    got = pipe.restore_channels(img, 9, 30.0)
    psf = motion_blur_kernel_oracle(9, 30.0)
    want = oracle_channels(
        np.moveaxis(img.astype(np.float32) / 255.0, -1, 0), psf
    )
    for tier in ("l2", "inf", "gpu"):
        rep = channels_equal(got, want, tier)
        assert rep.passed, str(rep)
