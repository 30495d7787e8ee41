"""Pallas kernels (interpret mode on CPU) vs np.fft / jnp references."""

import numpy as np
import pytest

import jax.numpy as jnp

from fft_restoration_tpu.ops.pallas.fft_kernel import fft_cols_pallas, fft_rows_pallas
from fft_restoration_tpu.ops.pallas.wiener import wiener_pallas
from fft_restoration_tpu.ops.wiener import wiener_filter


@pytest.mark.parametrize("n", [2, 8, 128, 512])
def test_fft_rows_pallas_matches_npfft(rng, n):
    re = rng.standard_normal((16, n)).astype(np.float32)
    im = rng.standard_normal((16, n)).astype(np.float32)
    r, i = fft_rows_pallas(jnp.asarray(re), jnp.asarray(im), False)
    ours = np.asarray(r) + 1j * np.asarray(i)
    ref = np.fft.fft(re.astype(np.complex128) + 1j * im, axis=-1)
    assert np.abs(ours - ref).max() / max(1.0, np.abs(ref).max()) < 1e-5


def test_fft_rows_pallas_inverse_roundtrip(rng):
    re = rng.standard_normal((4, 64)).astype(np.float32)
    zero = jnp.zeros((4, 64), jnp.float32)
    r, i = fft_rows_pallas(jnp.asarray(re), zero, False)
    r2, _ = fft_rows_pallas(r, i, True)
    assert np.abs(np.asarray(r2) / 64 - re).max() < 1e-5


def test_fft_rows_pallas_3d_batch(rng):
    re = rng.standard_normal((3, 8, 32)).astype(np.float32)
    r, i = fft_rows_pallas(jnp.asarray(re), jnp.zeros_like(jnp.asarray(re)), False)
    ref = np.fft.fft(re.astype(np.complex128), axis=-1)
    ours = np.asarray(r) + 1j * np.asarray(i)
    assert ours.shape == (3, 8, 32)
    assert np.abs(ours - ref).max() / np.abs(ref).max() < 1e-5


def test_fft_rows_pallas_ragged_batch(rng):
    # batch not a multiple of block_rows exercises the pad path
    re = rng.standard_normal((7, 16)).astype(np.float32)
    r, i = fft_rows_pallas(
        jnp.asarray(re), jnp.zeros_like(jnp.asarray(re)), False, block_rows=4
    )
    ref = np.fft.fft(re.astype(np.complex128), axis=-1)
    assert np.abs((np.asarray(r) + 1j * np.asarray(i)) - ref).max() < 1e-4


def test_fft_rows_pallas_rejects_non_pow2(rng):
    with pytest.raises(ValueError):
        fft_rows_pallas(jnp.zeros((4, 12)), jnp.zeros((4, 12)))


@pytest.mark.parametrize("ordering", ["natural", "revorder"])
def test_fft_rows_pallas_transposed_output(rng, ordering):
    """transposed_output == plain call + swapaxes, bitwise."""
    re = rng.standard_normal((2, 24, 32)).astype(np.float32)
    im = rng.standard_normal((2, 24, 32)).astype(np.float32)
    r0, i0 = fft_rows_pallas(jnp.asarray(re), jnp.asarray(im), False, ordering=ordering)
    r1, i1 = fft_rows_pallas(
        jnp.asarray(re), jnp.asarray(im), False,
        ordering=ordering, transposed_output=True,
    )
    assert r1.shape == (2, 32, 24)
    # compiler re-fusion across the different output graph -> ~1 ulp
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(r0), -1, -2), np.asarray(r1), rtol=3e-7, atol=1e-6
    )
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(i0), -1, -2), np.asarray(i1), rtol=3e-7, atol=1e-6
    )


def test_fft_rows_pallas_transposed_real_input_ragged(rng):
    re = rng.standard_normal((20, 16)).astype(np.float32)  # 20 % block 8 != 0
    r0, i0 = fft_rows_pallas(jnp.asarray(re), None, False)
    r1, i1 = fft_rows_pallas(
        jnp.asarray(re), None, False, block_rows=8, transposed_output=True
    )
    assert r1.shape == (16, 20)
    assert np.abs(np.swapaxes(np.asarray(r0), -1, -2) - np.asarray(r1)).max() < 1e-5


def test_fft_rows_pallas_emit_minmax(rng):
    """Per-block min/max partials equal the true stats of the outputs."""
    re = rng.standard_normal((8, 32)).astype(np.float32)
    im = rng.standard_normal((8, 32)).astype(np.float32)
    r, i, mm = fft_rows_pallas(
        jnp.asarray(re), jnp.asarray(im), True, block_rows=4, emit_minmax=True
    )
    r, i, mm = np.asarray(r), np.asarray(i), np.asarray(mm)
    assert mm.shape == (2, 4)
    for b in range(2):
        blk_r = r[4 * b : 4 * b + 4]
        blk_i = i[4 * b : 4 * b + 4]
        truth = [blk_r.min(), blk_r.max(), blk_i.min(), blk_i.max()]
        # compiler may recompute the plane for the reduction -> ~1 ulp
        np.testing.assert_allclose(mm[b], truth, rtol=3e-7)
    with pytest.raises(ValueError):
        fft_rows_pallas(
            jnp.zeros((7, 32)), jnp.zeros((7, 32)), True,
            block_rows=4, emit_minmax=True,
        )


def test_fft_rows_pallas_real_output(rng):
    """real_output skips the imaginary write; the real plane is identical
    to the full call's."""
    re = rng.standard_normal((4, 32)).astype(np.float32)
    im = rng.standard_normal((4, 32)).astype(np.float32)
    full_r, full_i = fft_rows_pallas(jnp.asarray(re), jnp.asarray(im), True)
    only_r, none_i = fft_rows_pallas(
        jnp.asarray(re), jnp.asarray(im), True, real_output=True
    )
    assert none_i is None
    # dropping the dead output lets the compiler re-fuse (FMA contraction
    # differs) -> identical up to ~1 ulp, not bitwise
    full = np.asarray(full_r)
    only = np.asarray(only_r)
    assert np.abs(full - only).max() <= 4e-6 * max(1.0, np.abs(full).max())


# ---------------------------------------------------------------------------
# fft_cols_pallas: the sublane-axis column kernel. Not on the production
# path (sublane rolls cost ~3x lane rolls on v5e — measured negative
# result, docs/PERF.md), kept as an op for transpose-dominated workloads;
# these parity tests mirror the row-kernel suite so it cannot rot.


@pytest.mark.parametrize("h", [2, 8, 128])
def test_fft_cols_pallas_matches_npfft(rng, h):
    re = rng.standard_normal((h, 16)).astype(np.float32)
    im = rng.standard_normal((h, 16)).astype(np.float32)
    r, i = fft_cols_pallas(jnp.asarray(re), jnp.asarray(im), False)
    ours = np.asarray(r) + 1j * np.asarray(i)
    ref = np.fft.fft(re.astype(np.complex128) + 1j * im, axis=0)
    assert np.abs(ours - ref).max() / max(1.0, np.abs(ref).max()) < 1e-5


def test_fft_cols_pallas_inverse_roundtrip(rng):
    re = rng.standard_normal((64, 8)).astype(np.float32)
    zero = jnp.zeros((64, 8), jnp.float32)
    r, i = fft_cols_pallas(jnp.asarray(re), zero, False)
    r2, _ = fft_cols_pallas(r, i, True)
    assert np.abs(np.asarray(r2) / 64 - re).max() < 1e-5


def test_fft_cols_pallas_revorder_roundtrip(rng):
    """fwd(DIF, bit-reversed out) -> inv(DIT, bit-reversed in) with no
    permutation pass recovers the input x H."""
    re = rng.standard_normal((32, 8)).astype(np.float32)
    zero = jnp.zeros((32, 8), jnp.float32)
    r, i = fft_cols_pallas(jnp.asarray(re), zero, False, ordering="revorder")
    r2, _ = fft_cols_pallas(r, i, True, ordering="revorder")
    assert np.abs(np.asarray(r2) / 32 - re).max() < 1e-5


def test_fft_cols_pallas_3d_batch_and_ragged_cols(rng):
    # leading batch axis + a width that is not a block_cols multiple
    # exercises the lane-pad path
    re = rng.standard_normal((2, 16, 7)).astype(np.float32)
    r, i = fft_cols_pallas(
        jnp.asarray(re), jnp.zeros_like(jnp.asarray(re)), False, block_cols=4
    )
    ref = np.fft.fft(re.astype(np.complex128), axis=-2)
    ours = np.asarray(r) + 1j * np.asarray(i)
    assert ours.shape == (2, 16, 7)
    assert np.abs(ours - ref).max() / np.abs(ref).max() < 1e-5


def test_fft_cols_pallas_rejects_non_pow2():
    with pytest.raises(ValueError):
        fft_cols_pallas(jnp.zeros((12, 4)), jnp.zeros((12, 4)))


def test_transpose_free_2d_matches_fft2(rng):
    """rows kernel + cols kernel = full 2D FFT with zero transposes."""
    x = rng.standard_normal((32, 16)).astype(np.float32)
    zero = jnp.zeros_like(jnp.asarray(x))
    r, i = fft_rows_pallas(jnp.asarray(x), zero, False)
    r, i = fft_cols_pallas(r, i, False)
    ours = np.asarray(r) + 1j * np.asarray(i)
    ref = np.fft.fft2(x.astype(np.complex128))
    assert np.abs(ours - ref).max() / np.abs(ref).max() < 1e-5


def test_wiener_pallas_matches_jnp(rng):
    gr = rng.standard_normal((3, 16, 128)).astype(np.float32)
    gi = rng.standard_normal((3, 16, 128)).astype(np.float32)
    hr = rng.standard_normal((16, 128)).astype(np.float32)
    hi = rng.standard_normal((16, 128)).astype(np.float32)
    G = (jnp.asarray(gr), jnp.asarray(gi))
    H = (jnp.asarray(hr), jnp.asarray(hi))
    ours = wiener_pallas(G, H, 0.01)
    ref = wiener_filter(G, H, 0.01)
    assert np.abs(np.asarray(ours[0]) - np.asarray(ref[0])).max() < 1e-4
    assert np.abs(np.asarray(ours[1]) - np.asarray(ref[1])).max() < 1e-4


def test_set_mxu_precision_knob():
    """The precision knob resolves names to jax.lax.Precision and the
    group DFTs keep oracle-exact f32 parity on CPU under every setting
    (CPU dots ignore the bf16 fast path — the perf/parity trade exists
    only on the MXU; docs/PERF.md round-3 precision A/B)."""
    import jax
    import pytest

    from fft_restoration_tpu.ops.pallas import fft_kernel as fk

    try:
        fk.set_mxu_precision("highest")
        assert fk._MXU_PRECISION == jax.lax.Precision.HIGHEST
        fk.set_mxu_precision("default")
        assert fk._MXU_PRECISION == jax.lax.Precision.DEFAULT
        with pytest.raises(AttributeError):
            fk.set_mxu_precision("bogus")
    finally:
        fk.set_mxu_precision(None)
    assert fk._MXU_PRECISION is None


def test_mxu_precision_cpu_parity_both_settings():
    """On CPU both precision settings produce identical spectra (f32
    either way), so the strict parity suite covers the flagship config
    regardless of the knob."""
    import numpy as np

    from fft_restoration_tpu.ops.pallas import fft_kernel as fk

    rng = np.random.default_rng(0)
    x = rng.random((8, 256), np.float32)
    outs = {}
    for name in ("highest", "default"):
        fk.set_mxu_precision(name)
        try:
            re, im = fk.fft_rows_pallas(
                x, None, False, ordering="revorder", engine="mxu"
            )
            outs[name] = (np.asarray(re), np.asarray(im))
        finally:
            fk.set_mxu_precision(None)
    np.testing.assert_array_equal(outs["highest"][0], outs["default"][0])
    np.testing.assert_array_equal(outs["highest"][1], outs["default"][1])
