"""Radix-4 experiment kernel: correctness vs np.fft under its own
output permutation (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fft_restoration_tpu.ops.pallas.fft_radix4 import (
    _numpy_sim,
    fft_rows_radix4_fwd,
    radix4_output_permutation,
    radix4_stage_lengths,
)


def test_stage_lengths():
    assert radix4_stage_lengths(16) == [(16, 4), (4, 4)]
    assert radix4_stage_lengths(32) == [(32, 4), (8, 4), (2, 2)]
    assert radix4_stage_lengths(2048) == [
        (2048, 4), (512, 4), (128, 4), (32, 4), (8, 4), (2, 2),
    ]


@pytest.mark.parametrize("n", [16, 32, 64, 128])
def test_numpy_sim_is_permuted_dft(rng, n):
    x = rng.standard_normal((3, n)).astype(np.float32)
    re, im = _numpy_sim(x, None)
    ours = re + 1j * im
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    perm = radix4_output_permutation(n)
    assert sorted(perm) == list(range(n))  # a true permutation
    assert np.abs(ours - ref[:, perm]).max() / np.abs(ref).max() < 1e-6


@pytest.mark.parametrize("n", [16, 32, 128])
def test_kernel_matches_numpy_sim(rng, n):
    x = rng.standard_normal((8, n)).astype(np.float32)
    y = rng.standard_normal((8, n)).astype(np.float32)
    kr, ki = fft_rows_radix4_fwd(jnp.asarray(x), jnp.asarray(y))
    sr, si = _numpy_sim(x, y)
    scale = max(1.0, np.abs(sr).max(), np.abs(si).max())
    assert np.abs(np.asarray(kr) - sr).max() / scale < 1e-5
    assert np.abs(np.asarray(ki) - si).max() / scale < 1e-5


def test_kernel_real_input(rng):
    x = rng.standard_normal((4, 64)).astype(np.float32)
    kr, ki = fft_rows_radix4_fwd(jnp.asarray(x))
    perm = radix4_output_permutation(64)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)[:, perm]
    ours = np.asarray(kr) + 1j * np.asarray(ki)
    assert np.abs(ours - ref).max() / np.abs(ref).max() < 1e-5
