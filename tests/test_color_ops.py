"""jnp color ops vs the NumPy oracle color path."""

import numpy as np

import jax.numpy as jnp

from fft_restoration_tpu.ops.color import (
    apply_white_balance as wb_jnp,
    bgr_to_lab as lab_jnp,
    lab_to_bgr as bgr_jnp,
)
from fft_restoration_tpu.oracle.color import (
    apply_white_balance as wb_np,
    bgr_to_lab as lab_np,
    lab_to_bgr as bgr_np,
)


def test_bgr_to_lab_matches_oracle(small_bgr):
    ours = np.asarray(lab_jnp(jnp.asarray(small_bgr)))
    ref = lab_np(small_bgr)
    assert np.abs(ours - ref).max() < 1e-3


def test_lab_to_bgr_matches_oracle(small_bgr):
    lab = lab_np(small_bgr)
    ours = np.asarray(bgr_jnp(jnp.asarray(lab)))
    ref = bgr_np(lab)
    assert np.abs(ours - ref).max() < 1e-5


def test_white_balance_matches_oracle(small_bgr, rng):
    lab_d = lab_np(small_bgr)
    lab_o = lab_np(rng.random(small_bgr.shape).astype(np.float32))
    ours = np.asarray(wb_jnp(jnp.asarray(lab_d), jnp.asarray(lab_o)))
    ref = wb_np(lab_d, lab_o)
    assert np.abs(ours - ref).max() < 1e-3
