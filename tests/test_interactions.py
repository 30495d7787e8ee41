"""Feature-interaction matrix: every (filter, psf_type, pad, edgetaper)
combination restores through the single-chip pipeline.

Each feature is tested in depth in its own file; this matrix guards the
COMBINATIONS (kernel-agnostic filters x PSF family x mixed-radix pads x
border taper), where plumbing regressions hide. Tiny frames, matmul
backend — a pure smoke+shape+finite contract."""

import numpy as np
import pytest

from fft_restoration_tpu.models.pipeline import WienerDeblurPipeline


@pytest.mark.parametrize("filter_name", ["wiener", "inverse", "cls", "rl"])
@pytest.mark.parametrize("psf_type", ["motion", "gaussian", "disk", "custom"])
@pytest.mark.parametrize("pad_mode", ["pow2", "smooth"])
@pytest.mark.parametrize("edgetaper", [False, True])
def test_feature_matrix(rng, filter_name, psf_type, pad_mode, edgetaper):
    img = (rng.random((44, 60, 3)) * 255).astype(np.uint8)
    if psf_type == "custom":  # the --psf-file surface: a concrete array
        k = np.random.default_rng(9).random((7, 7)).astype(np.float32)
        psf_type = k / k.sum()
    pipe = WienerDeblurPipeline(
        fft_backend="matmul",
        filter_name=filter_name,
        psf_type=psf_type,
        pad_mode=pad_mode,
        edgetaper=edgetaper,
        rl_iters=3,
    )
    out = pipe.restore(img, 7, 2.0)
    assert out.shape == (44, 60, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()
