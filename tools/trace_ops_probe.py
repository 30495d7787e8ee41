#!/usr/bin/env python
"""Print the device-trace op names for the flagship pipeline (one TPU run).

Diagnostic for the phase-taxonomy mapping in utils/trace_profile.py:
shows exactly how XLA/Mosaic name the pipeline's kernels and fusions in
the profiler timeline, so phases_device_ms can bucket them.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(h=2048, w=2048):
    import jax
    import jax.numpy as jnp

    from fft_restoration_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from fft_restoration_tpu.models.pipeline import (
        _restore_core,
        psf_spectrum_planes,
    )
    from fft_restoration_tpu.ops.psf import motion_blur_kernel
    from fft_restoration_tpu.utils.trace_profile import device_trace

    rng = np.random.default_rng(0)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    x = jax.device_put(jnp.asarray(img))
    ang, k = jnp.float32(30.0), jnp.float32(0.01)

    core = functools.partial(
        _restore_core,
        psf_length=50,
        fft_backend="pallas",
        filter_name="wiener",
        white_balance=True,
    )
    h_fn = jax.jit(
        lambda a: psf_spectrum_planes(motion_blur_kernel(50, a), h, w, psf_rows=50)
    )
    hre, him = h_fn(ang)
    raw = jax.jit(core)
    fn = lambda xx, a, kk: raw(xx, a, kk, hre, him)
    rep = device_trace(fn, (x, ang, k), n_iters=10)
    print(f"device busy {rep.device_total_ms:.3f} ms/iter", file=sys.stderr)
    print("phases (ms/iter):")
    for name, ms in sorted(rep.phases_ms.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.4f} ms/iter  {name}")
    print("ops (ms/iter):")
    for name, ms in sorted(rep.ops_ms.items(), key=lambda kv: -kv[1]):
        print(f"{ms / rep.n_iters:9.4f} ms/iter  {name}")


if __name__ == "__main__":
    main()
