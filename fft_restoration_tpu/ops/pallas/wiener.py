"""Fused Wiener-filter Pallas kernel.

Hand-fused counterpart of wiener_kernel (/root/reference/fft/fft_gpu.cu:
169-181) and the AVX2 elementwise filter (fft_simd.cpp:328-372): one VMEM
pass computing F = G * conj(H) / (|H|^2 + K) over SoA planes. XLA would
fuse the jnp version (ops/wiener.py) similarly; this kernel exists as the
explicit native-performance path and as the fusion site for K and the
inverse-FFT input when the full Pallas pipeline is assembled.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SoA = Tuple[jnp.ndarray, jnp.ndarray]


def _wiener_kernel(k_ref, gr_ref, gi_ref, hr_ref, hi_ref, fr_ref, fi_ref):
    gr = gr_ref[:]
    gi = gi_ref[:]
    hr = hr_ref[:]
    hi = hi_ref[:]
    k = k_ref[0]
    inv = 1.0 / (hr * hr + hi * hi + k)
    fr_ref[:] = (gr * hr + gi * hi) * inv
    fi_ref[:] = (gi * hr - gr * hi) * inv


def wiener_pallas(
    G: SoA,
    H: SoA,
    K,
    block_rows: int = 256,
    interpret: bool | None = None,
) -> SoA:
    """F = G * conj(H) / (|H|^2 + K) on (..., M, N) SoA planes.

    H broadcasts against G's leading (channel/batch) axes, mirroring the
    per-channel loop sharing one PSF spectrum (serial.cpp:34-39).
    """
    gr, gi = G
    hr, hi = H
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = gr.shape
    n = lead[-1]
    hr_b = jnp.broadcast_to(hr, lead).reshape(-1, n)
    hi_b = jnp.broadcast_to(hi, lead).reshape(-1, n)
    gr2 = gr.reshape(-1, n)
    gi2 = gi.reshape(-1, n)
    batch = gr2.shape[0]
    # ~8 live (rows, n) f32 planes (4 in + 2 out + temporaries) must fit
    # the ~16MB scoped VMEM.
    max_rows = max(8, ((24 << 20) // (n * 4 * 8)) // 8 * 8)
    rows = min(block_rows, max_rows, max(batch, 1))
    pad = (-batch) % rows
    if pad:
        gr2, gi2, hr_b, hi_b = (
            jnp.pad(a, ((0, pad), (0, 0))) for a in (gr2, gi2, hr_b, hi_b)
        )
    total = gr2.shape[0]
    spec = pl.BlockSpec((rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    fr, fi = pl.pallas_call(
        _wiener_kernel,
        grid=(total // rows,),
        in_specs=[k_spec, spec, spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((total, n), jnp.float32),
            jax.ShapeDtypeStruct((total, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(
        jnp.asarray([K], jnp.float32),
        gr2,
        gi2,
        hr_b,
        hi_b,
    )
    if pad:
        fr = fr[:batch]
        fi = fi[:batch]
    return fr.reshape(lead), fi.reshape(lead)
