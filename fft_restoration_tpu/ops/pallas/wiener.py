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

import numpy as np

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
    m, n = lead[-2], lead[-1]
    if hr.shape[-2:] != (m, n):
        raise ValueError(f"H plane {hr.shape} doesn't match G {lead}")

    # G keeps its leading (channel/batch) axes as a grid dimension; H is
    # indexed by the row-block position ONLY, so the shared PSF spectrum
    # is never broadcast/materialized per channel in HBM.
    chans = int(np.prod(lead[:-2])) if len(lead) > 2 else 1
    gr3 = gr.reshape(chans, m, n)
    gi3 = gi.reshape(chans, m, n)
    hr2 = hr.reshape(m, n)
    hi2 = hi.reshape(m, n)

    max_rows = max(8, ((24 << 20) // (n * 4 * 8)) // 8 * 8)
    rows = min(block_rows, max_rows, max(m, 1))
    pad = (-m) % rows
    if pad:
        gr3 = jnp.pad(gr3, ((0, 0), (0, pad), (0, 0)))
        gi3 = jnp.pad(gi3, ((0, 0), (0, pad), (0, 0)))
        hr2 = jnp.pad(hr2, ((0, pad), (0, 0)))
        hi2 = jnp.pad(hi2, ((0, pad), (0, 0)))
    mt = gr3.shape[1]

    g_spec = pl.BlockSpec(
        (1, rows, n), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec((rows, n), lambda c, i: (i, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def kernel(k_ref, gr_ref, gi_ref, hr_ref, hi_ref, fr_ref, fi_ref):
        _wiener_kernel(
            k_ref, gr_ref.at[0], gi_ref.at[0], hr_ref, hi_ref,
            fr_ref.at[0], fi_ref.at[0],
        )

    fr, fi = pl.pallas_call(
        kernel,
        name="fftr_wiener_elem",
        grid=(chans, mt // rows),
        in_specs=[k_spec, g_spec, g_spec, h_spec, h_spec],
        out_specs=[g_spec, g_spec],
        out_shape=[
            jax.ShapeDtypeStruct((chans, mt, n), jnp.float32),
            jax.ShapeDtypeStruct((chans, mt, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(
        jnp.asarray([K], jnp.float32),
        gr3,
        gi3,
        hr2,
        hi2,
    )
    if pad:
        fr = fr[:, :m]
        fi = fi[:, :m]
    return fr.reshape(lead), fi.reshape(lead)
