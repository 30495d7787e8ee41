"""Spectral megakernel: column-FFT -> Wiener -> column-IFFT in one pass.

In the transposed orientation the middle of the 2D Wiener restore —
second forward FFT pass, elementwise filter, first inverse FFT pass —
operates independently on each (transposed) row block. This kernel fuses
all three, so the full 2D spectrum is NEVER materialized in HBM: per
block it runs the log2(N) DIF forward stages, the Wiener filter against
the PSF spectrum block, and the log2(N) DIT inverse stages, all in VMEM.

Replaces three kernels + two full spectrum round trips of the unfused
pallas path; the CUDA reference materializes every intermediate
(fft_gpu.cu:356-364: my_dft2D, wiener_kernel, my_dft2D).

Orderings: input blocks arrive row-FFT'd in revorder (bit-reversed
spectrum), the PSF spectrum must be produced by the same revorder
forward path, and the output leaves in spatial-domain transposed
orientation ready for the final row IFFT. Elementwise filtering is
order-agnostic so the bit-reversed order is free (fft_kernel.py).

Measured history (v5e, 2048sq x3): with the all-roll stage bodies the
fused pipeline ran 11.96 ms vs 3.13 ms unfused — 22 unrolled roll
stages plus filter in one body exceeded the VMEM working set and
spills ate the saved HBM passes. The MXU-hybrid engine (docs/
MXU_ENGINE.md) shrank the stage body enough to flip that: the fused
middle now wins or ties at every single-frame config (2048² −0.03 ms,
UHD −0.062; docs/PERF.md), and models/pipeline.py USES this kernel for
n >= 512 when the resolved engine is 'mxu'
(_spectral_megakernel_profitable). The roll engine keeps the unfused
three-kernel fallback.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_restoration_tpu.ops.pallas.fft_kernel import (
    _dif_stage,
    _dit_stage,
    _engine_tables,
    _half_masks_np,
    _load_f32,
    _mixed_q,
    _resolve_engine,
    _run_stages,
    _twiddle_planes_np,
)

SoA = Tuple[jnp.ndarray, jnp.ndarray]


def _kernel(
    k_ref,
    are_ref,
    aim_ref,
    hre_ref,
    him_ref,
    cf_ref,
    sf_ref,
    ci_ref,
    si_ref,
    m_ref,
    ore_ref,
    oim_ref,
):
    x_re = _load_f32(are_ref[:])
    x_im = _load_f32(aim_ref[:])
    n = x_re.shape[-1]
    stages = n.bit_length() - 1
    # forward column pass: DIF, stages from long to short
    for s in range(stages - 1, -1, -1):
        half = 1 << s
        x_re, x_im = _dif_stage(
            x_re,
            x_im,
            cf_ref[s, :][None, :],
            sf_ref[s, :][None, :],
            m_ref[s, :][None, :],
            half,
            n,
        )
    # Wiener: F = G * conj(H) / (|H|^2 + K)
    hr = _load_f32(hre_ref[:])
    hi = _load_f32(him_ref[:])
    k = k_ref[0]
    inv = 1.0 / (hr * hr + hi * hi + k)
    f_re = (x_re * hr + x_im * hi) * inv
    f_im = (x_im * hr - x_re * hi) * inv
    # inverse column pass: DIT, stages from short to long
    x_re, x_im = f_re, f_im
    for s in range(stages):
        half = 1 << s
        x_re, x_im = _dit_stage(
            x_re,
            x_im,
            ci_ref[s, :][None, :],
            si_ref[s, :][None, :],
            m_ref[s, :][None, :],
            half,
            n,
        )
    ore_ref[:] = x_re
    oim_ref[:] = x_im


def fwd_wiener_rows_pallas(
    A: SoA,
    H: SoA,
    K,
    block_rows: int = 256,
    interpret: bool | None = None,
    engine: str = "roll",
    radices: tuple = (),
) -> SoA:
    """wiener(rowFFT_revorder(A), H): the second forward pass fused with
    the elementwise filter, skipping one HBM round trip of the image
    spectrum. A: (..., M, N) row-FFT'd planes (transposed orientation);
    H: (M, N) PSF spectrum in matching revorder layout. radices:
    mixed-radix smooth N (fft_kernel.py)."""
    a_re, a_im = A
    h_re, h_im = H
    lead = a_re.shape
    n = lead[-1]
    radices = tuple(radices)
    if radices:
        q = _mixed_q(n, radices)
    elif n & (n - 1):
        raise ValueError(f"power-of-two length required, got {n}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if radices and not interpret and q % 128:
        raise ValueError(
            f"mixed-radix pow2 tail {q} must be 128-aligned on hardware"
        )

    chans = int(np.prod(lead[:-2])) if len(lead) > 2 else 1
    m = lead[-2]
    ar = a_re.reshape(chans, m, n)
    ai = a_im.reshape(chans, m, n)
    hr = h_re.reshape(m, n)
    hi = h_im.reshape(m, n)

    live = 16 if radices else 12  # cross-DFT block accumulators
    max_rows = max(8, ((24 << 20) // (n * 4 * live)) // 8 * 8)
    rows = min(block_rows, max_rows, max(m, 1))
    pad = (-m) % rows
    if pad:
        ar = jnp.pad(ar, ((0, 0), (0, pad), (0, 0)))
        ai = jnp.pad(ai, ((0, 0), (0, pad), (0, 0)))
        hr = jnp.pad(hr, ((0, pad), (0, 0)))
        hi = jnp.pad(hi, ((0, pad), (0, 0)))
    mt = ar.shape[1]

    # revorder semantics throughout this kernel family; 'mxu' swaps the
    # inner 7 DIF stages for the per-group DFT matmul (fft_kernel.py)
    engine = _resolve_engine(
        engine, n, "revorder", q if radices else None
    )
    tbl_arrays = _engine_tables(n, False, engine, radices)
    n_tbl = len(tbl_arrays)

    a_spec = pl.BlockSpec((1, rows, n), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((rows, n), lambda c, i: (i, 0), memory_space=pltpu.VMEM)
    tbl_specs = [
        pl.BlockSpec(a.shape, lambda c, i: (0, 0), memory_space=pltpu.VMEM)
        for a in tbl_arrays
    ]
    k_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def kernel(*refs):
        k_ref, are, aim, hre, him = refs[:5]
        tbls = refs[5 : 5 + n_tbl]
        fre, fim = refs[5 + n_tbl :]
        x_re = _load_f32(are.at[0][:])
        x_im = _load_f32(aim.at[0][:])
        x_re, x_im = _run_stages(x_re, x_im, tbls, dif=True, radices=radices)
        hrb = _load_f32(hre[:])
        hib = _load_f32(him[:])
        inv = 1.0 / (hrb * hrb + hib * hib + k_ref[0])
        fre.at[0][:] = (x_re * hrb + x_im * hib) * inv
        fim.at[0][:] = (x_im * hrb - x_re * hib) * inv

    f_re, f_im = pl.pallas_call(
        kernel,
        name="fftr_fwd_wiener",
        grid=(chans, mt // rows),
        in_specs=[k_spec, a_spec, a_spec, h_spec, h_spec] + tbl_specs,
        out_specs=[a_spec, a_spec],
        out_shape=[
            jax.ShapeDtypeStruct((chans, mt, n), jnp.float32),
            jax.ShapeDtypeStruct((chans, mt, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(
        jnp.asarray([K], jnp.float32),
        ar, ai, hr, hi,
        *[jnp.asarray(a) for a in tbl_arrays],
    )
    if pad:
        f_re = f_re[:, :m]
        f_im = f_im[:, :m]
    return f_re.reshape(lead), f_im.reshape(lead)


def wiener_spectral_rows_pallas(
    A: SoA,
    H: SoA,
    K,
    block_rows: int = 256,
    interpret: bool | None = None,
) -> SoA:
    """rowIFFT(wiener(rowFFT(A), H)) over the last axis, unscaled.

    A: (..., M, N) row-FFT'd image planes in transposed orientation,
       revorder (bit-reversed) spectrum along the last axis pending.
    H: (M, N) PSF spectrum in the same orientation/ordering (produced by
       the revorder forward 2D path); broadcasts over A's leading axes.
    """
    a_re, a_im = A
    h_re, h_im = H
    lead = a_re.shape
    n = lead[-1]
    if n & (n - 1):
        raise ValueError(f"power-of-two length required, got {n}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    ar = a_re.reshape(-1, n)
    ai = a_im.reshape(-1, n)
    hr = jnp.broadcast_to(h_re, lead).reshape(-1, n)
    hi = jnp.broadcast_to(h_im, lead).reshape(-1, n)
    batch = ar.shape[0]
    # ~14 live (rows, n) planes through the fused body.
    max_rows = max(8, ((24 << 20) // (n * 4 * 14)) // 8 * 8)
    rows = min(block_rows, max_rows, max(batch, 1))
    pad = (-batch) % rows
    if pad:
        ar, ai, hr, hi = (jnp.pad(v, ((0, pad), (0, 0))) for v in (ar, ai, hr, hi))
    total = ar.shape[0]

    cf, sf = _twiddle_planes_np(n, False)
    ci, si = _twiddle_planes_np(n, True)
    mask = _half_masks_np(n)
    stages = cf.shape[0]

    spec = pl.BlockSpec((rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tbl = pl.BlockSpec((stages, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    out_re, out_im = pl.pallas_call(
        _kernel,
        name="fftr_spectral_mid",
        grid=(total // rows,),
        in_specs=[k_spec, spec, spec, spec, spec, tbl, tbl, tbl, tbl, tbl],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((total, n), jnp.float32),
            jax.ShapeDtypeStruct((total, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(
        jnp.asarray([K], jnp.float32),
        ar,
        ai,
        hr,
        hi,
        jnp.asarray(cf),
        jnp.asarray(sf),
        jnp.asarray(ci),
        jnp.asarray(si),
        jnp.asarray(mask),
    )
    if pad:
        out_re = out_re[:batch]
        out_im = out_im[:batch]
    return out_re.reshape(lead), out_im.reshape(lead)


def wiener_spectral_rows_t(
    A: SoA,
    H: SoA,
    K,
    block_rows: int = 128,
    interpret: bool | None = None,
    engine: str = "mxu",
    vmem_budget_mb: int = 24,
    out_dtype=None,
    radices: tuple = (),
    spectral_filter: str = "wiener",
) -> SoA:
    """Full fused middle with TRANSPOSED block writes:
    colIFFT(filter(colFFT(A), H)) -> (..., N, M).

    spectral_filter: 'wiener' (F = G*conj(H)/(|H|^2+K), the restoration
    middle) or 'conv' (F = G*H, K ignored — the circular-convolution
    middle used by models/convolve.py for edge tapering and
    Richardson-Lucy round trips).

    One kernel replaces the fwd_wiener + inverse-T-write pair of the
    fused pipeline: the filtered 2D spectrum never round-trips HBM at
    all. Viable with the MXU engine because the body shrinks from 22
    unrolled roll-stages (which spilled VMEM — module docstring) to
    2*(log2(N)-7) roll-stages + two per-group DFT matmuls.

    A: (..., M, N) row-FFT'd planes, transposed orientation, revorder/
       hybrid spectrum pending along the last axis; H: (M, N) PSF
       spectrum in matching layout. Output is spatial-domain (..., N, M),
       ready for the final row IFFT.

    Returns None-able: falls back (returns None) when the transposed
    store's alignment constraints can't be met — callers then use the
    unfused pair."""
    a_re, a_im = A
    h_re, h_im = H
    lead = a_re.shape
    n = lead[-1]
    m = lead[-2]
    radices = tuple(radices)
    if radices:
        q = _mixed_q(n, radices)
    elif n & (n - 1):
        raise ValueError(f"power-of-two length required, got {n}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if radices and not interpret and q % 128:
        raise ValueError(
            f"mixed-radix pow2 tail {q} must be 128-aligned on hardware"
        )

    # the transposed OUT block's lane dim is `rows`: 128-aligned blocks,
    # and n itself 128-aligned on hardware (fft_kernel.py constraints)
    if (not interpret and n % 128) or m % 128:
        return None
    chans = int(np.prod(lead[:-2])) if len(lead) > 2 else 1
    ar = a_re.reshape(chans, m, n)
    ai = a_im.reshape(chans, m, n)
    hr = h_re.reshape(m, n)
    hi = h_im.reshape(m, n)

    # ~16 live (rows, n) planes through the fused body + transposed
    # staging copies
    live = 20 if radices else 16  # cross-DFT block accumulators
    max_rows = max(128, ((vmem_budget_mb << 20) // (n * 4 * live)) // 128 * 128)
    rows = min(block_rows // 128 * 128, max_rows)
    if rows == 0 or m % rows:
        single = -(-m // 128) * 128
        if single == m and single <= max_rows:
            rows = single
        else:
            return None

    engine = _resolve_engine(engine, n, "revorder", q if radices else None)
    fwd_tbls = _engine_tables(n, False, engine, radices)
    inv_tbls = _engine_tables(n, True, engine, radices)
    # mask plane is shared; drop the duplicate from the inverse set
    inv_tbls = [inv_tbls[0], inv_tbls[1]] + inv_tbls[3:]
    n_fwd = len(fwd_tbls)
    n_inv = len(inv_tbls)

    a_spec = pl.BlockSpec((1, rows, n), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((rows, n), lambda c, i: (i, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, n, rows), lambda c, i: (c, 0, i), memory_space=pltpu.VMEM)
    tbl_specs = [
        pl.BlockSpec(a.shape, lambda c, i: (0, 0), memory_space=pltpu.VMEM)
        for a in fwd_tbls + inv_tbls
    ]
    k_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    odt = jnp.float32 if out_dtype is None else jnp.dtype(out_dtype)

    def kernel(*refs):
        k_ref, are, aim, hre, him = refs[:5]
        ftbls = refs[5 : 5 + n_fwd]
        itbls_raw = refs[5 + n_fwd : 5 + n_fwd + n_inv]
        # re-insert the shared mask plane: (cos_i, sin_i, mask[, wc_i, ws_i])
        itbls = (itbls_raw[0], itbls_raw[1], ftbls[2]) + tuple(itbls_raw[2:])
        ore, oim = refs[5 + n_fwd + n_inv :]
        x_re = _load_f32(are.at[0][:])
        x_im = _load_f32(aim.at[0][:])
        x_re, x_im = _run_stages(x_re, x_im, ftbls, dif=True, radices=radices)
        hrb = _load_f32(hre[:])
        hib = _load_f32(him[:])
        if spectral_filter == "conv":
            f_re = x_re * hrb - x_im * hib
            f_im = x_re * hib + x_im * hrb
        else:
            inv = 1.0 / (hrb * hrb + hib * hib + k_ref[0])
            f_re = (x_re * hrb + x_im * hib) * inv
            f_im = (x_im * hrb - x_re * hib) * inv
        x_re, x_im = _run_stages(f_re, f_im, itbls, dif=False, radices=radices)
        ore.at[0][:] = jnp.swapaxes(x_re, 0, 1).astype(odt)
        oim.at[0][:] = jnp.swapaxes(x_im, 0, 1).astype(odt)

    out_re, out_im = pl.pallas_call(
        kernel,
        name=f"fftr_spectral_mid_T_{spectral_filter}",
        grid=(chans, m // rows),
        in_specs=[k_spec, a_spec, a_spec, h_spec, h_spec] + tbl_specs,
        out_specs=[o_spec, o_spec],
        out_shape=[
            jax.ShapeDtypeStruct((chans, n, m), odt),
            jax.ShapeDtypeStruct((chans, n, m), odt),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(
        jnp.asarray([K], jnp.float32),
        ar, ai, hr, hi,
        *[jnp.asarray(a) for a in fwd_tbls + inv_tbls],
    )
    return out_re.reshape(lead[:-2] + (n, m)), out_im.reshape(lead[:-2] + (n, m))
