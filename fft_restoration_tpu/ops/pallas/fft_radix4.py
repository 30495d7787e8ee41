"""Radix-4 row-FFT kernel — the measured answer to "would radix-4 help?"

The CUDA reference's butterfly loop (fft_gpu.cu:127-148) is radix-2;
classic radix-4 saves 1 complex multiply per 4 outputs per stage-pair.
In the TPU roll formulation the trade is different: a radix-4 DIF stage
needs 6 lane rolls per plane (vs 2x2 for two radix-2 stages) plus
4-way quarter selects to assemble (a, b, c, d) and the output, so the
op-count model predicts a LOSS:

  per element per radix-2-stage-equivalent (re+im planes):
    radix-2 (where-select): 4 rolls + 2 sel + ~10 arith  ~= 14 ops
    radix-4 (this kernel） : 6 rolls + ~15 sel + ~11 arith ~= 32 ops

This module exists to MEASURE that model (tools/perf_ab.py radix4) —
kept as an experiment op, not a pipeline backend. Forward DIF only,
natural input -> mixed-radix digit-reversed output (radices long->short:
[4]*a + [2]*b, n = 4^a * 2^b). The elementwise-filter pipeline could
consume any fixed permutation, so ordering is not the blocker; speed is.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_restoration_tpu.ops.pallas.fft_kernel import (
    _dif_stage,
    _half_masks_np,
    _twiddle_planes_np,
)

SoA = Tuple[jnp.ndarray, jnp.ndarray]


def radix4_stage_lengths(n: int) -> list:
    """DIF stage lengths long->short: radix-4 while L % 4 == 0, else 2."""
    out = []
    length = n
    while length >= 4 and length % 4 == 0:
        out.append((length, 4))
        length //= 4
    while length >= 2:
        out.append((length, 2))
        length //= 2
    return out


@functools.lru_cache(maxsize=None)
def _r4_tables_np(n: int) -> tuple:
    """Per radix-4 stage: lane tables (cos, sin) of W_L^{j*k} (j = lane
    offset within quarter, k = quarter index) and the quarter index."""
    stages = [L for L, r in radix4_stage_lengths(n) if r == 4]
    cos = np.empty((len(stages), n), np.float32)
    sin = np.empty((len(stages), n), np.float32)
    quarter = np.empty((len(stages), n), np.float32)
    t = np.arange(n, dtype=np.int64)
    for s, L in enumerate(stages):
        q = L // 4
        k = (t % L) // q
        j = (t % L) % q
        ang = -2.0 * math.pi * (j * k) / L
        cos[s] = np.cos(ang).astype(np.float32)
        sin[s] = np.sin(ang).astype(np.float32)
        quarter[s] = k.astype(np.float32)
    return cos, sin, quarter


def _dif4_stage(x_re, x_im, wc, ws, kq, q, n, roll):
    """One radix-4 DIF stage over the lane axis (see module docstring)."""
    # six rolls per plane: values at t±q, t±2q, t±3q
    rp = [(roll(x_re, n - m * q), roll(x_im, n - m * q)) for m in (1, 2, 3)]
    rm = [(roll(x_re, m * q), roll(x_im, m * q)) for m in (1, 2, 3)]
    k1 = kq == 1.0
    k2 = kq == 2.0
    k3 = kq == 3.0

    def pick(v0, v1, v2, v3):
        return jnp.where(k1, v1, jnp.where(k2, v2, jnp.where(k3, v3, v0)))

    # assemble the quarter values a=x[j], b=x[j+q], c=x[j+2q], d=x[j+3q]
    a_re = pick(x_re, rm[0][0], rm[1][0], rm[2][0])
    a_im = pick(x_im, rm[0][1], rm[1][1], rm[2][1])
    b_re = pick(rp[0][0], x_re, rm[0][0], rm[1][0])
    b_im = pick(rp[0][1], x_im, rm[0][1], rm[1][1])
    c_re = pick(rp[1][0], rp[0][0], x_re, rm[0][0])
    c_im = pick(rp[1][1], rp[0][1], x_im, rm[0][1])
    d_re = pick(rp[2][0], rp[1][0], rp[0][0], x_re)
    d_im = pick(rp[2][1], rp[1][1], rp[0][1], x_im)

    t1_re, t1_im = a_re + c_re, a_im + c_im
    t2_re, t2_im = a_re - c_re, a_im - c_im
    t3_re, t3_im = b_re + d_re, b_im + d_im
    t4_re, t4_im = b_re - d_re, b_im - d_im
    # forward kernel: y0=t1+t3, y1=t2-i*t4, y2=t1-t3, y3=t2+i*t4
    y_re = pick(t1_re + t3_re, t2_re + t4_im, t1_re - t3_re, t2_re - t4_im)
    y_im = pick(t1_im + t3_im, t2_im - t4_re, t1_im - t3_im, t2_im + t4_re)
    # twiddle W_L^{j*k} (identity on quarter 0)
    o_re = y_re * wc - y_im * ws
    o_im = y_re * ws + y_im * wc
    return o_re, o_im


def fft_rows_radix4_fwd(
    re: jnp.ndarray,
    im: jnp.ndarray | None = None,
    block_rows: int = 256,
    interpret: bool | None = None,
) -> SoA:
    """Forward DIF over the last axis: radix-4 stages + a radix-2 tail.
    Natural input, mixed-radix digit-reversed output (a fixed
    permutation — fine for elementwise-filter round trips)."""
    orig_shape = re.shape
    n = orig_shape[-1]
    if n & (n - 1):
        raise ValueError(f"power-of-two length required, got {n}")
    if n < 4:
        raise ValueError("radix-4 kernel needs n >= 4")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    real_input = im is None
    batch = int(np.prod(orig_shape[:-1])) if len(orig_shape) > 1 else 1
    re2 = re.reshape(batch, n)
    im2 = None if real_input else im.reshape(batch, n)

    vmem_budget = 24 << 20
    max_rows = max(8, (vmem_budget // (n * 4 * 14)) // 8 * 8)
    rows = min(block_rows, max_rows, max(batch, 1))
    pad = (-batch) % rows
    if pad:
        re2 = jnp.pad(re2, ((0, pad), (0, 0)))
        if im2 is not None:
            im2 = jnp.pad(im2, ((0, pad), (0, 0)))
    total = re2.shape[0]

    c4, s4, kq4 = _r4_tables_np(n)
    n4 = c4.shape[0]
    # radix-2 tail stages reuse the radix-2 tables (same lane layout)
    cos2, sin2 = _twiddle_planes_np(n, False)
    mask2 = _half_masks_np(n)
    tail = [L for L, r in radix4_stage_lengths(n) if r == 2]

    row_spec = pl.BlockSpec((rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tbl4 = pl.BlockSpec((n4, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    tbl2 = pl.BlockSpec(
        (cos2.shape[0], n), lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    def kernel(*refs):
        if real_input:
            re_ref, c4r, s4r, k4r, c2r, s2r, m2r, ore, oim = refs
            x_re = re_ref[:]
            x_im = jnp.zeros_like(x_re)
        else:
            re_ref, im_ref, c4r, s4r, k4r, c2r, s2r, m2r, ore, oim = refs
            x_re = re_ref[:]
            x_im = im_ref[:]
        for s in range(n4):
            L = n >> (2 * s)
            q = L // 4
            x_re, x_im = _dif4_stage(
                x_re,
                x_im,
                c4r[s, :][None, :],
                s4r[s, :][None, :],
                k4r[s, :][None, :],
                q,
                n,
                lambda v, amt: pltpu.roll(v, amt, axis=1),
            )
        for L in tail:
            half = L // 2
            s2 = half.bit_length() - 1  # stage index in the radix-2 tables
            x_re, x_im = _dif_stage(
                x_re,
                x_im,
                c2r[s2, :][None, :],
                s2r[s2, :][None, :],
                m2r[s2, :][None, :],
                half,
                n,
            )
        ore[:] = x_re
        oim[:] = x_im

    in_specs = ([row_spec] if real_input else [row_spec, row_spec]) + [
        tbl4,
        tbl4,
        tbl4,
        tbl2,
        tbl2,
        tbl2,
    ]
    operands = (re2,) if real_input else (re2, im2)
    out_re, out_im = pl.pallas_call(
        kernel,
        name="fftr_radix4_fwd",
        grid=(total // rows,),
        in_specs=in_specs,
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((total, n), jnp.float32),
            jax.ShapeDtypeStruct((total, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(
        *operands,
        jnp.asarray(c4),
        jnp.asarray(s4),
        jnp.asarray(kq4),
        jnp.asarray(cos2),
        jnp.asarray(sin2),
        jnp.asarray(mask2),
    )
    if pad:
        out_re = out_re[:batch]
        out_im = out_im[:batch]
    return out_re.reshape(orig_shape), out_im.reshape(orig_shape)


def radix4_output_permutation(n: int) -> np.ndarray:
    """perm such that fft_rows_radix4_fwd(x)[..., t] == FFT(x)[..., perm[t]].

    Derived by pushing basis frequencies through the stage structure is
    error-prone; instead simulate the kernel math in NumPy on the DFT of
    an impulse comb — cheap and exact for test sizes."""
    x = np.zeros(n, np.float32)
    x[1] = 1.0  # FFT is e^{-2pi i k/n}: unique per k
    re, im = _numpy_sim(x[None, :], None)
    ang = np.angle(re[0] + 1j * im[0])
    k = np.round((-ang) * n / (2 * np.pi)).astype(np.int64) % n
    return k


def _numpy_sim(re: np.ndarray, im: np.ndarray | None) -> tuple:
    """Reference NumPy implementation of the kernel's exact stage math."""
    n = re.shape[-1]
    x_re = re.astype(np.float64)
    x_im = np.zeros_like(x_re) if im is None else im.astype(np.float64)

    def roll(v, amt):
        return np.roll(v, amt, axis=-1)

    c4, s4, kq4 = _r4_tables_np(n)
    for s in range(c4.shape[0]):
        L = n >> (2 * s)
        q = L // 4
        wc, ws, kq = c4[s].astype(np.float64), s4[s].astype(np.float64), kq4[s]
        rp = [(roll(x_re, n - m * q), roll(x_im, n - m * q)) for m in (1, 2, 3)]
        rm = [(roll(x_re, m * q), roll(x_im, m * q)) for m in (1, 2, 3)]

        def pick(v0, v1, v2, v3):
            return np.where(
                kq == 1, v1, np.where(kq == 2, v2, np.where(kq == 3, v3, v0))
            )

        a_re = pick(x_re, rm[0][0], rm[1][0], rm[2][0])
        a_im = pick(x_im, rm[0][1], rm[1][1], rm[2][1])
        b_re = pick(rp[0][0], x_re, rm[0][0], rm[1][0])
        b_im = pick(rp[0][1], x_im, rm[0][1], rm[1][1])
        c_re = pick(rp[1][0], rp[0][0], x_re, rm[0][0])
        c_im = pick(rp[1][1], rp[0][1], x_im, rm[0][1])
        d_re = pick(rp[2][0], rp[1][0], rp[0][0], x_re)
        d_im = pick(rp[2][1], rp[1][1], rp[0][1], x_im)
        t1_re, t1_im = a_re + c_re, a_im + c_im
        t2_re, t2_im = a_re - c_re, a_im - c_im
        t3_re, t3_im = b_re + d_re, b_im + d_im
        t4_re, t4_im = b_re - d_re, b_im - d_im
        y_re = pick(t1_re + t3_re, t2_re + t4_im, t1_re - t3_re, t2_re - t4_im)
        y_im = pick(t1_im + t3_im, t2_im - t4_re, t1_im - t3_im, t2_im + t4_re)
        x_re = y_re * wc - y_im * ws
        x_im = y_re * ws + y_im * wc

    cos2, sin2 = _twiddle_planes_np(n, False)
    mask2 = _half_masks_np(n)
    for L in [LL for LL, r in radix4_stage_lengths(n) if r == 2]:
        half = L // 2
        s2 = half.bit_length() - 1
        wc = cos2[s2].astype(np.float64)
        ws = sin2[s2].astype(np.float64)
        m = mask2[s2]
        p_re, p_im = roll(x_re, n - half), roll(x_im, n - half)
        q_re, q_im = roll(x_re, half), roll(x_im, half)
        d_re, d_im = q_re - x_re, q_im - x_im
        wd_re = wc * d_re - ws * d_im
        wd_im = wc * d_im + ws * d_re
        x_re = np.where(m > 0.5, x_re + p_re, wd_re)
        x_im = np.where(m > 0.5, x_im + p_im, wd_im)
    return x_re, x_im
