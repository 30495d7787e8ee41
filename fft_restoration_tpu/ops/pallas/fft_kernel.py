"""Pallas TPU row-FFT kernel: all butterfly stages in VMEM.

TPU-native counterpart of fft_row_optimized_kernel
(/root/reference/fft/fft_gpu.cu:108-148), which stages one row per CUDA
block in shared memory and loops the butterfly stages in-kernel. The
jnp-level radix2 backend (ops/fft.py) pays one HBM round trip per stage
(log2 N full-array passes); this kernel loads a block of rows into VMEM
once, runs ALL log2 N stages on-chip, and writes once — the same
memory-locality win the CUDA kernel gets from shared memory.

Design notes (the TPU way, not a CUDA translation):
  * SoA float32 re/im planes (no complex dtype in Pallas), rows on the
    sublane axis, the transform axis on lanes.
  * Butterfly partner access is NOT a gather: for stage length L, the
    partner of lane j is j +- L/2 within its block, so one lane-axis
    `pltpu.roll` by -L/2 gives every first-half lane its partner, and a
    roll by +L/2 gives every second-half lane its; a per-stage iota mask
    selects which expression each lane keeps:
        first  half: out = x + w * roll(x, -L/2)
        second half: out = roll(x, +L/2) - w_shifted * x
  * Twiddles are exact float64-computed tables, one (S, N) cos and sin
    plane, laid out so lane j of stage s holds w^(j mod L/2)_L — both
    halves read the same lane index (w_shifted == w by periodicity).
  * Bit-reversal stays OUTSIDE the kernel as an XLA reshape-transpose
    (ops/fft.py _bit_reverse_last_axis): one data-movement pass, the
    in-kernel part is then purely sequential lane-local math.
  * The grid walks row blocks; the reference's per-row CUDA blocks
    (<=1024 threads, fft_gpu.cu:220) become (block_rows, N) VMEM tiles.
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

from fft_restoration_tpu.ops.fft import _bit_reverse_last_axis

SoA = Tuple[jnp.ndarray, jnp.ndarray]


@functools.lru_cache(maxsize=None)
def _twiddle_planes_np(n: int, inverse: bool, q: int | None = None) -> tuple:
    """(S, N) cos/sin planes; lane j of stage s = w_{L}^{j mod L/2},
    L = 2^{s+1}.

    q (mixed-radix): build only the log2(q) stages of the pow2 tail of
    an n = prod(radices) * q transform. The per-lane patterns are
    periodic in L, and L divides q divides n, so the same formula
    yields correct width-n planes for the q-local butterflies of every
    q-block."""
    stages = (q or n).bit_length() - 1
    sign = 1.0 if inverse else -1.0
    cos = np.empty((stages, n), np.float32)
    sin = np.empty((stages, n), np.float32)
    j = np.arange(n, dtype=np.float64)
    for s in range(stages):
        length = 2 << s
        k = np.mod(j, length // 2)
        ang = sign * 2.0 * math.pi * k / length
        cos[s] = np.cos(ang).astype(np.float32)
        sin[s] = np.sin(ang).astype(np.float32)
    return cos, sin


@functools.lru_cache(maxsize=None)
def _dft_planes_np(length: int, inverse: bool) -> tuple:
    """(length, length) cos/sin planes of the DFT matrix
    W[l, k] = exp(sign * 2*pi*i * l * k / length), float64-computed."""
    sign = 1.0 if inverse else -1.0
    lk = np.outer(np.arange(length, dtype=np.float64), np.arange(length))
    ang = sign * 2.0 * math.pi * lk / length
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _half_masks_np(n: int, q: int | None = None) -> np.ndarray:
    """(S, N) float32 mask: 1.0 where lane j is in the first half of its
    stage-s butterfly block, else 0.0. q: pow2-tail stage count of a
    mixed-radix transform (see _twiddle_planes_np)."""
    stages = (q or n).bit_length() - 1
    j = np.arange(n)
    out = np.empty((stages, n), np.float32)
    for s in range(stages):
        length = 2 << s
        out[s] = ((j % length) < length // 2).astype(np.float32)
    return out


@functools.lru_cache(maxsize=None)
def _cross_planes_np(n: int, radices: tuple, inverse: bool) -> tuple:
    """(L, N) cos/sin twiddle planes for the mixed-radix cross-DFT
    levels. Level l splits each w-wide block (w = n / prod(radices[:l]))
    into r = radices[l] sub-blocks of width q = w / r; the four-step
    twiddle for output sub-block k1, lane offset j2 is W_w^{k1*j2}, so
    as a width-n plane:  tw[j] = W_w^{((j mod w) // q) * (j mod q)}."""
    sign = 1.0 if inverse else -1.0
    L = len(radices)
    cos = np.empty((L, n), np.float32)
    sin = np.empty((L, n), np.float32)
    j = np.arange(n, dtype=np.int64)
    w = n
    for lvl, r in enumerate(radices):
        q = w // r
        k1 = (j % w) // q
        j2 = j % q
        ang = sign * 2.0 * math.pi * (k1 * j2).astype(np.float64) / w
        cos[lvl] = np.cos(ang).astype(np.float32)
        sin[lvl] = np.sin(ang).astype(np.float32)
        w = q
    return cos, sin


def _mixed_q(n: int, radices: tuple) -> int:
    """Validate an n = prod(radices) * q mixed-radix split; return the
    pow2 tail q."""
    q = n
    for r in radices:
        if r < 2 or q % r:
            raise ValueError(
                f"radices {radices} do not divide the transform length {n}"
            )
        q //= r
    if q < 2 or q & (q - 1):
        raise ValueError(
            f"mixed-radix length {n} / radices {radices} leaves a "
            f"non-power-of-two tail {q}"
        )
    return q


def _cross_dft_level(x_re, x_im, r, w, inverse):
    """r-point DFT across the q-wide sub-blocks (q = w / r) of every
    w-wide block along the lane axis:
        out[.., base + k1*q + j2] =
            sum_j1 x[.., base + j1*q + j2] * W_r^{sign*k1*j1}.
    Scalar complex coefficients are python floats baked into the graph;
    sub-block access is static lane slices (128-aligned on hardware —
    callers enforce q % 128 == 0 there)."""
    n = x_re.shape[-1]
    q = w // r
    sign = 1.0 if inverse else -1.0
    outs_re, outs_im = [], []
    for base in range(0, n, w):
        subs = [
            (
                x_re[..., base + j1 * q : base + (j1 + 1) * q],
                x_im[..., base + j1 * q : base + (j1 + 1) * q],
            )
            for j1 in range(r)
        ]
        for k1 in range(r):
            acc_re = None
            acc_im = None
            for j1 in range(r):
                sr, si = subs[j1]
                if (k1 * j1) % r == 0:  # coefficient is exactly 1
                    t_re, t_im = sr, si
                else:
                    ang = sign * 2.0 * math.pi * ((k1 * j1) % r) / r
                    c = np.float32(math.cos(ang))
                    s = np.float32(math.sin(ang))
                    t_re = c * sr - s * si
                    t_im = c * si + s * sr
                acc_re = t_re if acc_re is None else acc_re + t_re
                acc_im = t_im if acc_im is None else acc_im + t_im
            outs_re.append(acc_re)
            outs_im.append(acc_im)
    return jnp.concatenate(outs_re, axis=-1), jnp.concatenate(outs_im, axis=-1)


def _mixed_cross_fwd(x_re, x_im, radices, xc_ref, xs_ref):
    """Forward mixed-radix prefix: per level (outermost first), the
    cross-block r-DFT then the four-step twiddle plane. After all levels
    each q-wide block is an independent q-point sub-problem for the pow2
    DIF stages; output block k1... holds bins by residue — one fixed
    permutation of the spectrum, cancelled by the symmetric inverse
    exactly like revorder's bit-reversal (module docstring)."""
    w = x_re.shape[-1]
    for lvl, r in enumerate(radices):
        x_re, x_im = _cross_dft_level(x_re, x_im, r, w, inverse=False)
        twc = xc_ref[lvl, :][None, :]
        tws = xs_ref[lvl, :][None, :]
        t_re = x_re * twc - x_im * tws
        t_im = x_re * tws + x_im * twc
        x_re, x_im = t_re, t_im
        w //= r
    return x_re, x_im


def _mixed_cross_inv(x_re, x_im, radices, xc_ref, xs_ref):
    """Inverse mixed-radix suffix: levels in reverse (innermost first),
    each as conj-twiddle multiply then the conj-coefficient cross-DFT.
    Unscaled, like every inverse in this module: fwd∘inv gains a factor
    r per level (times q from the pow2 tail) = n total."""
    n = x_re.shape[-1]
    widths = []
    w = n
    for r in radices:
        widths.append(w)
        w //= r
    for lvl in range(len(radices) - 1, -1, -1):
        r = radices[lvl]
        w = widths[lvl]
        twc = xc_ref[lvl, :][None, :]
        tws = xs_ref[lvl, :][None, :]
        t_re = x_re * twc - x_im * tws
        t_im = x_re * tws + x_im * twc
        x_re, x_im = _cross_dft_level(t_re, t_im, r, w, inverse=True)
    return x_re, x_im


def _dit_stage(x_re, x_im, wc, ws, m, half, n):
    """One DIT butterfly stage over the lane axis (see module docstring).

    The half-select is a compare+vselect (m > 0.5), not the arithmetic
    blend m*a + (1-m)*b — one VPU op per plane instead of three in a
    kernel that is compute-bound, not bandwidth-bound (docs/PERF.md)."""
    # partner for first-half lanes (j + half) and second-half (j - half)
    p_re = pltpu.roll(x_re, n - half, axis=1)
    p_im = pltpu.roll(x_im, n - half, axis=1)
    q_re = pltpu.roll(x_re, half, axis=1)
    q_im = pltpu.roll(x_im, half, axis=1)
    # w * partner (first half) and w * self (second half)
    wp_re = wc * p_re - ws * p_im
    wp_im = wc * p_im + ws * p_re
    wx_re = wc * x_re - ws * x_im
    wx_im = wc * x_im + ws * x_re
    first = m > 0.5
    x_re = jnp.where(first, x_re + wp_re, q_re - wx_re)
    x_im = jnp.where(first, x_im + wp_im, q_im - wx_im)
    return x_re, x_im


def _dif_stage(x_re, x_im, wc, ws, m, half, n):
    """One DIF (Gentleman-Sande) stage: butterflies first, twiddle after.
        first  half: out = x + x[j+half]
        second half: out = (x[j-half] - x) * w
    """
    p_re = pltpu.roll(x_re, n - half, axis=1)
    p_im = pltpu.roll(x_im, n - half, axis=1)
    q_re = pltpu.roll(x_re, half, axis=1)
    q_im = pltpu.roll(x_im, half, axis=1)
    d_re = q_re - x_re
    d_im = q_im - x_im
    wd_re = wc * d_re - ws * d_im
    wd_im = wc * d_im + ws * d_re
    first = m > 0.5
    x_re = jnp.where(first, x_re + p_re, wd_re)
    x_im = jnp.where(first, x_im + p_im, wd_im)
    return x_re, x_im


def _fft_stages(x_re, x_im, cos_ref, sin_ref, mask_ref, dif):
    """All butterfly stages on in-register (rows, n) planes. The stage
    count comes from the table (log2(q) rows for a mixed-radix pow2
    tail, log2(n) for a plain pow2 transform)."""
    n = x_re.shape[-1]
    stages = cos_ref.shape[0]
    order = range(stages - 1, -1, -1) if dif else range(stages)
    for s in order:
        half = 1 << s
        wc = cos_ref[s, :][None, :]
        ws = sin_ref[s, :][None, :]
        m = mask_ref[s, :][None, :]
        stage = _dif_stage if dif else _dit_stage
        x_re, x_im = stage(x_re, x_im, wc, ws, m, half, n)
    return x_re, x_im


# ---------------------------------------------------------------------------
# MXU hybrid engine: outer roll-stages + per-group DFT matmul
#
# The log2(n) roll-butterfly stages above are VPU-throughput bound — the
# dominant device cost of the whole restore (docs/PERF.md). The hybrid
# engine keeps only the outer DIF/DIT stages whose butterfly distance is
# a multiple of the 128-lane vreg width (cheap whole-vreg moves) and
# replaces the inner log2(128)=7 stages with ONE 128-point DFT matmul
# per contiguous 128-lane group, executed on the MXU — the unit the
# roll-butterflies leave idle.
#
# Ordering: radix-2 DIF decimation assigns bins to the 16 groups exactly
# as full bit reversal does (group g holds bins k ≡ rev4(g) mod 16); the
# natural-order DFT-128 then leaves positions-within-group NATURAL
# (p = k div 16) instead of bit-reversed. This "hybrid order" is just a
# different fixed permutation of the spectrum: elementwise filters are
# order-agnostic, the PSF spectrum is produced by the same engine, and
# the inverse consumes it symmetrically (inverse-DFT-128 matmul first,
# then the outer DIT stages). It composes with `revorder` only — the
# zero-permutation-pass design this pipeline already uses throughout.

_MXU_INNER = 128

# Matmul precision for the MXU group DFTs. Measured A/B on v5e
# (tools/perf_ab.py precision, docs/PERF.md round 3): DEFAULT (1-pass
# bf16-input matmul) cuts the full-pipeline device time 31% vs HIGHEST
# (the 6-pass f32 emulation) — 1.48 vs 2.14 ms at 2048²x3 — at a parity
# cost of INF 9.2e-3 / PSNR 53 dB vs the serial oracle (car fixture):
# fails the strict l2/inf tiers, comfortably passes the reference's own
# accelerator-mode acceptance (gpu tier: INF<=1e-3 OR PSNR>=30 dB,
# /root/reference/gpu.cpp:28-52). DEFAULT is therefore the flagship
# precision, exactly as the reference's gpu mode trades exactness under
# its relaxed tier; set_mxu_precision('highest') restores 122 dB parity
# (and is auto-selected by the CLI for the strict tiers). On CPU
# (tests/interpret) both settings are plain f32 — parity tests are
# unaffected. (Precision.HIGH is not lowerable by Mosaic.)
_MXU_PRECISION = None  # None -> the flagship default (Precision.DEFAULT)


def set_mxu_precision(name: str | None) -> None:
    """Set the process-wide matmul precision for the MXU group DFTs:
    'default' (bf16 fast path, the flagship), 'highest' (6-pass f32
    emulation, strict-tier parity), or None to restore the flagship
    default. Takes effect at trace time — call before compiling."""
    global _MXU_PRECISION
    if name is None:
        _MXU_PRECISION = None
    else:
        _MXU_PRECISION = getattr(jax.lax.Precision, name.upper())


def mxu_precision_token() -> str:
    """Cache-key token of the CURRENT precision ('default'/'highest').

    set_mxu_precision is process-global trace-time state; every cache of
    compiled executables that may trace MXU group DFTs (pipeline/psf/
    batched/tiled/sharded jit caches) includes this token in its keys so
    flipping the precision mid-process can never serve a stale-precision
    executable — the first per-request precision option gets a fresh
    compile instead of a silent wrong answer."""
    return (
        "default" if _MXU_PRECISION is None else _MXU_PRECISION.name.lower()
    )


def _group_dft_matmul(x_re, x_im, wc, ws):
    """Multiply each contiguous 128-lane group of (R, n) planes by the
    (128, 128) DFT matrix wc + i*ws on the MXU. Static vreg-aligned lane
    slices per group — no relayout, 16 pipelined (R,128)@(128,128)
    matmuls for n=2048."""
    n = x_re.shape[-1]
    prec = _MXU_PRECISION or jax.lax.Precision.DEFAULT
    out_re, out_im = [], []
    for g in range(n // _MXU_INNER):
        lo = g * _MXU_INNER
        xr = x_re[:, lo : lo + _MXU_INNER]
        xi = x_im[:, lo : lo + _MXU_INNER]
        # 3-multiplication complex product (Karatsuba):
        #   m1 = xr@wc, m2 = xi@ws, m3 = (xr+xi)@(wc+ws)
        #   yr = m1 - m2, yi = m3 - m1 - m2
        m1 = jnp.dot(xr, wc, precision=prec)
        m2 = jnp.dot(xi, ws, precision=prec)
        m3 = jnp.dot(xr + xi, wc + ws, precision=prec)
        out_re.append(m1 - m2)
        out_im.append(m3 - m1 - m2)
    return (
        jnp.concatenate(out_re, axis=-1),
        jnp.concatenate(out_im, axis=-1),
    )


def _fft_stages_mxu(x_re, x_im, cos_ref, sin_ref, mask_ref, wc_ref, ws_ref, dif):
    """Hybrid engine (see block comment above): valid for n >= 128,
    revorder semantics only. Forward (dif=True): outer DIF roll-stages
    then the group matmul; inverse: group matmul (inverse DFT matrix)
    then outer DIT roll-stages."""
    n = x_re.shape[-1]
    stages = cos_ref.shape[0]  # log2 of the pow2 (sub-)transform extent
    inner = _MXU_INNER.bit_length() - 1  # 7
    wc = wc_ref[:]
    ws = ws_ref[:]
    if dif:
        for s in range(stages - 1, inner - 1, -1):
            x_re, x_im = _dif_stage(
                x_re, x_im,
                cos_ref[s, :][None, :], sin_ref[s, :][None, :],
                mask_ref[s, :][None, :], 1 << s, n,
            )
        x_re, x_im = _group_dft_matmul(x_re, x_im, wc, ws)
    else:
        x_re, x_im = _group_dft_matmul(x_re, x_im, wc, ws)
        for s in range(inner, stages):
            x_re, x_im = _dit_stage(
                x_re, x_im,
                cos_ref[s, :][None, :], sin_ref[s, :][None, :],
                mask_ref[s, :][None, :], 1 << s, n,
            )
    return x_re, x_im


def _resolve_engine(engine: str, n: int, ordering: str, q: int | None = None) -> str:
    """'mxu' needs revorder semantics and a pow2 (sub-)extent >= 128;
    silently fall back to the roll engine otherwise ('auto' = mxu when
    eligible). q: the pow2 tail of a mixed-radix n (defaults to n)."""
    if engine not in ("roll", "mxu", "auto"):
        raise ValueError(f"unknown FFT engine {engine!r}")
    if engine == "roll":
        return "roll"
    eligible = ordering == "revorder" and (q or n) >= _MXU_INNER
    if engine == "mxu" and not eligible:
        return "roll"
    return "mxu" if eligible else "roll"


def _engine_tables(n: int, inverse: bool, engine: str, radices: tuple = ()):
    """Numpy constant tables for the chosen engine, in the order
    _run_stages expects: (cos, sin, mask[, wc, ws][, xc, xs]). Callers
    append matching whole-array VMEM BlockSpecs with their grid's
    index-map arity. radices: mixed-radix cross-DFT levels — stage
    planes then cover only the pow2 tail q and the (L, n) cross twiddle
    planes ride at the tail of the list."""
    q = _mixed_q(n, radices) if radices else None
    cos_np, sin_np = _twiddle_planes_np(n, inverse, q)
    mask_np = _half_masks_np(n, q)
    arrays = [cos_np, sin_np, mask_np]
    if engine == "mxu":
        wc_np, ws_np = _dft_planes_np(_MXU_INNER, inverse)
        arrays += [wc_np, ws_np]
    if radices:
        xc_np, xs_np = _cross_planes_np(n, radices, inverse)
        arrays += [xc_np, xs_np]
    return arrays


def _run_stages(x_re, x_im, tbls, dif, radices=()):
    """Dispatch to the roll or MXU-hybrid engine on table arity:
    (cos, sin, mask) -> roll; (cos, sin, mask, wc, ws) -> hybrid.
    radices: the two trailing tables are the cross-DFT twiddle planes;
    forward (dif) runs the cross levels BEFORE the pow2-tail stages,
    inverse runs them AFTER — the mixed-radix generalization of the
    revorder DIF/DIT symmetry."""
    if radices:
        xc_ref, xs_ref = tbls[-2], tbls[-1]
        tbls = tbls[:-2]
        if dif:
            x_re, x_im = _mixed_cross_fwd(x_re, x_im, radices, xc_ref, xs_ref)
    if len(tbls) == 5:
        x_re, x_im = _fft_stages_mxu(x_re, x_im, *tbls, dif)
    else:
        x_re, x_im = _fft_stages(x_re, x_im, *tbls, dif)
    if radices and not dif:
        x_re, x_im = _mixed_cross_inv(x_re, x_im, radices, xc_ref, xs_ref)
    return x_re, x_im


def _load_f32(x):
    """Canonicalise a VMEM block load to float32 compute: uint8 ingest
    converts through the i32 hop (Mosaic has no direct u8<->f32 cast),
    bfloat16 staging planes (inter-kernel HBM traffic stored half-width,
    see models/pipeline.py stage_dtype) cast natively. float32 is
    returned untouched."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.int32).astype(jnp.float32) / jnp.float32(255.0)
    if x.dtype != jnp.float32:
        return x.astype(jnp.float32)
    return x


def _fft_kernel(
    re_ref, im_ref, tbl_refs, ore_ref, oim_ref, mm_ref=None, *, dif,
    radices=(),
):
    x_re = _load_f32(re_ref[:])
    # real_input mode passes im_ref=None: the zero imaginary plane is
    # synthesized in-register instead of being written to / read from HBM.
    x_im = jnp.zeros_like(x_re) if im_ref is None else _load_f32(im_ref[:])
    x_re, x_im = _run_stages(x_re, x_im, tbl_refs, dif, radices)
    ore_ref[:] = x_re
    # real_output mode passes oim_ref=None: callers that discard the
    # imaginary plane (the last inverse pass of a real restore) skip its
    # HBM write entirely.
    if oim_ref is not None:
        oim_ref[:] = x_im
    # emit_minmax: per-block [min_re, max_re, min_im, max_im] partials —
    # the outputs are already resident in VMEM, so the caller's min-max
    # normalize skips a full HBM re-read of the restored planes. The
    # partials array rides whole in VMEM (Mosaic rejects sub-(8,128)
    # grid-mapped blocks); each step stores its own row.
    if mm_ref is not None:
        vals = jnp.stack(
            [jnp.min(x_re), jnp.max(x_re), jnp.min(x_im), jnp.max(x_im)]
        ).reshape(1, 4)
        mm_ref[pl.dslice(pl.program_id(0), 1), :] = vals


def _dit_stage_sub(x_re, x_im, wc, ws, m, half, n):
    """DIT butterfly along the SUBLANE axis (axis 0): same math as
    _dit_stage with rolls on rows and (H, 1) column twiddles/masks."""
    p_re = pltpu.roll(x_re, n - half, axis=0)
    p_im = pltpu.roll(x_im, n - half, axis=0)
    q_re = pltpu.roll(x_re, half, axis=0)
    q_im = pltpu.roll(x_im, half, axis=0)
    wp_re = wc * p_re - ws * p_im
    wp_im = wc * p_im + ws * p_re
    wx_re = wc * x_re - ws * x_im
    wx_im = wc * x_im + ws * x_re
    x_re = m * (x_re + wp_re) + (1.0 - m) * (q_re - wx_re)
    x_im = m * (x_im + wp_im) + (1.0 - m) * (q_im - wx_im)
    return x_re, x_im


def _dif_stage_sub(x_re, x_im, wc, ws, m, half, n):
    """DIF stage along the sublane axis."""
    p_re = pltpu.roll(x_re, n - half, axis=0)
    p_im = pltpu.roll(x_im, n - half, axis=0)
    q_re = pltpu.roll(x_re, half, axis=0)
    q_im = pltpu.roll(x_im, half, axis=0)
    d_re = q_re - x_re
    d_im = q_im - x_im
    wd_re = wc * d_re - ws * d_im
    wd_im = wc * d_im + ws * d_re
    x_re = m * (x_re + p_re) + (1.0 - m) * wd_re
    x_im = m * (x_im + p_im) + (1.0 - m) * wd_im
    return x_re, x_im


def _fft_cols_kernel(re_ref, im_ref, cos_ref, sin_ref, mask_ref, ore_ref, oim_ref, *, dif):
    """Column FFT: transform along the sublane axis of an (H, C) block.
    Tables are stored TRANSPOSED — (H, S) with the stage index on lanes —
    so per-stage slices are (H, 1) columns in their natural layout (a
    (1, H) row slice would force a relayout)."""
    x_re = re_ref[:]
    x_im = im_ref[:]
    n = x_re.shape[0]
    stages = n.bit_length() - 1
    order = range(stages - 1, -1, -1) if dif else range(stages)
    stage_fn = _dif_stage_sub if dif else _dit_stage_sub
    for s in order:
        half = 1 << s
        wc = cos_ref[:, s : s + 1]
        ws = sin_ref[:, s : s + 1]
        m = mask_ref[:, s : s + 1]
        x_re, x_im = stage_fn(x_re, x_im, wc, ws, m, half, n)
    ore_ref[:] = x_re
    oim_ref[:] = x_im


def _fft_rows_transposed(
    re, im, inverse, block_rows, interpret, ordering, packed_planes=False,
    engine="roll", out_dtype=None, radices=(),
):
    """fft_rows_pallas with in-kernel transposed block writes:
    (..., M, N) -> (..., N, M). See fft_rows_pallas(transposed_output).

    out_dtype: storage dtype of the output planes (default float32).
    bfloat16 halves the kernel's HBM write traffic and the next kernel's
    read traffic; compute stays float32 (cast on store / after load).

    packed_planes=True: `re` is a single (2P, M, N) channel-major array
    whose even planes are the real parts and odd planes the imaginary
    parts (`im` must be None). The kernel reads the SAME array through
    two plane-index maps, so the strided pack slices (XLA copies, ~0.24
    ms/frame each at 2048^2) never materialize. Returns (re, im) of
    shape (P, N, M)."""
    if packed_planes:
        if im is not None:
            raise ValueError("packed_planes takes one interleaved array")
        if re.ndim != 3 or re.shape[0] % 2:
            raise ValueError(
                f"packed_planes needs (2P, M, N), got {re.shape}"
            )
        # NOTE measured negative result: an odd-plane-count variant
        # (clamped im index map + in-register zero for the phantom
        # plane) passed interpret-mode parity but crashes Mosaic on
        # hardware (FAILED_PRECONDITION) — index maps appear to need
        # affine forms of the grid ids. The caller's one-plane concat
        # (~0.13 ms at 2048^2x3) stays.
        orig_shape = re.shape[1:]  # (M, N) per plane
        n = re.shape[-1]
        m = re.shape[-2]
        p = re.shape[0] // 2
        lead = (p,)
        re3 = re
        im3 = None
        real_input = False
    else:
        orig_shape = re.shape
        n = orig_shape[-1]
        m = orig_shape[-2]
        lead = orig_shape[:-2]
        p = int(np.prod(lead)) if lead else 1
        real_input = im is None
        re3 = re.reshape(p, m, n)
        im3 = None if real_input else im.reshape(p, m, n)

    dif = ordering == "revorder" and not inverse
    if ordering == "natural":
        re3 = _bit_reverse_last_axis(re3)
        if im3 is not None:
            im3 = _bit_reverse_last_axis(im3)

    # ~12 live (rows, n) planes incl. the transposed staging copies.
    # The transposed OUT block's last dim is `rows`, so Mosaic needs
    # rows % 128 == 0 or a single block covering the (8-aligned) array;
    # ragged blocks crash its relayout (measured on 50-row PSF planes).
    interp = jax.default_backend() == "cpu" if interpret is None else interpret
    vmem_budget = 24 << 20
    live = 16 if radices else 12  # cross-DFT holds extra block accumulators
    max_rows = max(8, (vmem_budget // (n * 4 * live)) // 8 * 8)
    # rows become the transposed output's LANE dim: Mosaic requires the
    # stored slice 128-aligned, so blocks are 128-multiples (a ragged or
    # 8-aligned tail crashes its relayout — measured on 50-row PSFs).
    # The in-kernel transpose also needs n itself 128-aligned on
    # hardware (n=64 crashed under vmap).
    rows = min(block_rows, max_rows) // 128 * 128
    single = -(-m // 128) * 128
    if single <= max(rows, 128) and single <= max(max_rows, 128):
        rows = single  # one 128-aligned block covers the array
    if rows == 0 or (not interp and n % 128):
        # VMEM budget can't fit a 128-row transposed block, or the lane
        # length is not tile-aligned: fall back to the plain kernel +
        # an XLA transpose
        if packed_planes:
            # slice the ORIGINAL interleaved array (re3 may already be
            # bit-reversed above; the fallback call re-applies ordering)
            pk_re = re[0::2]
            pk_im = re[1::2]
            if pk_re.dtype == jnp.uint8:  # u8 ingest: convert outside
                pk_re = pk_re.astype(jnp.float32) / jnp.float32(255.0)
                pk_im = pk_im.astype(jnp.float32) / jnp.float32(255.0)
            r, i = fft_rows_pallas(
                pk_re, pk_im, inverse, block_rows, interpret, ordering,
                engine=engine, radices=radices,
            )
        else:
            r, i = fft_rows_pallas(
                re, im, inverse, block_rows, interpret, ordering,
                engine=engine, radices=radices,
            )
        if out_dtype is not None:
            r, i = r.astype(out_dtype), i.astype(out_dtype)
        return jnp.swapaxes(r, -1, -2), jnp.swapaxes(i, -1, -2)
    pad = (-m) % rows
    if pad:
        re3 = jnp.pad(re3, ((0, 0), (0, pad), (0, 0)))
        if im3 is not None:
            im3 = jnp.pad(im3, ((0, 0), (0, pad), (0, 0)))
    mt = re3.shape[1]

    engine = _resolve_engine(
        engine, n, ordering, _mixed_q(n, radices) if radices else None
    )
    tbl_arrays = _engine_tables(n, inverse, engine, radices)

    if packed_planes:
        # two views of the SAME interleaved array: even planes = re,
        # odd planes = im
        in_specs_data = [
            pl.BlockSpec(
                (1, rows, n), lambda pp, i: (2 * pp, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rows, n), lambda pp, i: (2 * pp + 1, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        operands = (re3, re3)
        n_ins = 2
    else:
        in_spec = pl.BlockSpec(
            (1, rows, n), lambda pp, i: (pp, i, 0), memory_space=pltpu.VMEM
        )
        n_ins = 1 if real_input else 2
        in_specs_data = [in_spec] * n_ins
        operands = (re3,) if real_input else (re3, im3)
    out_spec = pl.BlockSpec(
        (1, n, rows), lambda pp, i: (pp, 0, i), memory_space=pltpu.VMEM
    )
    tbl_specs = [
        pl.BlockSpec(a.shape, lambda pp, i: (0, 0), memory_space=pltpu.VMEM)
        for a in tbl_arrays
    ]

    odt = jnp.float32 if out_dtype is None else jnp.dtype(out_dtype)

    def body(*refs):
        ins, outs = refs[:-2], refs[-2:]
        # in-kernel uint8 ingest (i32 hop; the u8 planes stream straight
        # into VMEM and convert there, deleting the XLA convert fusion's
        # 50 MB f32 intermediate write + re-read per 2048² frame) and
        # bf16 staging loads both canonicalise here
        x_re = _load_f32(ins[0].at[0][:])
        x_im = (
            jnp.zeros_like(x_re) if real_input else _load_f32(ins[1].at[0][:])
        )
        tbls = ins[n_ins:]
        x_re, x_im = _run_stages(x_re, x_im, tbls, dif, radices)
        outs[0].at[0][:] = jnp.swapaxes(x_re, 0, 1).astype(odt)
        outs[1].at[0][:] = jnp.swapaxes(x_im, 0, 1).astype(odt)

    out_re, out_im = pl.pallas_call(
        body,
        grid=(p, mt // rows),
        in_specs=in_specs_data + tbl_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((p, n, mt), odt),
            jax.ShapeDtypeStruct((p, n, mt), odt),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=(
            jax.default_backend() == "cpu" if interpret is None else interpret
        ),
        name=f"fftr_rows_T_{'inv' if inverse else 'fwd'}",
    )(*operands, *[jnp.asarray(a) for a in tbl_arrays])

    if pad:
        out_re = out_re[..., :m]
        out_im = out_im[..., :m]
    return (
        out_re.reshape(lead + (n, m)),
        out_im.reshape(lead + (n, m)),
    )


def fft_rows_packed_out(
    re: jnp.ndarray,
    im: jnp.ndarray,
    inverse: bool = False,
    block_rows: int = 256,
    interpret: bool | None = None,
    ordering: str = "natural",
    emit_minmax: bool = False,
    engine: str = "roll",
    radices: tuple = (),
):
    """Row FFT of (P, M, N) SoA planes that writes ONE (2P, M, N) output
    with re at plane 2p and im at plane 2p+1 — i.e. the channel-unpack
    of a packed-pair restore happens in the output block specs instead
    of a separate XLA interleave copy. Optional (n_blocks, 4) min/max
    partials as in fft_rows_pallas(emit_minmax). radices: mixed-radix
    smooth lengths n = prod(radices) * 2^k (revorder only)."""
    if re.ndim != 3 or re.shape != im.shape:
        raise ValueError(f"need matching (P, M, N) planes, got {re.shape}")
    p, m, n = re.shape
    radices = tuple(radices)
    if radices:
        if ordering != "revorder":
            raise ValueError("mixed-radix (radices) requires revorder ordering")
        q = _mixed_q(n, radices)
    elif n & (n - 1):
        raise ValueError(f"power-of-two length required, got {n}")
    if ordering not in ("natural", "revorder"):
        raise ValueError(f"unknown ordering {ordering!r}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if radices and not interpret and q % 128:
        raise ValueError(
            f"mixed-radix pow2 tail {q} must be 128-aligned on hardware"
        )

    dif = ordering == "revorder" and not inverse
    if ordering == "natural":
        re = _bit_reverse_last_axis(re)
        im = _bit_reverse_last_axis(im)

    vmem_budget = 24 << 20
    live = 14 if radices else 10  # cross-DFT holds extra block accumulators
    max_rows = max(8, (vmem_budget // (n * 4 * live)) // 8 * 8)
    rows = min(block_rows, max_rows, m)
    if emit_minmax and rows & (rows - 1):
        rows = 1 << (rows.bit_length() - 1)
    if m % rows:
        raise ValueError(
            f"plane rows {m} must be a multiple of the block size {rows}"
        )
    bpp = m // rows  # blocks per plane

    engine = _resolve_engine(engine, n, ordering, q if radices else None)
    tbl_arrays = _engine_tables(n, inverse, engine, radices)

    in_spec = pl.BlockSpec(
        (1, rows, n), lambda pp, i: (pp, i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (2, rows, n), lambda pp, i: (pp, i, 0), memory_space=pltpu.VMEM
    )
    tbl_specs = [
        pl.BlockSpec(a.shape, lambda pp, i: (0, 0), memory_space=pltpu.VMEM)
        for a in tbl_arrays
    ]
    out_specs = [out_spec]
    out_shape = [jax.ShapeDtypeStruct((2 * p, m, n), jnp.float32)]
    n_blocks = p * bpp
    if emit_minmax:
        out_specs.append(
            pl.BlockSpec(
                (n_blocks, 4), lambda pp, i: (0, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((n_blocks, 4), jnp.float32))

    n_tbl = len(tbl_arrays)

    def body(*refs):
        re_ref, im_ref = refs[0], refs[1]
        tbls = refs[2 : 2 + n_tbl]
        o_ref = refs[2 + n_tbl]
        mm_ref = refs[3 + n_tbl] if emit_minmax else None
        x_re = _load_f32(re_ref.at[0][:])
        x_im = _load_f32(im_ref.at[0][:])
        x_re, x_im = _run_stages(x_re, x_im, tbls, dif, radices)
        o_ref.at[0][:] = x_re
        o_ref.at[1][:] = x_im
        if emit_minmax:
            pid = pl.program_id(0) * bpp + pl.program_id(1)
            vals = jnp.stack(
                [jnp.min(x_re), jnp.max(x_re), jnp.min(x_im), jnp.max(x_im)]
            ).reshape(1, 4)
            mm_ref[pl.dslice(pid, 1), :] = vals

    out = pl.pallas_call(
        body,
        grid=(p, bpp),
        in_specs=[in_spec, in_spec] + tbl_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
        name=f"fftr_rows_packed_{'inv' if inverse else 'fwd'}",
    )(re, im, *[jnp.asarray(a) for a in tbl_arrays])
    if emit_minmax:
        return out[0], out[1]
    return out[0]


def fft_cols_pallas(
    re: jnp.ndarray,
    im: jnp.ndarray,
    inverse: bool = False,
    block_cols: int = 256,
    interpret: bool | None = None,
    ordering: str = "natural",
) -> SoA:
    """1D DFT along axis -2 (the column axis) of (..., H, W) SoA planes,
    H a power of two. The transform axis sits on SUBLANES — combined
    with fft_rows_pallas this gives a fully transpose-free 2D FFT.
    Unscaled inverse; same ordering semantics as fft_rows_pallas."""
    orig_shape = re.shape
    h = orig_shape[-2]
    w = orig_shape[-1]
    if h & (h - 1):
        raise ValueError(f"fft_cols_pallas needs power-of-two height, got {h}")
    if ordering not in ("natural", "revorder"):
        raise ValueError(f"unknown ordering {ordering!r}")
    if h < 2:
        return re, im
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    lead = int(np.prod(orig_shape[:-2])) if len(orig_shape) > 2 else 1
    re3 = re.reshape(lead, h, w)
    im3 = im.reshape(lead, h, w)

    vmem_budget = 24 << 20
    # floor to a 64-lane multiple; 64 lanes (half a vreg) is the escape
    # hatch for very tall columns (e.g. H=4096).
    max_cols = max(64, (vmem_budget // (h * 4 * 10)) // 64 * 64)
    cols = min(block_cols, max_cols, max(w, 1))
    pad = (-w) % cols
    if pad:
        re3 = jnp.pad(re3, ((0, 0), (0, 0), (0, pad)))
        im3 = jnp.pad(im3, ((0, 0), (0, 0), (0, pad)))
    wt = re3.shape[-1]

    dif = ordering == "revorder" and not inverse
    if ordering == "natural":
        re3 = jnp.swapaxes(_bit_reverse_last_axis(jnp.swapaxes(re3, -1, -2)), -1, -2)
        im3 = jnp.swapaxes(_bit_reverse_last_axis(jnp.swapaxes(im3, -1, -2)), -1, -2)

    cos_np, sin_np = _twiddle_planes_np(h, inverse)
    mask_np = _half_masks_np(h)
    # transpose tables to (H, S): stage index on lanes
    cos_t = np.ascontiguousarray(cos_np.T)
    sin_t = np.ascontiguousarray(sin_np.T)
    mask_t = np.ascontiguousarray(mask_np.T)
    stages = cos_np.shape[0]

    grid = (lead, wt // cols)
    blk = pl.BlockSpec((1, h, cols), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM)
    tbl = pl.BlockSpec((h, stages), lambda b, j: (0, 0), memory_space=pltpu.VMEM)

    def kernel(re_ref, im_ref, c_ref, s_ref, m_ref, ore_ref, oim_ref):
        _fft_cols_kernel(
            re_ref.at[0], im_ref.at[0], c_ref, s_ref, m_ref,
            ore_ref.at[0], oim_ref.at[0], dif=dif,
        )

    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk, blk, tbl, tbl, tbl],
        out_specs=[blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((lead, h, wt), jnp.float32),
            jax.ShapeDtypeStruct((lead, h, wt), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
        name=f"fftr_cols_{'inv' if inverse else 'fwd'}",
    )(re3, im3, jnp.asarray(cos_t), jnp.asarray(sin_t), jnp.asarray(mask_t))

    if pad:
        out_re = out_re[..., :w]
        out_im = out_im[..., :w]
    return out_re.reshape(orig_shape), out_im.reshape(orig_shape)


def fft_rows_pallas(
    re: jnp.ndarray,
    im: jnp.ndarray,
    inverse: bool = False,
    block_rows: int = 256,
    interpret: bool | None = None,
    ordering: str = "natural",
    real_output: bool = False,
    emit_minmax: bool = False,
    transposed_output: bool = False,
    packed_planes: bool = False,
    engine: str = "roll",
    out_dtype=None,
    radices: tuple = (),
):
    """1D DFT over the last axis of (..., N) SoA planes, N a power of two
    >= 2 — or, with `radices`, a smooth N = prod(radices) * 2^k (each
    radix an odd >= 3; revorder ordering only, pow2 tail 128-aligned on
    hardware). Mixed-radix runs the cross-block DFT levels
    (_mixed_cross_fwd/_mixed_cross_inv) around the pow2-tail stages: the
    reference's only non-pow2 path is the O(N^2) naive DFT
    (fft_serial.cpp:71-87); this keeps smooth sizes at O(N log N) with
    all stages in VMEM, cutting pad waste from up to 2x to <= 25%
    (utils/padding.py next_smooth_size). Unscaled inverse. Rows are
    tiled over the grid; each tile runs every butterfly stage in VMEM.

    emit_minmax=True additionally returns an (n_blocks, 4) float32 array
    of per-row-block [min_re, max_re, min_im, max_im] partials (computed
    while the outputs are VMEM-resident), and requires the flattened row
    count to be an exact multiple of the block size. Return becomes
    (re, im, partials).

    transposed_output=True writes (..., M, N) inputs as (..., N, M)
    outputs — the transpose happens on the VMEM-resident block inside
    the kernel instead of as a separate XLA HBM round trip (measured
    11% faster than kernel + XLA transpose, bitwise identical;
    tools/perf_ab.py twrite). Requires ndim >= 2; not combinable with
    real_output/emit_minmax.

    im may be None (real input): the zero imaginary plane is synthesized
    in-register, saving its HBM write + read entirely.

    real_output=True skips the imaginary plane's HBM write and returns
    None for it — for the LAST inverse pass of a real-signal restore,
    where the caller keeps only the real part (postprocess_kernel in the
    CUDA reference likewise extracts real only, fft_gpu.cu:187-201).

    ordering:
      * 'natural'  — natural-order in AND out: DIT stages preceded by an
        XLA bit-reversal transpose pass.
      * 'revorder' — the fast-convolution trick: forward runs DIF
        (natural in, bit-reversed out) and inverse runs DIT assuming
        bit-reversed input (natural out), with NO bit-reversal pass at
        all. Elementwise frequency-domain filters (Wiener) are
        order-agnostic, so fwd(revorder) -> filter -> inv(revorder)
        computes the exact same restoration while skipping 2 full-array
        permutation passes per transform round trip.
    """
    orig_shape = re.shape
    n = orig_shape[-1]
    radices = tuple(radices)
    if radices:
        if ordering != "revorder":
            raise ValueError("mixed-radix (radices) requires revorder ordering")
        q = _mixed_q(n, radices)
    elif n & (n - 1):
        raise ValueError(f"fft_rows_pallas needs power-of-two length, got {n}")
    if ordering not in ("natural", "revorder"):
        raise ValueError(f"unknown ordering {ordering!r}")
    if n < 2:
        if real_output:
            return re, None
        return re, (jnp.zeros_like(re) if im is None else im)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if radices and not interpret and q % 128:
        raise ValueError(
            f"mixed-radix pow2 tail {q} must be 128-aligned on hardware"
        )

    real_input = im is None
    if packed_planes and not transposed_output:
        raise ValueError("packed_planes requires transposed_output")
    if out_dtype is not None and not transposed_output:
        raise ValueError(
            "out_dtype (bf16 staging) is only supported with "
            "transposed_output — the staged boundaries of the fused "
            "pipeline (models/pipeline.py stage_dtype)"
        )
    if transposed_output:
        if real_output or emit_minmax:
            raise ValueError(
                "transposed_output is not combinable with "
                "real_output/emit_minmax"
            )
        if len(orig_shape) < 2:
            raise ValueError("transposed_output needs ndim >= 2")
        return _fft_rows_transposed(
            re, im, inverse, block_rows, interpret, ordering,
            packed_planes=packed_planes, engine=engine, out_dtype=out_dtype,
            radices=radices,
        )
    batch = int(np.prod(orig_shape[:-1])) if len(orig_shape) > 1 else 1
    re2 = re.reshape(batch, n)
    im2 = None if real_input else im.reshape(batch, n)

    # Size the row block to the VMEM budget: ~10 live (rows, n) f32
    # planes (x/p/q/w-products for re+im) + the twiddle/mask tables.
    # The default 16MB scoped-VMEM limit is raised via CompilerParams
    # below (v5e has headroom); size blocks against a 24MB working set.
    vmem_budget = 24 << 20
    live = 14 if radices else 10  # cross-DFT holds extra block accumulators
    max_rows = max(8, (vmem_budget // (n * 4 * live)) // 8 * 8)
    rows = min(block_rows, max_rows, max(batch, 1))
    if emit_minmax and rows & (rows - 1):
        # snap to a power of two so pow2 plane heights always tile
        # cleanly (emit_minmax forbids row padding)
        rows = 1 << (rows.bit_length() - 1)
    pad = (-batch) % rows
    if pad:
        re2 = jnp.pad(re2, ((0, pad), (0, 0)))
        if im2 is not None:
            im2 = jnp.pad(im2, ((0, pad), (0, 0)))
    total = re2.shape[0]

    # 'natural': permute input to bit-reversed order, then DIT.
    # 'revorder' forward: DIF, no permutation (output bit-reversed).
    # 'revorder' inverse: DIT, no permutation (input bit-reversed).
    dif = ordering == "revorder" and not inverse
    if ordering == "natural":
        re2 = _bit_reverse_last_axis(re2)
        if im2 is not None:
            im2 = _bit_reverse_last_axis(im2)

    engine = _resolve_engine(engine, n, ordering, q if radices else None)
    tbl_arrays = _engine_tables(n, inverse, engine, radices)

    import functools as _ft

    grid = (total // rows,)
    row_spec = pl.BlockSpec(
        (rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tbl_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in tbl_arrays
    ]
    kernel = _ft.partial(_fft_kernel, dif=dif, radices=radices)
    if real_input:
        in_specs = [row_spec] + tbl_specs
        operands = (re2,)
    else:
        in_specs = [row_spec, row_spec] + tbl_specs
        operands = (re2, im2)

    if real_output:
        out_specs = [row_spec]
        out_shape = [jax.ShapeDtypeStruct((total, n), jnp.float32)]
    else:
        out_specs = [row_spec, row_spec]
        out_shape = [
            jax.ShapeDtypeStruct((total, n), jnp.float32),
            jax.ShapeDtypeStruct((total, n), jnp.float32),
        ]
    if emit_minmax:
        if real_output:
            raise ValueError("emit_minmax requires both output planes")
        if pad:
            raise ValueError(
                "emit_minmax needs row count divisible by the block size "
                f"(batch {batch}, block {rows})"
            )
        n_blocks = total // rows
        out_specs.append(
            pl.BlockSpec(
                (n_blocks, 4), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((n_blocks, 4), jnp.float32))

    def body(*refs):
        ins, outs = refs[: len(in_specs)], refs[len(in_specs) :]
        re_ref = ins[0]
        im_ref = None if real_input else ins[1]
        tbls = ins[1:] if real_input else ins[2:]
        ore_ref = outs[0]
        oim_ref = None if real_output else outs[1]
        mm_ref = outs[2] if emit_minmax else None
        kernel(re_ref, im_ref, tbls, ore_ref, oim_ref, mm_ref)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
        name=f"fftr_rows_{'inv' if inverse else 'fwd'}",
    )(*operands, *[jnp.asarray(a) for a in tbl_arrays])
    out_re = out[0]
    out_im = None if real_output else out[1]

    if pad:
        out_re = out_re[:batch]
        out_im = None if out_im is None else out_im[:batch]
    out_re = out_re.reshape(orig_shape)
    out_im = None if out_im is None else out_im.reshape(orig_shape)
    if emit_minmax:
        return out_re, out_im, out[2]
    return out_re, out_im
