"""Hand-built FFTs for TPU, expressed as XLA-friendly jnp graphs.

The reference hand-writes its FFT in every mode rather than calling
cuFFT/FFTW (SURVEY.md intro; /root/reference/fft/fft_serial.cpp:40-68 is
the scalar radix-2 core, fft_gpu.cu:108-148 the CUDA one). This module is
the TPU counterpart — the same transform re-designed for XLA/MXU rather
than translated.

Layout: **SoA (structure-of-arrays), split re/im float32 planes.** The
TPU backend here exposes no complex dtype (and Pallas never has one), so
every function takes and returns a `(re, im)` pair. This is the same
choice the reference's AVX2 mode makes (fft_simd.cpp:14-26 SoA planes for
8-wide vector butterflies) — on TPU the planes map straight onto (8,128)
vregs and MXU operands.

backends
--------
* ``radix2``  — iterative radix-2 Cooley-Tukey: bit-reversal realized as a
  log2(n)-dim reshape + axis-reversal transpose (pure data movement, no
  gather), then log2(n) vectorized butterfly stages over contiguous
  reshapes. Twiddles are exact float64-computed tables baked into the
  graph as float32 constants (the GPU reference also uses tables,
  fft_gpu.cu:206-212, unlike the CPU modes' drifting recurrence).
* ``matmul``  — Bailey four-step FFT: n = n1*n2, small DFT matrices
  applied on the MXU (4 real einsums per complex matmul), twiddle
  elementwise in between. O(n*(n1+n2)) FLOPs, but it trades the radix2
  backend's log2(n) full-array passes (HBM-bandwidth bound) for a
  constant number of MXU passes.
* ``naive``   — O(n^2) DFT-matrix matmul for arbitrary (non pow-2) n;
  counterpart of dft_naive_inplace (fft_serial.cpp:71-87), but as a
  single MXU matmul instead of a scalar loop.
* ``xla``     — jnp.fft (XLA's built-in) behind an SoA shim. Complex is
  unimplemented on the axon TPU backend, so this backend is CPU-only;
  kept as a cross-check the way the reference keeps the cv::dft
  prototype (others/fft_image_restoration_opencv.cpp).

All backends operate over the LAST axis of float32 `(re, im)` arrays of
any equal leading batch shape, forward or inverse, and apply NO scaling
on the inverse (fft_serial.cpp:67) — callers scale explicitly.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from fft_restoration_tpu.utils.padding import is_power_of_two

FFT_BACKENDS = ("radix2", "matmul", "naive", "xla", "pallas")

_HIGHEST = jax.lax.Precision.HIGHEST

SoA = Tuple[jnp.ndarray, jnp.ndarray]


# ---------------------------------------------------------------------------
# twiddle / DFT-matrix tables (host-side float64, cast once to float32)


@functools.lru_cache(maxsize=None)
def _stage_twiddle_np(length: int, inverse: bool) -> tuple:
    """Exact twiddles (cos, sin) for w^k, k < length/2, one radix-2 stage."""
    sign = 1.0 if inverse else -1.0
    k = np.arange(length // 2, dtype=np.float64)
    ang = sign * 2.0 * math.pi * k / length
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_matrix_np(n: int, inverse: bool) -> tuple:
    """Dense DFT matrix W[k,t] = exp(sign*2pi*i*k*t/n) as (re, im) f32."""
    sign = 1.0 if inverse else -1.0
    k = np.arange(n, dtype=np.float64)
    ang = sign * 2.0 * math.pi * np.outer(k, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _four_step_twiddle_np(n1: int, n2: int, inverse: bool) -> tuple:
    """T[k1, j2] = exp(sign*2pi*i*k1*j2/(n1*n2)) as (re, im) f32."""
    n = n1 * n2
    sign = 1.0 if inverse else -1.0
    k1 = np.arange(n1, dtype=np.float64)
    j2 = np.arange(n2, dtype=np.float64)
    ang = sign * 2.0 * math.pi * np.outer(k1, j2) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _split_factors(n: int) -> tuple:
    """n = n1 * n2, as square as possible (minimal n1 + n2), for ANY
    composite n — the four-step works for every factorization, not just
    pow2 ones. Returns (n, 1) when n is prime (caller falls back to the
    naive DFT matmul). For pow2 n this reproduces the balanced pow2
    split; for smooth sizes (utils/padding.py next_smooth_size) it finds
    e.g. 3840 = 64*60 — both factors MXU-friendly."""
    best = (n, 1)
    d = int(math.isqrt(n))
    while d >= 2:
        if n % d == 0:
            best = (n // d, d)
            break
        d -= 1
    return best


# ---------------------------------------------------------------------------
# backends


def _bit_reverse_last_axis(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-reversal permutation of the last axis via reshape + transpose.

    Equivalent to the swap loop at fft_serial.cpp:45-51 but expressed as
    pure data movement XLA lowers to one transpose copy (no gather).
    """
    n = x.shape[-1]
    m = n.bit_length() - 1
    lead = x.shape[:-1]
    y = x.reshape(lead + (2,) * m)
    axes = tuple(range(len(lead))) + tuple(
        len(lead) + m - 1 - i for i in range(m)
    )
    return y.transpose(axes).reshape(lead + (n,))


def _fft_radix2(re: jnp.ndarray, im: jnp.ndarray, inverse: bool) -> SoA:
    n = re.shape[-1]
    if n <= 1:
        return re, im
    lead = re.shape[:-1]
    re = _bit_reverse_last_axis(re)
    im = _bit_reverse_last_axis(im)
    length = 2
    while length <= n:
        half = length // 2
        wr_np, wi_np = _stage_twiddle_np(length, inverse)
        wr = jnp.asarray(wr_np)
        wi = jnp.asarray(wi_np)
        br = re.reshape(lead + (n // length, length))
        bi = im.reshape(lead + (n // length, length))
        ur, ui = br[..., :half], bi[..., :half]
        vr, vi = br[..., half:], bi[..., half:]
        # v * w, complex: (vr + i vi)(wr + i wi)
        tr = vr * wr - vi * wi
        ti = vr * wi + vi * wr
        re = jnp.concatenate([ur + tr, ur - tr], axis=-1).reshape(lead + (n,))
        im = jnp.concatenate([ui + ti, ui - ti], axis=-1).reshape(lead + (n,))
        length <<= 1
    return re, im


def _cmatmul_last(re, im, fr, fi):
    """(re + i im) @ (fr + i fi)^T over the last axis: out[..,k] =
    sum_t x[..,t] * F[k,t]. Four real MXU einsums."""
    rr = jnp.einsum("...t,kt->...k", re, fr, precision=_HIGHEST)
    ii = jnp.einsum("...t,kt->...k", im, fi, precision=_HIGHEST)
    ri = jnp.einsum("...t,kt->...k", re, fi, precision=_HIGHEST)
    ir = jnp.einsum("...t,kt->...k", im, fr, precision=_HIGHEST)
    return rr - ii, ri + ir


def _fft_naive(re: jnp.ndarray, im: jnp.ndarray, inverse: bool) -> SoA:
    n = re.shape[-1]
    if n <= 1:
        return re, im
    fr_np, fi_np = _dft_matrix_np(n, inverse)
    return _cmatmul_last(re, im, jnp.asarray(fr_np), jnp.asarray(fi_np))


def _fft_matmul(re: jnp.ndarray, im: jnp.ndarray, inverse: bool) -> SoA:
    """Bailey four-step FFT over the last axis (any composite n).

    x[j1*n2 + j2] -> X[k1 + n1*k2]:
      A = F_{n1} applied over j1         (MXU)
      B = A * T[k1, j2]                  (VPU)
      C = F_{n2} applied over j2         (MXU)
      X = transpose(C) flattened         (data movement)

    Prime n (no split) falls back to the dense DFT matmul.
    """
    n = re.shape[-1]
    if n <= 4:
        return _fft_naive(re, im, inverse)
    n1, n2 = _split_factors(n)
    if n2 == 1:  # prime length: no four-step split exists
        return _fft_naive(re, im, inverse)
    lead = re.shape[:-1]
    ar = re.reshape(lead + (n1, n2))
    ai = im.reshape(lead + (n1, n2))
    f1r_np, f1i_np = _dft_matrix_np(n1, inverse)
    f2r_np, f2i_np = _dft_matrix_np(n2, inverse)
    tr_np, ti_np = _four_step_twiddle_np(n1, n2, inverse)
    f1r, f1i = jnp.asarray(f1r_np), jnp.asarray(f1i_np)
    f2r, f2i = jnp.asarray(f2r_np), jnp.asarray(f2i_np)
    tr, ti = jnp.asarray(tr_np), jnp.asarray(ti_np)

    # F_{n1} over the j1 axis: contract (k,j) with a[..., j, t].
    def cm_first(ar, ai):
        rr = jnp.einsum("kj,...jt->...kt", f1r, ar, precision=_HIGHEST)
        ii = jnp.einsum("kj,...jt->...kt", f1i, ai, precision=_HIGHEST)
        ri = jnp.einsum("kj,...jt->...kt", f1i, ar, precision=_HIGHEST)
        ir = jnp.einsum("kj,...jt->...kt", f1r, ai, precision=_HIGHEST)
        return rr - ii, ri + ir

    ar, ai = cm_first(ar, ai)
    ar, ai = ar * tr - ai * ti, ar * ti + ai * tr
    ar, ai = _cmatmul_last(ar, ai, f2r, f2i)
    ar = jnp.swapaxes(ar, -1, -2)
    ai = jnp.swapaxes(ai, -1, -2)
    return ar.reshape(lead + (n,)), ai.reshape(lead + (n,))


def _fft_xla(re: jnp.ndarray, im: jnp.ndarray, inverse: bool) -> SoA:
    if jax.default_backend() == "axon":
        # fail with intent instead of a compile-time UNIMPLEMENTED: this
        # TPU backend has no complex dtype at all (ops/fft.py docstring)
        raise ValueError(
            "fft backend 'xla' (jnp.fft) needs complex support, which "
            "this TPU backend lacks — use 'pallas' or 'matmul'; 'xla' is "
            "the CPU cross-check backend"
        )
    x = jax.lax.complex(re, im)
    if inverse:
        n = re.shape[-1]
        y = jnp.fft.ifft(x, axis=-1) * n  # undo jnp's 1/n to stay unscaled
    else:
        y = jnp.fft.fft(x, axis=-1)
    return jnp.real(y).astype(jnp.float32), jnp.imag(y).astype(jnp.float32)


def _fft_pallas(re: jnp.ndarray, im: jnp.ndarray, inverse: bool) -> SoA:
    from fft_restoration_tpu.ops.pallas.fft_kernel import fft_rows_pallas

    return fft_rows_pallas(re, im, inverse, ordering="natural")


_BACKEND_FNS = {
    "radix2": _fft_radix2,
    "matmul": _fft_matmul,
    "naive": _fft_naive,
    "xla": _fft_xla,
    "pallas": _fft_pallas,
}


def fft1d(re, im, inverse: bool = False, backend: str = "radix2") -> SoA:
    """1D DFT over the last axis of float32 (re, im) planes, unscaled inverse.

    Non-power-of-two lengths: 'matmul' runs its four-step on any
    composite n (naive DFT matmul only for primes); 'radix2' and
    'pallas' fall back to the naive DFT matmul, mirroring
    transform_row_inplace's pow2 check (fft_serial.cpp:100-101) — the
    pallas kernels' non-pow2 support (mixed-radix smooth sizes) is a
    pipeline-level fast path (fft_kernel.py radices=), not part of this
    generic natural-order API.
    """
    re = jnp.asarray(re, jnp.float32)
    im = jnp.asarray(im, jnp.float32)
    if re.shape != im.shape:
        raise ValueError(f"re/im shape mismatch: {re.shape} vs {im.shape}")
    n = re.shape[-1]
    if backend not in _BACKEND_FNS:
        raise ValueError(f"unknown fft backend {backend!r}; one of {FFT_BACKENDS}")
    if backend in ("radix2", "pallas") and not is_power_of_two(n):
        return _fft_naive(re, im, inverse)
    return _BACKEND_FNS[backend](re, im, inverse)


def fft2d(re, im, inverse: bool = False, backend: str = "radix2") -> SoA:
    """2D separable DFT over the last two axes, unscaled inverse.

    Row pass -> transpose -> row pass -> transpose back, the same
    decomposition as my_dft2D (fft_serial.cpp:113-139) and the CUDA
    pipeline (fft_gpu.cu:214-240). On TPU the transposes are XLA layout
    copies fused into the surrounding stages.
    """
    re, im = fft1d(re, im, inverse, backend)
    re = jnp.swapaxes(re, -1, -2)
    im = jnp.swapaxes(im, -1, -2)
    re, im = fft1d(re, im, inverse, backend)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)
