"""Fused post-processing pallas kernels: Lab white balance + uint8 encode.

The reference's display path converts the restored image BGR->Lab,
scales L by mean(L_orig)/mean(L_deblur), converts back and packs uint8
(utils.hpp:55-71, serial.cpp:43-54). Under XLA this lowers to a chain
of fusions that materializes a full f32 planes_bgr intermediate between
the Lab->BGR math and the uint8 converts (measured 0.36 ms of the
0.76 ms post-process segment at 2048²x3, device trace in docs/PERF.md),
plus two transcendental-heavy mean passes (0.29 ms).

These kernels collapse the segment to its two irreducible passes (the
gain is a global mean, so one reduction pass must finish before the
scale applies):

  1. `lab_l_sum_partials` — ONE read of the restored planes and the
     original planes computing BOTH Lab-L partial sums (per-row-block
     partials; the caller finishes the means and the gain scalar).
  2. `wb_encode_u8` — ONE read of the restored planes applying
     BGR->Lab, the L gain, Lab->BGR and the uint8 convert, writing
     (3, H, W) uint8 planes directly (no f32 intermediate ever touches
     HBM; XLA interleaves the planes to (H, W, 3) in a cheap u8 pass).

Zero-padding trick: sRGB(0)=0 -> Y=0 -> L=903.3*0=0, so rows/cols
padded with zeros contribute nothing to the L sums — ragged shapes pad
to block geometry with no masking, and the caller divides by the true
pixel count. Color math is copied expression-for-expression from
ops/color.py's planar functions (exact cv2-parity formulas), with every
power lowered as exp2(log2(x)*p): Mosaic has no cbrt, and its exp/log
cost ~2-3x the native base-2 unit (measured, docs/PERF.md round 3).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_restoration_tpu.oracle.color import _D65, _SRGB2XYZ_N, _XYZ2SRGB

_T0 = 0.008856
_CBRT_A = 7.787
_CBRT_B = 16.0 / 116.0


# All powers go through exp2/log2: Mosaic's exp/log lowering costs
# ~2-3x the native base-2 unit (measured 2048²x3 device A/B: partials
# 0.362 -> 0.166 ms, encode 0.501 -> 0.314 ms just from this swap —
# docs/PERF.md round 3). exp2(log2(x)*p) == exp(log(x)*p) to ~1 ulp.


def _pow_pos(x, p):
    return jnp.exp2(jnp.log2(jnp.maximum(x, 1e-30)) * p)


def _srgb_to_linear(x):
    return jnp.where(
        x <= 0.04045, x / 12.92, _pow_pos((x + 0.055) / 1.055, 2.4)
    )


def _linear_to_srgb(x):
    x = jnp.maximum(x, 0.0)
    return jnp.where(
        x <= 0.0031308, 12.92 * x, 1.055 * _pow_pos(x, 1.0 / 2.4) - 0.055
    )


def _f_cbrt(t):
    return jnp.where(
        t > _T0, _pow_pos(t, 1.0 / 3.0), _CBRT_A * t + _CBRT_B
    )


# uint8/bf16 block-load canonicalisation is shared with the FFT kernels:
# ONE place owns the "no direct u8<->f32 cast, hop through i32; bf16
# staging casts natively" Mosaic ingest rule.
from fft_restoration_tpu.ops.pallas.fft_kernel import _load_f32 as _to_f32


# --- transcendental-free color math (the ops/color.py *_fast forms,
# Mosaic-adapted). MEASURED NEGATIVE RESULT (docs/PERF.md round 3):
# in-kernel on hardware these polynomial/Newton forms benched SLOWER
# than the transcendentals (partials 0.503 vs 0.362 ms, encode 0.789
# vs 0.501 at block 64, before the exp2 swap made the gap bigger) —
# the VPU's native exp2/log2 unit beats long FMA chains here just as
# it did under XLA in round 2. Kept behind `fast=True` with parity
# tests as the recorded experiment. The rcbrt seed's i//3 uses a float
# multiply instead of integer division (no i32 div in Mosaic): the
# <=128-ulp seed slop is 2^-16 relative, absorbed by the Newton steps.

_U04_LO, _U04_HI = 0.0905, 1.0


def _fit_u04():
    u = np.linspace(_U04_LO, _U04_HI, 4096)
    t = (2.0 * u - (_U04_LO + _U04_HI)) / (_U04_HI - _U04_LO)
    return np.polyfit(t, u**0.4, 10).astype(np.float32)


_U04_COEF = _fit_u04()


def _rcbrt_fast(x):
    """x^(-1/3) for x > 0: exponent bit trick + 3 Newton steps."""
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    third = (i.astype(jnp.float32) * (1.0 / 3.0)).astype(jnp.int32)
    r = jax.lax.bitcast_convert_type(
        jnp.int32(0x54A21D2A) - third, jnp.float32
    )
    for _ in range(3):
        r = r * (4.0 - x * r * r * r) * (1.0 / 3.0)
    return r


def _srgb_to_linear_fast(x):
    u = (x + 0.055) * (1.0 / 1.055)
    t = (2.0 * u - (_U04_LO + _U04_HI)) * (1.0 / (_U04_HI - _U04_LO))
    poly = jnp.full_like(t, float(_U04_COEF[0]))
    for c in _U04_COEF[1:]:
        poly = poly * t + float(c)
    return jnp.where(x <= 0.04045, x * (1.0 / 12.92), u * u * poly)


def _linear_to_srgb_fast(x):
    x = jnp.maximum(x, 0.0)
    xs = jnp.maximum(x, 1e-30)
    # x^(5/12) = sqrt(x) * sqrt(sqrt(rcbrt(x)))
    p = jnp.sqrt(xs) * jnp.sqrt(jnp.sqrt(_rcbrt_fast(xs)))
    return jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * p - 0.055)


def _cbrt_fast(x):
    xs = jnp.maximum(x, 1e-30)
    r = _rcbrt_fast(xs)
    return xs * r * r


def _f_cbrt_fast(t):
    return jnp.where(t > _T0, _cbrt_fast(t), _CBRT_A * t + _CBRT_B)


def _lab_from_bgr_block(b, g, r, fast=False):
    """(rows, W) BGR blocks in [0,1] -> (L, a, b) blocks. Expression-
    for-expression the math of ops/color.py:bgr_to_lab_planar (exact)
    or its *_fast forms (transcendental-free)."""
    to_lin = _srgb_to_linear_fast if fast else _srgb_to_linear
    fc = _f_cbrt_fast if fast else _f_cbrt
    m = np.asarray(_SRGB2XYZ_N, np.float32)
    lb = to_lin(jnp.clip(b, 0.0, 1.0))
    lg = to_lin(jnp.clip(g, 0.0, 1.0))
    lr = to_lin(jnp.clip(r, 0.0, 1.0))
    tx = m[0, 2] * lb + m[0, 1] * lg + m[0, 0] * lr
    ty = m[1, 2] * lb + m[1, 1] * lg + m[1, 0] * lr
    tz = m[2, 2] * lb + m[2, 1] * lg + m[2, 0] * lr
    fx, fy, fz = fc(tx), fc(ty), fc(tz)
    L = jnp.where(ty > _T0, 116.0 * fy - 16.0, 903.3 * ty)
    return L, 500.0 * (fx - fy), 200.0 * (fy - fz)


def _l_from_bgr_block(b, g, r, fast=False):
    """Lab L only (ops/color.py:luminance_l_planar)."""
    to_lin = _srgb_to_linear_fast if fast else _srgb_to_linear
    fc = _f_cbrt_fast if fast else _f_cbrt
    m = np.asarray(_SRGB2XYZ_N, np.float32)
    lb = to_lin(jnp.clip(b, 0.0, 1.0))
    lg = to_lin(jnp.clip(g, 0.0, 1.0))
    lr = to_lin(jnp.clip(r, 0.0, 1.0))
    y = m[1, 2] * lb + m[1, 1] * lg + m[1, 0] * lr
    fy = fc(y)
    return jnp.where(y > _T0, 116.0 * fy - 16.0, 903.3 * y)


def _bgr_from_lab_block(L, a, b, fast=False):
    """(L, a, b) blocks -> (b, g, r) blocks in [0,1]
    (ops/color.py:lab_to_bgr_planar)."""
    to_srgb = _linear_to_srgb_fast if fast else _linear_to_srgb
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def _inv_f(f):
        f3 = f * f * f
        return jnp.where(f3 > _T0, f3, (f - _CBRT_B) / _CBRT_A)

    d65 = np.asarray(_D65, np.float32)
    x = _inv_f(fx) * d65[0]
    y = _inv_f(fy) * d65[1]
    z = _inv_f(fz) * d65[2]
    m = np.asarray(_XYZ2SRGB, np.float32)
    lr = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z
    lg = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z
    lb = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z
    return tuple(
        jnp.clip(to_srgb(v), 0.0, 1.0) for v in (lb, lg, lr)
    )


def _pad_planes(x, rows):
    """Zero-pad (3, H, W) planes to (3, ceil(H/rows)*rows, ceil(W/128)*128)."""
    h, w = x.shape[-2:]
    ph = (-h) % rows
    pw = (-w) % 128
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw)))
    return x


def _block_geometry(h, w, block_rows):
    """Row-block size: 8-aligned, VMEM-bounded (~12 live (rows, W) f32
    blocks across the two kernels' inputs/outputs/temporaries)."""
    wp = -(-w // 128) * 128
    budget = 24 << 20
    max_rows = max(8, (budget // (wp * 4 * 12)) // 8 * 8)
    rows = min(block_rows, max_rows) // 8 * 8
    rows = max(rows, 8)
    hp = -(-h // rows) * rows
    return rows, hp, wp


def effective_wb_stride(h_live: int, stride: int) -> int:
    """Clamp the WB-stats stride so at least ~8 8-row stripes intersect
    the LIVE image: below 64*stride live rows the sampling error on the
    gain outgrows its ~0.1-count budget (small frames' stats pass is
    cheap anyway), so fall back to exact means. Pass the live row count,
    not the padded extent — a 129-row frame padded to 256 still has
    only ~5 live stripes at stride 4."""
    return stride if stride > 1 and h_live >= 64 * stride else 1


def sampled_live_pixels(
    h0: int, w0: int, live_hw=None, block_rows: int = 64, stride: int = 1
) -> int:
    """Static pixel count the strided partials actually sum over (the
    caller's mean denominator). stride=1 -> full live h*w."""
    h, w = live_hw if live_hw is not None else (h0, w0)
    rows, hp, _ = _block_geometry(h0, w0, block_rows)
    n_blocks = hp // rows
    return sum(
        max(0, min(h - j * rows, rows))
        for j in range(0, n_blocks, stride)
    ) * w


def lab_l_sum_partials(
    restored: jnp.ndarray,
    orig: jnp.ndarray,
    interpret: bool | None = None,
    block_rows: int = 64,
    fast: bool = False,
    norm=None,
    live_hw=None,
    stride: int = 1,
):
    """Partial Lab-L sums of the restored and original images in one
    HBM pass each.

    restored: (C>=3, H0, W0) float32 BGR planes in [0,1] (normalized),
              OR raw inverse-FFT planes with norm=(lo, scale)
              per-channel (3,) arrays — the min-max normalize then
              fuses into the kernel and the raw planes never
              materialize normalized. Only the first 3 planes are read
              (block specs skip a packed path's phantom 4th plane with
              no slice copy), and with live_hw=(h, w) only that
              top-left extent contributes (the pipeline passes its
              power-of-two padded planes uncropped).
    orig:     (3, h, w) uint8 or float32 BGR planes (the unpadded
              original frame; uint8 converts in VMEM).
    Returns (n_blocks, 4) float32 partials (the emit-minmax geometry,
    proven on hardware): column 0 = restored-L block sums, column 1 =
    original-L block sums. The caller sums the columns and divides by
    h*w (stride=1) or sampled_live_pixels(...) (stride>1).

    stride: sample every stride-th row block. The white-balance gain is
    a RATIO of two means over the SAME pixels, so equal subsampling
    leaves it unbiased; for stride s the pass reads and transforms 1/s
    of the planes. Statistical cost: the gain moves by the sampled-mean
    error of Lab-L (relative ~sigma_L/(mean_L*sqrt(n_px/s))), well under
    one uint8 count at >=1 MP frames with s=4 (tests/test_postproc.py
    bounds it at 1 count on 2048-row frames).
    """
    if restored.ndim != 3 or restored.shape[0] < 3:
        raise ValueError(f"need (C>=3, H, W) planes, got {restored.shape}")
    h0, w0 = restored.shape[-2:]
    h, w = live_hw if live_hw is not None else (h0, w0)
    if orig.shape != (3, h, w):
        raise ValueError(f"orig must be (3, {h}, {w}), got {orig.shape}")
    rows, hp, wp = _block_geometry(h0, w0, block_rows)
    restored = _pad_planes(restored, rows)
    if (h0, w0) != (hp, wp) and restored.shape[0] > 3:
        # ragged + packed: keep the pad cheap by dropping phantom planes
        restored = restored[:3]
    orig = jnp.pad(
        orig, ((0, 0), (0, hp - h), (0, wp - w))
    ) if (h, w) != (hp, wp) else orig
    n_blocks = -(-(hp // rows) // stride)  # sampled row blocks
    interp = (
        jax.default_backend() == "cpu" if interpret is None else interpret
    )

    padded = hp != h or wp != w

    def body(*refs):
        if norm is not None:
            lo_ref, sc_ref = refs[0], refs[1]
            r_ref, o_ref, out_ref = refs[2], refs[3], refs[4]
        else:
            lo_ref = sc_ref = None
            r_ref, o_ref, out_ref = refs
        i = pl.program_id(0)
        rb, rg, rr = r_ref.at[0][:], r_ref.at[1][:], r_ref.at[2][:]
        if lo_ref is not None:
            rb = (rb - lo_ref[0]) * sc_ref[0]
            rg = (rg - lo_ref[1]) * sc_ref[1]
            rr = (rr - lo_ref[2]) * sc_ref[2]
        l_deb = _l_from_bgr_block(rb, rg, rr, fast)
        if padded and (lo_ref is not None or live_hw is not None):
            # pixels beyond (h, w) are pad garbage (fused normalize
            # makes zeros nonzero; uncropped pipeline planes carry FFT
            # ringing): mask them out of the sum. The un-normed,
            # full-extent path's zero pads contribute L=0 for free.
            ri = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
            live = (ri + i * stride * rows < h) & (ci < w)
            l_deb = jnp.where(live, l_deb, 0.0)
        ob = _to_f32(o_ref.at[0][:])
        og = _to_f32(o_ref.at[1][:])
        orr = _to_f32(o_ref.at[2][:])
        l_org = _l_from_bgr_block(ob, og, orr, fast)
        vals = jnp.stack(
            [jnp.sum(l_deb), jnp.sum(l_org), 0.0, 0.0]
        ).reshape(1, 4)
        out_ref[pl.dslice(i, 1), :] = vals

    plane_spec = pl.BlockSpec(
        (3, rows, wp), lambda i: (0, i * stride, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [plane_spec, plane_spec]
    operands = [restored, orig]
    if norm is not None:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + in_specs
        operands = [
            jnp.asarray(norm[0], jnp.float32).reshape(3),
            jnp.asarray(norm[1], jnp.float32).reshape(3),
        ] + operands
    out = pl.pallas_call(
        body,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (n_blocks, 4), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interp,
        name="ppk_lab_l_partials",
    )(*operands)
    return out


def wb_encode_u8(
    restored: jnp.ndarray,
    gain,
    interpret: bool | None = None,
    block_rows: int = 64,
    fast: bool = False,
    norm=None,
    live_hw=None,
):
    """White-balanced uint8 encode in one HBM pass.

    restored: (C>=3, H0, W0) float32 BGR planes in [0,1] (normalized),
              OR raw planes with norm=(lo, scale) (3,) arrays (fused
              min-max normalize). Only the first 3 planes are read;
              live_hw=(h, w) crops the output to the true extent (pad
              pixels compute garbage that never leaves the kernel's
              output slice).
    gain: scalar L gain (mean(L_orig) / (mean(L_deblur) + 1e-6)).
    Returns (3, h, w) uint8 planes — BGR->Lab, L*gain clamped [0,100],
    Lab->BGR, clip(p*255)->u8, all in VMEM.
    """
    if restored.ndim != 3 or restored.shape[0] < 3:
        raise ValueError(f"need (C>=3, H, W) planes, got {restored.shape}")
    h0, w0 = restored.shape[-2:]
    h, w = live_hw if live_hw is not None else (h0, w0)
    rows, hp, wp = _block_geometry(h0, w0, block_rows)
    padded = _pad_planes(restored, rows)
    n_blocks = hp // rows
    interp = (
        jax.default_backend() == "cpu" if interpret is None else interpret
    )

    def body(*refs):
        if norm is not None:
            g_ref, lo_ref, sc_ref, r_ref, out_ref = refs
        else:
            lo_ref = sc_ref = None
            g_ref, r_ref, out_ref = refs
        rb, rg, rr = r_ref.at[0][:], r_ref.at[1][:], r_ref.at[2][:]
        if lo_ref is not None:
            rb = (rb - lo_ref[0]) * sc_ref[0]
            rg = (rg - lo_ref[1]) * sc_ref[1]
            rr = (rr - lo_ref[2]) * sc_ref[2]
        L, a, b = _lab_from_bgr_block(rb, rg, rr, fast)
        L = jnp.clip(L * g_ref[0], 0.0, 100.0)
        ob, og, orr = _bgr_from_lab_block(L, a, b, fast)
        for c, p in enumerate((ob, og, orr)):
            # Mosaic has no f32->u8 cast; truncate through i32 — the
            # same trunc-toward-zero the XLA encode performs
            out_ref.at[c][:] = (
                jnp.clip(p * 255.0, 0.0, 255.0)
                .astype(jnp.int32)
                .astype(jnp.uint8)
            )

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    operands = [jnp.asarray([gain], jnp.float32).reshape(1)]
    if norm is not None:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        operands += [
            jnp.asarray(norm[0], jnp.float32).reshape(3),
            jnp.asarray(norm[1], jnp.float32).reshape(3),
        ]
    in_specs.append(
        pl.BlockSpec(
            (3, rows, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
    )
    operands.append(padded)
    out = pl.pallas_call(
        body,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (3, rows, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, hp, wp), jnp.uint8),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interp,
        name="ppk_wb_encode",
    )(*operands)
    if hp != h or wp != w:
        out = out[:, :h, :w]
    return out


def lab_l_sum_partials_batched(
    restored: jnp.ndarray,
    orig: jnp.ndarray,
    batch: int,
    interpret: bool | None = None,
    block_rows: int = 64,
    norm=None,
    live_hw=None,
    stride: int = 1,
):
    """Batched Lab-L partial sums: one kernel over a whole image stack.

    restored: (C >= 3*batch, H0, W0) channel-major planes — image i's
              BGR channels at planes 3i..3i+2 (the batched pipeline's
              (B*3, Hp, Wp) layout, models/batched.py). A packed path's
              phantom tail plane is skipped by the block specs.
    orig:     (3*batch, h, w) uint8/float32 planes, same channel order.
    norm:     optional (lo, scale) arrays of shape (3*batch,) — fused
              per-plane min-max normalize.
    Returns (batch, n_blocks, 4) partials; [..., 0] sums restored-L,
    [..., 1] sums original-L per image. Sum axis 1, divide by h*w
    (stride=1) or sampled_live_pixels(...) (stride>1 — every stride-th
    row block per image; see lab_l_sum_partials).
    """
    if restored.ndim != 3 or restored.shape[0] < 3 * batch:
        raise ValueError(
            f"need (C>={3*batch}, H, W) planes, got {restored.shape}"
        )
    h0, w0 = restored.shape[-2:]
    h, w = live_hw if live_hw is not None else (h0, w0)
    if orig.shape != (3 * batch, h, w):
        raise ValueError(
            f"orig must be ({3*batch}, {h}, {w}), got {orig.shape}"
        )
    rows, hp, wp = _block_geometry(h0, w0, block_rows)
    restored = _pad_planes(restored, rows)
    orig = (
        jnp.pad(orig, ((0, 0), (0, hp - h), (0, wp - w)))
        if (h, w) != (hp, wp)
        else orig
    )
    n_blocks = -(-(hp // rows) // stride)  # sampled row blocks
    interp = (
        jax.default_backend() == "cpu" if interpret is None else interpret
    )
    padded = hp != h or wp != w

    def body(*refs):
        if norm is not None:
            lo_ref, sc_ref = refs[0], refs[1]
            r_ref, o_ref, out_ref = refs[2], refs[3], refs[4]
        else:
            lo_ref = sc_ref = None
            r_ref, o_ref, out_ref = refs
        i = pl.program_id(0)  # image
        j = pl.program_id(1)  # row block
        rb, rg, rr = r_ref.at[0][:], r_ref.at[1][:], r_ref.at[2][:]
        if lo_ref is not None:
            rb = (rb - lo_ref[3 * i]) * sc_ref[3 * i]
            rg = (rg - lo_ref[3 * i + 1]) * sc_ref[3 * i + 1]
            rr = (rr - lo_ref[3 * i + 2]) * sc_ref[3 * i + 2]
        l_deb = _l_from_bgr_block(rb, rg, rr)
        if padded and (lo_ref is not None or live_hw is not None):
            ri = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
            live = (ri + j * stride * rows < h) & (ci < w)
            l_deb = jnp.where(live, l_deb, 0.0)
        ob = _to_f32(o_ref.at[0][:])
        og = _to_f32(o_ref.at[1][:])
        orr = _to_f32(o_ref.at[2][:])
        l_org = _l_from_bgr_block(ob, og, orr)
        vals = jnp.stack(
            [jnp.sum(l_deb), jnp.sum(l_org), 0.0, 0.0]
        ).reshape(1, 1, 4)
        out_ref[pl.dslice(i, 1), pl.dslice(j, 1), :] = vals

    plane_spec = pl.BlockSpec(
        (3, rows, wp), lambda i, j: (i, j * stride, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [plane_spec, plane_spec]
    operands = [restored, orig]
    if norm is not None:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + in_specs
        operands = [
            jnp.asarray(norm[0], jnp.float32).reshape(-1)[: 3 * batch],
            jnp.asarray(norm[1], jnp.float32).reshape(-1)[: 3 * batch],
        ] + operands
    out = pl.pallas_call(
        body,
        grid=(batch, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (batch, n_blocks, 4), lambda i, j: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, n_blocks, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interp,
        name="ppk_lab_l_partials_b",
    )(*operands)
    return out


def wb_encode_u8_batched(
    restored: jnp.ndarray,
    gains: jnp.ndarray,
    batch: int,
    interpret: bool | None = None,
    block_rows: int = 64,
    norm=None,
    live_hw=None,
):
    """Batched white-balanced uint8 encode (one kernel per stack).

    restored: (C >= 3*batch, H0, W0) channel-major planes (see
              lab_l_sum_partials_batched). gains: (batch,) per-image L
              gains. Returns (3*batch, h, w) uint8 planes.
    """
    if restored.ndim != 3 or restored.shape[0] < 3 * batch:
        raise ValueError(
            f"need (C>={3*batch}, H, W) planes, got {restored.shape}"
        )
    h0, w0 = restored.shape[-2:]
    h, w = live_hw if live_hw is not None else (h0, w0)
    rows, hp, wp = _block_geometry(h0, w0, block_rows)
    padded = _pad_planes(restored, rows)
    n_blocks = hp // rows
    interp = (
        jax.default_backend() == "cpu" if interpret is None else interpret
    )

    def body(*refs):
        if norm is not None:
            g_ref, lo_ref, sc_ref, r_ref, out_ref = refs
        else:
            lo_ref = sc_ref = None
            g_ref, r_ref, out_ref = refs
        i = pl.program_id(0)
        rb, rg, rr = r_ref.at[0][:], r_ref.at[1][:], r_ref.at[2][:]
        if lo_ref is not None:
            rb = (rb - lo_ref[3 * i]) * sc_ref[3 * i]
            rg = (rg - lo_ref[3 * i + 1]) * sc_ref[3 * i + 1]
            rr = (rr - lo_ref[3 * i + 2]) * sc_ref[3 * i + 2]
        L, a, b = _lab_from_bgr_block(rb, rg, rr)
        L = jnp.clip(L * g_ref[i], 0.0, 100.0)
        ob, og, orr = _bgr_from_lab_block(L, a, b)
        for c, p in enumerate((ob, og, orr)):
            out_ref.at[c][:] = (
                jnp.clip(p * 255.0, 0.0, 255.0)
                .astype(jnp.int32)
                .astype(jnp.uint8)
            )

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    operands = [jnp.asarray(gains, jnp.float32).reshape(-1)[:batch]]
    if norm is not None:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        operands += [
            jnp.asarray(norm[0], jnp.float32).reshape(-1)[: 3 * batch],
            jnp.asarray(norm[1], jnp.float32).reshape(-1)[: 3 * batch],
        ]
    in_specs.append(
        pl.BlockSpec(
            (3, rows, wp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
    )
    operands.append(padded)
    out = pl.pallas_call(
        body,
        grid=(batch, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (3, rows, wp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3 * batch, hp, wp), jnp.uint8),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interp,
        name="ppk_wb_encode_b",
    )(*operands)
    if hp != h or wp != w:
        out = out[:, :h, :w]
    return out
