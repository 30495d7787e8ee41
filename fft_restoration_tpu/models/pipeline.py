"""Single-chip Wiener-deblur pipeline: one fused jit graph.

TPU-native counterpart of the reference's accelerator mode
(/root/reference/fft/fft_gpu.cu:279-394 wienerDeblur_RGB_optimized +
gpu.cpp driver): where CUDA stages pinned-host H2D copies, per-kernel
launches and explicit device buffers, here the WHOLE restoration — pad,
complexify, PSF synthesis, forward FFTs, filter, inverse FFT, crop,
min-max normalize, Lab white balance, uint8 encode — is one traced XLA
graph. Buffer reuse falls out of XLA's allocator + input donation
(the reference's optimized-vs-naive allocation comparison, SURVEY.md §2
row 9, is subsumed by donate_argnums).

Semantics preserved from the serial oracle (SURVEY.md §7 contract):
  * channels are power-of-two padded BEFORE restoration (serial.cpp:36),
  * min-max normalize runs over the PADDED extent, then crop
    (fft_serial.cpp:246, serial.cpp:38),
  * the IFFT stays UNSCALED and min-max normalize absorbs 1/(M*N) — the
    serial convention (fft_serial.cpp:229,246). Normalize is exactly
    scale-invariant, so this matches the GPU/MPI explicit-scale outputs
    too while saving one elementwise pass.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from fft_restoration_tpu.models.filters import apply_filter
from fft_restoration_tpu.ops.color import apply_white_balance, bgr_to_lab, lab_to_bgr
from fft_restoration_tpu.ops.fft import fft2d
from fft_restoration_tpu.ops.psf import make_psf
from fft_restoration_tpu.utils.padding import next_power_of_two, next_smooth_size

PAD_MODES = ("pow2", "smooth")


def pad_extents(h: int, w: int, pad_mode: str = "pow2"):
    """DFT extents + mixed-radix cross-DFT levels for an (h, w) frame.

    'pow2' — the reference contract (utils.hpp:40-47), radices ().
    'smooth' — minimal odd*2^k extents (odd in {3,5,9,15}); the pallas
    kernels transform these at O(n log n) via their cross-DFT levels
    and the matmul backend via the generalized four-step. NOTE: the
    Wiener output depends on the pad extent (circular boundary), so
    smooth mode is verified against the oracle AT THE SAME extents
    (oracle/serial.py pad_to), not against the pow2-padded output.
    Returns (hp, wp, radices_h, radices_w)."""
    if pad_mode == "smooth":
        hp, rad_h = next_smooth_size(h)
        wp, rad_w = next_smooth_size(w)
        return hp, wp, rad_h, rad_w
    if pad_mode != "pow2":
        raise ValueError(f"unknown pad mode {pad_mode!r}; one of {PAD_MODES}")
    return next_power_of_two(h), next_power_of_two(w), (), ()


def _pad2d(x: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    if rows == x.shape[-2] and cols == x.shape[-1]:
        return x  # already at extent: skip the (measured) XLA pad copy
    pad = [(0, 0)] * (x.ndim - 2) + [
        (0, rows - x.shape[-2]),
        (0, cols - x.shape[-1]),
    ]
    return jnp.pad(x, pad)


def _pack_channel_pairs(channels: jnp.ndarray):
    """Pack adjacent real channels as complex planes: (..., C, H, W) ->
    SoA (re, im) of shape (..., ceil(C/2), H, W).

    The DFT is linear and every filter in this framework multiplies by a
    single Hermitian spectrum W = conj(H)/(|H|^2 + ...), so for real
    channels r, g:  ifft(W * fft(r + i*g)) = ifft(W*R) + i*ifft(W*G) —
    the restored channels fall out of the real/imag parts with NO
    Hermitian unpack. 3 channels ride 2 complex transforms instead of 3
    (-33% FFT work); even channel counts get the full 2x. The reference
    runs one full complex FFT per channel (serial.cpp:34-39)."""
    c = channels.shape[-3]
    re = channels[..., 0::2, :, :]
    im = channels[..., 1::2, :, :]
    if c % 2:
        pad = jnp.zeros_like(channels[..., :1, :, :])
        im = jnp.concatenate([im, pad], axis=-3)
    return re, im


def _unpack_channel_pairs(re: jnp.ndarray, im: jnp.ndarray, c: int) -> jnp.ndarray:
    """Inverse of _pack_channel_pairs: interleave real/imag planes back
    into (..., C, H, W) channel order."""
    stacked = jnp.stack([re, im], axis=-3)  # (..., P, 2, H, W)
    shape = stacked.shape[:-4] + (2 * re.shape[-3],) + stacked.shape[-2:]
    return stacked.reshape(shape)[..., :c, :, :]


def _minmax_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Per-plane min-max to [0,1] over the last two axes, with the
    reference's degenerate-range convention scale=0 (fft_serial.cpp:246
    via cv::normalize NORM_MINMAX)."""
    lo = jnp.min(x, axis=(-2, -1), keepdims=True)
    hi = jnp.max(x, axis=(-2, -1), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 0.0)
    return (x - lo) * scale


def restore_planes(
    channels: jnp.ndarray,
    psf: jnp.ndarray,
    K,
    *,
    fft_backend: str = "radix2",
    filter_name: str = "wiener",
    fft_engine: str = "mxu",
    img_rows: int | None = None,
    psf_spectrum=None,
    return_norm: bool = False,
    stage_dtype: str | None = None,
    radices_hw=((), ()),
    rl_iters: int = 10,
    normalize: bool = True,
) -> jnp.ndarray:
    """Restore (..., Hp, Wp) power-of-two — or, with radices_hw, smooth
    mixed-radix — planes with a (S, S) PSF.

    radices_hw: (radices_h, radices_w) cross-DFT levels when Hp/Wp are
    smooth sizes from pad_extents('smooth'); only the pallas backend
    consumes them (the matmul backend's four-step handles composite
    extents natively, radix2 falls back to the naive DFT).

    stage_dtype='bf16' (pallas backend only) stores the inter-kernel
    spectral planes (fwd->middle->inverse boundaries) as bfloat16,
    halving ~134 MB of HBM traffic per 2048²x3 frame; compute stays
    float32 inside every kernel. MEASURED NEAR-ZERO on v5e (1.18 vs
    1.19 ms device — the FFT kernels are compute-bound per block, so
    the saved DMA hides under compute; docs/PERF.md round 3) at a
    parity cost of ~2 uint8 counts, hence NOT the flagship default.
    Kept for bandwidth-constrained parts where the trade flips.

    return_norm=True (pallas backend, (C, Hp, Wp) input only) returns
    (raw_planes, lo, scale) with lo/scale per-channel (C,) arrays
    instead of materializing the normalized planes — the fused
    post-processing kernels apply (x - lo) * scale in VMEM
    (ops/pallas/postprocess.py), saving the 50 MB normalize write at
    2048². normalized == (raw - lo[:, None, None]) * scale[:, None,
    None] bit-for-bit (same expression the XLA path evaluates).

    psf_spectrum: optional precomputed (H_re, H_im) in the pallas fast
    path's transposed/hybrid layout (psf_spectrum_planes) — serving with
    a fixed PSF skips the per-frame PSF transform (~0.15 ms at 2048²).
    Only honored by the pallas backend.

    normalize=False returns the RAW unscaled-inverse planes instead of
    min-max normalizing them — the tiled-restore path (models/tiled.py)
    stitches raw tiles and normalizes globally so tile brightness stays
    consistent. The filter is linear in the input, so raw planes from
    same-extent transforms are directly comparable. ('rl' ignores it:
    the RL loop's clipped [0,1] output is already flux-calibrated.)

    The (...) leading axes batch channels/images — the TPU equivalent of
    the reference's sequential per-channel loop (serial.cpp:34-39); the
    PSF FFT is computed once and broadcast.
    Returns restored planes, min-max normalized over the padded extent.
    All frequency-domain state is SoA float32 (no complex dtype on this
    TPU backend — see ops/fft.py).
    """
    hp, wp = channels.shape[-2:]
    psf_rows = psf.shape[-2]  # only these rows of psf_pad are nonzero
    psf_pad = _pad2d(psf, hp, wp)
    if img_rows is not None and not (0 < img_rows <= hp):
        raise ValueError(f"img_rows {img_rows} outside (0, {hp}]")
    if filter_name == "rl":
        # iterative Richardson-Lucy: its own fori_loop pipeline (it is
        # not a one-shot spectral multiply); K is unused by design
        from fft_restoration_tpu.models.richardson_lucy import (
            richardson_lucy_planes,
        )

        if return_norm:
            raise ValueError("return_norm is not supported for filter 'rl'")
        return richardson_lucy_planes(
            channels, psf, rl_iters, fft_backend=fft_backend,
            fft_engine=fft_engine, radices_hw=radices_hw,
            psf_rows=psf_rows,
            psf_spectrum=(
                psf_spectrum if fft_backend == "pallas" else None
            ),
        )
    if fft_backend == "pallas" and min(hp, wp) < 128:
        import jax as _jax

        if _jax.default_backend() != "cpu":
            # frames below one (8,128) tile: Mosaic rejects the fused
            # kernels' sub-tile lane slices on hardware, and the MXU
            # four-step is faster at these sizes anyway
            fft_backend = "matmul"
    if fft_backend == "pallas":
        # every filter in the family is elementwise in the frequency
        # domain, so the revorder fast path (zero permutation passes,
        # transposed-write kernels, MXU engine) serves them all; wiener
        # additionally gets the fused spectral-middle kernel
        return _restore_planes_pallas_fused(
            channels, psf_pad, K, psf_rows, engine=fft_engine,
            filter_name=filter_name, img_rows=img_rows,
            psf_spectrum=psf_spectrum, return_norm=return_norm,
            stage_dtype=stage_dtype, radices_hw=radices_hw,
            normalize=normalize,
        )
    if return_norm:
        raise ValueError("return_norm requires the pallas backend")
    if channels.dtype == jnp.uint8:
        # u8 kernel ingest exists only on the pallas fast path (incl.
        # after the small-frame matmul reroute above)
        channels = channels.astype(jnp.float32) / jnp.float32(255.0)
    if channels.ndim >= 3 and channels.shape[-3] >= 2:
        c = channels.shape[-3]
        p_re, p_im = _pack_channel_pairs(channels)
    else:
        c = None
        p_re, p_im = channels, jnp.zeros_like(channels)
    G = fft2d(p_re, p_im, inverse=False, backend=fft_backend)
    H = fft2d(psf_pad, jnp.zeros_like(psf_pad), inverse=False, backend=fft_backend)
    F = apply_filter(filter_name, G, H, K, backend=fft_backend)
    r_re, r_im = fft2d(F[0], F[1], inverse=True, backend=fft_backend)
    restored = r_re if c is None else _unpack_channel_pairs(r_re, r_im, c)
    # No 1/(MN) scale: min-max normalize is scale-invariant, and the
    # serial oracle also normalizes the unscaled inverse directly
    # (fft_serial.cpp:229,246 — SURVEY.md §7 item 5). Saves a full
    # elementwise pass over the restored planes.
    return _minmax_normalize(restored) if normalize else restored


def _spectral_megakernel_profitable(
    m: int, n: int, engine: str = "auto", radices: tuple = ()
) -> bool:
    """Shape gate for the fused spectral middle (wiener_spectral_rows_t).

    Per-config same-process A/B (docs/PERF.md): the one-kernel middle is
    even-to-slightly-better than the half-fused pair at every
    single-frame config (2048² −0.03 ms, cat n=1024 −0.014, car n=512
    −0.001, UHD n=4096 −0.062) and a hair worse on small batched stacks
    (batch64 n=256: +0.024 ms). Gate to n >= 512 where it never loses.

    Only the MXU engine keeps the 2·log2(n)-stage fused body inside
    VMEM; the all-roll body spills and loses (module notes in
    wiener_spectral.py), so the gate also requires the resolved engine
    to be 'mxu'."""
    from fft_restoration_tpu.ops.pallas.fft_kernel import (
        _mixed_q,
        _resolve_engine,
    )

    q = _mixed_q(n, radices) if radices else None
    return n >= 512 and _resolve_engine(engine, n, "revorder", q) == "mxu"


def _fwd_rows_t_live(re, im, live_rows, engine, **kw):
    """Forward row pass with transposed block writes, transforming only
    the first `live_rows` rows (rows beyond are all-zero padding — a row
    FFT of zeros is zeros) and zero-refilling the transposed LANE axis.
    The shared primitive behind the PSF's live-row trick and the image's
    padded-frame slicing (all first-pass variants of the fused path)."""
    from fft_restoration_tpu.ops.pallas.fft_kernel import fft_rows_pallas

    m = re.shape[-2]
    slicing = live_rows is not None and live_rows < m
    if slicing:
        re = re[..., :live_rows, :]
        im = None if im is None else im[..., :live_rows, :]
    lre, lim = fft_rows_pallas(
        re, im, False, ordering="revorder", transposed_output=True,
        engine=engine, **kw,
    )
    if slicing:
        pad = [(0, 0)] * (lre.ndim - 1) + [(0, m - live_rows)]
        lre, lim = jnp.pad(lre, pad), jnp.pad(lim, pad)
    return lre, lim


def psf_spectrum_planes(psf, hp, wp, engine="mxu", psf_rows=None,
                        stage_dtype=None, radices_hw=((), ())):
    """2D forward transform of the corner-anchored padded PSF in the
    pallas fast path's layout (transposed orientation, revorder/hybrid
    spectrum) — the `H` the fused pipeline consumes. Compute once per
    (psf, hp, wp) and pass to restore_planes(psf_spectrum=...) to skip
    the per-frame PSF transform when the PSF is fixed.

    stage_dtype='bf16' stores the cached spectrum half-width (computed
    in f32, cast once here): the spectral-middle kernel reads 16.8 MB
    instead of 33.6 at 2048² and casts back on load."""
    from fft_restoration_tpu.ops.pallas.fft_kernel import fft_rows_pallas

    rad_h, rad_w = radices_hw
    psf_pad = _pad2d(psf, hp, wp)
    rows = psf.shape[-2] if psf_rows is None else psf_rows
    re, im = _fwd_rows_t_live(psf_pad, None, rows, engine, radices=rad_w)
    H = fft_rows_pallas(
        re, im, False, ordering="revorder", engine=engine, radices=rad_h
    )
    if stage_dtype in ("bf16", "bfloat16"):
        H = (H[0].astype(jnp.bfloat16), H[1].astype(jnp.bfloat16))
    return H


def _restore_planes_pallas_fused(
    channels, psf_pad, K, psf_rows=None, engine="mxu", filter_name="wiener",
    img_rows=None, psf_spectrum=None, return_norm=False, stage_dtype=None,
    radices_hw=((), ()), normalize=True,
):
    """Pallas fast path: revorder (DIF fwd / DIT inv, zero bit-reversal
    passes) row-FFT kernels + fused Wiener kernel, with the filter
    applied in the TRANSPOSED, bit-reversed-spectrum orientation so each
    2D round trip needs only 2 XLA transposes instead of 4. Elementwise
    filters are order- and orientation-agnostic, so the restoration is
    numerically the same transform (ops/pallas/fft_kernel.py docstring).

    Measured note (v5e): a fully transpose-free variant exists
    (fft_cols_pallas transforms along sublanes), but sublane rolls cost
    ~3x lane rolls on this hardware, making it 9.1 ms vs 3.1 ms here —
    XLA's transposes + lane-axis kernels win. Kept as an op for
    workloads where the transpose dominates.
    """
    # Live-row slicing of the image's first pass pays an extra lane-axis
    # pad copy over the transposed planes; measured net-positive only
    # when a substantial fraction of rows is padding (UHD 2160/4096 wins
    # ~1%, cat 782/1024 loses ~1% — docs/PERF.md). Gate at 60%.
    if img_rows is not None and img_rows > 0.6 * channels.shape[-2]:
        img_rows = None
    from fft_restoration_tpu.ops.pallas.fft_kernel import fft_rows_pallas
    from fft_restoration_tpu.ops.pallas.wiener_spectral import (
        fwd_wiener_rows_pallas,
    )

    if channels.dtype == jnp.uint8 and not (
        channels.ndim == 3 and channels.shape[-3] >= 2
    ):
        # u8 streams only through the packed_planes forward kernel
        channels = channels.astype(jnp.float32) / jnp.float32(255.0)

    # bf16 staging: half-width storage for the image's inter-kernel
    # spectral planes. The PSF spectrum and every in-kernel compute stay
    # float32 (kernels cast on load/store, _load_f32).
    stage = (
        jnp.bfloat16 if stage_dtype in ("bf16", "bfloat16") else None
    )
    if stage_dtype not in (None, "f32", "float32", "bf16", "bfloat16"):
        raise ValueError(f"unknown stage_dtype {stage_dtype!r}")

    hp, wp = channels.shape[-2:]
    rad_h, rad_w = radices_hw

    def fwd2d_t(re, nonzero_rows=None):
        # rows pass with TRANSPOSED block writes (the XLA transpose's
        # HBM round trip happens inside the kernel's VMEM instead —
        # measured 11% faster, tools/perf_ab.py twrite) -> cols-as-rows
        # pass; STAY transposed. nonzero_rows: see _fwd_rows_t_live.
        re, im = _fwd_rows_t_live(re, None, nonzero_rows, engine, radices=rad_w)
        return fft_rows_pallas(
            re, im, False, ordering="revorder", engine=engine, radices=rad_h
        )

    # PSF spectrum: plain two-pass forward (1 plane), or the caller's
    # precomputed planes (psf_spectrum_planes) for fixed-PSF serving.
    # (named_scope phase labels feed trace_profile.phase_breakdown —
    # the device-timeline analog of the reference's 6-phase tables,
    # fft_serial.cpp:249-258 / fft_gpu.cu:45-56.)
    with jax.named_scope("fphase_fft_psf"):
        H = (
            psf_spectrum
            if psf_spectrum is not None
            else fwd2d_t(psf_pad, psf_rows)
        )
    # Channel packing (see _pack_channel_pairs): 3 channels ride 2
    # complex transforms through the whole fwd->filter->inv chain.
    packed = channels.ndim >= 3 and channels.shape[-3] >= 2
    with jax.named_scope("fphase_fft_image"):
        if packed:
            c = channels.shape[-3]
            if channels.ndim == 3:
                # read the channel-major array directly through even/odd
                # plane-index maps (packed_planes): the strided pack
                # slices never materialize as XLA copies
                pk = (
                    channels
                    if c % 2 == 0
                    else jnp.concatenate(
                        [channels, jnp.zeros_like(channels[:1])], axis=0
                    )
                )
                # img_rows: the image's padded rows are all-zero, exactly
                # like the PSF's — slice the live rows (UHD pads
                # 2160 -> 4096: −47% of this pass)
                a_re, a_im = _fwd_rows_t_live(
                    pk, None, img_rows, engine, packed_planes=True,
                    out_dtype=stage, radices=rad_w,
                )
            else:
                p_re, p_im = _pack_channel_pairs(channels)
                a_re, a_im = _fwd_rows_t_live(
                    p_re, p_im, img_rows, engine, out_dtype=stage,
                    radices=rad_w,
                )
        else:
            a_re, a_im = _fwd_rows_t_live(
                channels, None, img_rows, engine, out_dtype=stage,
                radices=rad_w,
            )
    # Middle of the 2D restore. Wiener gets the fully fused spectral
    # kernel (col-FFT + filter + col-IFFT with transposed writes — the
    # filtered 2D spectrum never touches HBM), viable since the MXU
    # engine shrank the stage body; gated by measured shape
    # profitability, with the half-fused fwd_wiener + inverse-T-write
    # pair as the fallback. Other filters run the pair with an XLA
    # elementwise filter (order-agnostic).
    from fft_restoration_tpu.ops.pallas.wiener_spectral import (
        wiener_spectral_rows_t,
    )

    if filter_name == "wiener" and _spectral_megakernel_profitable(
        a_re.shape[-2], a_re.shape[-1], engine, rad_h
    ):
        # one kernel spanning three reference phases: FFT Image (cols),
        # Wiener Filter, IFFT (cols) — phase_breakdown reports it under
        # the fused label rather than splitting it by guesswork
        with jax.named_scope("fphase_spectral_fused"):
            r = wiener_spectral_rows_t(
                (a_re, a_im), H, K, engine=engine, out_dtype=stage,
                radices=rad_h,
            )
    else:
        r = None
    if r is not None:
        r_re, r_im = r
    elif filter_name == "wiener":
        with jax.named_scope("fphase_spectral_fused"):
            F = fwd_wiener_rows_pallas(
                (a_re, a_im), H, K, engine=engine, radices=rad_h
            )
        # inverse col pass with transposed writes: back to natural
        # orientation with zero XLA transpose passes in the whole restore
        with jax.named_scope("fphase_ifft"):
            r_re, r_im = fft_rows_pallas(
                F[0], F[1], True, ordering="revorder",
                transposed_output=True, engine=engine, radices=rad_h,
            )
    else:
        # inverse / cls: same revorder plumbing, elementwise filter in
        # the transposed hybrid-spectrum orientation (order-agnostic);
        # the CLS Laplacian spectrum rides the same forward path so its
        # ordering matches H and G
        from fft_restoration_tpu.ops.wiener import cls_filter, inverse_filter

        g_re, g_im = fft_rows_pallas(
            a_re, a_im, False, ordering="revorder", engine=engine,
            radices=rad_h,
        )
        if filter_name == "inverse":
            F = inverse_filter((g_re, g_im), H)
        elif filter_name == "cls":
            lap = jnp.zeros((hp, wp), jnp.float32)
            lap = lap.at[0, 0].set(4.0)
            lap = lap.at[0, 1].set(-1.0)
            lap = lap.at[1, 0].set(-1.0)
            lap = lap.at[0, -1].set(-1.0)
            lap = lap.at[-1, 0].set(-1.0)
            P = fwd2d_t(lap)
            F = cls_filter((g_re, g_im), H, P, K)
        else:
            raise ValueError(f"unknown filter {filter_name!r}")
        r_re, r_im = fft_rows_pallas(
            F[0], F[1], True, ordering="revorder", transposed_output=True,
            engine=engine, radices=rad_h,
        )
    if packed:
        # emit per-block min/max partials from the final kernel while its
        # outputs are VMEM-resident — the normalize below then skips a
        # full HBM re-read of the restored planes for its reduction.
        # Requires clean block tiling (pow2 planes >= the block size).
        total_rows = int(np.prod(r_re.shape[:-1]))
        rows_per_plane = r_re.shape[-2]
        n_planes = total_rows // rows_per_plane
        # largest POW2 block <= 256 that tiles the plane height (the
        # emit_minmax kernels snap blocks to pow2 internally) — pow2
        # heights take 256 as before; smooth heights (e.g. 1920 = 15*128)
        # drop to their pow2 tail so the minmax fusion still applies
        blk = 1 << (min(256, rows_per_plane).bit_length() - 1)
        while blk >= 8 and rows_per_plane % blk:
            blk //= 2
        # normalize=False callers want RAW planes: skip the minmax
        # fusion (its only job is producing the normalized output)
        fuse_mm = (
            blk >= 8
            and rows_per_plane % blk == 0
            and (normalize or return_norm)
        )
        if fuse_mm and r_re.ndim == 3:
            # final pass writes channel-INTERLEAVED planes directly
            # (fft_rows_packed_out): the unpack never materializes as a
            # separate copy; minmax partials ride along as before
            from fft_restoration_tpu.ops.pallas.fft_kernel import (
                fft_rows_packed_out,
            )

            with jax.named_scope("fphase_ifft"):
                out, mm = fft_rows_packed_out(
                    r_re, r_im, True, ordering="revorder", emit_minmax=True,
                    engine=engine, block_rows=blk, radices=rad_w,
                )
            restored = out[:c]
            per = mm.reshape(n_planes, -1, 4)

            def _ilv(a, b):
                s = jnp.stack([a, b], axis=-1)
                return s.reshape(2 * n_planes)[:c]

            lo = _ilv(
                jnp.min(per[..., 0], axis=-1), jnp.min(per[..., 2], axis=-1)
            )[..., None, None]
            hi = _ilv(
                jnp.max(per[..., 1], axis=-1), jnp.max(per[..., 3], axis=-1)
            )[..., None, None]
            scale = jnp.where(hi > lo, 1.0 / (hi - lo), 0.0)
            if return_norm:
                # hand back ALL 2P planes: the [:c] slice would
                # materialize a full-size copy (measured 0.067 ms at
                # 2048²) just to feed kernels whose block specs read
                # the first 3 planes for free
                return out, lo.reshape(-1), scale.reshape(-1)
            return (restored - lo) * scale
        if fuse_mm:
            with jax.named_scope("fphase_ifft"):
                r_re, r_im, mm = fft_rows_pallas(
                    r_re,
                    r_im,
                    True,
                    block_rows=blk,
                    ordering="revorder",
                    emit_minmax=True,
                    engine=engine,
                    radices=rad_w,
                )
            lead = r_re.shape[:-2]  # (..., P)
            per = mm.reshape(n_planes, -1, 4)

            def _interleave(a, b):
                # per-plane scalars (..., P) x2 -> per-channel (..., C)
                s = jnp.stack([a.reshape(lead), b.reshape(lead)], axis=-1)
                return s.reshape(lead[:-1] + (2 * lead[-1],))[..., :c]

            lo = _interleave(
                jnp.min(per[..., 0], axis=-1), jnp.min(per[..., 2], axis=-1)
            )[..., None, None]
            hi = _interleave(
                jnp.max(per[..., 1], axis=-1), jnp.max(per[..., 3], axis=-1)
            )[..., None, None]
            restored = _unpack_channel_pairs(r_re, r_im, c)
            scale = jnp.where(hi > lo, 1.0 / (hi - lo), 0.0)
            if return_norm:
                if restored.ndim != 3:
                    raise ValueError(
                        "return_norm supports (C, Hp, Wp) input only"
                    )
                return restored, lo.reshape(-1), scale.reshape(-1)
            return (restored - lo) * scale
        with jax.named_scope("fphase_ifft"):
            r_re, r_im = fft_rows_pallas(
                r_re, r_im, True, ordering="revorder", engine=engine,
                radices=rad_w,
            )
        restored = _unpack_channel_pairs(r_re, r_im, c)
    else:
        # single plane: only the real part is kept, so skip the
        # imaginary plane's HBM write (real_output) — ≙ the CUDA
        # postprocess_kernel extracting real only (fft_gpu.cu:187-201)
        with jax.named_scope("fphase_ifft"):
            restored, _ = fft_rows_pallas(
                r_re, r_im, True, ordering="revorder", real_output=True,
                engine=engine, radices=rad_w,
            )
    # unscaled + normalize, as in the oracle (see restore_planes note)
    with jax.named_scope("fphase_post_process"):
        if return_norm:
            if restored.ndim != 3:
                raise ValueError("return_norm supports (C, Hp, Wp) input only")
            lo = jnp.min(restored, axis=(-2, -1))
            hi = jnp.max(restored, axis=(-2, -1))
            scale = jnp.where(hi > lo, 1.0 / (hi - lo), 0.0)
            return restored, lo, scale
        return _minmax_normalize(restored) if normalize else restored


def _restore_core(
    img_f32: jnp.ndarray,
    angle_deg: jnp.ndarray,
    K: jnp.ndarray,
    h_re: jnp.ndarray | None = None,
    h_im: jnp.ndarray | None = None,
    *,
    psf_length: int,
    fft_backend: str,
    filter_name: str,
    white_balance: bool,
    fft_engine: str = "mxu",
    emit_planes: bool = True,
    stage_dtype: str | None = None,
    pad_mode: str = "pow2",
    rl_iters: int = 10,
    edgetaper: bool = False,
    wb_stats_stride: int = 1,
    psf_type: str = "motion",
):
    """(H, W, 3) BGR image -> (H, W, 3) uint8 BGR restored.

    Accepts float32 in [0,1] OR uint8: uint8 inputs are converted
    on-device AFTER the channel de-interleave, so the (H, W, 3)->
    (3, H, W) transpose reads 1-byte pixels (4x less HBM) and the host
    ships a 4x smaller buffer through the tunnel.

    pad_mode='smooth': minimal odd*2^k DFT extents via the mixed-radix
    kernels instead of the pow2 pad (see pad_extents) — e.g. UHD
    3840x2160 restores at 3840x2304 (8.8 MP) instead of 4096x4096
    (16.8 MP)."""
    h, w = img_f32.shape[:2]
    hp, wp, rad_h, rad_w = pad_extents(h, w, pad_mode)

    with jax.named_scope("fphase_pre_process"):
        # PSF family: 'motion' (reference), 'gaussian' (angle_deg is
        # sigma), 'disk' defocus — every filter is kernel-agnostic
        psf = make_psf(psf_type, psf_length, angle_deg)
        chans0 = jnp.moveaxis(img_f32, -1, 0)  # (3, H, W) BGR planes
        if chans0.dtype == jnp.uint8 and (
            edgetaper
            or not (
                fft_backend == "pallas"
                and chans0.ndim == 3
                and chans0.shape[0] >= 2
            )
        ):
            # exact division (not reciprocal multiply): bit-matches the
            # historical host-side np.float32 conversion. The pallas
            # packed path skips this: its forward kernel converts u8 in
            # VMEM (fft_kernel.py body), deleting the 50 MB f32
            # intermediate per 2048² frame. (Edge tapering needs f32
            # planes before the forward FFT, so it forfeits the u8
            # ingest.)
            chans0 = chans0.astype(jnp.float32) / jnp.float32(255.0)
        chans = _pad2d(chans0, hp, wp)
        if edgetaper:
            from fft_restoration_tpu.models.edgetaper import (
                edge_taper_planes,
            )

            chans = edge_taper_planes(
                chans, psf, (h, w), fft_backend=fft_backend,
                fft_engine=fft_engine, radices_hw=(rad_h, rad_w),
                # fixed-PSF serving: reuse the cached pallas spectrum
                psf_spectrum=(
                    (h_re, h_im)
                    if h_re is not None and fft_backend == "pallas"
                    else None
                ),
            )
    # Fused pallas post-processing (ops/pallas/postprocess.py): the XLA
    # lowering of the WB+encode chain materializes a full f32 planes_bgr
    # intermediate and splits the means into transcendental-heavy
    # fusions (0.76 ms of the 1.38 ms frame at 2048²x3 — compiled-HLO
    # analysis in docs/PERF.md). Two kernels collapse it to the two
    # irreducible HBM passes, with the min-max normalize fused in
    # (return_norm) so the normalized planes only materialize when the
    # caller asked for them. Same gate domain as the FFT kernel family
    # (>= one (8,128) tile).
    use_ppk = (
        white_balance
        and fft_backend == "pallas"
        and min(h, w) >= 128
        and filter_name != "rl"  # RL's loop output skips return_norm
    )
    rp = restore_planes(
        chans, psf, K, fft_backend=fft_backend, filter_name=filter_name,
        fft_engine=fft_engine,
        # tapering fills the pad rows with the blur's wrap tail, so the
        # live-rows forward-FFT shortcut would drop real signal there
        img_rows=None if edgetaper else h,
        psf_spectrum=None if h_re is None else (h_re, h_im),
        return_norm=use_ppk, stage_dtype=stage_dtype,
        radices_hw=(rad_h, rad_w), rl_iters=rl_iters,
    )
    if use_ppk:
        raw, lo, scale = rp  # raw may carry a packed 4th plane, uncropped
        restored = (
            (raw[:3, :h, :w] - lo[:, None, None]) * scale[:, None, None]
            if emit_planes
            else None
        )
    else:
        restored = rp[..., :h, :w]

    # Post-processing stays PLANAR — (H, W, 3) interleaved color math
    # wastes 125 of 128 VPU lanes (4.1x slower measured, ops/color.py);
    # channels interleave exactly once, at the final uint8 stack.
    with jax.named_scope("fphase_post_process"):
        if use_ppk:
            from fft_restoration_tpu.ops.pallas.postprocess import (
                lab_l_sum_partials,
                wb_encode_u8,
            )

            from fft_restoration_tpu.ops.pallas.postprocess import (
                sampled_live_pixels,
            )

            # wb_stats_stride > 1: the L-mean pass samples every
            # stride-th row block — the gain is a ratio of means over
            # the SAME pixels, so equal sampling leaves it unbiased
            # (postprocess.py docstring; measured <= 1 uint8 count)
            from fft_restoration_tpu.ops.pallas.postprocess import (
                effective_wb_stride,
            )

            # strided stats use FINE 8-row stripes: equal read fraction
            # but far better spatial stratification than 64-row chunks
            # (gain rel-err 2.8e-4 vs 2.3e-3 at 2048 rows, stride 4 —
            # measured, docs/PERF.md); small frames fall back to exact
            wb_stats_stride = effective_wb_stride(h, wb_stats_stride)
            _sb = 8 if wb_stats_stride > 1 else 64
            parts = lab_l_sum_partials(
                raw, chans0, norm=(lo, scale), live_hw=(h, w),
                stride=wb_stats_stride, block_rows=_sb,
            )
            npix = jnp.float32(
                sampled_live_pixels(
                    raw.shape[-2], raw.shape[-1], live_hw=(h, w),
                    stride=wb_stats_stride, block_rows=_sb,
                )
            )
            gain = (jnp.sum(parts[:, 1]) / npix) / (
                jnp.sum(parts[:, 0]) / npix + 1e-6
            )
            out = jnp.moveaxis(
                wb_encode_u8(raw, gain, norm=(lo, scale), live_hw=(h, w)),
                0,
                -1,
            )
        elif white_balance:
            from fft_restoration_tpu.ops.color import (
                bgr_to_lab_planar,
                lab_to_bgr_planar,
                luminance_l_planar,
            )

            # NOTE measured negative result (docs/PERF.md): a
            # transcendental-free "fast color" mode (polynomial sRGB +
            # Newton rcbrt, ops/color.py *_fast) benched SLOWER on v5e
            # (2.067 vs 2.041 ms device) — the VPU's exp/log are already
            # cheap and this segment is bandwidth/fusion-bound, not
            # math-bound. Exact cv2-parity math is both the accuracy and
            # the speed choice here.
            L, a_, b_ = bgr_to_lab_planar(
                restored[0], restored[1], restored[2]
            )
            # only the ORIGINAL image's mean L feeds the gain
            # (utils.hpp:55-71). With u8 kernel ingest chans0 is still
            # uint8 here: the convert fuses into this mean's reduction
            # (one 12.6 MB u8 read instead of a 50 MB f32 one).
            c32 = (
                chans0.astype(jnp.float32) / jnp.float32(255.0)
                if chans0.dtype == jnp.uint8
                else chans0
            )
            l_orig_mean = jnp.mean(
                luminance_l_planar(c32[0], c32[1], c32[2])
            )
            gain = l_orig_mean / (jnp.mean(L) + 1e-6)
            L = jnp.clip(L * gain, 0.0, 100.0)
            planes_bgr = lab_to_bgr_planar(L, a_, b_)
        else:
            planes_bgr = (restored[0], restored[1], restored[2])
        if not use_ppk:
            out = jnp.stack(
                [
                    jnp.clip(p * 255.0, 0.0, 255.0).astype(jnp.uint8)
                    for p in planes_bgr
                ],
                axis=-1,
            )
    # emit_planes=False is the serving graph: the (3, H, W) f32
    # diagnostic output is a 50 MB HBM materialization per 2048² frame
    # that only verification consumes — callers that ship the uint8
    # image alone skip it (the reference drivers likewise only ever
    # output the image; verification re-runs separately, simd.cpp:66-99)
    if not emit_planes:
        return out
    return out, restored


class WienerDeblurPipeline:
    """Compiled single-chip restoration pipeline.

    One instance caches compiled executables per (H, W, psf_length)
    signature; psf angle and K are traced scalars, so PSF sweeps reuse
    the same executable (BASELINE.json config 4).
    """

    def __init__(
        self,
        fft_backend: str = "radix2",
        filter_name: str = "wiener",
        white_balance: bool = True,
        device: Optional[object] = None,
        donate_input: bool = True,
        fft_engine: str = "mxu",
        cache_psf_spectrum: bool = True,
        emit_planes: bool = True,
        stage_dtype: str | None = None,
        pad_mode: str = "pow2",
        rl_iters: int = 10,
        edgetaper: bool = False,
        wb_stats_stride: int = 1,
        psf_type: str = "motion",
    ):
        # emit_planes=False compiles the SERVING graph: restore() skips
        # the (3, H, W) f32 diagnostic planes output (a 50 MB HBM
        # materialization per 2048² frame that only verification
        # consumes); restore_with_planes()/restore_channels() then
        # raise. The reference drivers likewise only output the image.
        self.emit_planes = emit_planes
        self.fft_backend = fft_backend
        self.fft_engine = fft_engine
        # 'smooth' restores at minimal odd*2^k DFT extents via the
        # mixed-radix kernels (pad_extents); 'pow2' is the reference
        # contract. The restored output depends on the pad extent, so
        # verification compares against the oracle at matching extents.
        if pad_mode not in PAD_MODES:
            raise ValueError(f"unknown pad mode {pad_mode!r}; one of {PAD_MODES}")
        self.pad_mode = pad_mode
        # iteration count for filter_name='rl' (Richardson-Lucy)
        self.rl_iters = rl_iters
        # border blend toward the circular blur (models/edgetaper.py)
        self.edgetaper = edgetaper
        # >1: strided row-block sampling of the white-balance L means
        self.wb_stats_stride = wb_stats_stride
        # 'motion' | 'gaussian' | 'disk' (ops/psf.py make_psf)
        self.psf_type = psf_type
        # 'bf16' stores the inter-kernel spectral planes half-width
        # (restore_planes stage_dtype); None/'f32' keeps full precision
        self.stage_dtype = stage_dtype
        self.filter_name = filter_name
        self.white_balance = white_balance
        self.device = device
        # Buffer donation lets XLA reuse the input image's HBM for
        # intermediates — the allocation-reuse optimization the CUDA
        # reference demonstrates by hoisting buffers out of the channel
        # loop (wienerDeblur_RGB_optimized vs _naive, fft_gpu.cu:279,400).
        self.donate_input = donate_input
        # Fixed-PSF serving: the PSF's own 2D transform (~0.15 ms at
        # 2048^2, one full-plane pass) is keyed on (shape, length, angle)
        # and computed once; the restore graph consumes the cached
        # spectrum planes. PSF sweeps with VARYING angles still reuse
        # one executable (the spectrum graph is the tiny one).
        self.cache_psf_spectrum = cache_psf_spectrum
        self._cache = {}
        self._psf_cache = {}
        self._psf_fns = {}

    def _compiled(self, h: int, w: int, psf_length: int, with_h: bool = False):
        from fft_restoration_tpu.ops.pallas.fft_kernel import (
            mxu_precision_token,
        )

        key = (h, w, psf_length, with_h, mxu_precision_token())
        if key not in self._cache:
            fn = functools.partial(
                _restore_core,
                psf_length=psf_length,
                fft_backend=self.fft_backend,
                filter_name=self.filter_name,
                white_balance=self.white_balance,
                fft_engine=self.fft_engine,
                emit_planes=self.emit_planes,
                stage_dtype=self.stage_dtype,
                pad_mode=self.pad_mode,
                rl_iters=self.rl_iters,
                edgetaper=self.edgetaper,
                wb_stats_stride=self.wb_stats_stride,
                psf_type=self.psf_type,
            )
            donate = (0,) if self.donate_input else ()
            self._cache[key] = jax.jit(fn, donate_argnums=donate)
        return self._cache[key]

    def _uses_psf_cache(self, h: int, w: int) -> bool:
        # mirror restore_planes' small-frame guard: below one (8,128)
        # tile the pallas path reroutes to matmul on hardware, which
        # ignores psf_spectrum — computing it would ALSO run the sub-128
        # pallas kernels Mosaic rejects
        hp, wp, _, _ = pad_extents(h, w, self.pad_mode)
        return (
            self.cache_psf_spectrum
            and self.fft_backend == "pallas"
            and min(hp, wp) >= 128
        )

    def _psf_spectrum(self, h: int, w: int, psf_length: int, angle: float):
        from fft_restoration_tpu.models.pipeline import psf_spectrum_planes

        from fft_restoration_tpu.ops.pallas.fft_kernel import (
            mxu_precision_token,
        )

        hp, wp, rad_h, rad_w = pad_extents(h, w, self.pad_mode)
        key = (hp, wp, psf_length, float(angle), mxu_precision_token())
        if key not in self._psf_cache:
            fkey = (hp, wp, psf_length, mxu_precision_token())
            if fkey not in self._psf_fns:
                def make_h(
                    ang, _hp=hp, _wp=wp, _len=psf_length, _rad=(rad_h, rad_w)
                ):
                    psf = make_psf(self.psf_type, _len, ang)
                    return psf_spectrum_planes(
                        psf, _hp, _wp, engine=self.fft_engine, psf_rows=_len,
                        stage_dtype=self.stage_dtype, radices_hw=_rad,
                    )

                self._psf_fns[fkey] = jax.jit(make_h)
            # bound the device-memory footprint: each spectrum is
            # 2 * hp * wp float32 (33.5 MB at 2048^2); angle sweeps
            # evict oldest-first
            if len(self._psf_cache) >= 8:
                self._psf_cache.pop(next(iter(self._psf_cache)))
            H = self._psf_fns[fkey](jnp.float32(angle))
            if self.device is not None:
                # pin to the pipeline's device: jit rejects mixed
                # committed-device inputs
                H = tuple(jax.device_put(p, self.device) for p in H)
            self._psf_cache[key] = H
        return self._psf_cache[key]

    def _check_psf_fits(self, h: int, w: int, psf_length: int) -> None:
        hp, wp, _, _ = pad_extents(h, w, self.pad_mode)
        if psf_length > hp or psf_length > wp:
            raise ValueError(
                f"PSF length {psf_length} exceeds the padded "
                f"image ({hp}x{wp}); use a smaller PSF or a larger image"
            )

    def restore(
        self,
        img_bgr: np.ndarray,
        psf_length: int,
        psf_angle: float,
        K: float = 0.01,
    ) -> np.ndarray:
        """uint8 BGR (H, W, 3) -> restored uint8 BGR (H, W, 3)."""
        if not self.emit_planes:
            out = self._run(img_bgr, psf_length, psf_angle, K)
            return np.asarray(out)
        out, _ = self.restore_with_planes(img_bgr, psf_length, psf_angle, K)
        return out

    def restore_with_planes(
        self,
        img_bgr: np.ndarray,
        psf_length: int,
        psf_angle: float,
        K: float = 0.01,
    ):
        """One device execution returning BOTH the final uint8 image and
        the restored float planes (3, H, W) — so callers that verify
        against the oracle don't re-run the whole graph."""
        if not self.emit_planes:
            raise ValueError(
                "this pipeline was built with emit_planes=False (serving "
                "graph); construct with emit_planes=True for diagnostics"
            )
        out, restored = self._run(img_bgr, psf_length, psf_angle, K)
        return np.asarray(out), np.asarray(restored)

    def _run(self, img_bgr, psf_length, psf_angle, K):
        arr = np.asarray(img_bgr)
        if arr.dtype == np.uint8:
            img = jnp.asarray(arr)  # device-side /255 (see _restore_core)
        else:
            # non-uint8 callers keep the historical contract: values are
            # 0..255-scaled and normalized here
            img = jnp.asarray(arr.astype(np.float32) / np.float32(255.0))
        self._check_psf_fits(img.shape[0], img.shape[1], int(psf_length))
        if self.device is not None:
            img = jax.device_put(img, self.device)
        if self._uses_psf_cache(img.shape[0], img.shape[1]):
            H = self._psf_spectrum(
                img.shape[0], img.shape[1], int(psf_length), float(psf_angle)
            )
            fn = self._compiled(
                img.shape[0], img.shape[1], int(psf_length), with_h=True
            )
            return fn(
                img, jnp.float32(psf_angle), jnp.float32(K), H[0], H[1]
            )
        else:
            fn = self._compiled(img.shape[0], img.shape[1], int(psf_length))
            return fn(img, jnp.float32(psf_angle), jnp.float32(K))

    def restore_channels(
        self,
        img_bgr: np.ndarray,
        psf_length: int,
        psf_angle: float,
        K: float = 0.01,
    ) -> np.ndarray:
        """Restored float32 planes (3, H, W) before color post-processing —
        the quantity the reference drivers verify against serial
        (simd.cpp:66-99 et al.)."""
        _, restored = self.restore_with_planes(img_bgr, psf_length, psf_angle, K)
        return restored


def profile_phases(
    img_bgr: np.ndarray,
    psf_length: int,
    psf_angle: float,
    K: float = 0.01,
    fft_backend: str = "matmul",
    white_balance: bool = True,
    profiler=None,
    psf_type: str = "motion",
):
    """Run the pipeline as six separately-dispatched device phases and
    accumulate per-phase wall time, preserving the reference's phase
    taxonomy (fft_serial.cpp:158-236: Pre-process / FFT Image / FFT PSF /
    Wiener Filter / IFFT / Post-process; CUDA Profiler fft_gpu.cu:17-57).

    The production path fuses all phases into one graph (XLA erases the
    boundaries), so this instrumented mode exists purely for the
    profiler — each phase is forced to materialize via a host sync,
    which on a tunneled device adds per-phase RTT overhead.
    Returns (restored uint8 image, PhaseProfiler).
    """
    import jax

    from fft_restoration_tpu.models.filters import apply_filter
    from fft_restoration_tpu.ops.fft import fft2d
    from fft_restoration_tpu.ops.psf import make_psf
    from fft_restoration_tpu.utils.timing import PhaseProfiler

    prof = profiler or PhaseProfiler(mode="jit")
    img = jnp.asarray(np.asarray(img_bgr, np.float32) / np.float32(255.0))
    h, w = img.shape[:2]
    hp, wp = next_power_of_two(h), next_power_of_two(w)

    def sync(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf[(0,) * leaf.ndim])

    @jax.jit
    def pre(img):
        psf = make_psf(psf_type, psf_length, jnp.float32(psf_angle))
        chans = _pad2d(jnp.moveaxis(img, -1, 0), hp, wp)
        psf_pad = _pad2d(psf, hp, wp)
        return chans, psf_pad

    fftf = jax.jit(lambda re: fft2d(re, jnp.zeros_like(re), False, fft_backend))
    wien = jax.jit(
        lambda G, H: apply_filter("wiener", G, H, jnp.float32(K), backend=fft_backend)
    )
    ifft = jax.jit(lambda F: fft2d(F[0], F[1], True, fft_backend))

    @jax.jit
    def post(r_re, img):
        restored = _minmax_normalize(r_re)
        merged = jnp.moveaxis(restored[..., :h, :w], 0, -1)
        if white_balance:
            lab_deblur = bgr_to_lab(merged)
            lab_orig = bgr_to_lab(img)
            merged = lab_to_bgr(apply_white_balance(lab_deblur, lab_orig))
        return jnp.clip(merged * 255.0, 0.0, 255.0).astype(jnp.uint8)

    with prof.phase("Pre-process"):
        chans, psf_pad = pre(img)
        sync((chans, psf_pad))
    with prof.phase("FFT Image"):
        G = fftf(chans)
        sync(G)
    with prof.phase("FFT PSF"):
        H = fftf(psf_pad)
        sync(H)
    with prof.phase("Wiener Filter"):
        F = wien(G, H)
        sync(F)
    with prof.phase("IFFT"):
        r = ifft(F)
        sync(r)
    with prof.phase("Post-process"):
        out = post(r[0], img)
        out = np.asarray(out)
    return out, prof


def deblur_image(
    img_bgr: np.ndarray,
    psf_length: int,
    psf_angle: float,
    K: float = 0.01,
    **kwargs,
) -> np.ndarray:
    """One-shot convenience wrapper around WienerDeblurPipeline."""
    return WienerDeblurPipeline(**kwargs).restore(img_bgr, psf_length, psf_angle, K)
