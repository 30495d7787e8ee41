#!/usr/bin/env python
"""Same-process interleaved A/B experiments on the real TPU.

Methodology (docs/PERF.md): absolute numbers across sessions are not
comparable on the pool-shared chip, so every design decision comes from
variants compiled and traced in ONE process. Device-timeline times
(utils/trace_profile.device_trace) additionally exclude host RTT and
tunnel queueing.

Experiments:
  select     — where-select butterflies (adopted) vs arithmetic-blend
               stages (round-1 formulation)
  realout    — real_output final inverse pass (adopted) vs full SoA write
  donate     — donate_argnums on vs off (VERDICT item 6 / gpu.cpp:96-113
               optimized-vs-naive allocation experiment)
  twrite     — in-kernel transposed writes vs kernel + XLA transpose
  megakernel — fused fwd+filter+inv middle at several block sizes
  radix4     — radix-4 vs radix-2 forward pass
  engine     — MXU-hybrid FFT engine (outer rolls + per-group DFT-128
               matmul) vs the all-roll engine, full fused pipeline
  all        — everything

Usage: python tools/perf_ab.py [select realout donate twrite megakernel radix4 | all]
"""

EXPERIMENTS = {"select", "realout", "donate", "twrite", "megakernel",
               "radix4", "engine", "megamxu", "precision", "stage",
               "smoothpad", "features", "batchwb"}

import functools
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = W = 2048


class Timeout(Exception):
    pass


def _alarm(s, f):
    raise Timeout()


signal.signal(signal.SIGALRM, _alarm)


def compile_guarded(make, budget_s=600):
    signal.alarm(budget_s)
    try:
        return make()
    finally:
        signal.alarm(0)


def sync(tree):
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if leaf is not None:
            np.asarray(leaf[(0,) * leaf.ndim])


def host_best(fn, args, iters=15, rounds=3):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    which = set(sys.argv[1:]) or {"select", "realout", "donate"}
    if "all" in which:
        which = set(EXPERIMENTS)
    unknown = which - EXPERIMENTS
    if unknown:
        sys.exit(f"unknown experiment(s) {sorted(unknown)}; one of "
                 f"{sorted(EXPERIMENTS)} or 'all'")

    import jax
    import jax.numpy as jnp

    from fft_restoration_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    from fft_restoration_tpu.models.pipeline import _restore_core
    from fft_restoration_tpu.utils.trace_profile import device_trace
    import fft_restoration_tpu.ops.pallas.fft_kernel as fk

    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.random((H, W, 3), np.float32)))
    ang, k = jnp.float32(30.0), jnp.float32(0.01)

    def pallas_pipe(fft_engine="mxu", **kw):
        return jax.jit(
            functools.partial(
                _restore_core,
                psf_length=50,
                fft_backend="pallas",
                filter_name="wiener",
                white_balance=True,
                fft_engine=fft_engine,
            ),
            **kw,
        )

    def measure(label, fn, args):
        sync(fn(*args))  # warm/compile
        hb = host_best(fn, args)
        rep = device_trace(fn, args, n_iters=10)
        print(
            f"{label:34s} host-best {hb:7.2f} ms  device {rep.device_total_ms:6.2f} ms",
            flush=True,
        )
        return hb, rep.device_total_ms

    results = {}

    if "megamxu" in which:
        import fft_restoration_tpu.ops.pallas.wiener_spectral as ws

        fused = compile_guarded(lambda: pallas_pipe())
        out_f = np.asarray(fused(img, ang, k)[0])
        real_t = ws.wiener_spectral_rows_t
        ws.wiener_spectral_rows_t = lambda *a, **kw: None  # force fallback
        try:
            pair = compile_guarded(lambda: pallas_pipe())
            out_p = np.asarray(pair(img, ang, k)[0])
            diff = np.max(np.abs(out_f.astype(np.int32) - out_p.astype(np.int32)))
            print(f"megamxu parity (uint8 max abs diff): {diff}")
            results["fusedmid"] = measure(
                "fused middle (one megakernel)", fused, (img, ang, k)
            )
            results["pairmid"] = measure(
                "half-fused pair (fwd_wiener + invT)", pair, (img, ang, k)
            )
        finally:
            ws.wiener_spectral_rows_t = real_t

    if "precision" in which:
        # VERDICT r2 weak-1: every _group_dft_matmul runs
        # Precision.HIGHEST (6-pass bf16 emulation) while the parity
        # contract is the reference's loose tiers. A/B DEFAULT (1-pass
        # bf16) against HIGHEST on the full fused pipeline + parity cost
        # in uint8 levels. (Precision.HIGH is not lowerable by Mosaic:
        # "Unsupported dot precision: HIGH", measured 2026-08-17.)
        outs = {}
        for prec_name in ("HIGHEST", "DEFAULT"):
            fk._MXU_PRECISION = getattr(jax.lax.Precision, prec_name)
            try:
                pipe = compile_guarded(lambda: pallas_pipe())
                outs[prec_name] = np.asarray(pipe(img, ang, k)[0])
                results[f"prec_{prec_name}"] = measure(
                    f"pallas MXU precision={prec_name}", pipe, (img, ang, k)
                )
            finally:
                fk._MXU_PRECISION = None
        for prec_name in ("DEFAULT",):
            if prec_name in outs:
                diff = np.max(
                    np.abs(
                        outs[prec_name].astype(np.int32)
                        - outs["HIGHEST"].astype(np.int32)
                    )
                )
                print(
                    f"precision parity {prec_name} vs HIGHEST "
                    f"(uint8 max abs diff): {diff}"
                )
        # interleaved re-measure to bracket drift
        fk._MXU_PRECISION = jax.lax.Precision.HIGHEST
        try:
            pipe = compile_guarded(lambda: pallas_pipe())
            results["prec_HIGHEST2"] = measure(
                "pallas MXU precision=HIGHEST (re)", pipe, (img, ang, k)
            )
        finally:
            fk._MXU_PRECISION = None

    if "stage" in which:
        # bf16 staging of the inter-kernel spectral planes: halves the
        # fwd->mid and mid->inv HBM boundaries (~134 MB/frame at
        # 2048²x3). Serving graph (uint8 in/out, emit_planes=False),
        # per-frame PSF transform on both sides.
        img_u8 = jax.device_put(
            jnp.asarray((rng.random((H, W, 3)) * 255).astype(np.uint8))
        )

        def mk_stage(sd):
            return jax.jit(
                functools.partial(
                    _restore_core,
                    psf_length=50,
                    fft_backend="pallas",
                    filter_name="wiener",
                    white_balance=True,
                    fft_engine="mxu",
                    emit_planes=False,
                    stage_dtype=sd,
                )
            )

        f32p = compile_guarded(lambda: mk_stage(None))
        b16p = compile_guarded(lambda: mk_stage("bf16"))
        out_f = np.asarray(f32p(img_u8, ang, k))
        out_b = np.asarray(b16p(img_u8, ang, k))
        diff = np.max(np.abs(out_f.astype(np.int32) - out_b.astype(np.int32)))
        print(f"stage parity (uint8 max abs diff bf16 vs f32): {diff}")
        results["stage_f32"] = measure(
            "pallas stage=f32 (serving)", f32p, (img_u8, ang, k)
        )
        results["stage_bf16"] = measure(
            "pallas stage=bf16 (serving)", b16p, (img_u8, ang, k)
        )
        results["stage_f32_2"] = measure(
            "pallas stage=f32 (re)", f32p, (img_u8, ang, k)
        )

    if "smoothpad" in which:
        # Pad-waste A/B: pow2 vs smooth (mixed-radix) DFT extents on the
        # serving graph (uint8 in/out, emit_planes=False, per-frame PSF
        # transform on both sides). Smooth cuts the padded pixel count
        # up to 2x (UHD 2160 -> 2304 instead of 4096) at the cost of the
        # cross-DFT levels inside every kernel.
        from fft_restoration_tpu.models.pipeline import pad_extents

        for (h, w) in ((2160, 3840), (782, 1920), (330, 640)):
            img_u8 = jax.device_put(jnp.asarray(
                (np.random.default_rng(1).random((h, w, 3)) * 255)
                .astype(np.uint8)))
            outs = {}
            for mode in ("pow2", "smooth"):
                hp, wp, rh, rw = pad_extents(h, w, mode)
                fn = compile_guarded(lambda m=mode: jax.jit(
                    functools.partial(
                        _restore_core, psf_length=50, fft_backend="pallas",
                        filter_name="wiener", white_balance=True,
                        emit_planes=False, pad_mode=m)))
                outs[mode] = np.asarray(fn(img_u8, ang, k))
                results[f"smooth_{h}x{w}_{mode}"] = measure(
                    f"{h}x{w} pad={mode:6s} ({hp}x{wp})", fn, (img_u8, ang, k))
            # different pad extents -> different restorations by design;
            # report the PSNR between them as a sanity signal only
            d = outs["pow2"].astype(np.float64) - outs["smooth"].astype(np.float64)
            mse = (d ** 2).mean()
            print(f"  pow2-vs-smooth output PSNR {10*np.log10(255.0**2/(mse+1e-12)):.1f} dB "
                  f"(extent-dependent outputs; parity is vs the oracle at "
                  f"matching extents, tests/test_mixed_radix.py)")

    if "features" in which:
        # Device cost of the round-3 restoration-family extensions at
        # 2048²x3 on the serving graph: edge tapering (one extra conv
        # round trip before the forward FFT) and Richardson-Lucy
        # (2 conv round trips per iteration, fori_loop).
        img_u8 = jax.device_put(jnp.asarray(
            (np.random.default_rng(2).random((H, W, 3)) * 255)
            .astype(np.uint8)))

        def serving(**kw):
            return jax.jit(functools.partial(
                _restore_core, psf_length=50, fft_backend="pallas",
                filter_name="wiener", white_balance=True,
                emit_planes=False, **kw))

        base = compile_guarded(lambda: serving())
        taper = compile_guarded(lambda: serving(edgetaper=True))
        wbs = compile_guarded(lambda: serving(wb_stats_stride=4))
        results["feat_base"] = measure(
            "wiener serving (baseline)", base, (img_u8, ang, k))
        out_b = np.asarray(base(img_u8, ang, k)[0])
        out_s = np.asarray(wbs(img_u8, ang, k)[0])
        print(f"  wb-stride-4 parity (uint8 max abs diff): "
              f"{np.abs(out_b.astype(np.int32) - out_s.astype(np.int32)).max()}")
        results["feat_wbstride"] = measure(
            "wiener serving wb_stride=4", wbs, (img_u8, ang, k))
        results["feat_taper"] = measure(
            "wiener serving + edgetaper", taper, (img_u8, ang, k))
        for iters in (10, 25):
            rl = compile_guarded(lambda n=iters: jax.jit(functools.partial(
                _restore_core, psf_length=50, fft_backend="pallas",
                filter_name="rl", white_balance=True,
                emit_planes=False, rl_iters=n)))
            results[f"feat_rl{iters}"] = measure(
                f"richardson-lucy {iters} iters", rl, (img_u8, ang, k))
        results["feat_base2"] = measure(
            "wiener serving (re-measure)", base, (img_u8, ang, k))

    if "batchwb" in which:
        # strided WB stats on the batched serving path: 64x256² stack
        # (BASELINE config 3), exact vs stride-4 per-image L means.
        from fft_restoration_tpu.models.batched import _batched_images_core

        stack = jax.device_put(jnp.asarray(
            (np.random.default_rng(3).random((64, 256, 256, 3)) * 255)
            .astype(np.uint8)))

        def batched(stride):
            return jax.jit(functools.partial(
                _batched_images_core, psf_length=25, fft_backend="pallas",
                filter_name="wiener", white_balance=True,
                emit_planes=False, wb_stats_stride=stride))

        b1 = compile_guarded(lambda: batched(1))
        b4 = compile_guarded(lambda: batched(4))
        o1 = np.asarray(b1(stack, ang, k)[0])
        o4 = np.asarray(b4(stack, ang, k)[0])
        print(f"  batch wb-stride parity (uint8 max abs diff): "
              f"{np.abs(o1.astype(np.int32) - o4.astype(np.int32)).max()}")
        results["batchwb1"] = measure(
            "batch64 256² wb_stride=1", b1, (stack, ang, k))
        results["batchwb4"] = measure(
            "batch64 256² wb_stride=4", b4, (stack, ang, k))

    if "engine" in which:
        mxu = compile_guarded(lambda: pallas_pipe(fft_engine="mxu"))
        roll = compile_guarded(lambda: pallas_pipe(fft_engine="roll"))
        out_m = np.asarray(mxu(img, ang, k)[0])
        out_r = np.asarray(roll(img, ang, k)[0])
        diff = np.max(np.abs(out_m.astype(np.int32) - out_r.astype(np.int32)))
        print(f"engine parity (uint8 max abs diff mxu vs roll): {diff}")
        results["mxu"] = measure("pallas engine=mxu (hybrid MXU)", mxu, (img, ang, k))
        results["roll"] = measure("pallas engine=roll (all-roll)", roll, (img, ang, k))

    if "select" in which or "realout" in which:
        new = compile_guarded(lambda: pallas_pipe())
        results["adopted"] = measure("pallas (select+realout, adopted)", new, (img, ang, k))

    if "select" in which:
        # round-1 arithmetic-blend stages, monkeypatched
        from jax.experimental.pallas import tpu as pltpu

        def _dit_blend(x_re, x_im, wc, ws, m, half, n):
            p_re = pltpu.roll(x_re, n - half, axis=1)
            p_im = pltpu.roll(x_im, n - half, axis=1)
            q_re = pltpu.roll(x_re, half, axis=1)
            q_im = pltpu.roll(x_im, half, axis=1)
            wp_re = wc * p_re - ws * p_im
            wp_im = wc * p_im + ws * p_re
            wx_re = wc * x_re - ws * x_im
            wx_im = wc * x_im + ws * x_re
            x_re = m * (x_re + wp_re) + (1.0 - m) * (q_re - wx_re)
            x_im = m * (x_im + wp_im) + (1.0 - m) * (q_im - wx_im)
            return x_re, x_im

        def _dif_blend(x_re, x_im, wc, ws, m, half, n):
            p_re = pltpu.roll(x_re, n - half, axis=1)
            p_im = pltpu.roll(x_im, n - half, axis=1)
            q_re = pltpu.roll(x_re, half, axis=1)
            q_im = pltpu.roll(x_im, half, axis=1)
            d_re = q_re - x_re
            d_im = q_im - x_im
            wd_re = wc * d_re - ws * d_im
            wd_im = wc * d_im + ws * d_re
            x_re = m * (x_re + p_re) + (1.0 - m) * wd_re
            x_im = m * (x_im + p_im) + (1.0 - m) * wd_im
            return x_re, x_im

        saved = fk._dit_stage, fk._dif_stage
        fk._dit_stage, fk._dif_stage = _dit_blend, _dif_blend
        try:
            old = compile_guarded(lambda: pallas_pipe())
            results["blend"] = measure("pallas (arith-blend stages)", old, (img, ang, k))
        finally:
            fk._dit_stage, fk._dif_stage = saved

    if "donate" in which:
        nodon = compile_guarded(lambda: pallas_pipe())
        don = compile_guarded(lambda: pallas_pipe(donate_argnums=(0,)))

        # donation invalidates the input; re-put a fresh copy per call
        base = np.asarray(rng.random((H, W, 3), np.float32))

        def run_donating(iters):
            t0 = time.perf_counter()
            for _ in range(iters):
                x = jax.device_put(jnp.asarray(base))
                out = don(x, ang, k)
            sync(out)
            return (time.perf_counter() - t0) / iters * 1e3

        def run_plain(iters):
            t0 = time.perf_counter()
            for _ in range(iters):
                x = jax.device_put(jnp.asarray(base))
                out = nodon(x, ang, k)
            sync(out)
            return (time.perf_counter() - t0) / iters * 1e3

        sync(don(jax.device_put(jnp.asarray(base)), ang, k))
        sync(nodon(jax.device_put(jnp.asarray(base)), ang, k))
        d = min(run_donating(10) for _ in range(3))
        p = min(run_plain(10) for _ in range(3))
        print(f"donation ON  (incl. re-put): {d:7.2f} ms", flush=True)
        print(f"donation OFF (incl. re-put): {p:7.2f} ms", flush=True)
        results["donate"] = (d, p)

    if "twrite" in which:
        # Can an in-kernel VMEM transpose + transposed block writes beat
        # kernel + separate XLA transpose (an HBM round trip)?
        from fft_restoration_tpu.ops.pallas.fft_kernel import fft_rows_pallas

        n = 2048
        planes = 2
        x = jax.device_put(jnp.asarray(rng.random((planes * n, n), np.float32)))
        y = jax.device_put(jnp.asarray(rng.random((planes * n, n), np.float32)))

        def fwd_then_xla_t(re, im):
            r, i = fft_rows_pallas(re, im, False, ordering="revorder")
            r = r.reshape(planes, n, n)
            i = i.reshape(planes, n, n)
            return jnp.swapaxes(r, -1, -2), jnp.swapaxes(i, -1, -2)

        def fwd_twrite(re, im):
            r, i = fft_rows_pallas(
                re.reshape(planes, n, n),
                im.reshape(planes, n, n),
                False,
                ordering="revorder",
                transposed_output=True,
            )
            return r, i

        fa = compile_guarded(lambda: jax.jit(fwd_then_xla_t))
        results["xla_t"] = measure("fwd pass + XLA transpose", fa, (x, y))
        try:
            fb = compile_guarded(lambda: jax.jit(fwd_twrite))
            results["twrite"] = measure("fwd pass, transposed writes", fb, (x, y))
            # correctness cross-check
            ra = fa(x, y)
            rb = fb(x, y)
            d = max(
                float(jnp.abs(ra[0] - rb[0]).max()),
                float(jnp.abs(ra[1] - rb[1]).max()),
            )
            print(f"twrite parity maxdiff: {d:.2e}", flush=True)
        except Exception as e:
            print(f"twrite variant failed: {str(e)[:300]}", flush=True)
        results["xla_t2"] = measure("fwd pass + XLA transpose (re)", fa, (x, y))

    if "radix4" in which:
        from fft_restoration_tpu.ops.pallas.fft_kernel import fft_rows_pallas
        from fft_restoration_tpu.ops.pallas.fft_radix4 import fft_rows_radix4_fwd

        x = jax.device_put(
            jnp.asarray(rng.random((3 * 2048, 2048), np.float32))
        )
        r2 = compile_guarded(
            lambda: jax.jit(
                lambda v: fft_rows_pallas(v, None, False, ordering="revorder")
            )
        )
        r4 = compile_guarded(lambda: jax.jit(lambda v: fft_rows_radix4_fwd(v)))
        results["r2pass"] = measure("radix-2 fwd pass (6144,2048)", r2, (x,))
        results["r4pass"] = measure("radix-4 fwd pass (6144,2048)", r4, (x,))
        results["r2pass2"] = measure("radix-2 fwd pass (re-measure)", r2, (x,))

    if "megakernel" in which:
        # The round-1 megakernel (fwd+filter+inv in one body) lost at
        # the default auto-sized blocks (VMEM spill). Re-test the middle
        # section at smaller block_rows: megakernel vs the adopted
        # half-fused + separate inverse composition.
        from fft_restoration_tpu.ops.pallas.fft_kernel import fft_rows_pallas
        from fft_restoration_tpu.ops.pallas.wiener_spectral import (
            fwd_wiener_rows_pallas,
            wiener_spectral_rows_pallas,
        )

        are = jax.device_put(jnp.asarray(rng.random((3, 2048, 2048), np.float32)))
        aim = jax.device_put(jnp.asarray(rng.random((3, 2048, 2048), np.float32)))
        hr = jax.device_put(jnp.asarray(rng.random((2048, 2048), np.float32)))
        hi = jax.device_put(jnp.asarray(rng.random((2048, 2048), np.float32)))

        def unfused(are, aim, hr, hi):
            F = fwd_wiener_rows_pallas((are, aim), (hr, hi), 0.01)
            return fft_rows_pallas(F[0], F[1], True, ordering="revorder")

        fu = compile_guarded(lambda: jax.jit(unfused))
        results["mid_unfused"] = measure(
            "middle: half-fused + inv pass", fu, (are, aim, hr, hi)
        )
        for br in (32, 64, 128):
            fm = compile_guarded(
                lambda br=br: jax.jit(
                    lambda a, b, c, d: wiener_spectral_rows_pallas(
                        (a, b), (c, d), 0.01, block_rows=br
                    )
                )
            )
            results[f"mega{br}"] = measure(
                f"middle: megakernel block_rows={br}", fm, (are, aim, hr, hi)
            )
        results["mid_unfused2"] = measure(
            "middle: half-fused + inv (re-measure)", fu, (are, aim, hr, hi)
        )

    # interleaved re-measure of adopted to bracket pool drift
    if "adopted" in results:
        results["adopted2"] = measure(
            "pallas (adopted, re-measure)",
            compile_guarded(lambda: pallas_pipe()),
            (img, ang, k),
        )


if __name__ == "__main__":
    main()
