#!/usr/bin/env python
"""Benchmark: 2048x2048 RGB Wiener restoration throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N,
   "backend": ..., "rtt_ms": N, "rounds_ms": [...], "spread": N,
   "contended": bool, "oracle_ms": N}

`value` is restored megapixels/second through the flagship single-chip
pipeline (pallas revorder FFT kernels) at the BASELINE.json north-star
config (2048^2, PSF(50, 30deg), K=0.01), steady-state.

`vs_baseline` is the speedup over the serial oracle on this host — the
same "[Speedup] x.xx vs serial" semantic every reference driver reports
(/root/reference/simd.cpp:98, gpu.cpp:105). The reference publishes no
absolute numbers (BASELINE.md), so speedup-vs-serial is its own metric.

Measurement integrity on a POOL-SHARED tunneled chip (the round-1
failure mode — a contended window recorded 28 ms for a 2.4 ms pipeline):
  * the fixed host-fetch RTT is estimated from interleaved noop probes
    and subtracted; per-round RTT drift marks contention,
  * rounds run in several batches spread over time, best-of wins
    (steady-state capability, not instantaneous pool luck),
  * if the round spread stays > 2x, more batches are run (up to a time
    budget) and the result is flagged "contended": true,
  * a known-FLOPs probe (4096^3 f32 matmul) measures device health
    independently of our pipeline: a quiet v5e sustains tens of f32
    TFLOP/s on it, a saturated pool reads ~1-2. probe_tflops below
    PROBE_TFLOPS_QUIET also sets "contended" (sustained pool load has
    LOW spread — spread alone cannot detect it, measured 2026-08-16),
  * the chosen backend is recorded — a pallas-compile failure falls back
    to matmul VISIBLY in the JSON, never silently.

Timing note: the axon tunnel's block_until_ready does not block, so we
amortize N queued dispatches between two small host fetches.
"""

import json
import signal
import sys
import time

import numpy as np

H = W = 2048
PSF_LEN = 50
PSF_ANGLE = 30.0
K = 0.01
ITERS = 30
ROUNDS_PER_BATCH = 5
MAX_BATCHES = 5
BATCH_GAP_S = 15.0
SPREAD_OK = 2.0
MEASURE_BUDGET_S = 420.0
PROBE_TFLOPS_QUIET = 5.0


def _sync(x):
    # slice ON DEVICE first: np.asarray(full_array) would drag the whole
    # buffer through the ~140 MB/s tunnel (~90 ms for the uint8 frame),
    # inflating amortized timings by ~3 ms/frame
    return np.asarray(x[(0,) * x.ndim])


class _CompileTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise _CompileTimeout()


def _compile_pipeline(x, ang, k):
    """Compile the flagship pipeline; pallas first, matmul fallback.

    The axon remote Mosaic compiler is intermittently flaky (HTTP 500s,
    multi-minute hangs), so each compile is alarm-guarded. The fallback
    is RECORDED in the output JSON via the returned backend name."""
    import functools

    import jax

    from fft_restoration_tpu.models.pipeline import _restore_core
    from fft_restoration_tpu.ops.pallas.fft_kernel import set_mxu_precision

    # flagship precision: bf16 MXU group DFTs (-31% device time, passes
    # the reference's gpu tier at PSNR ~53 dB — docs/PERF.md round 3)
    set_mxu_precision("default")

    for backend, budget_s in (("pallas", 420), ("matmul", 240)):
        try:
            core = functools.partial(
                _restore_core,
                psf_length=PSF_LEN,
                fft_backend=backend,
                filter_name="wiener",
                white_balance=True,
                # serving graph: ship the uint8 image only — the f32
                # diagnostic planes are a 50 MB HBM materialization
                # per frame that only verification consumes
                emit_planes=False,
                # strided WB stats (8-row stripes, every 4th): -0.15 ms
                # device at 2048² for <=1 uint8 count of parity — the
                # same adopt-with-documented-parity trade as bf16 MXU
                # DFTs (docs/PERF.md round 3)
                wb_stats_stride=4,
            )
            old = signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(budget_s)
            try:
                if backend == "pallas":
                    # the production serving path: the fixed PSF's own
                    # spectrum is computed once (WienerDeblurPipeline
                    # cache_psf_spectrum) and fed to the restore graph
                    from fft_restoration_tpu.models.pipeline import (
                        psf_spectrum_planes,
                    )
                    from fft_restoration_tpu.ops.psf import (
                        motion_blur_kernel,
                    )

                    h_fn = jax.jit(
                        lambda a: psf_spectrum_planes(
                            motion_blur_kernel(PSF_LEN, a), H, W,
                            psf_rows=PSF_LEN,
                        )
                    )
                    hre, him = h_fn(ang)
                    raw = jax.jit(core)
                    cand = lambda x, a, kk: raw(x, a, kk, hre, him)
                else:
                    cand = jax.jit(core)
                out = cand(x, ang, k)
                _sync(out)  # compile + warm
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
            print(f"backend: {backend}", file=sys.stderr)
            return cand, backend
        except _CompileTimeout:
            print(f"backend {backend}: compile timed out", file=sys.stderr)
        except Exception as e:  # compile-service failure
            print(f"backend {backend} failed: {str(e)[:200]}", file=sys.stderr)
    return None, None


def main():
    import jax
    import jax.numpy as jnp

    # persistent executable cache: repeated bench runs skip the
    # minutes-long Mosaic compile (and its flaky remote helper)
    from fft_restoration_tpu.cli import _enable_compile_cache

    _enable_compile_cache()

    rng = np.random.default_rng(0)
    # uint8 frame: the production ingest contract (restore() ships uint8
    # and converts on-device after the channel de-interleave)
    img = (rng.random((H, W, 3)) * 255).astype(np.uint8)

    def _emit_failure(why: str):
        # Emit an interpretable artifact instead of crashing/hanging:
        # the driver's record then says WHY there is no number.
        print(
            json.dumps(
                {
                    "metric": "wiener_deblur_2048sq_rgb_throughput",
                    "value": None,
                    "unit": "MP/s",
                    "vs_baseline": None,
                    "backend": None,
                    "contended": True,
                    "error": why + "; see docs/PERF.md measurement "
                    "model. Last healthy quiet-window record: "
                    "BASELINE.md",
                }
            )
        )

    # Device INIT can itself hang when the pool tunnel is down; SIGALRM
    # can't guard it (see utils/devwatch.py) — a watchdog thread emits
    # the failure artifact and exits instead of wedging the driver.
    from fft_restoration_tpu.utils.devwatch import arm as _arm_watchdog

    init_done = _arm_watchdog(
        300.0,
        lambda: _emit_failure(
            "device initialization did not complete within 300 s "
            "(pool tunnel unresponsive)"
        ),
    )
    x = jax.device_put(jnp.asarray(img))
    init_done.set()
    ang = jnp.float32(PSF_ANGLE)
    k = jnp.float32(K)

    fn, backend = _compile_pipeline(x, ang, k)
    if fn is None:
        # Total failure (e.g. an extreme pool-weather window where even
        # a cached-executable warm run exceeds the alarms — observed
        # 360 s for a trivial op on 2026-08-17).
        _emit_failure(
            "no backend completed a warm run within the alarm budget "
            "(pool tunnel unresponsive)"
        )
        return

    noop = jax.jit(lambda a: a * 1.0)
    small = jax.device_put(jnp.ones((8, 8)))
    _sync(noop(small))

    def probe_rtt(n=5):
        rtts = []
        for _ in range(n):
            t0 = time.perf_counter()
            _sync(noop(small))
            rtts.append(time.perf_counter() - t0)
        return sorted(rtts)[len(rtts) // 2]

    # Device-health probe: known-FLOPs workload, best of 3 amortized.
    pa = jax.device_put(jnp.asarray(rng.random((4096, 4096), np.float32)))
    pmm = jax.jit(lambda a: a @ a)
    _sync(pmm(pa))
    probe_ms = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            o = pmm(pa)
        _sync(o)
        probe_ms = min(probe_ms, (time.perf_counter() - t0) / 10 * 1e3)
    probe_tflops = 2 * 4096**3 / (probe_ms / 1e3) / 1e12
    print(f"device-health probe: {probe_tflops:.2f} f32 TFLOP/s", file=sys.stderr)

    def one_round(rtt):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(x, ang, k)
        _sync(out)
        t_total = time.perf_counter() - t0
        return max((t_total - rtt) / ITERS, 1e-9) * 1e3

    # Batches of rounds with interleaved RTT probes, spread over time.
    t_begin = time.perf_counter()
    rounds = []
    rtts = []
    for batch in range(MAX_BATCHES):
        rtt = probe_rtt()
        rtts.append(rtt)
        batch_rounds = [one_round(rtt) for _ in range(ROUNDS_PER_BATCH)]
        rounds.extend(batch_rounds)
        spread = max(rounds) / min(rounds)
        print(
            f"batch {batch}: rtt {rtt * 1e3:.1f} ms, rounds "
            f"{[round(r, 2) for r in batch_rounds]} ms, spread {spread:.2f}x",
            file=sys.stderr,
        )
        elapsed = time.perf_counter() - t_begin
        # Enough batches AND a stable spread -> done; otherwise keep
        # sampling (pool contention comes in windows) within the budget.
        if batch >= 1 and spread <= SPREAD_OK:
            break
        if elapsed + BATCH_GAP_S + 10.0 > MEASURE_BUDGET_S:
            break
        time.sleep(BATCH_GAP_S)

    ms_per_frame = min(rounds)
    spread = max(rounds) / min(rounds)
    contended = spread > SPREAD_OK or probe_tflops < PROBE_TFLOPS_QUIET
    mp_per_s = (H * W * 3 / 1e6) / (ms_per_frame / 1e3)

    # Device-timeline cost (the cudaEvent-profiler analog): time on the
    # TPU itself from a jax.profiler trace — no host RTT, no tunnel
    # queueing. This is the per-frame cost a dedicated (non-pool) chip
    # would deliver; host-observed `value` additionally pays the shared
    # tunnel. Best-effort: tracing can fail on the remote backend.
    device_ms = None
    phases_ms = None
    try:
        from fft_restoration_tpu.utils.trace_profile import device_trace

        rep = device_trace(fn, (x, ang, k), n_iters=10)
        if rep.device_total_ms > 0:
            device_ms = rep.device_total_ms
            phases_ms = {
                k2: round(v, 3) for k2, v in rep.phases_ms.items()
            }
            print(
                f"device timeline: {device_ms:.2f} ms/frame busy "
                f"(span {rep.device_span_ms:.2f})",
                file=sys.stderr,
            )
    except Exception as e:
        print(f"device trace unavailable: {str(e)[:150]}", file=sys.stderr)

    # serial-oracle reference (the in-binary oracle every reference
    # driver times itself against). Host load skews this too: take the
    # faster of two runs.
    from fft_restoration_tpu.oracle.psf import motion_blur_kernel_oracle
    from fft_restoration_tpu.oracle.serial import restore_channels

    psf = motion_blur_kernel_oracle(PSF_LEN, PSF_ANGLE)
    chans = np.moveaxis(img, -1, 0)
    oracle_ms = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        restore_channels(chans, psf, K)
        oracle_ms = min(oracle_ms, (time.perf_counter() - t0) * 1e3)
    speedup = oracle_ms / ms_per_frame

    print(
        f"2048x2048x3 Wiener deblur: {ms_per_frame:.2f} ms/frame on "
        f"{jax.devices()[0].device_kind}, serial oracle {oracle_ms:.0f} ms, "
        f"speedup {speedup:.1f}x"
        + (" [CONTENDED POOL — value is best-of]" if contended else ""),
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "wiener_deblur_2048sq_rgb_throughput",
                "value": round(mp_per_s, 1),
                "unit": "MP/s",
                "vs_baseline": round(speedup, 2),
                "backend": backend,
                "mxu_precision": "default",
                "rtt_ms": round(min(rtts) * 1e3, 2),
                "rounds_ms": [round(r, 2) for r in rounds],
                "spread": round(spread, 2),
                "probe_tflops": round(probe_tflops, 2),
                "contended": contended,
                "oracle_ms": round(oracle_ms, 1),
                "device_ms_per_frame": (
                    round(device_ms, 2) if device_ms else None
                ),
                "device_mp_per_s": (
                    round((H * W * 3 / 1e6) / (device_ms / 1e3), 1)
                    if device_ms
                    else None
                ),
                # reference 6-phase taxonomy from the device timeline
                # (fphase_* named scopes; 'spectral_fused' = colFFT+
                # Wiener+colIFFT in one Mosaic kernel)
                "phases_device_ms": phases_ms,
            }
        )
    )


if __name__ == "__main__":
    # Init-retry armor (round-4 post-mortem): the parent process
    # supervises a re-exec'd child and retries device-init hangs with
    # backoff, so a transient tunnel outage can't void the artifact.
    from fft_restoration_tpu.utils.bench_retry import main_with_retries

    main_with_retries(main)
