#!/usr/bin/env python
"""Benchmark: 2048x2048 RGB Wiener restoration throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

`value` is restored megapixels/second through the flagship single-chip
pipeline (pallas revorder FFT kernels) at the BASELINE.json north-star config
(2048^2, PSF(50, 30deg), K=0.01), steady-state.

`vs_baseline` is the speedup over the serial oracle on this host — the
same "[Speedup] x.xx vs serial" semantic every reference driver reports
(/root/reference/simd.cpp:98, gpu.cpp:105). The reference publishes no
absolute numbers (BASELINE.md), so speedup-vs-serial is its own metric.

Timing notes: the axon tunnel's block_until_ready does not block, so we
amortize N queued dispatches between two small host fetches.
"""

import json
import sys
import time

import numpy as np

H = W = 2048
PSF_LEN = 50
PSF_ANGLE = 30.0
K = 0.01
ITERS = 30


def _sync(x):
    return np.asarray(x).ravel()[0]


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from fft_restoration_tpu.models.pipeline import _restore_core

    rng = np.random.default_rng(0)
    img = rng.random((H, W, 3)).astype(np.float32)

    x = jax.device_put(jnp.asarray(img))
    ang = jnp.float32(PSF_ANGLE)
    k = jnp.float32(K)

    # Flagship backend is the pallas revorder path; the axon remote
    # Mosaic compiler is intermittently flaky (HTTP 500s, multi-minute
    # hangs), so guard each compile with an alarm and fall back to the
    # matmul (MXU four-step) backend.
    import signal

    class _CompileTimeout(Exception):
        pass

    def _alarm(signum, frame):
        raise _CompileTimeout()

    fn = None
    for backend, budget_s in (("pallas", 420), ("matmul", 240)):
        try:
            cand = jax.jit(
                functools.partial(
                    _restore_core,
                    psf_length=PSF_LEN,
                    fft_backend=backend,
                    filter_name="wiener",
                    white_balance=True,
                )
            )
            old = signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(budget_s)
            try:
                out = cand(x, ang, k)
                _sync(out[0])  # compile + warm
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
            fn = cand
            print(f"backend: {backend}", file=sys.stderr)
            break
        except _CompileTimeout:
            print(f"backend {backend}: compile timed out", file=sys.stderr)
        except Exception as e:  # compile-service failure
            print(f"backend {backend} failed: {str(e)[:200]}", file=sys.stderr)
    if fn is None:
        raise RuntimeError("no FFT backend compiled")

    # The tunneled chip is pool-shared, so single measurements are noisy;
    # estimate the fixed fetch RTT separately (median of trivial
    # round-trips) and take the best of 3 amortized rounds.
    noop = jax.jit(lambda a: a * 1.0)
    small = jax.device_put(jnp.ones((8, 8)))
    _sync(noop(small))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(noop(small))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]

    def one_round():
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(x, ang, k)
        _sync(out[0])
        t_total = time.perf_counter() - t0
        return max((t_total - rtt) / ITERS, 1e-9) * 1e3

    ms_per_frame = min(one_round() for _ in range(5))
    mp_per_s = (H * W * 3 / 1e6) / (ms_per_frame / 1e3)

    # serial-oracle reference (the in-binary oracle every reference
    # driver times itself against)
    from fft_restoration_tpu.oracle.psf import motion_blur_kernel_oracle
    from fft_restoration_tpu.oracle.serial import restore_channels

    psf = motion_blur_kernel_oracle(PSF_LEN, PSF_ANGLE)
    chans = np.moveaxis(img, -1, 0)
    t0 = time.perf_counter()
    restore_channels(chans, psf, K)
    oracle_ms = (time.perf_counter() - t0) * 1e3
    speedup = oracle_ms / ms_per_frame

    print(
        f"2048x2048x3 Wiener deblur: {ms_per_frame:.2f} ms/frame on "
        f"{jax.devices()[0].device_kind}, serial oracle {oracle_ms:.0f} ms, "
        f"speedup {speedup:.1f}x",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "wiener_deblur_2048sq_rgb_throughput",
                "value": round(mp_per_s, 1),
                "unit": "MP/s",
                "vs_baseline": round(speedup, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
