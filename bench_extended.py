#!/usr/bin/env python
"""Extended benchmark: all BASELINE.json configs on the current device.

Prints one JSON line per config (bench.py stays the single-line headline
harness for the driver). Configs (BASELINE.json):
  1. cat_blurred.png PSF(50, 30)      — real fixture, 1920x782
  2. car_blurred.png PSF(40, 45)      — real fixture, 640x330
  3. 64-image 256^2 batch, shared PSF — vmap/batch-axes config
  4. 4K non-square 3840x2160 + PSF grid sweep
  5. sharded correctness is covered in tests (single real chip here)
"""

import json
import sys
import time

import numpy as np


def _sync(x):
    # on-device slice first (see bench.py): full np.asarray would pull
    # the whole buffer through the tunnel and distort amortized timings
    return np.asarray(x[(0,) * x.ndim])


_RTT = None


def _fetch_rtt():
    """Median trivial round-trip, measured once (see bench.py notes)."""
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp

        noop = jax.jit(lambda a: a * 1.0)
        small = jax.device_put(jnp.ones((8, 8)))
        _sync(noop(small))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(noop(small))
            ts.append(time.perf_counter() - t0)
        _RTT = sorted(ts)[len(ts) // 2]
    return _RTT


def bench_call(fn, args, iters=10):
    out = fn(*args)
    _sync(jax_leaves(out)[0])
    rtt = _fetch_rtt()

    def one_round():
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(jax_leaves(out)[0])
        return (time.perf_counter() - t0 - rtt) / iters * 1e3

    best = min(one_round() for _ in range(3))
    # sub-RTT workloads (e.g. the car fixture at ~0.4 ms/frame) make the
    # RTT subtraction degenerate; report None rather than a fantasy
    return best if best > 0.05 else None


def device_ms(fn, args, iters=5):
    """Device-busy ms/iter from a jax.profiler trace (None on failure)."""
    try:
        from fft_restoration_tpu.utils.trace_profile import device_trace

        rep = device_trace(fn, args, n_iters=iters)
        return round(rep.device_total_ms, 2) if rep.device_total_ms else None
    except Exception:
        return None


def jax_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def main(backend="matmul"):
    import functools

    import jax
    import jax.numpy as jnp

    from fft_restoration_tpu.models.batched import _batched_images_core
    from fft_restoration_tpu.models.pipeline import _restore_core
    from fft_restoration_tpu.utils.devwatch import arm as _arm_watchdog
    from fft_restoration_tpu.utils.imageio import imread

    # device init hangs when the pool tunnel is down and SIGALRM can't
    # reach it (utils/devwatch.py) — emit a record instead of wedging
    init_done = _arm_watchdog(
        300.0,
        lambda: print(
            json.dumps(
                {
                    "metric": "extended_bench",
                    "value": None,
                    "error": "device initialization did not complete "
                    "within 300 s (pool tunnel unresponsive)",
                }
            )
        ),
    )
    _probe = jax.device_put(jnp.ones((8, 8)))
    np.asarray(_probe[0, 0])
    init_done.set()

    results = []

    def run_single(name, img, length, angle, pad_mode="pow2"):
        fn = jax.jit(
            functools.partial(
                _restore_core,
                psf_length=length,
                fft_backend=backend,
                filter_name="wiener",
                white_balance=True,
                pad_mode=pad_mode,
            )
        )
        x = jax.device_put(jnp.asarray(img.astype(np.float32) / 255.0))
        a = (x, jnp.float32(angle), jnp.float32(0.01))
        ms = bench_call(fn, a)
        mp = img.shape[0] * img.shape[1] * 3 / 1e6
        results.append(
            {"metric": name,
             "value": round(ms, 2) if ms else None, "unit": "ms/frame",
             "mp_per_s": round(mp / ms * 1e3, 1) if ms else None,
             "device_ms": device_ms(fn, a)}
        )

    cat = imread("/root/reference/input/cat_blurred.png")
    run_single("cat_1920x782_psf50_30", cat, 50, 30.0)
    car = imread("/root/reference/input/car_blurred.png")
    run_single("car_640x330_psf40_45", car, 40, 45.0)

    # config 3: 64-image 256^2 stack, shared PSF
    rng = np.random.default_rng(0)
    stack = (rng.random((64, 256, 256, 3)) * 255).astype(np.uint8)
    # full serving path: restore + per-frame device white balance + uint8
    bfn = jax.jit(
        functools.partial(
            _batched_images_core,
            psf_length=25,
            fft_backend=backend,
            filter_name="wiener",
            white_balance=True,
        )
    )
    xs = jax.device_put(jnp.asarray(stack))
    ba = (xs, jnp.float32(30.0), jnp.float32(0.01))
    ms = bench_call(bfn, ba, iters=5)
    mp = 64 * 256 * 256 * 3 / 1e6
    results.append(
        {"metric": "batch64_256sq_shared_psf",
         "value": round(ms, 2) if ms else None, "unit": "ms/batch",
         "mp_per_s": round(mp / ms * 1e3, 1) if ms else None,
         "device_ms": device_ms(bfn, ba, iters=3)}
    )

    # config 3b (VERDICT r4 #8): flagship-size batch — 8 frames of
    # 2048^2x3 through the same serving graph, amortizing launch/ingest
    # over the batch the way the reference's per-driver channel loop
    # does (/root/reference/serial.cpp:34-39). device_ms is the honest
    # per-batch busy figure to compare against 8x the single-frame
    # headline (bench.py device_ms_per_frame).
    stack8 = (rng.random((8, 2048, 2048, 3)) * 255).astype(np.uint8)
    b8fn = jax.jit(
        functools.partial(
            _batched_images_core,
            psf_length=50,
            fft_backend=backend,
            filter_name="wiener",
            white_balance=True,
        )
    )
    xs8 = jax.device_put(jnp.asarray(stack8))
    ba8 = (xs8, jnp.float32(30.0), jnp.float32(0.01))
    try:
        ms = bench_call(b8fn, ba8, iters=3)
        dms = device_ms(b8fn, ba8, iters=3)
        mp = 8 * 2048 * 2048 * 3 / 1e6
        results.append(
            {"metric": "batch8_2048sq_shared_psf",
             "value": round(ms, 2) if ms else None, "unit": "ms/batch",
             "mp_per_s": round(mp / ms * 1e3, 1) if ms else None,
             "device_ms": dms,
             "device_mp_per_s": round(mp / dms * 1e3, 1) if dms else None}
        )
    except Exception as e:  # HBM pressure must not void the other rows
        results.append(
            {"metric": "batch8_2048sq_shared_psf", "value": None,
             "error": str(e)[:200]}
        )
    del xs8, ba8, b8fn

    # config 4: 4K non-square (pads to 4096x4096)
    uhd = (rng.random((2160, 3840, 3)) * 255).astype(np.uint8)
    run_single("uhd_3840x2160_psf50_30", uhd, 50, 30.0)
    if backend == "pallas":
        # mixed-radix smooth pad: restores at 3840x2304 instead of
        # 4096x4096 (docs/PERF.md round 3, -39% device time)
        run_single(
            "uhd_3840x2160_psf50_30_smoothpad", uhd, 50, 30.0,
            pad_mode="smooth",
        )

        # round-3 tiled giant-frame config: device-resident 25.2 MP
        # restore (models/tiled.py). End-to-end host wall-clock — the
        # figure is tunnel-transfer-bound (device span 27.8 ms,
        # docs/PERF.md); warm-then-timed like the other configs.
        import time as _time

        from fft_restoration_tpu.models.tiled import tiled_restore_image

        big = (rng.random((4096, 6144, 3)) * 255).astype(np.uint8)
        try:
            tiled_restore_image(big, 50, 30.0, tile=1024, fft_backend=backend)
            t0 = _time.perf_counter()
            tiled_restore_image(big, 50, 30.0, tile=1024, fft_backend=backend)
            ms = (_time.perf_counter() - t0) * 1e3
            results.append(
                {"metric": "tiled_4096x6144_tile1024",
                 "value": round(ms, 1), "unit": "ms/frame (end-to-end)",
                 "mp_per_s": round(25.17 / ms * 1e3, 1)}
            )
        except Exception as e:  # keep the other configs' output intact
            results.append(
                {"metric": "tiled_4096x6144_tile1024", "value": None,
                 "error": str(e)[:200]}
            )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    # Init-retry armor (see utils/bench_retry.py): passthrough mode
    # because this harness prints one JSON line per config.
    from fft_restoration_tpu.utils.bench_retry import main_with_retries

    # flagship backend by default; pass 'matmul' etc. to override
    main_with_retries(
        lambda: main(sys.argv[1] if len(sys.argv) > 1 else "pallas"),
        passthrough=True,
    )
