#!/usr/bin/env python
"""Device-health probe for the pool-shared TPU: one JSON line to stdout.

{"ts": ..., "rtt_ms": ..., "probe_tflops": ..., "quiet": bool}

A known-FLOPs f32 matmul measures what the pool currently delivers; the
pipeline's own numbers are only comparable across sessions when this
probe reads quiet (docs/PERF.md methodology). Used by the round-2
quiet-window watcher and available for deployment health checks.
"""

import json
import time

import numpy as np

QUIET_TFLOPS = 5.0


def probe(size: int = 4096, iters: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    def sync(x):
        # on-device slice first: fetching the full (size, size) product
        # through the ~140 MB/s tunnel adds ~50 ms/iter and deflates the
        # TFLOP/s reading below the quiet threshold even on an idle chip
        # (this bug hid every real quiet window from the watcher)
        return np.asarray(x[(0,) * x.ndim])

    noop = jax.jit(lambda a: a * 1.0)
    small = jax.device_put(jnp.ones((8, 8)))
    sync(noop(small))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(noop(small))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = sorted(rtts)[2] * 1e3

    a = jax.device_put(
        jnp.asarray(np.random.default_rng(0).random((size, size), np.float32))
    )
    mm = jax.jit(lambda a: a @ a)
    sync(mm(a))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = mm(a)
        sync(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    tflops = 2 * size**3 / best / 1e12
    return {
        "ts": round(time.time(), 1),
        "rtt_ms": round(rtt_ms, 1),
        "probe_tflops": round(tflops, 2),
        "quiet": tflops >= QUIET_TFLOPS,
    }


def _unreachable_record():
    print(
        json.dumps(
            {
                "ts": round(time.time(), 1),
                "rtt_ms": None,
                "probe_tflops": None,
                "quiet": False,
                "error": "pool unreachable (no response in 300 s)",
            }
        )
    )


def _main():
    # device init hangs when the tunnel is down and SIGALRM can't reach
    # it (utils/devwatch.py): a watchdog thread keeps the probe honest
    from fft_restoration_tpu.utils.devwatch import arm

    done = arm(300.0, _unreachable_record)
    out = json.dumps(probe())
    done.set()
    print(out)


if __name__ == "__main__":
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    # Init-retry armor: the supervisor retries transient tunnel outages
    # with backoff (utils/bench_retry.py, round-4 post-mortem).
    from fft_restoration_tpu.utils.bench_retry import main_with_retries

    main_with_retries(_main)
