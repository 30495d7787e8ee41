"""Tunnel transfer experiments for the tiled giant-frame path.

VERDICT r3 #2: the 25.2 MP tiled restore is 27.8 ms of device span
inside ~5 s end-to-end — the 2x75 MB u8 host<->device round trip owns
~99% of wall clock. The reference's GPU mode pipelines pinned-memory
async H2D against compute (/root/reference/fft/fft_gpu.cu:279-394);
the analogous levers through the pool tunnel are measured here, same
process, interleaved (docs/PERF.md methodology):

  A. one blocking device_put of the full frame  (today's code)
  B. sequential chunked puts, scalar-sync each  (worst case)
  C. enqueued chunked puts, sync once           (does H2D pipeline?)
  D. full-frame fetch / chunked fetch           (D2H baseline)
  E. duplex: concurrent H2D + D2H threads       (can up overlap down?)
  F. banded pipeline: put band k+1 / restore k / fetch k-1
     (what a double-buffered tiled path would achieve)

Compute is 0.5% of wall, so (F) is bounded by the transfer results;
the decision this tool informs is recorded in docs/PERF.md round 4.

Run on the real chip (no test env vars): python tools/transfer_ab.py
"""

from __future__ import annotations

import argparse
import threading
import time

import numpy as np


def sync(x):
    np.asarray(x[(0,) * x.ndim])


def med(xs):
    return float(np.median(xs))


def run(reps: int = 3, h: int = 4096, w: int = 6144):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (h, w, 3), np.uint8)
    mb = frame.nbytes / 2**20
    n_bands = 8
    bands = np.array_split(frame, n_bands, axis=0)
    print(f"frame {h}x{w}x3 = {mb:.1f} MB, {n_bands} bands, reps={reps}")
    results = {}

    def timed(label, fn):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        results[label] = med(ts)
        print(
            f"{label:26s} {med(ts)*1e3:8.0f} ms  "
            f"{mb/med(ts):6.1f} MB/s  (all: {[f'{t*1e3:.0f}' for t in ts]})"
        )

    # A: blocking full-frame upload (what tiled_restore_image does today)
    def up_block():
        x = jax.device_put(frame)
        sync(x)

    # B: chunked, fully serialized (sync between puts)
    def up_chunks_seq():
        for b in bands:
            x = jax.device_put(b)
            sync(x)

    # C: chunked, enqueued (sync only at the end) — measures whether
    # the tunnel pipelines its serialize/send/write stages across puts
    def up_chunks_async():
        xs = [jax.device_put(b) for b in bands]
        for x in xs:
            sync(x)

    timed("A  up: 1 blocking put", up_block)
    timed("B  up: 8 puts, sync each", up_chunks_seq)
    timed("C  up: 8 puts, sync once", up_chunks_async)

    # D: downloads. A fetched jax.Array caches its host copy, so a
    # second np.asarray of the SAME array is free — every timed fetch
    # below reads a FRESH buffer minted by a jit call (new Array, no
    # host copy), prepared and synced OUTSIDE the timed region.
    dev = jax.device_put(frame)
    sync(dev)
    bump = jax.jit(lambda x: x + jnp.uint8(1))

    def fresh_full():
        x = bump(dev)
        sync(x)
        return x

    def fresh_bands():
        xs = [bump(jax.device_put(b)) for b in bands]
        for x in xs:
            sync(x)
        return xs

    def timed_prepared(label, prep, fn):
        ts = []
        for _ in range(reps):
            arg = prep()
            t0 = time.perf_counter()
            fn(arg)
            ts.append(time.perf_counter() - t0)
        results[label] = med(ts)
        print(
            f"{label:26s} {med(ts)*1e3:8.0f} ms  "
            f"{mb/med(ts):6.1f} MB/s  (all: {[f'{t*1e3:.0f}' for t in ts]})"
        )

    timed_prepared("D1 down: 1 full fetch", fresh_full, np.asarray)
    timed_prepared(
        "D2 down: 8 band fetches",
        fresh_bands,
        lambda xs: [np.asarray(x) for x in xs],
    )

    # E: duplex — D2H of one fresh frame in a thread while H2D of
    # another frame runs on the main thread. If the tunnel is
    # full-duplex the wall is ~max(A, D1); serialized, ~A + D1.
    def duplex(fresh):
        err = []

        def fetch():
            try:
                np.asarray(fresh)
            except Exception as e:  # record, don't hang the run
                err.append(e)

        t = threading.Thread(target=fetch)
        t.start()
        x = jax.device_put(frame)
        sync(x)
        t.join()
        if err:
            raise err[0]

    try:
        timed_prepared("E  duplex up||down", fresh_full, duplex)
    except Exception as e:
        print(f"E  duplex up||down       FAILED: {type(e).__name__}: {e}")
        results["E  duplex up||down"] = None

    # F: banded pipeline — the shape a double-buffered tiled restore
    # would take: for each band, enqueue H2D of band k while fetching
    # the (already-restored, fresh) band k-1. Compute is 0.5% of wall;
    # this isolates what the transfer schedule can save.
    def banded_pipeline(out_bands):
        fetched = []

        def fetch(i):
            fetched.append(np.asarray(out_bands[i]))

        threads = []
        for k, b in enumerate(bands):
            x = jax.device_put(b)  # enqueue upload of band k
            if k > 0:
                t = threading.Thread(target=fetch, args=(k - 1,))
                t.start()
                threads.append(t)
            sync(x)
        t = threading.Thread(target=fetch, args=(n_bands - 1,))
        t.start()
        threads.append(t)
        for t in threads:
            t.join()

    try:
        timed_prepared("F  banded up||down pipe", fresh_bands, banded_pipeline)
    except Exception as e:
        print(f"F  banded up||down pipe  FAILED: {type(e).__name__}: {e}")
        results["F  banded up||down pipe"] = None

    a, d1 = results["A  up: 1 blocking put"], results["D1 down: 1 full fetch"]
    e = results.get("E  duplex up||down")
    print("\nround trip today (A + D1): %.0f ms" % ((a + d1) * 1e3))
    if e:
        print(
            "duplex wall / max(A,D1) = %.2f   (1.0 = full duplex, "
            "%.2f = serialized)" % (e / max(a, d1), (a + d1) / max(a, d1))
        )
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--h", type=int, default=4096)
    p.add_argument("--w", type=int, default=6144)
    a = p.parse_args()
    run(a.reps, a.h, a.w)
