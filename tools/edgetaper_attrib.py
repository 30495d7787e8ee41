"""Attribute a served edgetaper request's latency (VERDICT r4 weak #2).

Measures, for the big smooth-pad fixture (cat, 1920x782) and the small
one (car, 640x330), each serving pipeline stage in-process:

  decode_ms   PNG bytes -> BGR ndarray (the server's ingest)
  device_ms   device-busy of the jitted restore (same-process trace),
              wiener vs edgetaper variants
  host_ms     host-observed restore wall time (includes transfers)
  encode_ms   restored ndarray -> PNG bytes (the server's egress)

The residue between SERVE_r05 per-class p50 and decode+host+encode is
queueing + HTTP.  Writes docs/serve_attrib_r5.json and prints a table.
Run on the real chip (no JAX_PLATFORMS override), server stopped.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _t(fn, *a, n=5, **kw):
    fn(*a, **kw)  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(*a, **kw)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    from fft_restoration_tpu.models.pipeline import WienerDeblurPipeline
    from fft_restoration_tpu.utils.imageio import decode_image_bgr, encode_png
    from fft_restoration_tpu.utils.trace_profile import device_trace

    out = {}
    for tag, path in (
        ("car_640x330", "/root/reference/input/car_blurred.png"),
        ("cat_1920x782", "/root/reference/input/cat_blurred.png"),
    ):
        body = open(path, "rb").read()
        img = decode_image_bgr(body)
        decode_ms = _t(decode_image_bgr, body)
        row = {"decode_ms": round(decode_ms, 1), "shape": list(img.shape)}
        for opt in ("wiener", "edgetaper"):
            pipe = WienerDeblurPipeline(
                fft_backend="pallas",
                emit_planes=False,
                pad_mode="pow2",
                edgetaper=(opt == "edgetaper"),
            )
            host_ms = _t(lambda: np.asarray(pipe.restore(img, 50, 30.0, 0.01)))
            restored = np.asarray(pipe.restore(img, 50, 30.0, 0.01))
            try:
                dev = device_trace(lambda a: pipe.restore(a, 50, 30.0, 0.01), (img,), n_iters=5)
                dev_ms = dev.device_span_ms
            except Exception as e:  # trace is best-effort on the pool
                dev_ms = None
                row.setdefault("trace_err", repr(e))
            enc_ms = _t(encode_png, restored[..., ::-1] if restored.ndim == 3 else restored)
            row[opt] = {
                "host_restore_ms": round(host_ms, 1),
                "device_busy_ms": round(dev_ms, 2) if dev_ms else None,
                "encode_ms": round(enc_ms, 1),
            }
        out[tag] = row
        print(tag, json.dumps(row))
    with open("docs/serve_attrib_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/serve_attrib_r5.json")


if __name__ == "__main__":
    main()
