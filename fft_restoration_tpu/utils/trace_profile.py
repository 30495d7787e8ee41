"""Device-timeline profiling via jax.profiler traces.

The host-sync phase profiler (utils/timing.py + models/pipeline.py
profile_phases) pays one tunnel round trip per phase, and on the
pool-shared axon chip host wall-clock includes other tenants' queue
time. This module measures what the reference's cudaEvent Profiler
measures (/root/reference/fft/fft_gpu.cu:17-57): time ON THE DEVICE.

It runs a function under jax.profiler.trace, parses the emitted
trace.json.gz, and aggregates the device-lane events — per-op totals
and device-busy time per iteration. Device-event durations come from
the TPU's own timeline, so they exclude host RTT and other tenants'
work entirely: the honest per-frame cost on shared hardware.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from dataclasses import dataclass, field


@dataclass
class DeviceTraceReport:
    """Aggregated device-side timeline for n_iters executions."""

    n_iters: int
    device_total_ms: float  # sum of device op durations / n_iters
    device_span_ms: float  # (last end - first start) / n_iters
    ops_ms: dict = field(default_factory=dict)  # op name -> total ms (all iters)
    trace_dir: str = ""
    # reference phase taxonomy (fft_serial.cpp:249-258 / fft_gpu.cu:45-56)
    # per iteration, from the fphase_* named scopes in models/pipeline.py.
    # Fused kernels spanning several reference phases report under
    # 'spectral_fused' (colFFT+Wiener+colIFFT in one Mosaic kernel)
    # rather than being split by guesswork; ops outside any scope (psf
    # synthesis glue, copies) land in 'unattributed'.
    phases_ms: dict = field(default_factory=dict)

    def report(self, top: int = 12) -> str:
        if not self.ops_ms and self.device_total_ms == 0.0:
            return (
                "no device lanes in the trace (CPU backend?) — device-"
                f"timeline profiling needs the TPU; trace at {self.trace_dir}"
            )
        lines = [
            f"device timeline over {self.n_iters} iterations "
            f"(jax.profiler trace; excludes host RTT and other tenants):",
            f"  device busy : {self.device_total_ms:.3f} ms/iter",
            f"  device span : {self.device_span_ms:.3f} ms/iter",
        ]
        if self.phases_ms:
            lines.append("  phases (ms/iter, reference taxonomy):")
            for name, ms in sorted(
                self.phases_ms.items(), key=lambda kv: -kv[1]
            ):
                lines.append(f"    {ms:10.3f} ms  {name}")
        lines.append("  top ops (total across iters):")
        for name, ms in sorted(self.ops_ms.items(), key=lambda kv: -kv[1])[:top]:
            lines.append(f"    {ms:10.3f} ms  {name[:80]}")
        if self.trace_dir:
            lines.append(f"  full trace (TensorBoard): {self.trace_dir}")
        return "\n".join(lines)


def _parse_trace(trace_dir: str) -> tuple:
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device:" in n.lower()}
    # device lanes nest module events (jit_fn) over op events (fusion,
    # custom-call); count leaf ops only — module events would double.
    dev = [
        e
        for e in ev
        if e.get("ph") == "X" and e["pid"] in dev_pids and "dur" in e
    ]
    mods = [e for e in dev if e.get("name", "").startswith("jit")]
    ops = [e for e in dev if not e.get("name", "").startswith("jit")]
    return mods, ops


def device_trace(fn, args, n_iters: int = 10, trace_dir: str | None = None):
    """Run fn(*args) n_iters times under a profiler trace; aggregate the
    device lanes. fn must already be compiled/warm (call it once first).
    Returns a DeviceTraceReport."""
    import jax
    import numpy as np

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="fftr_trace_")

    def _sync(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        for leaf in leaves:
            # on-device slice first — a full np.asarray would drag the
            # whole buffer through the tunnel
            np.asarray(leaf[(0,) * leaf.ndim])

    out = fn(*args)  # warm (compile outside the trace)
    _sync(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(n_iters):
            out = fn(*args)
        _sync(out)

    mods, ops = _parse_trace(trace_dir)
    src = ops or mods
    total_us = sum(e["dur"] for e in src)
    if src:
        start = min(e["ts"] for e in src)
        end = max(e["ts"] + e["dur"] for e in src)
        span_us = end - start
    else:
        span_us = 0.0
    agg = {}
    for e in ops:
        agg[e["name"]] = agg.get(e["name"], 0.0) + e["dur"] / 1e3
    return DeviceTraceReport(
        n_iters=n_iters,
        device_total_ms=total_us / 1e3 / n_iters,
        device_span_ms=span_us / 1e3 / n_iters,
        ops_ms=agg,
        trace_dir=trace_dir,
        phases_ms=phase_breakdown(ops, n_iters),
    )


def phase_breakdown(ops, n_iters: int = 1) -> dict:
    """Bucket device op events into the reference's phase taxonomy via
    the fphase_* jax.named_scope labels models/pipeline.py wraps around
    each pipeline section (the scope path arrives in each trace event's
    'tf_op' arg). Returns {phase: ms_per_iter}; ops outside any fphase
    scope aggregate under 'unattributed'. The reference prints this
    table on every run (fft_serial.cpp:249-258, fft_gpu.cu:45-56); here
    it comes from the device timeline, so it excludes host RTT and other
    pool tenants."""
    phases = {}
    for e in ops:
        tf_op = str(e.get("args", {}).get("tf_op", ""))
        key = "unattributed"
        i = tf_op.find("fphase_")
        if i >= 0:
            key = tf_op[i + len("fphase_"):].split("/")[0].split(":")[0]
        phases[key] = phases.get(key, 0.0) + e["dur"] / 1e3 / n_iters
    return phases
