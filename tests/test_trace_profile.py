"""Device-timeline trace profiling: parser unit test + CPU fallback."""

import gzip
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from fft_restoration_tpu.utils.trace_profile import (
    DeviceTraceReport,
    _parse_trace,
    device_trace,
)


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    os.makedirs(d)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_parse_trace_aggregates_device_ops(tmp_path):
    events = [
        {"ph": "M", "pid": 3, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name", "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "name": "jit_f(123)", "ts": 0, "dur": 1000},
        {"ph": "X", "pid": 3, "name": "fusion.1", "ts": 0, "dur": 600},
        {"ph": "X", "pid": 3, "name": "custom-call.2", "ts": 600, "dur": 300},
        {"ph": "X", "pid": 9, "name": "np.asarray", "ts": 0, "dur": 99999},
    ]
    mods, ops = _parse_trace(_write_trace(tmp_path, events))
    assert [e["name"] for e in mods] == ["jit_f(123)"]
    assert sorted(e["name"] for e in ops) == ["custom-call.2", "fusion.1"]
    # host events excluded
    assert all(e["pid"] == 3 for e in mods + ops)


def test_report_formats():
    rep = DeviceTraceReport(
        n_iters=10,
        device_total_ms=2.5,
        device_span_ms=3.0,
        ops_ms={"fusion.1": 20.0, "custom-call.2": 5.0},
        trace_dir="/tmp/x",
    )
    text = rep.report()
    assert "2.500 ms/iter" in text
    assert "fusion.1" in text


def test_device_trace_cpu_reports_no_lanes(tmp_path):
    """On the CPU test backend there are no TPU lanes; the report says
    so instead of printing zeros."""
    f = jax.jit(lambda a: a * 2.0)
    x = jnp.ones((8, 8))
    rep = device_trace(f, (x,), n_iters=2, trace_dir=str(tmp_path / "tr"))
    assert rep.n_iters == 2
    text = rep.report()
    assert isinstance(text, str) and text
