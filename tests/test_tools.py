"""tools/ harnesses: structural checks on CPU."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_quiet_probe_schema():
    import quiet_probe

    rep = quiet_probe.probe(size=256, iters=2)
    assert set(rep) == {"ts", "rtt_ms", "probe_tflops", "quiet"}
    assert rep["probe_tflops"] > 0
    assert isinstance(rep["quiet"], bool)
    json.dumps(rep)  # serializable


def test_perf_ab_importable():
    import perf_ab  # noqa: F401  (argument parsing only happens in main)


def test_bench_json_contract():
    """bench.py must print exactly one JSON line with the driver's
    required keys plus the round-2 integrity fields. Static check of the
    emitted dict literal (running it needs the TPU)."""
    src = open(os.path.join(REPO, "bench.py")).read()
    for key in (
        '"metric"', '"value"', '"unit"', '"vs_baseline"', '"backend"',
        '"rtt_ms"', '"spread"', '"probe_tflops"', '"contended"',
        '"device_ms_per_frame"',
    ):
        assert key in src, key
