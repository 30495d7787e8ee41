"""Warmup tool smoke test (subprocess, CPU)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_warmup_tool(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["FFT_RESTORATION_CACHE"] = str(tmp_path / "cache")
    r = subprocess.run(
        [sys.executable, "-m", "fft_restoration_tpu.warmup", "16x32",
         "--psf-length", "5"],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    # shapes are HEIGHTxWIDTH; the parsed geometry is echoed back
    assert "warmed H=16 W=32" in r.stdout
    assert (tmp_path / "cache").exists()


def test_warmup_bad_shape():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-m", "fft_restoration_tpu.warmup", "banana"],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=300,
    )
    assert r.returncode == 2
    assert "bad shape" in r.stdout
