"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding (parallel/) is validated on a virtual 8-device CPU
mesh, mirroring how the reference verifies its MPI modes with
oversubscribed local ranks on one host (SURVEY.md §4,
/root/reference/README.md:55). Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin registers itself from sitecustomize before this
# conftest runs; force the platform list back to pure CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def car_image():
    """Small real fixture from the reference repo (640x330 BGR uint8)."""
    from fft_restoration_tpu.utils.imageio import imread

    return imread("/root/reference/input/car_blurred.png")


@pytest.fixture(scope="session")
def small_bgr(rng):
    """Random small BGR float image in [0,1] for fast pipeline tests."""
    return rng.random((48, 56, 3)).astype(np.float32)


@pytest.fixture(autouse=True)
def _reset_mxu_precision():
    """Test isolation for the process-global MXU precision knob.

    CLI runs inside tests call set_mxu_precision('default') (bf16 group
    DFTs — the gpu-tier flagship), which would silently leak into later
    strict-parity tests (sharded-vs-single RL at <=1 count, smooth-pad
    oracle INF tiers) depending on collection order. Every test starts
    from the unset state; on CPU interpret runs the knob only matters
    through matmul precision, but the leak was observed to flip two
    sharded parity tests in full-suite order."""
    from fft_restoration_tpu.ops.pallas.fft_kernel import set_mxu_precision

    set_mxu_precision(None)
    yield
    set_mxu_precision(None)
