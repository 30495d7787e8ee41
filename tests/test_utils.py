import numpy as np
import pytest

from fft_restoration_tpu.utils.padding import (
    is_power_of_two,
    next_power_of_two,
    pad_to_power_of_two,
)
from fft_restoration_tpu.utils.verify import channels_equal, psnr


def test_power_of_two_helpers():
    assert next_power_of_two(1) == 1
    assert next_power_of_two(330) == 512
    assert next_power_of_two(512) == 512
    assert next_power_of_two(640) == 1024
    assert is_power_of_two(1024) and not is_power_of_two(0) and not is_power_of_two(12)


def test_pad_to_power_of_two():
    x = np.ones((3, 330, 641), np.float32)
    p = pad_to_power_of_two(x)
    assert p.shape == (3, 512, 1024)
    assert p[:, :330, :641].sum() == x.sum()
    assert p.sum() == x.sum()


def test_channels_equal_tiers(rng):
    a = rng.random((32, 32)).astype(np.float32)
    b = a + 5e-4
    assert channels_equal(b, a, tier="inf").passed
    assert channels_equal(b, a, tier="l2").passed
    assert channels_equal(b, a, tier="gpu").passed
    c = a + 0.5
    assert not channels_equal(c, a, tier="inf").passed
    assert not channels_equal(c, a, tier="gpu").passed


def test_channels_equal_per_channel(rng):
    """One bad channel must fail the check even when the joint PSNR over
    all channels would pass (the reference verifiers loop channels,
    simd.cpp:66-79) — advisor finding."""
    oracle = rng.random((3, 64, 64)).astype(np.float32)
    ours = oracle.copy()
    # corrupt one channel in a small region: channel-1 PSNR ~26.9 dB
    # (fails) while the joint PSNR ~31.7 dB would pass
    ours[1, :8, :8] += 0.36
    rep_joint_psnr = psnr(ours, oracle)
    assert rep_joint_psnr >= 30.0  # joint metric alone would pass 'gpu'
    rep = channels_equal(ours, oracle, tier="gpu")
    assert not rep.passed
    assert rep.details["worst_channel"] == 1
    per = rep.details["per_channel"]
    assert per[0]["passed"] and per[2]["passed"] and not per[1]["passed"]


def test_psnr_known_value():
    a = np.zeros((10, 10))
    b = np.full((10, 10), 0.1)
    assert abs(psnr(a, b) - 20.0) < 1e-6
