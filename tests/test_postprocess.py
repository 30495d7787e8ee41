"""Fused post-processing kernels vs the jnp color path
(ops/pallas/postprocess.py; interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fft_restoration_tpu.ops.color import (
    bgr_to_lab_planar,
    lab_to_bgr_planar,
    luminance_l_planar,
)
from fft_restoration_tpu.ops.pallas.postprocess import (
    lab_l_sum_partials,
    wb_encode_u8,
)


def _rand_planes(rng, h, w):
    return rng.random((3, h, w), np.float32)


@pytest.mark.parametrize("h,w", [(64, 128), (100, 256), (30, 140)])
def test_lab_l_partials_match_jnp(h, w):
    rng = np.random.default_rng(0)
    restored = jnp.asarray(_rand_planes(rng, h, w))
    orig_u8 = jnp.asarray((rng.random((3, h, w)) * 255).astype(np.uint8))

    parts = jax.jit(
        lambda r, o: lab_l_sum_partials(r, o, block_rows=16)
    )(restored, orig_u8)
    n = h * w
    mean_deb = float(jnp.sum(parts[:, 0])) / n
    mean_org = float(jnp.sum(parts[:, 1])) / n

    want_deb = float(
        jnp.mean(luminance_l_planar(restored[0], restored[1], restored[2]))
    )
    o32 = orig_u8.astype(jnp.float32) / 255.0
    want_org = float(jnp.mean(luminance_l_planar(o32[0], o32[1], o32[2])))
    assert abs(mean_deb - want_deb) < 1e-3  # L in [0,100]
    assert abs(mean_org - want_org) < 1e-3


@pytest.mark.parametrize("h,w", [(64, 128), (100, 256), (30, 140)])
def test_wb_encode_matches_jnp(h, w):
    rng = np.random.default_rng(1)
    restored = jnp.asarray(_rand_planes(rng, h, w))
    gain = 1.17

    out = jax.jit(
        lambda r: wb_encode_u8(r, jnp.float32(gain), block_rows=16)
    )(restored)
    assert out.shape == (3, h, w) and out.dtype == jnp.uint8

    L, a, b = bgr_to_lab_planar(restored[0], restored[1], restored[2])
    L = jnp.clip(L * gain, 0.0, 100.0)
    planes = lab_to_bgr_planar(L, a, b)
    want = jnp.stack(
        [jnp.clip(p * 255.0, 0.0, 255.0).astype(jnp.uint8) for p in planes]
    )
    diff = np.abs(
        np.asarray(out).astype(int) - np.asarray(want).astype(int)
    )
    # cbrt via exp(log/3) vs jnp.cbrt can flip the trunc boundary by
    # one count on isolated pixels
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_f32_orig_planes_accepted():
    rng = np.random.default_rng(2)
    restored = jnp.asarray(_rand_planes(rng, 32, 128))
    orig = jnp.asarray(_rand_planes(rng, 32, 128))
    parts = lab_l_sum_partials(restored, orig, block_rows=8)
    assert np.isfinite(np.asarray(parts)).all()


def test_shape_validation():
    with pytest.raises(ValueError):
        lab_l_sum_partials(
            jnp.zeros((2, 8, 128)), jnp.zeros((2, 8, 128))
        )
    with pytest.raises(ValueError):
        wb_encode_u8(jnp.zeros((8, 128)), 1.0)


def test_pipeline_ppk_path_matches_jnp_path():
    """At >=128px the pallas backend routes WB+encode through the fused
    kernels; the matmul backend keeps the jnp color path. Same restore
    math (planes verified equal) => final u8 within 1 count."""
    import functools

    from fft_restoration_tpu.models.pipeline import _restore_core

    rng = np.random.default_rng(5)
    img = (rng.random((128, 128, 3)) * 255).astype(np.uint8)

    def run(backend):
        fn = functools.partial(
            _restore_core, psf_length=9, fft_backend=backend,
            filter_name="wiener", white_balance=True,
        )
        return jax.jit(fn)(
            jnp.asarray(img), jnp.float32(30.0), jnp.float32(0.01)
        )

    out_p, planes_p = run("pallas")
    out_m, planes_m = run("matmul")
    assert (
        float(np.abs(np.asarray(planes_p) - np.asarray(planes_m)).max())
        <= 1e-5
    )
    diff = np.abs(
        np.asarray(out_p).astype(int) - np.asarray(out_m).astype(int)
    )
    assert diff.max() <= 1


def test_pipeline_emit_planes_false():
    import functools

    from fft_restoration_tpu.models.pipeline import _restore_core

    rng = np.random.default_rng(6)
    img = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
    fn = functools.partial(
        _restore_core, psf_length=9, fft_backend="pallas",
        filter_name="wiener", white_balance=True, emit_planes=False,
    )
    out = jax.jit(fn)(jnp.asarray(img), jnp.float32(30.0), jnp.float32(0.01))
    assert out.shape == img.shape and out.dtype == jnp.uint8
    # same image as the two-output graph
    fn2 = functools.partial(
        _restore_core, psf_length=9, fft_backend="pallas",
        filter_name="wiener", white_balance=True,
    )
    out2, _ = jax.jit(fn2)(
        jnp.asarray(img), jnp.float32(30.0), jnp.float32(0.01)
    )
    assert np.array_equal(np.asarray(out), np.asarray(out2))


def test_fast_color_matches_exact():
    """The transcendental-free in-kernel color math (polynomial sRGB +
    Newton rcbrt with a float-multiply seed) stays within one uint8
    count of the exact forms."""
    rng = np.random.default_rng(7)
    restored = jnp.asarray(_rand_planes(rng, 64, 256))
    orig = jnp.asarray((rng.random((3, 64, 256)) * 255).astype(np.uint8))

    pe = np.asarray(lab_l_sum_partials(restored, orig, block_rows=16))
    pf = np.asarray(
        lab_l_sum_partials(restored, orig, block_rows=16, fast=True)
    )
    assert np.abs(pf[:, :2] / pe[:, :2] - 1).max() < 1e-4

    ee = np.asarray(wb_encode_u8(restored, jnp.float32(1.1), block_rows=16))
    ef = np.asarray(
        wb_encode_u8(restored, jnp.float32(1.1), block_rows=16, fast=True)
    )
    d = np.abs(ee.astype(int) - ef.astype(int))
    assert d.max() <= 1
    assert (d > 0).mean() < 0.02


@pytest.mark.parametrize("h,w", [(64, 128), (30, 140)])
def test_norm_fusion_matches_pre_normalized(h, w):
    """norm=(lo, scale) applies the min-max normalize in VMEM; results
    must match feeding pre-normalized planes (incl. pad masking in the
    partial sums for ragged shapes)."""
    rng = np.random.default_rng(8)
    raw = jnp.asarray(rng.random((3, h, w), np.float32) * 7.0 - 2.0)
    orig = jnp.asarray((rng.random((3, h, w)) * 255).astype(np.uint8))
    lo = jnp.min(raw, axis=(-2, -1))
    hi = jnp.max(raw, axis=(-2, -1))
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 0.0)
    normed = (raw - lo[:, None, None]) * scale[:, None, None]

    p_ref = np.asarray(lab_l_sum_partials(normed, orig, block_rows=16))
    p_fus = np.asarray(
        lab_l_sum_partials(raw, orig, block_rows=16, norm=(lo, scale))
    )
    assert abs(p_fus[:, 0].sum() / p_ref[:, 0].sum() - 1) < 1e-5
    assert abs(p_fus[:, 1].sum() / p_ref[:, 1].sum() - 1) < 1e-6

    e_ref = np.asarray(wb_encode_u8(normed, jnp.float32(1.1), block_rows=16))
    e_fus = np.asarray(
        wb_encode_u8(raw, jnp.float32(1.1), block_rows=16, norm=(lo, scale))
    )
    d = np.abs(e_ref.astype(int) - e_fus.astype(int))
    assert d.max() <= 1


def test_pipeline_ppk_ragged_shape():
    """Non-pow2 frame >=128px: the ppk path reads the power-of-two
    padded planes uncropped (live_hw masks the L sums, output crops
    in-kernel) and must match the jnp path."""
    import functools

    from fft_restoration_tpu.models.pipeline import _restore_core

    rng = np.random.default_rng(9)
    img = (rng.random((200, 300, 3)) * 255).astype(np.uint8)

    def run(backend):
        fn = functools.partial(
            _restore_core, psf_length=9, fft_backend=backend,
            filter_name="wiener", white_balance=True,
        )
        return jax.jit(fn)(
            jnp.asarray(img), jnp.float32(30.0), jnp.float32(0.01)
        )

    out_p, planes_p = run("pallas")
    out_m, planes_m = run("matmul")
    assert out_p.shape == img.shape
    assert (
        float(np.abs(np.asarray(planes_p) - np.asarray(planes_m)).max())
        <= 1e-5
    )
    diff = np.abs(
        np.asarray(out_p).astype(int) - np.asarray(out_m).astype(int)
    )
    assert diff.max() <= 1


def test_wb_stats_stride_unbiased(rng):
    """Strided L-mean sampling (wb_stats_stride) moves the output by at
    most 2 uint8 counts on an adversarially row-structured 500-row
    frame (8-row stripes, stride 4 = 1/4 of the rows); the error is the
    stripe-sampled gain deviation, which shrinks with frame size
    (measured 0.04 counts at 2048 rows — docs/PERF.md)."""
    from fft_restoration_tpu.models.pipeline import WienerDeblurPipeline
    from fft_restoration_tpu.utils.blurgen import blur_image

    yy, xx = np.mgrid[0:500, 0:640]
    img = np.zeros((500, 640, 3), np.float32)
    img[..., 0] = 80 + 100 * np.sin(yy / 19.0) * np.cos(xx / 11.0)
    img[..., 1] = 60 + 0.2 * xx
    img[..., 2] = 70 + 0.3 * yy
    img[100:400, 200:220] += 120
    blurred = blur_image(np.clip(img, 0, 255).astype(np.uint8), 11, 30.0)

    exact = WienerDeblurPipeline(fft_backend="pallas").restore(
        blurred, 11, 30.0
    )
    strided = WienerDeblurPipeline(
        fft_backend="pallas", wb_stats_stride=4
    ).restore(blurred, 11, 30.0)
    d = np.abs(exact.astype(np.int16) - strided.astype(np.int16))
    assert d.max() <= 2, d.max()


def test_sampled_live_pixels_counts():
    from fft_restoration_tpu.ops.pallas.postprocess import (
        _block_geometry,
        sampled_live_pixels,
    )

    # stride 1 == exact live pixel count
    assert sampled_live_pixels(512, 640, live_hw=(500, 600)) == 500 * 600
    # strided: sum of live rows over every 4th block
    rows, hp, _ = _block_geometry(512, 640, 64)
    expect = sum(
        max(0, min(500 - j * rows, rows))
        for j in range(0, hp // rows, 4)
    ) * 600
    assert (
        sampled_live_pixels(512, 640, live_hw=(500, 600), stride=4)
        == expect
    )


def test_wb_stats_stride_batched(rng):
    """Batched strided WB stats: per-image parity with the exact-stats
    batched path within 5 counts AT THE MINIMUM qualifying size
    (64*stride = 256 padded rows -> only 8 stripes sampled; the error
    shrinks ~1/sqrt(stripes) toward ~0.1 counts at 2048 rows), and
    exact fallback below the cutoff."""
    from fft_restoration_tpu.models.batched import BatchedWienerPipeline
    from fft_restoration_tpu.ops.pallas.postprocess import (
        effective_wb_stride,
    )
    from fft_restoration_tpu.utils.blurgen import blur_image

    assert effective_wb_stride(256, 4) == 4
    assert effective_wb_stride(128, 4) == 1
    assert effective_wb_stride(2048, 4) == 4

    stack = []
    for i in range(2):
        yy, xx = np.mgrid[0:250, 0:140]
        f = np.zeros((250, 140, 3), np.float32)
        f[..., 0] = 70 + 90 * np.sin(yy / (13.0 + i))
        f[..., 1] = 60 + 0.4 * xx
        f[..., 2] = 50 + 0.5 * yy
        f[40:200, 50 + 10 * i : 70] += 120
        stack.append(blur_image(np.clip(f, 0, 255).astype(np.uint8), 9, 30.0))
    imgs = np.stack(stack)  # pads to 256 rows -> stride active
    exact = BatchedWienerPipeline(fft_backend="pallas").restore(
        imgs, 9, 30.0
    )
    strided = BatchedWienerPipeline(
        fft_backend="pallas", wb_stats_stride=4
    ).restore(imgs, 9, 30.0)
    d = np.abs(exact.astype(np.int16) - strided.astype(np.int16))
    assert d.max() <= 5, d.max()
