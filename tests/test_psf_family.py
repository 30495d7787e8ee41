"""PSF family beyond the reference's motion line: gaussian + disk.

Every filter in the framework is kernel-agnostic (Wiener/inverse/CLS
are spectral multiplies, RL convolves with any kernel), so extending
the PSF synthesis extends the whole restoration surface; the oracle
verifies with the SAME kernel (oracle/psf.make_psf_oracle).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fft_restoration_tpu.oracle.psf import make_psf_oracle
from fft_restoration_tpu.ops.psf import make_psf


@pytest.mark.parametrize("kind,param", [("gaussian", 2.5), ("disk", 0.0)])
def test_kernels_match_oracle_and_normalize(kind, param):
    dev = np.asarray(jax.jit(
        lambda p: make_psf(kind, 11, p), static_argnums=()
    )(jnp.float32(param)))
    orc = make_psf_oracle(kind, 11, param)
    assert np.abs(dev - orc).max() < 1e-6
    assert abs(dev.sum() - 1.0) < 1e-5
    assert np.allclose(dev, dev[::-1, ::-1])  # centro-symmetric


def test_disk_deblur_recovers_defocus():
    """Defocus (disk) blur is actually invertible through the framework:
    RL with the shift-free corner-anchored disk (the blurgen placement,
    cf. test_rl_actually_deblurs — RL clips instead of min-max
    stretching, so PSNR vs the sharp truth is meaningful) must increase
    PSNR. The one-shot pipeline's quality contract for disk is the
    jit-vs-oracle parity below, exactly as for motion (the reference's
    min-max + unshifted-PSF conventions make whole-pipeline PSNR-vs-
    sharp a non-metric for every kernel family)."""
    from fft_restoration_tpu.models.richardson_lucy import (
        richardson_lucy_planes,
    )
    from fft_restoration_tpu.oracle.psf import disk_kernel_oracle
    from fft_restoration_tpu.utils.blurgen import blur_image
    from fft_restoration_tpu.utils.verify import psnr

    h, w, S = 96, 96, 9
    sharp = np.zeros((h, w, 3), np.uint8)
    sharp[20:70, 30:40] = 255
    sharp[40:50, 10:90] = 200
    blurred = blur_image(sharp, S, 0.0, psf_type="disk")

    psf = disk_kernel_oracle(S).astype(np.float64)
    full = np.zeros((h, w))
    cy, cx = S // 2, S // 2
    full[h // 2 - cy : h // 2 - cy + S, w // 2 - cx : w // 2 - cx + S] = psf
    psf_corner = np.roll(full, (-(h // 2), -(w // 2)), axis=(0, 1)).astype(
        np.float32
    )
    y = np.moveaxis(blurred.astype(np.float32) / 255.0, -1, 0)
    restored = np.asarray(
        richardson_lucy_planes(jnp.asarray(y), jnp.asarray(psf_corner), 25)
    )
    s = np.moveaxis(sharp.astype(np.float64) / 255.0, -1, 0)
    before = psnr(s, y.astype(np.float64), peak=1.0)
    after = psnr(s, restored.astype(np.float64), peak=1.0)
    assert after > before + 2.0, (before, after)


@pytest.mark.parametrize("kind,param", [("gaussian", 1.8), ("disk", 0.0)])
def test_pipeline_matches_oracle_per_kind(rng, kind, param):
    """jit-vs-oracle differential verification holds for every PSF
    family member (the CLI's --psf-type contract)."""
    from fft_restoration_tpu.models.pipeline import WienerDeblurPipeline
    from fft_restoration_tpu.oracle.serial import restore_channels
    from fft_restoration_tpu.utils.verify import channels_equal

    img = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    pipe = WienerDeblurPipeline(fft_backend="matmul", psf_type=kind)
    _, ours = pipe.restore_with_planes(img, 7, param)
    oracle = restore_channels(
        np.moveaxis(img.astype(np.float32) / 255.0, -1, 0),
        make_psf_oracle(kind, 7, param),
    )
    report = channels_equal(np.asarray(ours), oracle, "gpu")
    assert report.passed, report


def test_sharded_gaussian_matches_single(rng):
    from fft_restoration_tpu.models.pipeline import WienerDeblurPipeline
    from fft_restoration_tpu.parallel.mesh import make_mesh
    from fft_restoration_tpu.parallel.sharded_pipeline import (
        ShardedWienerPipeline,
    )

    img = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    a = ShardedWienerPipeline(
        mesh=make_mesh(8), fft_backend="matmul", psf_type="gaussian"
    ).restore(img, 7, 1.5)
    b = WienerDeblurPipeline(
        fft_backend="matmul", psf_type="gaussian"
    ).restore(img, 7, 1.5)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_load_psf_file_formats(tmp_path):
    """load_psf_file: npy/txt/image inputs, square zero-pad, sum
    normalization, and the error contract."""
    from fft_restoration_tpu.ops.psf import load_psf_file
    from fft_restoration_tpu.oracle.psf import gaussian_kernel_oracle
    from fft_restoration_tpu.utils.imageio import imwrite

    k = gaussian_kernel_oracle(9, 1.7)
    np.save(tmp_path / "k.npy", k * 3.0)  # unnormalized on purpose
    got = load_psf_file(str(tmp_path / "k.npy"))
    assert got.shape == (9, 9) and abs(got.sum() - 1.0) < 1e-6
    assert np.abs(got - k).max() < 1e-6

    np.savetxt(tmp_path / "k.txt", k[:5])  # non-square: 5x9 -> 9x9 pad
    got = load_psf_file(str(tmp_path / "k.txt"))
    assert got.shape == (9, 9)
    assert np.all(got[5:] == 0.0) and abs(got.sum() - 1.0) < 1e-6

    imwrite(
        str(tmp_path / "k.png"),
        np.repeat((k / k.max() * 255).astype(np.uint8)[..., None], 3, -1),
    )
    got = load_psf_file(str(tmp_path / "k.png"))
    assert got.shape == (9, 9) and abs(got.sum() - 1.0) < 1e-6

    np.save(tmp_path / "bad.npy", np.zeros((3, 3)))
    with pytest.raises(ValueError, match="sum"):
        load_psf_file(str(tmp_path / "bad.npy"))
    np.save(tmp_path / "nan.npy", np.full((3, 3), np.nan))
    with pytest.raises(ValueError, match="finite"):
        load_psf_file(str(tmp_path / "nan.npy"))
    lap = np.array([[0, -1, 0], [-1, 5.0, -1], [0, -1, 0]])
    np.save(tmp_path / "lap.npy", lap)  # positive sum, negative lobes
    with pytest.raises(ValueError, match="negative"):
        load_psf_file(str(tmp_path / "lap.npy"))


def test_custom_kernel_pipeline_matches_oracle(rng):
    """A concrete kernel array flows through psf_type end to end
    (pipeline + oracle verify with the SAME kernel)."""
    from fft_restoration_tpu.models.pipeline import WienerDeblurPipeline
    from fft_restoration_tpu.oracle.psf import make_psf_oracle
    from fft_restoration_tpu.oracle.serial import restore_channels
    from fft_restoration_tpu.utils.verify import channels_equal

    k = np.asarray(rng.random((7, 7)), np.float32)
    k /= k.sum()
    img = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    pipe = WienerDeblurPipeline(fft_backend="matmul", psf_type=k)
    _, ours = pipe.restore_with_planes(img, 7, 0.0)
    oracle = restore_channels(
        np.moveaxis(img.astype(np.float32) / 255.0, -1, 0),
        make_psf_oracle(k, 7, 0.0),
    )
    report = channels_equal(np.asarray(ours), oracle, "gpu")
    assert report.passed, report
    with pytest.raises(ValueError, match="shape"):
        WienerDeblurPipeline(fft_backend="matmul", psf_type=k).restore(
            img, 9, 0.0
        )


def test_cli_psf_file(tmp_path, rng):
    """--psf-file end to end incl. in-process verification, and the
    --estimate-psf conflict."""
    from fft_restoration_tpu.cli import main
    from fft_restoration_tpu.oracle.psf import gaussian_kernel_oracle
    from fft_restoration_tpu.utils.blurgen import blur_image
    from fft_restoration_tpu.utils.imageio import imwrite

    img = blur_image(
        (rng.random((48, 64, 3)) * 255).astype(np.uint8), 9, 1.7,
        psf_type="gaussian",
    )
    src = tmp_path / "in.png"
    imwrite(str(src), img)
    np.save(tmp_path / "k.npy", gaussian_kernel_oracle(9, 1.7))
    rc = main(
        [str(src), "1", "0", "--psf-file", str(tmp_path / "k.npy"),
         "-o", str(tmp_path / "out.png")]
    )
    assert rc == 0
    rc = main([str(src), "1", "0", "--psf-file", str(tmp_path / "missing.npy")])
    assert rc == 2
    with pytest.raises(SystemExit):
        main([str(src), "1", "0", "--psf-file", str(tmp_path / "k.npy"),
              "--estimate-psf"])


def test_profilers_honor_psf_type(rng):
    """profile_phases / profile_phases_sharded build the session's PSF
    family (the --profile paths must measure the graph the session
    actually runs, not the motion default)."""
    from fft_restoration_tpu.models.pipeline import (
        WienerDeblurPipeline,
        profile_phases,
    )
    from fft_restoration_tpu.parallel.sharded_pipeline import (
        profile_phases_sharded,
    )

    img = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    ref = WienerDeblurPipeline(
        fft_backend="matmul", psf_type="gaussian"
    ).restore(img, 9, 2.5)
    out, _ = profile_phases(
        img, 9, 2.5, fft_backend="matmul", psf_type="gaussian"
    )
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
    planes, _ = profile_phases_sharded(
        img, 9, 2.5, fft_backend="matmul", psf_type="gaussian"
    )
    assert planes.shape == (3, 40, 56)


def test_cli_sharded_directory_singleton_honors_psf_type(tmp_path, rng):
    """Regression: the sharded directory mode's singleton-group pipeline
    must build the session's PSF family, matching the jit mode's
    output (it has no oracle verification to catch a wrong kernel)."""
    from fft_restoration_tpu.cli import main
    from fft_restoration_tpu.utils.imageio import imread, imwrite

    d = tmp_path / "frames"
    d.mkdir()
    img = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    imwrite(str(d / "f.png"), img)
    rc = main(
        [str(d), "9", "2.5", "--psf-type", "gaussian", "--mode", "sharded",
         "--fft-backend", "matmul", "-o", str(tmp_path / "out_sh")]
    )
    assert rc == 0
    rc = main(
        [str(d), "9", "2.5", "--psf-type", "gaussian",
         "--fft-backend", "matmul", "-o", str(tmp_path / "out_jit")]
    )
    assert rc == 0
    a = imread(str(tmp_path / "out_sh" / "f_restored.png"))
    b = imread(str(tmp_path / "out_jit" / "f_restored.png"))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_cli_psf_type(tmp_path, rng):
    """--psf-type end to end incl. verification (--estimate-psf with
    disk/gaussian is covered in tests/test_estimate.py)."""
    from fft_restoration_tpu.cli import main
    from fft_restoration_tpu.utils.blurgen import blur_image
    from fft_restoration_tpu.utils.imageio import imwrite

    img = blur_image(
        (rng.random((48, 64, 3)) * 255).astype(np.uint8), 7, 2.0,
        psf_type="gaussian",
    )
    src = tmp_path / "in.png"
    imwrite(str(src), img)
    rc = main(
        [str(src), "7", "2.0", "--psf-type", "gaussian",
         "-o", str(tmp_path / "out.png")]
    )
    assert rc == 0


def test_sharded_custom_kernel_matches_single(rng):
    """A --psf-file kernel flows through the sharded path too."""
    from fft_restoration_tpu.models.pipeline import WienerDeblurPipeline
    from fft_restoration_tpu.parallel.mesh import make_mesh
    from fft_restoration_tpu.parallel.sharded_pipeline import (
        ShardedWienerPipeline,
    )

    k = np.asarray(rng.random((7, 7)), np.float32)
    k /= k.sum()
    img = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    a = ShardedWienerPipeline(
        mesh=make_mesh(8), fft_backend="matmul", psf_type=k
    ).restore(img, 7, 0.0)
    b = WienerDeblurPipeline(fft_backend="matmul", psf_type=k).restore(
        img, 7, 0.0
    )
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_cli_psf_file_edgetaper_smooth_combo(tmp_path, rng):
    """--psf-file + --edgetaper + --pad smooth together, verified
    against the oracle at the same extents with the same loaded kernel
    (the cross-feature contract a user composing flags relies on)."""
    from fft_restoration_tpu.cli import main
    from fft_restoration_tpu.oracle.psf import gaussian_kernel_oracle
    from fft_restoration_tpu.utils.blurgen import blur_image
    from fft_restoration_tpu.utils.imageio import imwrite

    img = blur_image(
        (rng.random((60, 88, 3)) * 255).astype(np.uint8), 9, 1.7,
        psf_type="gaussian",
    )
    src = tmp_path / "in.png"
    imwrite(str(src), img)
    np.save(tmp_path / "k.npy", gaussian_kernel_oracle(9, 1.7))
    rc = main(
        [str(src), "1", "0", "--psf-file", str(tmp_path / "k.npy"),
         "--edgetaper", "--pad", "smooth",
         "-o", str(tmp_path / "out.png")]
    )
    assert rc == 0
