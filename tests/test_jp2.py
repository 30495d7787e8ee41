"""JPEG 2000 decoder parity (utils/jp2.py + utils/jp2_t1.py).

The reference ingests .jp2 through cv::imread/OpenJPEG
(/root/reference/serial.cpp:22). Oracles: cv2 (OpenJPEG) for reversible
5/3 streams — bit-exact, including rate-truncated ones, which pins the
OpenJPEG midpoint reconstruction in the Tier-1 decoder — and PIL
(also OpenJPEG) for the 9/7 irreversible path, where float wavelet
rounding allows one-count differences.
"""

import numpy as np
import pytest

from fft_restoration_tpu.utils.imageio import decode_image_bgr, probe_size
from fft_restoration_tpu.utils.jp2 import Jp2Error, decode_jp2, probe_jp2_size

cv2 = pytest.importorskip("cv2")
PIL_Image = pytest.importorskip("PIL.Image")


def _smooth_rgb(h, w, seed=3):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 7, w)
    y = np.linspace(0, 5, h)
    base = (np.sin(y[:, None]) + np.cos(x[None, :]))[..., None] * [40, 55, 60]
    img = base + 128 + rng.normal(0, 7, (h, w, 3))
    return img.clip(0, 255).astype(np.uint8)


def _cv2_jp2(img_rgb, tmp_path, name, x1000):
    p = str(tmp_path / name)
    assert cv2.imwrite(p, img_rgb[..., ::-1],
                       [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, x1000])
    return p, open(p, "rb").read()


def test_lossless_rgb_bit_exact_vs_cv2(tmp_path):
    img = _smooth_rgb(66, 85)
    p, blob = _cv2_jp2(img, tmp_path, "ll.jp2", 1000)
    mine = decode_jp2(blob)
    theirs = cv2.imread(p)[..., ::-1]
    assert np.array_equal(mine, theirs)
    assert np.array_equal(mine, img)  # lossless round-trip


def test_rate_truncated_reversible_bit_exact_vs_cv2(tmp_path):
    # cv2's "lossy" default keeps the 5/3 reversible transform and
    # truncates coding passes; decoding must reproduce OpenJPEG's
    # midpoint reconstruction exactly.
    img = _smooth_rgb(70, 91, seed=5)
    p, blob = _cv2_jp2(img, tmp_path, "lossy.jp2", 120)
    mine = decode_jp2(blob)
    theirs = cv2.imread(p)[..., ::-1]
    assert np.array_equal(mine, theirs)
    assert not np.array_equal(mine, img)  # genuinely truncated


def test_gray_lossless_bit_exact(tmp_path):
    img = _smooth_rgb(64, 72)[..., 0]
    p = str(tmp_path / "gray.jp2")
    assert cv2.imwrite(p, img, [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000])
    blob = open(p, "rb").read()
    mine = decode_jp2(blob)
    assert mine.ndim == 2
    assert np.array_equal(mine, cv2.imread(p, cv2.IMREAD_UNCHANGED))


def test_irreversible_97_matches_pil(tmp_path):
    img = _smooth_rgb(65, 83, seed=9)
    p = str(tmp_path / "irrev.jp2")
    PIL_Image.fromarray(img).save(p, irreversible=True)
    blob = open(p, "rb").read()
    mine = decode_jp2(blob).astype(np.int64)
    theirs = np.asarray(PIL_Image.open(p)).astype(np.int64)
    diff = np.abs(mine - theirs)
    assert diff.max() <= 2
    mse = np.mean((mine - theirs) ** 2.0)
    assert mse == 0 or 10 * np.log10(255.0**2 / mse) > 45.0


def test_16bit_lossless_and_bgr_narrowing(tmp_path):
    rng = np.random.default_rng(11)
    img = (rng.random((48, 60)) * 65535).astype(np.uint16)
    p = str(tmp_path / "u16.jp2")
    assert cv2.imwrite(p, img, [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000])
    blob = open(p, "rb").read()
    mine = decode_jp2(blob)
    assert mine.dtype == np.uint16
    assert np.array_equal(mine, cv2.imread(p, cv2.IMREAD_UNCHANGED))
    # the BGR ingest surface narrows to the high byte (IMREAD_COLOR)
    bgr = decode_image_bgr(blob)
    assert bgr.dtype == np.uint8 and bgr.shape == (48, 60, 3)
    assert np.array_equal(bgr[..., 0], (img >> 8).astype(np.uint8))


def test_raw_j2k_codestream(tmp_path):
    img = _smooth_rgb(62, 77, seed=13)
    p = str(tmp_path / "t.j2k")
    PIL_Image.fromarray(img).save(p)
    blob = open(p, "rb").read()
    assert blob[:4] == b"\xff\x4f\xff\x51"  # raw codestream, no container
    mine = decode_jp2(blob)
    assert np.array_equal(mine, np.asarray(PIL_Image.open(p)))


def test_probe_size_and_bgr_dispatch(tmp_path):
    img = _smooth_rgb(59, 101)
    p, blob = _cv2_jp2(img, tmp_path, "probe.jp2", 1000)
    assert probe_jp2_size(blob) == (59, 101)
    assert probe_size(p) == (59, 101)
    assert np.array_equal(decode_image_bgr(blob), cv2.imread(p))


@pytest.mark.parametrize(
    "kwargs",
    [
        {"tile_size": (64, 64)},  # multi-tile grid (9 tiles)
        # odd tile extents give band rects odd origins (parity-aware
        # lifting + empty deep resolutions with no packet in-stream)
        {"tile_size": (33, 47)},
        {"tile_size": (40, 56)},
        {"quality_mode": "rates", "quality_layers": [40, 10, 2]},
        {"num_resolutions": 3},
        {"progression": "RPCL"},
    ],
    ids=["multitile", "oddtile", "oddtile2", "multilayer", "3res", "rpcl"],
)
def test_advanced_profiles_match_pil(tmp_path, kwargs):
    rng = np.random.default_rng(4)
    img = (rng.random((150, 200, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "adv.jp2")
    PIL_Image.fromarray(img).save(p, **kwargs)
    mine = decode_jp2(open(p, "rb").read())
    assert np.array_equal(mine, np.asarray(PIL_Image.open(p)))


def test_native_t1_matches_pure_python(tmp_path, monkeypatch):
    # native/jp2_t1.cpp is a direct port of the Python Tier-1; both
    # paths must agree bit-exactly on the same truncated stream.
    import fft_restoration_tpu.utils.jp2_t1 as t1

    img = _smooth_rgb(67, 88, seed=21)
    p, blob = _cv2_jp2(img, tmp_path, "nat.jp2", 150)
    native = decode_jp2(blob)
    monkeypatch.setenv("FFT_JP2_PURE", "1")
    monkeypatch.setattr(t1, "_native_lib", None)
    pure = decode_jp2(blob)
    monkeypatch.setattr(t1, "_native_lib", None)
    assert np.array_equal(native, pure)
    assert np.array_equal(pure, cv2.imread(p)[..., ::-1])


def test_encode_lossless_round_trip_and_cv2_pil_decode(tmp_path):
    from fft_restoration_tpu.utils.jp2_encode import encode_jp2

    img = _smooth_rgb(73, 94, seed=31)
    blob = encode_jp2(img)
    assert np.array_equal(decode_jp2(blob), img)  # own decoder
    p = str(tmp_path / "enc.jp2")
    open(p, "wb").write(blob)
    assert np.array_equal(cv2.imread(p)[..., ::-1], img)  # OpenJPEG
    assert np.array_equal(np.asarray(PIL_Image.open(p)), img)


@pytest.mark.parametrize(
    "shape,dtype",
    [((61, 77), np.uint8), ((40, 52), np.uint16), ((1, 1, 3), np.uint8),
     ((3, 257, 3), np.uint8), ((129, 2), np.uint8)],
    ids=["gray", "u16", "1x1", "thin", "tall"],
)
def test_encode_edge_geometries(tmp_path, shape, dtype):
    from fft_restoration_tpu.utils.jp2_encode import encode_jp2

    rng = np.random.default_rng(sum(shape))
    hi = 255 if dtype == np.uint8 else 65535
    img = (rng.random(shape) * hi).astype(dtype)
    blob = encode_jp2(img)
    assert np.array_equal(decode_jp2(blob), img)
    p = str(tmp_path / "e.jp2")
    open(p, "wb").write(blob)
    theirs = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    if theirs.ndim == 3:
        theirs = theirs[..., ::-1]
    assert np.array_equal(theirs, img)


def test_encode_extreme_values(tmp_path):
    # hard-threshold noise maximizes coefficient magnitudes — guards the
    # Mb = guard + eps - 1 bit-plane budget against overflow.
    from fft_restoration_tpu.utils.jp2_encode import encode_jp2

    rng = np.random.default_rng(17)
    img = np.where(rng.random((80, 80, 3)) < 0.5, 0, 255).astype(np.uint8)
    blob = encode_jp2(img)
    assert np.array_equal(decode_jp2(blob), img)
    p = str(tmp_path / "x.jp2")
    open(p, "wb").write(blob)
    assert np.array_equal(cv2.imread(p)[..., ::-1], img)


def test_imwrite_jp2_and_exr_round_trip(tmp_path):
    from fft_restoration_tpu.utils.imageio import imread, imwrite

    rng = np.random.default_rng(23)
    bgr = (rng.random((45, 58, 3)) * 255).astype(np.uint8)
    p2 = str(tmp_path / "out.jp2")
    imwrite(p2, bgr)
    assert np.array_equal(imread(p2), bgr)  # lossless
    assert np.array_equal(cv2.imread(p2), bgr)
    pe = str(tmp_path / "out.exr")
    imwrite(pe, bgr)
    back = imread(pe)
    assert np.abs(back.astype(int) - bgr.astype(int)).max() <= 1  # half prec


def test_out_of_profile_raises():
    with pytest.raises(Jp2Error):
        decode_jp2(b"\x00\x00\x00\x0cjP  \r\n\x87\n" + b"\x00" * 40)
    with pytest.raises(ValueError):
        probe_jp2_size(b"\xff\x4f\xff\x51" + b"\x00" * 8)
