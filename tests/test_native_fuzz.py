"""Direct-native fuzz: corrupt bitstreams driven straight into the C++
decoders (native/webp_codec.cpp, native/jp2_t1.cpp).

tests/test_ingest_fuzz.py fuzzes through decode_image_bgr, where a
native error silently falls back to pure Python — so the only native
property it proves is "this corpus doesn't take the process down".
These tests take the container parse and the fallback out of the loop:
every corrupted payload reaches the native entry point itself, which
must either return nonzero (error) or fill exactly the caller's buffer
— never crash, never write outside it. Out-of-bounds writes are
detected with redzones: each output buffer is allocated inside a
sentinel-filled arena and the sentinel bytes are asserted untouched
after every call (the same contract cv::imread's codecs owe their
callers, /root/reference/serial.cpp:22).

Skips cleanly when the .so files could not be built — the pure-Python
decoders remain the always-working path and get the same corpus through
tests/test_ingest_fuzz.py.
"""

import numpy as np
import pytest

from fft_restoration_tpu.utils import jp2_t1
from fft_restoration_tpu.utils import webp as webp_mod

cv2 = pytest.importorskip("cv2")

_webp_lib = webp_mod._load_webp_native()
_jp2_lib = jp2_t1._load_jp2_native()

PAD = 64  # redzone bytes on each side of every output buffer
H, W = 40, 56  # small enough that thousands of native calls stay cheap
N_FLIPS = 1200
N_CUTS = 48
N_GARBAGE = 64


class _Guarded:
    """uint8 arena with PAD sentinel bytes around a payload view."""

    def __init__(self, payload_bytes: int):
        self.arena = np.full(payload_bytes + 2 * PAD, 0xA5, np.uint8)
        self.view = self.arena[PAD : PAD + payload_bytes]

    def ptr(self, ctype):
        import ctypes

        return self.view.ctypes.data_as(ctypes.POINTER(ctype))

    def assert_intact(self, what: str):
        assert (self.arena[:PAD] == 0xA5).all() and (
            self.arena[-PAD:] == 0xA5
        ).all(), f"native decoder wrote outside its output buffer: {what}"


def _chunks(blob: bytes):
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    out, pos = {}, 12
    while pos + 8 <= len(blob):
        fourcc = blob[pos : pos + 4]
        size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        out[fourcc] = blob[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    return out


def _img(rng, channels=3):
    base = (rng.random((H, W, channels)) * 255).astype(np.uint8)
    return base


def _corpus(rng, payload: bytes):
    """Yield (tag, corrupted_payload): byteflips, truncations, garbage."""
    blob = bytearray(payload)
    n = len(blob)
    for _ in range(N_FLIPS):
        pos = int(rng.integers(n))
        old = blob[pos]
        blob[pos] = int(rng.integers(256))
        yield f"flip@{pos}", bytes(blob)
        blob[pos] = old
    for cut in sorted({int(c) for c in np.linspace(0, n - 1, N_CUTS)}):
        yield f"cut@{cut}", payload[:cut]
    for i in range(N_GARBAGE):
        m = int(rng.integers(1, 4 * n))
        yield f"garbage#{i}", rng.integers(0, 256, m, dtype=np.uint8).tobytes()


# ---------------------------------------------------------------------------
# VP8 (lossy)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not _webp_lib, reason="native/libwebpdec.so not built")
def test_vp8_native_fuzz_never_corrupts_memory():
    import ctypes

    from fft_restoration_tpu.utils._vp8_tables import (
        COEFF_PROBS,
        COEFF_UPDATE_PROBS,
        KF_BMODE_PROBS,
    )

    rng = np.random.default_rng(20260819)
    ok, enc = cv2.imencode(".webp", _img(rng)[..., ::-1], [cv2.IMWRITE_WEBP_QUALITY, 75])
    assert ok
    payload = _chunks(enc.tobytes())[b"VP8 "]

    u8p = ctypes.POINTER(ctypes.c_uint8)
    probs = np.ascontiguousarray(
        np.concatenate([COEFF_PROBS.reshape(-1), COEFF_UPDATE_PROBS.reshape(-1)])
    )
    bmode = np.ascontiguousarray(KF_BMODE_PROBS.reshape(-1))
    out = _Guarded(H * W * 3)
    for tag, bad in _corpus(rng, payload):
        webp_mod._load_webp_native().webp_vp8_decode(
            bad, len(bad),
            probs.ctypes.data_as(u8p), bmode.ctypes.data_as(u8p),
            W, H, out.ptr(ctypes.c_uint8),
        )
        out.assert_intact(f"vp8 {tag}")


# ---------------------------------------------------------------------------
# VP8L (lossless)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not _webp_lib, reason="native/libwebpdec.so not built")
def test_vp8l_native_fuzz_never_corrupts_memory():
    import ctypes

    rng = np.random.default_rng(20260820)
    ok, enc = cv2.imencode(".webp", _img(rng)[..., ::-1], [cv2.IMWRITE_WEBP_QUALITY, 101])
    assert ok
    payload = _chunks(enc.tobytes())[b"VP8L"]

    out = _Guarded(H * W * 4)
    for tag, bad in _corpus(rng, payload):
        webp_mod._load_webp_native().webp_vp8l_decode(
            bad, len(bad), W, H, out.ptr(ctypes.c_uint8)
        )
        out.assert_intact(f"vp8l {tag}")


# ---------------------------------------------------------------------------
# ALPH (alpha channel of a lossy RGBA webp)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not _webp_lib, reason="native/libwebpdec.so not built")
def test_alpha_native_fuzz_never_corrupts_memory():
    import ctypes

    rng = np.random.default_rng(20260821)
    bgra = _img(rng, 4)
    bgra[..., 3] = (rng.random((H, W)) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".webp", bgra, [cv2.IMWRITE_WEBP_QUALITY, 75])
    assert ok
    chunks = _chunks(enc.tobytes())
    assert b"ALPH" in chunks, "cv2 did not emit an ALPH chunk"
    payload = chunks[b"ALPH"]

    out = _Guarded(H * W)
    for tag, bad in _corpus(rng, payload):
        webp_mod._load_webp_native().webp_alpha_decode(
            bad, len(bad), W, H, out.ptr(ctypes.c_uint8)
        )
        out.assert_intact(f"alpha {tag}")


# ---------------------------------------------------------------------------
# JPEG 2000 Tier-1 (MQ/EBCOT code-block decoder)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not _jp2_lib, reason="native/libjp2t1.so not built")
def test_jp2_t1_native_fuzz_never_corrupts_memory():
    """The Tier-1 entry gets whatever bytes Tier-2 packet parsing hands
    it; a corrupt packet body must decode to garbage coefficients or an
    error, never an out-of-bounds write. Random data with random
    numbps/npasses/orientation sweeps the pass state machine."""
    import ctypes

    rng = np.random.default_rng(20260822)
    out = _Guarded(H * W * 4)  # int32 coefficients
    i32p = out.ptr(ctypes.c_int32)
    for i in range(600):
        n = int(rng.integers(1, 512))
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        numbps = int(rng.integers(1, 32))
        npasses = int(rng.integers(1, 3 * numbps))
        fam = int(rng.integers(3))
        _jp2_lib.jp2_decode_block(data, n, W, H, numbps, npasses, fam, i32p)
        out.assert_intact(f"jp2 t1 iter {i} numbps={numbps} npasses={npasses}")

    # And a real block's codewords under byteflips/truncation: encode a
    # lossless jp2, re-decode it far enough to reach Tier-1 inputs by
    # corrupting the whole file through the public decoder.
    from fft_restoration_tpu.utils.jp2 import decode_jp2
    from fft_restoration_tpu.utils.jp2_encode import encode_jp2

    blob = bytearray(encode_jp2(_img(rng)))
    for _ in range(48):
        pos = int(rng.integers(len(blob)))
        old = blob[pos]
        blob[pos] = int(rng.integers(256))
        try:
            res = decode_jp2(bytes(blob))
            assert isinstance(res, np.ndarray)
        except ValueError:
            pass
        blob[pos] = old


# ---------------------------------------------------------------------------
# GIF LZW (native/gif_codec.cpp)


def test_gif_lzw_native_fuzz_never_corrupts_memory():
    import ctypes

    from fft_restoration_tpu.utils import gif as gif_mod

    lib = gif_mod._load_gif_native()
    if not lib:
        pytest.skip("native/libgifdec.so not built")
    rng = np.random.default_rng(20260823)
    img = rng.integers(0, 256, (H, W), dtype=np.uint8)
    blob = gif_mod.encode_gif(img)
    # extract the raw LZW payload structurally (searching for 0x2C can
    # hit a palette byte): 13-byte header + GCT + 10-byte descriptor +
    # the min-code-size byte
    from fft_restoration_tpu.utils.gif import _subblocks

    gct_n = 2 << (blob[10] & 0x7)
    lzw_off = 13 + 3 * gct_n + 10 + 1
    assert blob[13 + 3 * gct_n] == 0x2C, "unexpected encoder layout"
    payload, _ = _subblocks(blob, lzw_off)

    out = _Guarded(H * W)
    u8p = out.ptr(ctypes.c_uint8)
    for tag, bad in _corpus(rng, payload):
        for mcs in (2, 8, 11):
            lib.gif_lzw_decode(bad, len(bad), mcs, u8p, H * W)
            out.assert_intact(f"gif lzw {tag} mcs={mcs}")

    # and through the public decoder with whole-file corruption
    arr = bytearray(blob)
    for _ in range(300):
        pos = int(rng.integers(len(arr)))
        old = arr[pos]
        arr[pos] = int(rng.integers(256))
        try:
            res = gif_mod.decode_gif(bytes(arr))
            assert isinstance(res, np.ndarray)
        except ValueError:
            pass
        arr[pos] = old


# ---------------------------------------------------------------------------
# Progressive JPEG entropy lanes (libpngfilt.so)
# ---------------------------------------------------------------------------

from fft_restoration_tpu.utils import imageio as _iio
from fft_restoration_tpu.utils import jpeg as _jpeg_mod

_png_lib = _iio._load_native()


@pytest.mark.skipif(
    not _png_lib or not hasattr(_png_lib, "jpeg_decode_prog_ac"),
    reason="native/libpngfilt.so progressive lanes not built",
)
def test_progressive_jpeg_native_fuzz_never_corrupts_memory():
    """Corrupt entropy segments straight into jpeg_decode_prog_dc/_ac:
    nonzero return or in-bounds writes only, with redzoned coefficient
    grids and predictor arrays. LUTs come from a real table built over
    a hostile-but-spec-shaped DHT (every r/s nibble pair occurs)."""
    import ctypes

    rng = np.random.default_rng(23)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_longlong

    # an AC-style table covering all 256 rs symbols (16 per length tier)
    counts = [0, 0, 0, 0, 0, 0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 252]
    symbols = list(range(4)) + list(range(4, 256))
    tab = _jpeg_mod._Huff(counts, symbols)
    # a DC-style table: symbols are SSSS <= 15
    dc_tab = _jpeg_mod._Huff([0, 2, 2, 2, 2, 2, 2, 2, 2, 0, 0, 0, 0, 0, 0, 0],
                             list(range(16)))

    bw, bh = 6, 5
    grid = _Guarded(bh * bw * 64 * 4)
    coef = grid.view.view(np.int32).reshape(bh, bw, 64)
    predz = _Guarded(4)
    payload = rng.integers(0, 256, 160, dtype=np.uint8).tobytes()

    checked = 0
    for tag, blob in _corpus(rng, payload):
        data = blob.replace(b"\xff\x00", b"\xff")
        for refine in (0, 1):
            coef[:] = rng.integers(-4, 5, coef.shape, dtype=np.int32)
            rc = _png_lib.jpeg_decode_prog_ac(
                data, i64(len(data)),
                tab.lut_sym.ctypes.data_as(u8p),
                tab.lut_len.ctypes.data_as(u8p),
                refine, 1, 63, 2,
                coef.ctypes.data_as(i32p), i64(bw * 64),
                i64(bw), i64(0), i64(bh * bw),
            )
            assert rc in (0, -1, -2, -3, -4), (tag, refine, rc)
            grid.assert_intact(f"prog_ac {tag} refine={refine}")

            coef[:] = 0
            predz.view[:] = 0
            stride = np.asarray([bw * 64], np.int64)
            ch = np.ones(1, np.int32)
            base = (i32p * 1)(coef.ctypes.data_as(i32p))
            plan0 = np.zeros(1, np.int32)
            rc = _png_lib.jpeg_decode_prog_dc(
                data, i64(len(data)),
                dc_tab.lut_sym.ctypes.data_as(u8p),
                dc_tab.lut_len.ctypes.data_as(u8p),
                refine, 2, 1,
                base, stride.ctypes.data_as(i64p),
                ch.ctypes.data_as(i32p), ch.ctypes.data_as(i32p),
                1, plan0.ctypes.data_as(i32p),
                plan0.ctypes.data_as(i32p), plan0.ctypes.data_as(i32p),
                i64(bw), i64(0), i64(bh * bw),
                predz.ptr(ctypes.c_int32),
            )
            assert rc in (0, -1, -2), (tag, refine, rc)
            grid.assert_intact(f"prog_dc {tag} refine={refine}")
            predz.assert_intact(f"prog_dc pred {tag}")
        checked += 1
    assert checked > 1000
