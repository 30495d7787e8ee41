"""EXR DWAA/DWAB decode (utils/exr_dwa.py) vs the system libOpenEXR.

This environment's cv2 has no EXR codec, but the system libOpenEXR 3.1
does — the committed fixtures under tests/data/ were both WRITTEN and
DECODED by that library through a small C++ oracle tool (recipe below),
so `dwa_reference.npz` holds the real implementation's float32 output
for every fixture. Our decoder must match within one half ulp of the
local magnitude (the remaining difference is float32 IDCT rounding
order; the DC-only / nonlinear-LUT path is bit-exact, pinned separately
against the library's own 65536-entry table).

Fixture regeneration (needs g++ + libOpenEXR-dev, as in this image):
    g++ -O2 -o exr_oracle exr_oracle.cpp -I/usr/include/OpenEXR \
        -I/usr/include/Imath -lOpenEXR-3_1 -lImath-3_1
    exr_oracle write <out> <w> <h> <nchan> <compression> half|float
with float32 HWC samples on stdin (see git history of this file's
introduction for the full tool source).
"""

import pathlib

import numpy as np
import pytest

from fft_restoration_tpu.utils.exr import decode_exr, decode_exr_float
from fft_restoration_tpu.utils.exr_dwa import _to_linear_lut

DATA = pathlib.Path(__file__).parent / "data"

FIXTURES = [
    # name, channels our decoder returns
    ("dwaa_rgb_half", ["R", "G", "B"]),
    ("dwab_rgb_half", ["R", "G", "B"]),
    ("dwaa_rgba_half", ["R", "G", "B", "A"]),
    ("dwaa_rgb_float", ["R", "G", "B"]),
    ("dwaa_gray_half", ["R"]),
    ("dwaa_rgbz", ["R", "G", "B"]),  # Z float = UNKNOWN scheme, zlib lane
]


@pytest.fixture(scope="module")
def reference():
    return np.load(DATA / "dwa_reference.npz")


@pytest.mark.parametrize("name,sel", FIXTURES, ids=[f[0] for f in FIXTURES])
def test_dwa_matches_system_libopenexr(name, sel, reference):
    data = (DATA / f"{name}.exr").read_bytes()
    want = reference[name]
    names = [str(x) for x in reference[name + "__names"]]
    got = decode_exr_float(data)
    img = got[0] if isinstance(got, tuple) else got
    if img.ndim == 2:
        img = img[..., None]
    order = [names.index(c) for c in sel]
    ref = want[..., order]
    diff = np.abs(img - ref)
    # a few half ulps of the local magnitude: the pre-LUT IDCT is
    # float32 with a different summation order than the library's, and
    # the toLinear curve's slope (up to ~2.2 for these magnitudes)
    # amplifies a one-ulp half flip
    ulp = np.maximum(np.abs(ref), 1.0) * 2 ** -10
    assert (diff <= 4 * ulp + 1e-7).all(), float(diff.max())
    assert float(diff.mean()) < 1e-4


def test_dwa_uint8_ingest_path():
    # the framework-facing decode_exr contract (value*255 saturate)
    img = decode_exr((DATA / "dwaa_rgb_half.exr").read_bytes())
    assert img.dtype == np.uint8 and img.shape == (37, 53, 3)
    assert img.max() == 255  # fixture exceeds 1.0 -> saturates


def test_to_linear_lut_matches_library_table():
    """The closed form reproduces libOpenEXR's generated dwa toLinear
    table bit-exactly (all 65536 entries). Skipped when the system
    library is absent or a different build ships a moved table."""
    lib = pathlib.Path("/usr/lib/x86_64-linux-gnu/libOpenEXR-3_1.so.30")
    if not lib.exists():
        pytest.skip("system libOpenEXR not present")
    blob = lib.read_bytes()
    ours = _to_linear_lut()
    # locate the table: 65536 uint16 window with t[0]==0,
    # t[half(1.0)]==half(1.0), t[half(0.5)]==half(0.5^2.2)
    arr = np.frombuffer(blob[: len(blob) // 2 * 2], np.uint16)
    anchor = ours[0x3800]
    for j in np.flatnonzero(arr == anchor):
        i = int(j) - 0x3800
        if i < 0 or i + 65536 > arr.size:
            continue
        if arr[i] == 0 and arr[i + 0x3C00] == 0x3C00:
            win = arr[i : i + 65536]
            if np.array_equal(win, ours):
                return  # bit-exact hit
            mism = int((win != ours).sum())
            pytest.fail(f"library table found but {mism} entries differ")
    pytest.skip("library table layout not found (different build)")


def test_dwa_corruption_never_crashes():
    """Truncation + byteflips on a real DWA file: ValueError or a valid
    decode, never any other exception (the ingest fuzz contract)."""
    blob = bytearray((DATA / "dwaa_rgba_half.exr").read_bytes())
    rng = np.random.default_rng(3)
    for cut in range(0, len(blob), max(1, len(blob) // 48)):
        try:
            decode_exr(bytes(blob[:cut]))
        except ValueError:
            pass
    for _ in range(200):
        pos = int(rng.integers(len(blob)))
        old = blob[pos]
        blob[pos] = int(rng.integers(256))
        try:
            decode_exr(bytes(blob))
        except ValueError:
            pass
        blob[pos] = old


def test_dwa_absurd_counts_rejected():
    """A forged header with absurd stream counts must raise, not
    allocate."""
    from fft_restoration_tpu.utils.exr_dwa import dwa_uncompress

    import struct

    hdr = struct.pack(
        "<11Q", 2, 0, 0, 0, 0, 0, 0, 0, 1 << 60, 1 << 60, 0
    ) + struct.pack("<H", 2)
    with pytest.raises(ValueError):
        dwa_uncompress(hdr, [("R", 1, 1, 1)], 8, 8, 128)
