"""AddressSanitizer replay of the native-decoder fuzz corpus.

tests/test_native_fuzz.py proves the C++ decoders survive corrupt
payloads without visible crashes or redzone writes; this tool raises
the bar to ASAN instrumentation, which catches heap overflows, UAFs,
and out-of-bounds reads that a 64-byte redzone cannot. One-shot
verification artifact, not part of the pytest suite (ASAN needs
LD_PRELOAD before the interpreter starts):

    python tools/native_asan_fuzz.py

Builds -fsanitize=address variants of webp_codec.cpp / jp2_t1.cpp /
png_codec.cpp into a temp dir, then re-runs tests/test_native_fuzz.py
and tests/test_ingest_fuzz.py in a child python with
LD_PRELOAD=libasan.so and FFT_NATIVE_DIR pointing at the ASAN build
(the loaders in utils/{webp,jp2_t1,imageio}.py honor that override).
Exit code 0 = the whole corpus ran clean under ASAN.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
NATIVE = REPO / "fft_restoration_tpu" / "native"

BUILDS = [
    ("libwebpdec.so", ["webp_codec.cpp"], []),
    ("libjp2t1.so", ["jp2_t1.cpp"], []),
    ("libpngfilt.so", ["png_codec.cpp"], ["-lz", "-lpthread"]),
    ("libgifdec.so", ["gif_codec.cpp"], []),
]


def main() -> int:
    asan_rt = subprocess.run(
        ["g++", "-print-file-name=libasan.so"], capture_output=True, text=True
    ).stdout.strip()
    if not asan_rt or not Path(asan_rt).exists():
        print("g++/libasan not available; nothing to do", file=sys.stderr)
        return 2
    # libstdc++ must be resident when ASAN initializes or its
    # __cxa_throw interceptor is left null and the decoders' fail()
    # throw aborts the process (observed: CHECK failed
    # asan_interceptors.cpp:320) — preload it after the runtime.
    stdcxx = subprocess.run(
        ["g++", "-print-file-name=libstdc++.so.6"], capture_output=True, text=True
    ).stdout.strip()

    with tempfile.TemporaryDirectory(prefix="fft_asan_") as tmp:
        for so, srcs, libs in BUILDS:
            cmd = [
                "g++", "-O1", "-g", "-fPIC", "-shared", "-fsanitize=address",
                "-o", str(Path(tmp) / so),
                *[str(NATIVE / s) for s in srcs], *libs,
            ]
            print("+", " ".join(cmd))
            subprocess.run(cmd, check=True)

        env = dict(os.environ)
        env.update(
            LD_PRELOAD=f"{asan_rt} {stdcxx}",
            FFT_NATIVE_DIR=tmp,
            # Python leaks-by-design trip LSan; the target is the codecs.
            ASAN_OPTIONS="detect_leaks=0:log_path=/tmp/asan_report:allocator_may_return_null=0",
        )
        rc = subprocess.run(
            [
                sys.executable, "-m", "pytest",
                str(REPO / "tests" / "test_native_fuzz.py"),
                str(REPO / "tests" / "test_ingest_fuzz.py"),
                "-q", "-p", "no:cacheprovider",
            ],
            env=env,
            cwd=str(REPO),
        ).returncode
        print(f"ASAN fuzz replay: {'CLEAN' if rc == 0 else f'FAILED rc={rc}'}")
        return rc


if __name__ == "__main__":
    sys.exit(main())
