#!/usr/bin/env python
"""Extract the AV1 default entropy/quantizer tables from system AV1
decoder binaries into ``fft_restoration_tpu/utils/_av1_tables.py``.

The AV1 spec pins ~30k u16 of default symbol CDFs (spec 5.x "Default CDF
tables"), the dc/ac quantizer lookups (spec 9.4), and the 15-level
quantizer-matrix set (spec 9.6, Quantizer_Matrix[15][2][3344]).  Typing
them in by hand is error-prone at this volume, so — exactly like
``_vp8_tables.py`` did for libwebp — we lift them byte-exactly from the
rodata of the AV1 decoders shipped in this environment and emit a
generated module.  Every table is located CONTENT-ADDRESSED (searched by
spec-known anchor values and validated structurally: ICDF rows must be
strictly decreasing and zero-terminated), never by hard file offsets, so
the extractor survives rebuilds of the source libraries.

Sources probed (first validating match wins; all carry identical spec
constants):
  * pillow's bundled libavif (contains static aom + dav1d copies)
  * /usr/lib/x86_64-linux-gnu/libaom.so.3*
  * /usr/lib/x86_64-linux-gnu/libdav1d.so.6*

Layout conventions recovered on these binaries (aom convention):
  * a CDF row for n symbols is CDF_SIZE(n) = n+1 u16: n-1 strictly
    decreasing ICDF values (32768 - cumulative prob), a 0 terminator,
    and a 0 adaptation counter.  Some arrays pad rows to a larger
    declared symbol count (uv_mode rows to 15 entries, partition to 11,
    intra tx-type rows to 17); strides are validated against every row.
  * the per-quantizer-context coefficient CDFs sit in one contiguous
    rodata region in declaration order: eob_pt_1024..16, coeff_base_eob,
    coeff_base, coeff_br, dc_sign, eob_extra, txb_skip.
  * Quantizer_Matrix is two [15][2][3344] u8 arrays (forward weights and
    inverse weights, elementwise product ~1024); the spec orientation is
    the one whose level-0 luma 4x4 starts 32,43,73,97.

Run: python tools/extract_av1_tables.py   (rewrites the generated module)
"""

from __future__ import annotations

import glob
import struct
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "fft_restoration_tpu" / "utils" / "_av1_tables.py"


def _sources() -> list[tuple[str, bytes]]:
    cands: list[str] = []
    cands += glob.glob("/root/.cache/uv/archive-v0/*/pillow.libs/libavif*.so*")
    cands += glob.glob("/usr/lib/x86_64-linux-gnu/libaom.so.3*")
    cands += glob.glob("/usr/lib/x86_64-linux-gnu/libdav1d.so.6*")
    out, seen = [], set()
    for c in sorted(set(cands)):
        p = Path(c)
        if not p.is_file():
            continue
        key = p.stat().st_size
        if key in seen:
            continue
        seen.add(key)
        out.append((c, p.read_bytes()))
    if not out:
        sys.exit("no AV1 decoder binaries found to extract from")
    return out


SOURCES = _sources()


def icdf(probs):
    """Spec probability prefix -> aom ICDF u16 prefix."""
    return [32768 - p for p in probs]


def row_ok(vals, nsym):
    """Validate one aom-layout CDF row prefix: nsym-1 strictly decreasing
    positive ICDFs, then a zero terminator (rest of row don't-care)."""
    body = list(vals[: nsym - 1])
    if len(body) != nsym - 1 or any(v <= 0 or v >= 32768 for v in body):
        return False
    if any(b >= a for a, b in zip(body, body[1:])):
        return False
    return len(vals) > nsym - 1 and vals[nsym - 1] == 0


def lift(blob, off, nsyms, stride, width):
    """Lift len(nsyms) rows of `stride` u16 each; row r must be a valid
    nsyms[r]-symbol CDF row.  Returns a (rows, width) u16 array holding
    the aom CDF_SIZE layout (icdfs, 0 terminator, 0 counter)."""
    rows = len(nsyms)
    need = rows * stride * 2
    if off < 0 or off + need > len(blob):
        return None
    vals = struct.unpack_from(f"<{rows * stride}H", blob, off)
    table = np.zeros((rows, width), np.uint16)
    for r in range(rows):
        rv = vals[r * stride : (r + 1) * stride]
        if not row_ok(rv, nsyms[r]):
            return None
        table[r, : nsyms[r] - 1] = rv[: nsyms[r] - 1]
    return table


def find_cdf(name, anchor, nsyms, width, strides, anchor_row=0):
    """Locate a CDF table by an anchor u16 sequence (list of ICDF values,
    0 = literal zero) at row `anchor_row`, then lift+validate all rows."""
    pat = struct.pack(f"<{len(anchor)}H", *anchor)
    for src, blob in SOURCES:
        i = -1
        while True:
            i = blob.find(pat, i + 1)
            if i < 0:
                break
            if i % 2:
                continue
            for st in strides:
                off = i - anchor_row * st * 2
                t = lift(blob, off, nsyms, st, width)
                if t is not None:
                    print(f"  {name}: {Path(src).name} @ {off} stride={st}")
                    return t
    raise SystemExit(f"FAILED to locate {name}")


def anchor_rows(prob_rows, stride):
    """Anchor pattern spanning several consecutive rows at a stride."""
    out = []
    for probs in prob_rows:
        row = icdf(probs)
        out += row + [0] * (stride - len(row))
    # trim trailing padding of the last row: keep through its terminator
    return out[: (len(prob_rows) - 1) * stride + len(icdf(prob_rows[-1])) + 1]


def scan_runs(blob, lo, hi):
    """Map a rodata window into runs of equally-shaped CDF rows."""
    lo -= lo % 2
    n = (min(hi, len(blob)) - lo) // 2
    u16 = struct.unpack_from(f"<{n}H", blob, lo)
    i, runs = 0, []
    while i < n - 2:
        if u16[i] == 0:
            i += 1
            continue
        j = i
        while j + 1 < n and u16[j + 1] != 0 and u16[j + 1] < u16[j]:
            j += 1
        if j + 2 < n and u16[j + 1] == 0 and u16[j + 2] == 0 and u16[i] < 32768:
            off, ns = lo + 2 * i, (j - i + 1) + 1
            if runs and runs[-1][1] == ns and off == runs[-1][0] + runs[-1][2] * (ns + 1) * 2:
                runs[-1] = (runs[-1][0], ns, runs[-1][2] + 1)
            else:
                runs.append((off, ns, 1))
            i = j + 3
        else:
            i += 1
    return runs


def find_intra_tx():
    """Structural search: 52 rows of 7-symbol CDFs padded to 17 u16,
    immediately followed by 52 rows of 5-symbol CDFs at the same stride.
    That shape ([4 tx sizes][13 intra modes] per set) is unique."""
    for src, blob in SOURCES:
        b = blob[: len(blob) // 2 * 2]
        a = np.frombuffer(b, "<u2").astype(np.int32)

        def rowmask(nsym):
            # position i starts an nsym-row: icdfs strictly decreasing,
            # positive, terminator + pad zeros through entry 16
            m = np.ones(len(a) - 17, bool)
            m &= (a[: len(m)] > 0) & (a[: len(m)] < 32768)
            for k in range(1, nsym - 1):
                m &= (a[k : len(m) + k] > 0) & (a[k : len(m) + k] < a[k - 1 : len(m) + k - 1])
            for k in range(nsym - 1, 17):
                m &= a[k : len(m) + k] == 0
            return m

        m7, m5 = rowmask(7), rowmask(5)

        def all52(m, start_positions):
            ok = start_positions.copy()
            for k in range(52):
                ok = ok[m[ok + 17 * k]]
            return ok

        cand = np.nonzero(m7)[0]
        cand = all52(m7, cand)
        for i in cand:
            j = i + 52 * 17
            if j + 52 * 17 <= len(m5) and len(all52(m5, np.array([j]))) == 1:
                off = 2 * int(i)
                t1 = lift(blob, off, [7] * 52, 17, 8)
                t2 = lift(blob, off + 52 * 34, [5] * 52, 17, 6)
                assert t1 is not None and t2 is not None
                print(f"  intra_tx_type: {Path(src).name} @ {off}")
                return t1.reshape(4, 13, 8), t2.reshape(4, 13, 6)
    sys.exit("FAILED to locate intra tx-type CDFs")


def main():
    tables: dict[str, np.ndarray] = {}
    print("== mode CDFs")
    tables["partition"] = find_cdf(
        "partition",
        anchor_rows([[19132, 25510, 30392]], 11),
        nsyms=[4] * 4 + [10] * 12 + [8] * 4, width=11, strides=[11],
    )
    tables["kf_y_mode"] = find_cdf(
        "kf_y_mode",
        icdf([15588, 17027, 19338, 20218, 20682, 21110, 21825, 23244, 24189,
              28165, 29093, 30466]) + [0],
        nsyms=[13] * 25, width=14, strides=[14],
    ).reshape(5, 5, 14)
    tables["uv_mode"] = find_cdf(
        "uv_mode",
        icdf([22631, 24152, 25378, 25661, 25986, 26520, 27055, 27923, 28244,
              30059, 30941, 31961]) + [0],
        nsyms=[13] * 13 + [14] * 13, width=15, strides=[15],
    ).reshape(2, 13, 15)  # [cfl_allowed][y mode]; !cfl rows use 13 syms
    tables["angle_delta"] = find_cdf(
        "angle_delta",
        icdf([2180, 5032, 7567, 22776, 26989, 30217]) + [0],
        nsyms=[7] * 8, width=8, strides=[8],
    )
    tables["cfl_sign"] = find_cdf(
        "cfl_sign",
        icdf([1418, 2123, 13340, 18405, 26972, 28343, 32294]) + [0],
        nsyms=[8], width=9, strides=[9],
    )
    tables["cfl_alpha"] = find_cdf(
        "cfl_alpha",
        icdf([7637, 20719, 31401, 32481, 32657, 32688, 32692, 32696, 32700,
              32704, 32708, 32712, 32716, 32720, 32724]) + [0],
        nsyms=[16] * 6, width=17, strides=[17],
    )
    tables["skip"] = find_cdf(
        "skip",
        anchor_rows([[31671], [16515], [4576]], 3),
        nsyms=[2] * 3, width=3, strides=[3],
    )
    tables["filter_intra"] = find_cdf(
        "filter_intra",
        anchor_rows([[4621], [6743], [5893], [7866], [12551]], 3),
        nsyms=[2] * 22, width=3, strides=[3],
    )
    tables["filter_intra_mode"] = find_cdf(
        "filter_intra_mode",
        icdf([8949, 12776, 17211, 29558]) + [0],
        nsyms=[5], width=6, strides=[6, 5, 8],
    )
    tables["delta_q"] = find_cdf(
        "delta_q", icdf([28160, 32120, 32677]) + [0],
        nsyms=[4], width=5, strides=[5],
    )
    # default_tx_size_cdf[MAX_TX_CATS=4][TX_SIZE_CONTEXTS=3][CDF_SIZE(3)]:
    # cat 0 rows carry 2 symbols (depth 0/1), cats 1-3 carry 3.
    tables["tx_size"] = find_cdf(
        "tx_size",
        anchor_rows([[19968], [19968], [24320]], 4),
        nsyms=[2] * 3 + [3] * 9, width=4, strides=[4],
    ).reshape(4, 3, 4)

    print("== intra tx-type CDFs (structural)")
    tables["intra_tx_type1"], tables["intra_tx_type2"] = find_intra_tx()

    # Coefficient CDFs: one contiguous region in declaration order;
    # anchor on eob_pt_16's q0 row, then walk the structural run map.
    print("== coefficient CDFs (structural region)")
    pat = struct.pack("<4H", *icdf([840, 1039, 1980, 4895]))
    region = None
    for src, blob in SOURCES:
        i = blob.find(pat)
        if i >= 0 and i % 2 == 0:
            region = (src, blob, i)
            break
    if region is None:
        sys.exit("FAILED to anchor the coefficient CDF region")
    src, blob, eob16_off = region
    runs = scan_runs(blob, max(eob16_off - 40000, 0), eob16_off + 80000)
    want = {  # (nsym, rows): (name, final shape)
        (11, 16): ("eob_pt_1024", (4, 2, 2, 12)),
        (10, 16): ("eob_pt_512", (4, 2, 2, 11)),
        (9, 16): ("eob_pt_256", (4, 2, 2, 10)),
        (8, 16): ("eob_pt_128", (4, 2, 2, 9)),
        (7, 16): ("eob_pt_64", (4, 2, 2, 8)),
        (6, 16): ("eob_pt_32", (4, 2, 2, 7)),
        (5, 16): ("eob_pt_16", (4, 2, 2, 6)),
        (3, 160): ("coeff_base_eob", (4, 5, 2, 4, 4)),
        (4, 2520): ("coeff_base+br", None),
        (2, 24): ("dc_sign", (4, 2, 3, 3)),
        (2, 360): ("eob_extra", (4, 5, 2, 9, 3)),
        (2, 260): ("txb_skip", (4, 5, 13, 3)),
    }
    for off, ns, cnt in runs:
        key = (ns, cnt)
        if key not in want:
            continue
        name, shape = want.pop(key)
        t = lift(blob, off, [ns] * cnt, ns + 1, ns + 1)
        assert t is not None
        if name == "coeff_base+br":
            # 4*5*2*42 = 1680 coeff_base rows then 4*5*2*21 = 840 coeff_br
            tables["coeff_base"] = t[:1680].reshape(4, 5, 2, 42, 5)
            tables["coeff_br"] = t[1680:].reshape(4, 5, 2, 21, 5)
        else:
            tables[name] = t.reshape(shape)
        print(f"  {name}: {Path(src).name} @ {off} x{cnt}")
    if want:
        sys.exit(f"FAILED to locate coefficient blocks: {sorted(want.values())}")
    # sanity: spec-known q0 anchors inside the lifted blocks
    assert tables["coeff_base"][0, 0, 0, 0, 0] == 32768 - 4034
    assert tables["txb_skip"][0, 0, 0, 0] == 32768 - 31849

    # Quantizer lookups: 256 monotone nondecreasing i16 from 4 to 1336/1828.
    print("== quantizer lookups")
    for name, last in (("dc_q", 1336), ("ac_q", 1828)):
        found = None
        for src, blob in SOURCES:
            arr = np.frombuffer(blob[: len(blob) // 2 * 2], "<i2")
            for k in np.where(arr == last)[0]:
                if k < 255:
                    continue
                seg = arr[k - 255 : k + 1]
                if seg[0] == 4 and np.all(np.diff(seg.astype(np.int32)) >= 0):
                    found = (src, 2 * (k - 255), seg.astype(np.int16).copy())
                    break
            if found:
                break
        if not found:
            sys.exit(f"FAILED to locate {name}")
        src, off, seg = found
        tables[name] = seg
        print(f"  {name}: {Path(src).name} @ {off}")

    # Quantizer_Matrix [15][2][3344] u8: locate via the elementwise
    # wt*iwt ~= 1024 signature between the two 100320-byte arrays, then
    # pick the spec orientation (level-0 luma 4x4 starts 32,43,73,97).
    print("== quantizer matrices")
    QM_N = 15 * 2 * 3344
    qm = None
    for src, blob in SOURCES:
        u8 = np.frombuffer(blob, np.uint8).astype(np.int32)
        if len(u8) < 2 * QM_N:
            continue
        prod = u8[:-QM_N] * u8[QM_N:]
        idx = np.where((prod >= 900) & (prod <= 1160))[0]
        if len(idx) == 0:
            continue
        splits = np.split(idx, np.where(np.diff(idx) != 1)[0] + 1)
        longest = max(splits, key=len)
        if len(longest) < QM_N:
            continue
        off = int(longest[0])
        A = np.frombuffer(blob[off : off + QM_N], np.uint8).reshape(15, 2, 3344)
        B = np.frombuffer(blob[off + QM_N : off + 2 * QM_N], np.uint8).reshape(15, 2, 3344)
        qm = A if list(A[0, 0, :4]) == [32, 43, 73, 97] else B
        assert list(qm[0, 0, :4]) == [32, 43, 73, 97], "spec orientation missing"
        print(f"  qm: {Path(src).name} @ {off}")
        break
    if qm is None:
        sys.exit("FAILED to locate quantizer matrices")
    # structural check of the recovered tx-size offsets: square tables
    # must be symmetric at every level/plane
    for (w, h), o in ((4, 4), 0), ((8, 8), 16), ((16, 16), 80), ((32, 32), 336):
        m = qm[0, 0, o : o + w * h].reshape(h, w)
        assert np.array_equal(m, m.T), f"qm {w}x{h} slice not symmetric"
    tables["qm"] = qm.copy()

    find_recon_tables(tables)
    find_scan_tables(tables)
    emit(tables)


def find_scan_tables(tables):
    """Default (diagonal) scan orders, spec section 9.23, one per coded
    tx shape (64-wide/tall transforms reuse the 32 tables).  Located
    structurally: an int16 window is a Default_Scan_WxH candidate iff it
    is a permutation of 0..w*h-1 whose positions (pos // w, pos % w)
    walk anti-diagonals in nondecreasing order, each diagonal traversed
    monotonically.  That property is orientation-discriminating for
    every rect shape (reading the bytes at the transposed stride fails
    the diagonal walk), and both system decoders carry byte-identical
    rect tables.  Squares exist in both traversal parities in rodata;
    the spec family is the right-first one (scan[1] == 1 — pinned by the
    spec's own Default_Scan_4x4 = {0, 1, 4, 8, ...})."""
    print("== scan orders (structural)")
    shapes = [(4, 4), (8, 8), (16, 16), (32, 32), (4, 8), (8, 4), (8, 16),
              (16, 8), (16, 32), (32, 16), (4, 16), (16, 4), (8, 32), (32, 8)]

    def diagonal_scans(blob):
        found: dict[tuple[int, int], set[tuple[int, ...]]] = {}
        for align in (0, 1):
            a = np.frombuffer(
                blob[align : align + (len(blob) - align) // 2 * 2], "<i2"
            )
            zero_idx = np.flatnonzero(a == 0)
            for (w, h) in shapes:
                n = w * h
                for i in zero_idx:
                    if i + n > len(a) or a[i + 1] not in (1, w):
                        continue
                    v = a[i : i + n].astype(np.int64)
                    if v.min() != 0 or v.max() != n - 1:
                        continue
                    if len(np.unique(v)) != n:
                        continue
                    r, c = v // w, v % w
                    d = r + c
                    dd = np.diff(d)
                    if np.any(dd < 0) or np.any(dd > 1):
                        continue
                    ok, start = True, 0
                    for k in range(1, n + 1):
                        if k == n or d[k] != d[start]:
                            rr = r[start:k]
                            if len(rr) > 1 and not (
                                np.all(np.diff(rr) == 1)
                                or np.all(np.diff(rr) == -1)
                            ):
                                ok = False
                                break
                            start = k
                    if ok:
                        found.setdefault((w, h), set()).add(tuple(int(x) for x in v))
        return found

    per_src = [(src, diagonal_scans(blob)) for src, blob in SOURCES]
    for (w, h) in shapes:
        cands = None
        for src, f in per_src:
            got = set()
            for v in f.get((w, h), set()):
                if w != h or v[1] == 1:
                    got.add(v)
                else:  # square stored down-first (dav1d parity): transpose
                    a = np.array(v, np.int64)
                    t = (a % w) * w + a // w
                    got.add(tuple(int(x) for x in t))
            cands = got if cands is None else (cands & got)
        if not cands:
            sys.exit(f"FAILED to locate default scan {w}x{h}")
        if len(cands) > 1:
            sys.exit(f"ambiguous default scan {w}x{h}: {len(cands)} candidates")
        tables[f"scan_{w}x{h}"] = np.array(sorted(cands)[0], np.uint16)
        print(f"  scan_{w}x{h}: agreed across {len(per_src)} source(s)")

    # Coeff_Base_Ctx_Offset (spec: the 2D-class base-level context
    # offsets, one 5x5 grid per aspect class square/wide/tall) and the
    # Skip_Contexts grid (get_txb_skip_ctx) — stored adjacently in the
    # decoders' rodata; anchored on the square grid's exact bytes and
    # validated by each grid's structural monotonicity.
    print("== coeff-base ctx offsets")
    sq = bytes([0, 1, 6, 6, 21, 1, 6, 6, 21, 21, 6, 6, 21, 21, 21,
                6, 21, 21, 21, 21, 21, 21, 21, 21, 21])
    hit = None
    for src, blob in SOURCES:
        i = blob.find(sq)
        if i < 0 or i + 75 > len(blob):
            continue
        trio = np.frombuffer(blob[i : i + 75], np.uint8)
        wide, tall = trio[25:50], trio[50:75]
        if (
            wide[0] == 0 and tall[0] == 0
            and set(wide.tolist()) <= {0, 6, 16, 21}
            and set(tall.tolist()) <= {0, 6, 11, 21}
        ):
            hit = (src, i, trio.reshape(3, 5, 5).copy())
            break
    if hit is None:
        sys.exit("FAILED to locate coeff-base ctx offsets")
    src, off, trio = hit
    tables["lo_ctx_offsets"] = trio
    print(f"  lo_ctx_offsets: {Path(src).name} @ {off}")

    # Skip_Contexts[5][5] (spec get_txb_skip_ctx): its own anchor — the
    # exact 25 bytes are unique and identical across the decoders.
    skip_pat = bytes([1, 2, 2, 2, 3, 2, 4, 4, 4, 5, 2, 4, 4, 4, 5,
                      2, 4, 4, 4, 5, 3, 5, 5, 5, 6])
    for src, blob in SOURCES:
        i = blob.find(skip_pat)
        if i >= 0:
            tables["skip_contexts"] = np.frombuffer(
                blob[i : i + 25], np.uint8
            ).reshape(5, 5).copy()
            print(f"  skip_contexts: {Path(src).name} @ {i}")
            break
    else:
        sys.exit("FAILED to locate skip contexts")


def find_recon_tables(tables):
    """Reconstruction-side constants (spec 7.11.2): Filter_Intra_Taps,
    Sm_Weights, Dr_Intra_Derivative.  Same content-addressed discipline:
    each table is located by a structural invariant the spec pins, never
    by file offset."""
    # Filter_Intra_Taps[5][8][7] int8: 40 consecutive 7-tap rows, every
    # one summing to 16 (each 4x2-patch output is a gain-16 weighted
    # average of the 7 reference pixels), taps bounded and mixed-sign.
    print("== filter intra taps")
    hit = None
    for src, blob in SOURCES:
        a = np.frombuffer(blob, np.int8).astype(np.int32)
        if len(a) < 320:
            continue
        s8 = np.convolve(a, np.ones(8, np.int32), "valid")
        for off in np.where(s8 == 16)[0]:
            if off + 320 > len(a):
                continue
            rows = a[off : off + 320].reshape(40, 8)
            # stored [5][8][8] with a zero pad column; the 7 taps of each
            # 4x2-patch output sum to 16 (gain-16 weighted average)
            if (
                np.all(rows.sum(1) == 16)
                and np.all(rows[:, 0] == 0)
                and np.all(np.abs(rows) <= 16)
                and (rows < 0).sum() >= 20
            ):
                hit = (src, int(off), rows[:, 1:].astype(np.int8).reshape(5, 8, 7))
                break
        if hit:
            break
    if hit is None:
        sys.exit("FAILED to locate filter intra taps")
    src, off, taps = hit
    tables["filter_intra_taps"] = taps.copy()
    print(f"  filter_intra_taps: {Path(src).name} @ {off}")

    # Sm_Weights: five strictly-decreasing u8 runs (lengths 4/8/16/32/64)
    # stored back to back, each starting at 255; anchored on the len-4
    # run {255, 149, 85, 64} followed immediately by the len-8 run's 255.
    print("== smooth weights")
    anchor = bytes([255, 149, 85, 64, 255])
    found = None
    for src, blob in SOURCES:
        i = -1
        while True:
            i = blob.find(anchor, i + 1)
            if i < 0:
                break
            seq = np.frombuffer(blob[i : i + 124], np.uint8)
            if len(seq) < 124:
                continue
            ok, pos = True, 0
            for n in (4, 8, 16, 32, 64):
                run = seq[pos : pos + n].astype(np.int32)
                # non-increasing (the 32/64 runs end in repeated values),
                # from 255 down to a small positive tail
                if (
                    run[0] != 255
                    or np.any(np.diff(run) > 0)
                    or run[-1] < 1
                    or run[-1] > 64
                ):
                    ok = False
                    break
                pos += n
            if ok:
                found = (src, i, seq.copy())
                break
        if found:
            break
    if found is None:
        sys.exit("FAILED to locate smooth weights")
    src, off, sm = found
    tables["sm_weights"] = sm
    print(f"  sm_weights: {Path(src).name} @ {off}")

    # Dr_Intra_Derivative[90] u16: nonzero exactly at the angles the
    # directional predictors can look up (spec 7.11.2.7 slot layout:
    # pAngle, pAngle-90 and 180-pAngle for every coded angle), strictly
    # decreasing from 1023 at 3 degrees down to 3 at 87.
    print("== dr intra derivative")
    dr_slots = (
        [3, 6, 9, 14, 17, 20, 23, 26, 29, 32]
        + [36, 39, 42, 45, 48, 51, 54, 58, 61, 64]
        + [67, 70, 73, 76, 81, 84, 87]
    )
    pat = struct.pack("<6H", 1023, 0, 0, 547, 0, 0)
    found = None
    for src, blob in SOURCES:
        i = -1
        while True:
            i = blob.find(pat, i + 1)
            if i < 0:
                break
            if i % 2:
                continue
            off = i - 6  # table starts three zero slots earlier
            arr = np.frombuffer(blob[off : off + 180], "<u2")
            if len(arr) < 90:
                continue
            nz = arr[:90][dr_slots]
            zeros = np.delete(arr[:90], dr_slots)
            if (
                np.all(zeros == 0)
                and nz[0] == 1023
                and nz[-1] == 3
                and np.all(np.diff(nz.astype(np.int32)) < 0)
            ):
                found = (src, off, arr[:90].astype(np.uint16).copy())
                break
        if found:
            break
    if found is None:
        sys.exit("FAILED to locate dr intra derivative")
    src, off, dr = found
    tables["dr_intra_derivative"] = dr
    print(f"  dr_intra_derivative: {Path(src).name} @ {off}")


def emit(tables):
    lines = [
        '"""AV1 default entropy/quantizer tables (generated — do not edit).',
        "",
        "Byte-exact spec constants lifted from this environment's AV1 decoder",
        "binaries by tools/extract_av1_tables.py (provenance + layout notes",
        "there).  CDF arrays use the aom in-memory convention: u16 rows of",
        "CDF_SIZE(n) = n+1 entries [icdf_0 > icdf_1 > ... > icdf_{n-2}, 0, 0],",
        "where icdf = 32768 - cumulative probability and the final slot is the",
        "adaptation counter.  qm is Quantizer_Matrix[15][2][3344] (spec 9.6)",
        "with QM_OFFSET giving each tx size's slice.  dc_q/ac_q are the 8-bit",
        "quantizer lookups (spec 9.4).",
        '"""',
        "",
        "import binascii as _ba",
        "",
        "import numpy as np",
        "",
        "",
        "def _u16(hexstr, shape):",
        '    return np.frombuffer(_ba.unhexlify(hexstr), "<u2").reshape(shape).copy()',
        "",
        "",
        "def _i16(hexstr, shape):",
        '    return np.frombuffer(_ba.unhexlify(hexstr), "<i2").reshape(shape).copy()',
        "",
        "",
        "def _u8(hexstr, shape):",
        "    return np.frombuffer(_ba.unhexlify(hexstr), np.uint8).reshape(shape).copy()",
        "",
        "",
        "def _i8(hexstr, shape):",
        "    return np.frombuffer(_ba.unhexlify(hexstr), np.int8).reshape(shape).copy()",
        "",
        "",
        "# Quantizer_Matrix tx-size slices: enum-order offsets into axis 2.",
        "QM_OFFSET = {",
        "    (4, 4): 0, (8, 8): 16, (16, 16): 80, (32, 32): 336,",
        "    (4, 8): 1360, (8, 4): 1392, (8, 16): 1424, (16, 8): 1552,",
        "    (16, 32): 1680, (32, 16): 2192, (4, 16): 2704, (16, 4): 2768,",
        "    (8, 32): 2832, (32, 8): 3088,",
        "}",
        "",
    ]
    for name, arr in tables.items():
        if arr.dtype == np.uint16:
            fn, blob = "_u16", arr.astype("<u2").tobytes()
        elif arr.dtype == np.int16:
            fn, blob = "_i16", arr.astype("<i2").tobytes()
        elif arr.dtype == np.int8:
            fn, blob = "_i8", arr.tobytes()
        else:
            fn, blob = "_u8", arr.tobytes()
        hx = blob.hex()
        lines.append(f"{name.upper()} = {fn}(")
        for i in range(0, len(hx), 96):
            lines.append(f'    "{hx[i:i + 96]}"')
        lines.append(f"    , {tuple(arr.shape)})")
        lines.append("")
    OUT.write_text("\n".join(lines) + "\n")
    total = sum(t.nbytes for t in tables.values())
    print(f"wrote {OUT} ({len(tables)} tables, {total} bytes of data)")


if __name__ == "__main__":
    main()
