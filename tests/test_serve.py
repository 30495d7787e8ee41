"""HTTP serving endpoint (fft_restoration_tpu/serve.py)."""

import http.client
import json
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from fft_restoration_tpu.serve import (
    RestorationService,
    build_parser,
    make_handler,
)
from fft_restoration_tpu.utils.imageio import decode_png, encode_png
from fft_restoration_tpu.utils import formats


@pytest.fixture(scope="module")
def server():
    args = build_parser().parse_args(
        ["--backend", "matmul", "--psf-length", "5", "--psf-angle", "30"]
    )
    service = RestorationService(args)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()
    srv.server_close()


def _post(addr, path, body):
    conn = http.client.HTTPConnection(*addr, timeout=120)
    conn.request("POST", path, body=body)
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, data


def test_healthz(server):
    conn = http.client.HTTPConnection(*server, timeout=30)
    conn.request("GET", "/healthz")
    r = conn.getresponse()
    body = json.loads(r.read())
    conn.close()
    assert r.status == 200
    assert body["status"] == "ok"
    assert body["backend"] == "matmul"


def test_restore_png_roundtrip(server):
    rng = np.random.default_rng(0)
    img = (rng.random((24, 40, 3)) * 255).astype(np.uint8)
    status, data = _post(server, "/restore", encode_png(img))
    assert status == 200
    out = decode_png(data)
    assert out.shape == img.shape


def test_restore_bmp_with_params(server):
    rng = np.random.default_rng(1)
    img = (rng.random((16, 32, 3)) * 255).astype(np.uint8)
    status, data = _post(
        server, "/restore?psf_length=3&psf_angle=45&K=0.02",
        formats.encode_bmp(img),
    )
    assert status == 200
    assert decode_png(data).shape == img.shape


def test_restore_matches_pipeline(server):
    """The endpoint returns exactly what the library pipeline returns."""
    from fft_restoration_tpu.models.pipeline import WienerDeblurPipeline

    rng = np.random.default_rng(2)
    img = (rng.random((20, 36, 3)) * 255).astype(np.uint8)  # RGB for PNG
    status, data = _post(server, "/restore", encode_png(img))
    assert status == 200
    got = decode_png(data)
    want_bgr = WienerDeblurPipeline(fft_backend="matmul").restore(
        img[..., ::-1].copy(), 5, 30.0
    )
    np.testing.assert_array_equal(got, want_bgr[..., ::-1])


def test_bad_requests(server):
    status, data = _post(server, "/restore", b"not an image at all")
    assert status == 400 and b"error" in data
    status, _ = _post(server, "/restore?psf_length=abc", b"x")
    assert status == 400
    status, _ = _post(server, "/nope", b"x")
    assert status == 404
    status, _ = _post(server, "/restore", b"")
    assert status == 400


def test_health_after_serving(server):
    conn = http.client.HTTPConnection(*server, timeout=30)
    conn.request("GET", "/healthz")
    body = json.loads(conn.getresponse().read())
    conn.close()
    assert body["served"] >= 1
    assert any("x" in s for s in body["compiled_shapes"])
