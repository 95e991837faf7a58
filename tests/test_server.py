"""REST API behavior: endpoint contract parity with backend/app.py, tested
both in-process (Router.dispatch) and over a real socket."""

import base64
import io
import json
import re
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from gpu_image_processing_tpu.server.app import create_app
from gpu_image_processing_tpu.server.http import AppServer, Request


@pytest.fixture(scope="module")
def app():
    return create_app()


def _png_b64(arr: np.ndarray, data_url: bool = True) -> str:
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    s = base64.b64encode(buf.getvalue()).decode()
    return f"data:image/png;base64,{s}" if data_url else s


def _post(app, path, payload):
    return app.dispatch(Request(method="POST", path=path, json=payload))


def _small_image():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(16, 20, 3), dtype=np.uint8)


def test_root(app):
    status, body = app.dispatch(Request(method="GET", path="/"))
    assert status == 200
    assert body["status"] == "running"
    assert body["gpu_available"] is True
    assert "POST /api/process" in body["endpoints"]


def test_health(app):
    status, body = app.dispatch(Request(method="GET", path="/api/health"))
    assert status == 200
    assert body == {"status": "healthy", "gpu_available": True, "tpu_available": True}


def test_filters_catalog(app):
    status, body = app.dispatch(Request(method="GET", path="/api/filters"))
    assert status == 200
    f = body["filters"]
    assert set(f) == {"gaussian", "box", "sobel"}
    assert f["gaussian"]["parameters"]["sigma"]["range"] == [0.5, 20.0]
    assert f["gaussian"]["parameters"]["radius"]["range"] == [1, 15]
    assert f["sobel"]["parameters"]["level"]["default"] == 2


def test_process_gaussian(app):
    img = _small_image()
    status, body = _post(app, "/api/process", {
        "image": _png_b64(img), "filter": "gaussian", "level": 2,
        "sigma": 2.0, "radius": 3,
    })
    assert status == 200
    assert set(body) == {"processed_image", "metrics", "info"}
    assert body["processed_image"].startswith("data:image/png;base64,")
    assert body["metrics"]["time_ms"] > 0
    assert body["info"]["level"] == "texture_memory"
    assert body["info"]["width"] == 20 and body["info"]["height"] == 16
    # Round-trip the processed image and check it decodes to the same shape.
    raw = base64.b64decode(body["processed_image"].split(",", 1)[1])
    out = np.array(Image.open(io.BytesIO(raw)))
    assert out.shape == img.shape


def test_process_invalid_filter(app):
    status, body = _post(app, "/api/process", {
        "image": _png_b64(_small_image()), "filter": "median",
    })
    assert status == 400
    assert "Invalid filter" in body["detail"]


def test_process_invalid_level(app):
    status, body = _post(app, "/api/process", {
        "image": _png_b64(_small_image()), "filter": "box", "level": 9,
    })
    assert status == 400
    assert "Invalid level" in body["detail"]


def test_process_bad_image(app):
    status, body = _post(app, "/api/process", {
        "image": "data:image/png;base64,!!!notbase64!!!", "filter": "box",
    })
    assert status == 400
    assert "Failed to decode" in body["detail"]


def test_process_missing_body(app):
    status, body = _post(app, "/api/process", None)
    assert status == 400


def test_process_all(app):
    img = _small_image()
    status, body = _post(app, "/api/process-all", {
        "image": _png_b64(img), "filter": "sobel",
    })
    assert status == 200
    assert set(body["results"]) == {"level_1", "level_2"}
    for key, expected in [("level_1", "naive"), ("level_2", "shared_memory")]:
        r = body["results"][key]
        assert r["info"]["level"] == expected
        assert r["metrics"]["time_ms"] > 0
        assert r["info"]["level_number"] == int(key[-1])
    assert body["image_info"]["filter"] == "sobel"
    assert body["original_image"].startswith("data:image/png;base64,")
    assert body["profiling_available"] is False


def test_process_all_profiling_source_tag(app):
    """/api/process-all kernel rows must carry their provenance tag
    (xplane_trace on TPU; estimate/device-timing fallbacks elsewhere), and
    the profiled time must never override the device-event time_ms."""
    img = _small_image()
    status, body = _post(app, "/api/process-all", {
        "image": _png_b64(img), "filter": "gaussian", "sigma": 2.0,
        "radius": 3, "enable_profiling": True,
    })
    assert status == 200
    assert body["profiling_available"] is True
    for key in ("level_1", "level_2"):
        m = body["results"][key]["metrics"]
        assert m["kernel_duration_source"] in (
            "xplane_trace", "isolated_pass_estimate", "device_timing"
        )
        assert m["ncu_data"]["duration_source"] == m["kernel_duration_source"]
        # never-override-primary-time invariant (backend/app.py:391-427)
        assert m["time_ms"] > 0
        assert "ncu_profiled_time_ms" in m


def test_process_all_original_passthrough_and_encode_reuse(app):
    # RGB PNG uploads: the original_image is the SOURCE bytes passed through
    # (no lossy re-encode detour, same pixels), and the bit-identical
    # gaussian L1/L2 outputs share one encoded PNG instead of paying two.
    img = _small_image()
    data_url = _png_b64(img)
    status, body = _post(app, "/api/process-all", {
        "image": data_url, "filter": "gaussian", "sigma": 2.0, "radius": 3,
    })
    assert status == 200
    assert body["original_image"] == data_url
    r1 = body["results"]["level_1"]["processed_image"]
    r2 = body["results"]["level_2"]["processed_image"]
    assert r1 == r2  # encode reuse is only valid because outputs are equal
    out1 = np.array(Image.open(io.BytesIO(base64.b64decode(r1.split(",", 1)[1]))))
    assert out1.shape == img.shape


def test_process_all_trns_png_no_passthrough(app):
    # An RGB PNG carrying a tRNS chunk renders with transparency, but the
    # native decoder extracts opaque RGB — the source bytes must NOT pass
    # through as original_image (they would display differently from the
    # pixels the pipeline processed).
    img = _small_image()
    pil = Image.fromarray(img)
    buf = io.BytesIO()
    pil.save(buf, format="PNG", transparency=(255, 0, 0))
    assert b"tRNS" in buf.getvalue()
    data_url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    status, body = _post(app, "/api/process-all", {
        "image": data_url, "filter": "gaussian",
    })
    assert status == 200
    assert body["original_image"] != data_url
    orig = np.array(Image.open(io.BytesIO(
        base64.b64decode(body["original_image"].split(",", 1)[1]))))
    assert np.array_equal(orig, img)


def test_process_all_rgba_no_passthrough(app):
    # RGBA input is normalized to RGB; the original must be the re-encoded
    # normalized image, NOT the source bytes (whose alpha the pipeline drops).
    rng = np.random.default_rng(11)
    rgba = rng.integers(0, 256, (10, 12, 4), dtype=np.uint8)
    data_url = _png_b64(rgba)
    status, body = _post(app, "/api/process-all", {
        "image": data_url, "filter": "gaussian",
    })
    assert status == 200
    assert body["original_image"] != data_url
    orig = np.array(Image.open(io.BytesIO(
        base64.b64decode(body["original_image"].split(",", 1)[1]))))
    assert orig.shape == (10, 12, 3)
    assert np.array_equal(orig, rgba[:, :, :3])


def test_process_all_grayscale_normalized(app):
    # L-mode input is normalized to RGB by the codec (app.py:80-83).
    gray = np.random.default_rng(3).integers(0, 256, (12, 14), dtype=np.uint8)
    status, body = _post(app, "/api/process-all", {
        "image": _png_b64(gray), "filter": "gaussian",
    })
    assert status == 200
    assert body["image_info"]["channels"] == 3


def test_unknown_route(app):
    status, _ = app.dispatch(Request(method="GET", path="/nope"))
    assert status == 404


def test_method_not_allowed(app):
    status, _ = app.dispatch(Request(method="GET", path="/api/process"))
    assert status == 405


# ---------------------------------------------------------------------------
# Real-socket end-to-end (test_client.py analog)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def live_server(app):
    server = AppServer(app, "127.0.0.1", 0)
    server.start_background()
    port = server._httpd.server_address[1]
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _http_json(url, payload=None, method="GET"):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(
        url, data=data, method=method,
        headers={"Content-Type": "application/json"} if data else {},
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_live_health(live_server):
    status, body = _http_json(f"{live_server}/api/health")
    assert status == 200 and body["status"] == "healthy"


def test_live_process(live_server):
    img = _small_image()
    status, body = _http_json(
        f"{live_server}/api/process",
        {"image": _png_b64(img), "filter": "box", "level": 2, "radius": 2},
        method="POST",
    )
    assert status == 200
    assert body["info"]["level"] == "shared_memory"


def test_live_upload_multipart(live_server):
    img = _small_image()
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    boundary = "testboundary42"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; filename="x.png"\r\n'
        "Content-Type: image/png\r\n\r\n"
    ).encode() + buf.getvalue() + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"{live_server}/api/upload",
        data=body,
        method="POST",
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req) as resp:
        payload = json.loads(resp.read())
    assert payload["width"] == 20 and payload["height"] == 16
    assert payload["base64_image"].startswith("data:image/png;base64,")


def test_live_oversize_body_413_before_read(live_server, monkeypatch):
    """An oversize Content-Length is refused with 413 BEFORE the body is
    buffered (VERDICT r3 item 4): the in-flight gauge bounds threads, not
    bytes — without the cap, 64 concurrent multi-GB POSTs OOM the worker
    and the decode-bomb gate fires only after full buffering.  A raw
    socket sends the headers (claiming 200 MB) and NO body; the 413 must
    arrive anyway."""
    import socket as socket_mod
    import urllib.parse

    host_port = urllib.parse.urlparse(live_server)
    claimed = 200 * 1024 * 1024  # over the 64 MB default cap
    with socket_mod.create_connection(
            (host_port.hostname, host_port.port), timeout=10) as sock:
        sock.sendall(
            (f"POST /api/process HTTP/1.1\r\n"
             f"Host: {host_port.netloc}\r\n"
             f"Content-Type: application/json\r\n"
             f"Content-Length: {claimed}\r\n\r\n").encode())
        # No body bytes follow; a server that buffers first would block.
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(4096)
            if not chunk:
                break
            resp += chunk
        # Keep reading until the response BODY is complete too (it may land
        # in a later TCP segment than the headers).
        head_blob, _, body = resp.partition(b"\r\n\r\n")
        m = re.search(rb"(?i)content-length:\s*(\d+)", head_blob)
        want = int(m.group(1)) if m else 0
        while len(body) < want:
            chunk = sock.recv(4096)
            if not chunk:
                break
            body += chunk
    head = resp.split(b"\r\n", 1)[0]
    assert b"413" in head, resp[:200]
    assert b"GIP_TPU_MAX_BODY_MB" in head_blob + body


def test_live_chunked_body_411_and_close(live_server):
    """A chunked request (no Content-Length) gets 411 + Connection: close:
    this server reads exactly Content-Length bytes, so a chunked body
    would be left unread on the stream and poison the next keep-alive
    request on the same connection."""
    import socket as socket_mod
    import urllib.parse

    host_port = urllib.parse.urlparse(live_server)
    with socket_mod.create_connection(
            (host_port.hostname, host_port.port), timeout=10) as sock:
        sock.sendall(
            (f"POST /api/process HTTP/1.1\r\n"
             f"Host: {host_port.netloc}\r\n"
             f"Content-Type: application/json\r\n"
             f"Transfer-Encoding: chunked\r\n\r\n"
             f"5\r\nhello\r\n0\r\n\r\n").encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(4096)
            if not chunk:
                break
            resp += chunk
    head = resp.split(b"\r\n", 1)[0]
    assert b"411" in head, resp[:200]
    assert re.search(rb"(?i)connection:\s*close", resp), resp[:300]


def test_live_chunked_with_content_length_still_411(live_server):
    """The classic request-smuggling shape -- Transfer-Encoding: chunked
    AND a Content-Length -- must hit the same 411+close: reading CL bytes
    of chunk framing would desync the connection just the same."""
    import socket as socket_mod
    import urllib.parse

    host_port = urllib.parse.urlparse(live_server)
    with socket_mod.create_connection(
            (host_port.hostname, host_port.port), timeout=10) as sock:
        sock.sendall(
            (f"POST /api/process HTTP/1.1\r\n"
             f"Host: {host_port.netloc}\r\n"
             f"Content-Type: application/json\r\n"
             f"Content-Length: 11\r\n"
             f"Transfer-Encoding: chunked\r\n\r\n"
             f"5\r\nhello\r\n0\r\n\r\n").encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(4096)
            if not chunk:
                break
            resp += chunk
    assert b"411" in resp.split(b"\r\n", 1)[0], resp[:200]
    assert re.search(rb"(?i)connection:\s*close", resp), resp[:300]


def test_live_malformed_content_length_400_and_close(live_server):
    """'Content-Length: abc' cannot frame the body; coercing it to 0 would
    leave the real body unread on a live keep-alive connection (the next
    request would parse from mid-body garbage).  400 + close instead."""
    import socket as socket_mod
    import urllib.parse

    host_port = urllib.parse.urlparse(live_server)
    with socket_mod.create_connection(
            (host_port.hostname, host_port.port), timeout=10) as sock:
        sock.sendall(
            (f"POST /api/process HTTP/1.1\r\n"
             f"Host: {host_port.netloc}\r\n"
             f"Content-Type: application/json\r\n"
             f"Content-Length: abc\r\n\r\n"
             "{}").encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(4096)
            if not chunk:
                break
            resp += chunk
    assert b"400" in resp.split(b"\r\n", 1)[0], resp[:200]
    assert re.search(rb"(?i)connection:\s*close", resp), resp[:300]


def test_live_negative_content_length_400_and_close(live_server):
    """'Content-Length: -1' parses as an int but cannot frame a body --
    and rfile.read(-1) would read until EOF, parking the handler thread
    inside the in-flight gauge until the client closes.  Same 400 + close
    path as the non-numeric case (advisor round-4 finding)."""
    import socket as socket_mod
    import urllib.parse

    host_port = urllib.parse.urlparse(live_server)
    with socket_mod.create_connection(
            (host_port.hostname, host_port.port), timeout=10) as sock:
        sock.sendall(
            (f"POST /api/process HTTP/1.1\r\n"
             f"Host: {host_port.netloc}\r\n"
             f"Content-Type: application/json\r\n"
             f"Content-Length: -1\r\n\r\n"
             "{}").encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(4096)
            if not chunk:
                break
            resp += chunk
    assert b"400" in resp.split(b"\r\n", 1)[0], resp[:200]
    assert re.search(rb"(?i)connection:\s*close", resp), resp[:300]


def test_live_repeated_transfer_encoding_headers_still_411(live_server):
    """Chunked detection must read ALL Transfer-Encoding header lines:
    'Transfer-Encoding: gzip' followed by a second 'Transfer-Encoding:
    chunked' line previously evaded the 411 (only the first value was
    inspected) and re-opened the keep-alive desync / smuggling shape
    (advisor round-4 finding)."""
    import socket as socket_mod
    import urllib.parse

    host_port = urllib.parse.urlparse(live_server)
    with socket_mod.create_connection(
            (host_port.hostname, host_port.port), timeout=10) as sock:
        sock.sendall(
            (f"POST /api/process HTTP/1.1\r\n"
             f"Host: {host_port.netloc}\r\n"
             f"Content-Type: application/json\r\n"
             f"Transfer-Encoding: gzip\r\n"
             f"Transfer-Encoding: chunked\r\n\r\n"
             f"5\r\nhello\r\n0\r\n\r\n").encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(4096)
            if not chunk:
                break
            resp += chunk
    assert b"411" in resp.split(b"\r\n", 1)[0], resp[:200]
    assert re.search(rb"(?i)connection:\s*close", resp), resp[:300]


def test_live_body_cap_env_and_normal_requests_unaffected(live_server):
    """Requests under the cap flow through untouched (the 20x16 PNG
    payloads above already prove this live); here: a Content-Length just
    UNDER the configured cap is not rejected by the gate."""
    from gpu_image_processing_tpu.server import http as http_mod

    assert http_mod._max_body_bytes() == 64 * 1024 * 1024
    # 0 disables the gate entirely.
    import os
    old = os.environ.get("GIP_TPU_MAX_BODY_MB")
    try:
        os.environ["GIP_TPU_MAX_BODY_MB"] = "0"
        assert http_mod._max_body_bytes() == 0
        os.environ["GIP_TPU_MAX_BODY_MB"] = "not-a-number"
        assert http_mod._max_body_bytes() == 64 * 1024 * 1024
    finally:
        if old is None:
            os.environ.pop("GIP_TPU_MAX_BODY_MB", None)
        else:
            os.environ["GIP_TPU_MAX_BODY_MB"] = old


def test_live_cors_preflight(live_server):
    req = urllib.request.Request(f"{live_server}/api/process", method="OPTIONS")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 204
        assert resp.headers["Access-Control-Allow-Origin"] == "*"


def test_stats_endpoint(app):
    app.dispatch(Request(method="GET", path="/api/health"))
    status, body = app.dispatch(Request(method="GET", path="/api/stats"))
    assert status == 200
    assert body["requests_total"] >= 2
    assert "GET /api/health" in body["requests_by_route"]
    assert body["uptime_s"] >= 0
    # Worker-recycle observability (server/app.py watchdog): live RSS is
    # always reported; the threshold and generation are null off-relay /
    # unsupervised.
    assert body["rss_mb"] > 10.0
    assert body["max_rss_mb"] is None or body["max_rss_mb"] > 0
    assert body["worker_generation"] is None or body["worker_generation"] >= 1
    assert set(body["decode_tiers"]) == {
        "native_png", "native_jpeg", "native_gif", "native_bmp",
        "native_psd", "native_hdr", "native_pic", "native_pnm",
        "native_tga", "pil", "failed"}


def test_stats_decode_tiers_count_serving_decodes(app, small_rgb):
    """Decoder-tier observability (VERDICT r2 item 6): /api/stats shows
    which decoder served each upload, so a native-tier coverage
    regression is visible instead of silently riding the PIL fallback."""
    from gpu_image_processing_tpu.utils import image as image_util
    from gpu_image_processing_tpu.utils import native_codec

    image_util.reset_decode_tier_counts()
    # A plain RGB PNG decodes in the native tier.
    app.dispatch(Request(method="POST", path="/api/process", json={
        "image": _png_b64(small_rgb), "filter": "box", "level": 1,
        "radius": 2}))
    # Garbage counts as failed.
    status, _ = app.dispatch(Request(method="POST", path="/api/process",
                                     json={"image": "!!!notbase64$$$",
                                           "filter": "box", "level": 1}))
    assert status == 400
    _, body = app.dispatch(Request(method="GET", path="/api/stats"))
    tiers = body["decode_tiers"]
    # Which tier serves the PNG depends on the native library being built
    # AND loadable; the counter contract (every decode lands in exactly one
    # tier) is what this test owns, not the build environment.
    if native_codec.available():
        assert tiers["native_png"] >= 1
    else:
        assert tiers["pil"] >= 1
    assert tiers["failed"] >= 1


def test_degraded_mode_503(monkeypatch):
    # Accelerator-unavailable degradation (app.py:21-27,131-137,190-194):
    # health reports it, process endpoints 503, server still serves.
    from gpu_image_processing_tpu.server import app as app_mod

    monkeypatch.setattr(app_mod, "TPU_AVAILABLE", False)
    degraded = app_mod.create_app()
    status, body = degraded.dispatch(Request(method="GET", path="/api/health"))
    assert status == 200 and body["gpu_available"] is False
    status, body = degraded.dispatch(Request(
        method="POST", path="/api/process",
        json={"image": _png_b64(_small_image()), "filter": "box"},
    ))
    assert status == 503
    assert "not available" in body["detail"]


def test_process_level4_rest(app):
    img = _small_image()
    status, body = _post(app, "/api/process", {
        "image": _png_b64(img), "filter": "gaussian", "level": 4,
    })
    assert status == 200
    assert body["info"]["level"] == "advanced"


def test_batch_level4_rest(app):
    img = _small_image()
    status, body = _post(app, "/api/process-batch", {
        "images": [_png_b64(img)] * 2, "filter": "sobel", "level": 4,
    })
    assert status == 200
    assert body["info"]["level"] == "advanced"
    assert body["metrics"]["batch_size"] == 2


def test_docs_endpoint(app):
    status, body = app.dispatch(Request(method="GET", path="/docs"))
    assert status == 200
    assert "POST /api/process" in body["endpoints"]
    assert "POST /api/process-batch" in body["endpoints"]


def test_process_all_jpeg_original_passthrough(app):
    # Baseline RGB JPEG uploads: the original_image is the SOURCE bytes
    # passed through as data:image/jpeg (no PNG re-encode detour) -- the
    # browser displays the literal upload.
    rng = np.random.default_rng(21)
    img = rng.integers(100, 140, (12, 14, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92)
    data_url = "data:image/jpeg;base64," + base64.b64encode(buf.getvalue()).decode()
    status, body = _post(app, "/api/process-all", {
        "image": data_url, "filter": "gaussian",
    })
    assert status == 200
    assert body["original_image"] == data_url


def test_process_all_exif_jpeg_no_passthrough(app):
    # EXIF orientation would rotate the browser's display of the source
    # bytes away from the pixels the pipeline processed: re-encode instead.
    rng = np.random.default_rng(22)
    img = rng.integers(100, 140, (12, 14, 3), dtype=np.uint8)
    exif = Image.Exif()
    exif[274] = 6
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92, exif=exif)
    data_url = "data:image/jpeg;base64," + base64.b64encode(buf.getvalue()).decode()
    status, body = _post(app, "/api/process-all", {
        "image": data_url, "filter": "gaussian",
    })
    assert status == 200
    assert body["original_image"] != data_url
    assert body["original_image"].startswith("data:image/png;base64,")


def test_parse_precompile_shapes():
    from gpu_image_processing_tpu.server.app import _parse_precompile

    assert _parse_precompile("800x600, 1024X1024") == [(800, 600), (1024, 1024)]
    # malformed / out-of-range entries skipped, never raise
    assert _parse_precompile("junk,12x,x9,0x5,99999x5,") == []
    assert _parse_precompile("") == []
    # boolean-ish values mean "warm the defaults" (GIP_TPU_PRECOMPILE=1)
    from gpu_image_processing_tpu.server.app import DEFAULT_PRECOMPILE_SHAPES

    assert _parse_precompile("1") == DEFAULT_PRECOMPILE_SHAPES
    assert _parse_precompile("true") == DEFAULT_PRECOMPILE_SHAPES
    assert _parse_precompile("on,640x480") == DEFAULT_PRECOMPILE_SHAPES + [(640, 480)]


def test_precompile_warms_executable_cache(monkeypatch):
    # Fresh runtime: the process-global RUNTIME is shared with every other
    # test in the suite, so "cache grew" would depend on test order.
    import gpu_image_processing_tpu.runtime.dispatch as dispatch_mod
    from gpu_image_processing_tpu.server.app import precompile_shapes

    rt = dispatch_mod.FilterRuntime()
    monkeypatch.setattr(dispatch_mod, "RUNTIME", rt)
    warmed = precompile_shapes([(20, 16)])
    assert warmed == 3  # gaussian, box, sobel (per-level here: fused needs loop timing)
    # /api/process uses the per-level path: every filter x REQUEST level
    # (1, 2, 4) must be warm.
    per_level = [k for k in rt._cache if k[0] in ("gaussian", "box", "sobel")]
    assert len(per_level) == 9
    # idempotent: same bucket -> no new executables
    n = len(rt._cache)
    precompile_shapes([(20, 16)])
    assert len(rt._cache) == n


def test_multipart_preserves_crlf_tailed_binary(app):
    """Exactly ONE protocol CRLF is trimmed per part: file data whose last
    bytes are 0x0D/0x0A must survive /api/upload intact (a strip(b'\\r\\n')
    would truncate them)."""
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    img[-1, -1] = (8, 13, 10)            # file tail on disk: ... 08 0D 0A
    raw = b"P6\n3 3\n255\n" + img.tobytes()
    boundary = b"----gipboundary42"
    body = (b"--" + boundary + b"\r\n"
            b'Content-Disposition: form-data; name="file"; '
            b'filename="t.ppm"\r\n'
            b"Content-Type: image/x-portable-pixmap\r\n\r\n" + raw + b"\r\n"
            b"--" + boundary + b"--\r\n")
    from gpu_image_processing_tpu.server.http import parse_multipart

    files = parse_multipart(
        body, "multipart/form-data; boundary=" + boundary.decode())
    assert files["file"][1] == raw        # data byte-identical post-parse
    status, resp = app.dispatch(Request(
        method="POST", path="/api/upload", files=files))
    assert status == 200
    out = np.array(Image.open(io.BytesIO(
        base64.b64decode(resp["base64_image"].split(",", 1)[1]))))
    np.testing.assert_array_equal(out, img)


def test_live_conflicting_content_length_400_and_close(live_server):
    """Duplicate Content-Length headers with DIFFERING values must be
    rejected (RFC 9110 s8.6): framing on the first value would leave the
    remaining body bytes on the stream to desync the next keep-alive
    request -- the same smuggling shape as the chunked case (round-5
    review finding)."""
    import socket as socket_mod
    import urllib.parse

    host_port = urllib.parse.urlparse(live_server)
    with socket_mod.create_connection(
            (host_port.hostname, host_port.port), timeout=10) as sock:
        sock.sendall(
            (f"POST /api/process HTTP/1.1\r\n"
             f"Host: {host_port.netloc}\r\n"
             f"Content-Type: application/json\r\n"
             f"Content-Length: 2\r\n"
             f"Content-Length: 20\r\n\r\n"
             "{}extra-bytes-here-xx").encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(4096)
            if not chunk:
                break
            resp += chunk
    assert b"400" in resp.split(b"\r\n", 1)[0], resp[:200]
    assert re.search(rb"(?i)connection:\s*close", resp), resp[:300]


def test_live_equal_duplicate_content_length_accepted(live_server):
    """Duplicate Content-Length with EQUAL values is degenerate but
    unambiguous (RFC 9110 allows collapsing); it must still frame."""
    import socket as socket_mod
    import urllib.parse

    host_port = urllib.parse.urlparse(live_server)
    with socket_mod.create_connection(
            (host_port.hostname, host_port.port), timeout=10) as sock:
        sock.sendall(
            (f"GET /api/health HTTP/1.1\r\n"
             f"Host: {host_port.netloc}\r\n"
             f"Content-Length: 0\r\n"
             f"Content-Length: 0\r\n\r\n").encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = sock.recv(4096)
            if not chunk:
                break
            resp += chunk
    assert b"200" in resp.split(b"\r\n", 1)[0], resp[:200]
