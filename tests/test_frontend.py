"""Static integrity of the web UI: every DOM id the JS drives must exist in
the HTML, asset paths must resolve, and the API contract keys the table
renderer expects must match what the server actually returns."""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FRONTEND = os.path.join(REPO, "frontend")


def _read(name):
    with open(os.path.join(FRONTEND, name)) as f:
        return f.read()


def test_js_ids_exist_in_html():
    html = _read("index.html")
    js = _read("js/app.js")
    html_ids = set(re.findall(r'id="([^"]+)"', html))
    js_ids = set(re.findall(r'\$\("([^"]+)"\)', js))
    missing = js_ids - html_ids
    assert not missing, f"JS references ids missing from HTML: {missing}"


def test_assets_referenced_exist():
    html = _read("index.html")
    for rel in re.findall(r'(?:href|src)="([^"#][^":]*)"', html):
        assert os.path.exists(os.path.join(FRONTEND, rel)), f"missing asset {rel}"


def test_js_targets_real_api_routes():
    js = _read("js/app.js")
    routes = set(re.findall(r"/api/[a-z-]+", js))
    from gpu_image_processing_tpu.server.app import create_app
    from gpu_image_processing_tpu.server.http import Request

    app = create_app()
    for route in routes:
        # Every route the UI calls must exist (GET or POST).
        statuses = {
            app.dispatch(Request(method=m, path=route, json={}))[0]
            for m in ("GET", "POST")
        }
        assert statuses - {404}, f"UI calls unknown route {route}"


def test_metric_keys_match_profiler_output():
    js = _read("js/app.js")
    js_keys = set(re.findall(r'"(\w+)"(?:,)?', js.split("METRIC_SECTIONS")[1]
                             .split("];")[0]))
    # Keys the backend can actually emit.
    backend_keys = {
        "time_ms", "bandwidth_gbps", "fps", "ncu_profiled_time_ms",
        "kernel_duration_ms", "total_kernels", "compute_throughput_pct",
        "memory_throughput_gbps", "dram_throughput_pct",
        "peak_device_memory_bytes", "occupancy_pct", "kernel_durations",
        "kernels_profiled", "ncu_data", "profiling_error", "elapsed_cycles",
    }
    unknown = {
        k for k in js_keys
        if k not in backend_keys and k.isidentifier() and k.islower()
    }  # capitalized tokens are section titles, not metric keys
    assert not unknown, f"UI metric table references unknown keys: {unknown}"


def test_per_pass_duration_rows_wired():
    """The table renderer must expand the profiler's kernel_durations /
    kernels_profiled lists into per-pass rows (the reference UI's per-kernel
    ncu Duration rows) and label them from the kernel names."""
    js = _read("js/app.js")
    assert "expandPassDurations" in js
    body = js.split("function expandPassDurations")[1].split("\n}")[0]
    assert "kernel_durations" in body and "kernels_profiled" in body
    assert "horizontal|vertical" in body
    render = js.split("function renderMetricsTable")[1].split("\n}")[0]
    assert "expandPassDurations" in render and "dynLabels" in render


def test_per_pass_expansion_semantics():
    """Emulate expandPassDurations on a real profiler payload: the scalar
    keys it derives must exist and the labels must name the passes."""
    m = {
        "time_ms": 0.5,
        "kernel_durations": [0.3, 0.2],
        "kernels_profiled": [
            "gaussian_blur_fused_l2_horizontal",
            "gaussian_blur_fused_l2_vertical",
        ],
    }
    # Python port of the JS expansion (kept in lockstep by the static test
    # above asserting the JS reads the same fields).
    labels = {}
    out = dict(m)
    for i, v in enumerate(m["kernel_durations"]):
        key = f"kernel_{i}_duration_ms"
        name = m["kernels_profiled"][i]
        passname = name.rsplit("_", 1)[-1]
        out[key] = v
        labels[key] = f"└ {passname} pass (ms)"
    assert out["kernel_0_duration_ms"] == 0.3
    assert labels["kernel_1_duration_ms"] == "└ vertical pass (ms)"
