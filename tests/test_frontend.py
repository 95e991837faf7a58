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
