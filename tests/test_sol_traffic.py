"""Per-op SoL report plumbing: the HLO byte model for Mosaic custom-calls,
the xplane overlap sweep, and the report's self-consistent share/check
semantics (VERDICT r3 items 1 + 5).

The reference's analog is ncu's per-kernel %-of-peak table
(backend/profiling/ncu_profiler.py:406-723); our trace tier covers XLA
ops with real counters, and the flagship Pallas kernels -- invisible to
XLA's cost model -- get modeled bytes with explicit provenance.
"""

import importlib.util
import os

from gpu_image_processing_tpu.profiling.traffic import (
    hlo_modeled_bytes,
    is_custom_call,
)
from gpu_image_processing_tpu.profiling import xplane

from .test_xplane import _synthetic_tpu_space


def _load_sol_report():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "sol_report.py")
    spec = importlib.util.spec_from_file_location("sol_report", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# traffic.py: HLO instruction-text byte model
# ---------------------------------------------------------------------------


def test_custom_call_bytes_match_roofline_model():
    """A realistic serving blur custom-call: read padded input + weight
    vector, write output rows -- exactly the docs/ROOFLINE.md kernel
    stage (read padded 21.5 MB, write 20.85 MB)."""
    text = ("%_lambda_.1 = u8[2146,9717]{1,0:T(8,128)(4,1)} custom-call("
            "u8[2152,9856]{1,0:T(8,128)(4,1)} %pad.0, "
            "f32[7]{0:T(128)} %w.1), "
            'custom_call_target="tpu_custom_call"')
    assert is_custom_call(text)
    b = hlo_modeled_bytes(text)
    assert b == 2146 * 9717 + 2152 * 9856 + 7 * 4


def test_tuple_result_and_repeated_operand_charged_per_use():
    text = ("%cc = (f32[8,128]{1,0}, u8[4]{0}) custom-call("
            "bf16[8,128]{1,0} %a, bf16[8,128]{1,0} %a)")
    assert hlo_modeled_bytes(text) == (
        8 * 128 * 4 + 4 + 2 * (8 * 128 * 2))


def test_scalar_and_unparseable_shapes():
    assert hlo_modeled_bytes("%x = f32[] custom-call(f32[] %y)") == 8
    # No " = " split or no shapes -> None (callers keep bytes: null).
    assert hlo_modeled_bytes("TensorFlowOp") is None
    assert hlo_modeled_bytes("%x = opaque-thing()") is None
    assert not is_custom_call(
        "%fusion.1 = f32[2,2]{1,0} fusion(f32[2,2]{1,0} %p), kind=kLoop")


# ---------------------------------------------------------------------------
# xplane.py: cross-op overlap annotation
# ---------------------------------------------------------------------------


def test_overlap_annotated_from_intervals():
    """Synthetic plane: pad_fusion [0, 0.1 ms] runs inside the kernel's
    first occurrence [0, 0.5 ms]; the kernel's second occurrence
    [0.6, 1.3 ms] is alone.  Both ops get 0.1 ms of cross-op overlap."""
    planes = xplane.parse_xspace_bytes(_synthetic_tpu_space())
    agg = xplane.kernel_durations_from_planes(planes)
    kern = agg["gaussian_rows_kernel"]
    pad = agg["pad_fusion"]
    assert abs(kern["overlap_ms"] - 0.1) < 1e-9
    assert abs(pad["overlap_ms"] - 0.1) < 1e-9
    # Durations unchanged by the annotation.
    assert abs(kern["total_ms"] - 1.2) < 1e-9


def test_self_overlap_not_counted_as_cross_op():
    """Two occurrences of the SAME op overlapping each other are not
    cross-op concurrency (grid re-execution inside one window)."""
    agg = {"a": {"count": 2, "total_ms": 2.0, "avg_ms": 1.0}}
    xplane._annotate_overlap(
        agg, {"a": [(0, 1_000_000_000), (500_000_000, 1_500_000_000)]})
    assert agg["a"]["overlap_ms"] == 0.0


# ---------------------------------------------------------------------------
# sol_report.py: share semantics + --check gate
# ---------------------------------------------------------------------------


def test_check_flags_dominant_op_without_bytes():
    sol = _load_sol_report()
    payload = {
        "peak_hbm_gbps": 819.0,
        "rows": [{
            "filter": "gaussian", "level": 2,
            "duration_source": "xplane_trace",
            "ops": [
                {"op": "%cc", "share_pct": 90.0, "bytes": None,
                 "sol_pct": None},
                {"op": "%tiny", "share_pct": 1.0, "bytes": None,
                 "sol_pct": None},
            ],
        }],
    }
    problems = sol.check(payload)
    assert len(problems) == 1 and "%cc" in problems[0]

    payload["rows"][0]["ops"][0].update(bytes=1e6, sol_pct=40.0)
    assert sol.check(payload) == []


def test_check_flags_shares_over_100():
    sol = _load_sol_report()
    payload = {
        "peak_hbm_gbps": 819.0,
        "rows": [{
            "filter": "box", "level": 1,
            "duration_source": "xplane_trace",
            "ops": [
                {"op": "%a", "share_pct": 80.0, "bytes": 1.0, "sol_pct": 1.0},
                {"op": "%b", "share_pct": 40.0, "bytes": 1.0, "sol_pct": 1.0},
            ],
        }],
    }
    problems = sol.check(payload)
    assert any("shares sum" in p for p in problems)


def test_check_skips_non_trace_rows():
    sol = _load_sol_report()
    payload = {
        "peak_hbm_gbps": None,
        "rows": [{
            "filter": "sobel", "level": 2,
            "duration_source": "isolated_pass_estimate",
            "ops": [],
        }],
    }
    assert sol.check(payload) == []
