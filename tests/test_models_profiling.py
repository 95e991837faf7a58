"""Filter model objects and the deep-profiling subsystem."""

import jax
import numpy as np
import pytest

from gpu_image_processing_tpu.models import BoxBlur, GaussianBlur, SobelEdgeDetection, get_filter
from gpu_image_processing_tpu.profiling.profiler import (
    check_profiler_available,
    get_common_metrics,
    profile_filter,
)

from . import oracle_numpy as oracle
from .conftest import make_image


def test_model_apply_composable_in_jit(rng):
    img = make_image(rng, 16, 18, 3)
    blur = GaussianBlur(sigma=2.0, radius=3, level=1)
    edge = SobelEdgeDetection(level=2)

    @jax.jit
    def pipeline(x):
        return edge.apply(blur.apply(x))

    out = np.asarray(pipeline(img))
    want = oracle.sobel(oracle.gaussian_blur(img, blur.weights, 3), 2)
    from .sobel_tolerance import assert_sobel_close

    assert_sobel_close(out, want)


def test_model_call_returns_metrics(rng):
    img = make_image(rng, 12, 14, 3)
    out, metrics = BoxBlur(radius=2, level=1)(img)
    assert out.shape == img.shape
    assert metrics["time_ms"] > 0 and metrics["fps"] > 0


def test_get_filter_factory():
    assert isinstance(get_filter("gaussian", sigma=3.0), GaussianBlur)
    assert isinstance(get_filter("sobel", level=1), SobelEdgeDetection)
    with pytest.raises(ValueError):
        get_filter("median")


def test_model_validates_params():
    with pytest.raises(Exception):
        GaussianBlur(sigma=-1.0)
    with pytest.raises(Exception):
        BoxBlur(radius=0)


def test_profiler_available():
    assert check_profiler_available() is True


def test_profile_filter_contract(rng):
    img = make_image(rng, 16, 20, 3)
    deep = profile_filter(img, "gaussian", 2, sigma=2.0, radius=3)
    # Categorized dict shape (SURVEY 5.1 contract).
    for section in ("execution", "memory", "occupancy", "config"):
        assert section in deep
    assert deep["total_kernel_duration_ms"] > 0
    # Separable blurs report one duration per pass (the ncu analog of the
    # horizontal + vertical kernel rows); both pass labels carry the fused
    # kernel name.
    assert deep["kernels_profiled"] == [
        "gaussian_blur_fused_l2_horizontal",
        "gaussian_blur_fused_l2_vertical",
    ]
    pp = deep["per_pass_durations_ms"]
    assert pp["horizontal"] > 0 and pp["vertical"] > 0
    assert pp["horizontal"] + pp["vertical"] == pytest.approx(
        deep["total_kernel_duration_ms"]
    )

    common = get_common_metrics(deep, ncu_data=deep)
    assert common["time_ms"] > 0
    assert common["total_kernels"] == 2
    assert "memory_throughput_gbps" in common
    assert "occupancy_pct" in common
    assert common["kernel_durations"] == [pp["horizontal"], pp["vertical"]]
    # The per-pass split must never displace the primary device time.
    assert common["time_ms"] == deep["total_kernel_duration_ms"]


def test_profile_filter_sobel_single_kernel(rng):
    img = make_image(rng, 16, 20, 3)
    deep = profile_filter(img, "sobel", 2)
    assert deep["kernels_profiled"] == ["sobel_fused_l2"]
    assert "per_pass_durations_ms" not in deep


def test_common_metrics_empty():
    assert get_common_metrics({}) == {}
    assert get_common_metrics(None) == {}


def test_capture_xla_trace(tmp_path, rng):
    from gpu_image_processing_tpu.profiling.profiler import capture_xla_trace

    img = make_image(rng, 8, 10, 3)
    out_dir = capture_xla_trace(
        lambda: BoxBlur(radius=1, level=1)(img), trace_dir=str(tmp_path)
    )
    # The profiler must leave a trace artifact behind for offline inspection.
    found = list(__import__("pathlib").Path(out_dir).rglob("*"))
    assert any(f.is_file() for f in found)
