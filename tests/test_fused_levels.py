"""Fused all-levels serving path (runtime/dispatch.py::run_all_levels).

The fused program must be behavior-invisible: outputs bitwise-equal to the
per-level path, per-level time_ms from each level's own tier measurement,
and a clean fallback to the per-level loop whenever fusion cannot serve
(CPU wall-timing mode).  CPU default disables loop timing, so fusion is
exercised here by forcing GIP_TPU_LOOP_TIMING=1.
"""

from __future__ import annotations

import numpy as np
import pytest

from gpu_image_processing_tpu.runtime.dispatch import RUNTIME

from .conftest import make_image


@pytest.fixture()
def loop_timing_on(monkeypatch):
    monkeypatch.setenv("GIP_TPU_LOOP_TIMING", "1")


@pytest.mark.parametrize("filter_name", ["gaussian", "box", "sobel"])
def test_fused_matches_per_level(rng, filter_name, loop_timing_on):
    img = make_image(rng, 40, 57, 3)
    fused = RUNTIME.run_all_levels(filter_name, img, sigma=2.0, radius=3)
    assert sorted(fused) == [1, 2]
    for level in (1, 2):
        want, _ = RUNTIME.run(filter_name, img, level=level, sigma=2.0, radius=3)
        got, metrics = fused[level]
        np.testing.assert_array_equal(got, want)
        assert metrics.time_ms > 0
        assert metrics.fps > 0


def test_fused_raises_without_loop_timing(rng, monkeypatch):
    monkeypatch.setenv("GIP_TPU_LOOP_TIMING", "0")
    with pytest.raises(Exception):
        RUNTIME.run_all_levels("box", make_image(rng, 16, 16, 3), radius=2)


def test_fused_sobel_bucketed_border(rng, loop_timing_on):
    # A shape off the bucket grid: the padded run treats the true border as
    # interior; run_all_levels must re-zero it exactly like the per-level
    # path does.
    img = make_image(rng, 70, 67, 3)
    fused = RUNTIME.run_all_levels("sobel", img)
    for level in (1, 2):
        out = fused[level][0]
        assert (out[0, :] == 0).all() and (out[-1, :] == 0).all()
        assert (out[:, 0] == 0).all() and (out[:, -1] == 0).all()
        want, _ = RUNTIME.run("sobel", img, level=level)
        np.testing.assert_array_equal(out, want)


def test_server_process_all_uses_fused(rng, loop_timing_on, monkeypatch):
    """End-to-end through the endpoint with fusion active: the per-level
    runner must not be called, and the response must carry both levels."""
    import gpu_image_processing_tpu.server.app as app_mod
    from gpu_image_processing_tpu.utils.image import encode_image_to_base64

    def _boom(*a, **k):  # pragma: no cover - failure reporter
        raise AssertionError("per-level path used despite fused success")

    monkeypatch.setattr(app_mod, "_run_filter", _boom)
    from gpu_image_processing_tpu.server.http import Request

    app = app_mod.create_app()
    img = make_image(rng, 24, 31, 3)
    status, body = app.dispatch(Request(
        method="POST", path="/api/process-all",
        json={"image": encode_image_to_base64(img), "filter": "gaussian"},
    ))
    assert status == 200
    assert set(body["results"]) == {"level_1", "level_2"}
    for lv in ("level_1", "level_2"):
        assert body["results"][lv]["metrics"]["time_ms"] > 0


def test_fused_timing_failure_is_fusion_unavailable(rng, loop_timing_on,
                                                    monkeypatch):
    """Per-level timing failures surface as the fusion routing signal
    (per-level fallback), never as breaker-counted device errors.
    Deterministic failures latch (_broken: no re-timing per request);
    transient transport errors do NOT latch -- the next request retries
    against the recovered device without re-lowering."""
    import jax.numpy as jnp

    import gpu_image_processing_tpu.runtime.timing as timing_mod
    from gpu_image_processing_tpu.runtime.dispatch import (
        FusedLevelsExecutable,
        FusionUnavailable,
    )

    arg = jnp.zeros((8, 16), jnp.uint8)

    # Deterministic failure: latches, timing never re-invoked.
    def det_boom(*a, **k):
        raise RuntimeError("slope degenerate: congestion-proof failed")

    monkeypatch.setattr(timing_mod, "device_time_ms_auto", det_boom)
    exe = FusedLevelsExecutable([lambda x: x, lambda x: x + 1])
    with pytest.raises(FusionUnavailable):
        exe(arg)
    assert exe._broken is not None
    monkeypatch.setattr(timing_mod, "device_time_ms_auto",
                        lambda *a, **k: pytest.fail("re-timed"))
    with pytest.raises(FusionUnavailable):
        exe(arg)

    # Transient transport failure: no latch; a later request recovers
    # (and the compiled program was cached, so only timing re-runs).
    def transient_boom(*a, **k):
        raise RuntimeError("UNAVAILABLE: relay blip")

    monkeypatch.setattr(timing_mod, "device_time_ms_auto", transient_boom)
    exe2 = FusedLevelsExecutable([lambda x: x, lambda x: x + 1])
    with pytest.raises(FusionUnavailable):
        exe2(arg)
    assert exe2._broken is None
    assert exe2._compiled is not None
    monkeypatch.setattr(timing_mod, "device_time_ms_auto",
                        lambda *a, **k: 0.5)
    out, ms = exe2(arg)
    assert ms == [0.5, 0.5]


def test_profiled_requests_bypass_fusion(rng, loop_timing_on, monkeypatch):
    """enable_profiling must serve through the per-level path: the xplane
    tier traces the per-level executable, and the fused program is not
    guaranteed kernel-identical to it (XLA may CSE across levels)."""
    import gpu_image_processing_tpu.server.app as app_mod
    from gpu_image_processing_tpu.server.http import Request
    from gpu_image_processing_tpu.utils.image import encode_image_to_base64

    def _no_fuse(*a, **k):  # pragma: no cover - failure reporter
        raise AssertionError("fused path used for a profiled request")

    monkeypatch.setattr(RUNTIME, "run_all_levels", _no_fuse)
    app = app_mod.create_app()
    img = make_image(rng, 24, 31, 3)
    status, body = app.dispatch(Request(
        method="POST", path="/api/process-all",
        json={"image": encode_image_to_base64(img), "filter": "gaussian",
              "enable_profiling": True},
    ))
    assert status == 200
    assert set(body["results"]) == {"level_1", "level_2"}
