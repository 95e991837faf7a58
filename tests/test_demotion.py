"""Accelerator-demotion circuit breaker (runtime/dispatch.py::_serve).

Elastic recovery beyond the reference (SURVEY 5.3): when the device path
raises RuntimeError on several consecutive requests (the observed mid-
session relay-lease death), the runtime demotes the process to CPU, clears
executables compiled for the dead device, and retries — instead of
returning 500s until an operator restarts.
"""

from __future__ import annotations

import numpy as np
import pytest

from gpu_image_processing_tpu.core.params import ValidationError
from gpu_image_processing_tpu.runtime import device as device_mod
from gpu_image_processing_tpu.runtime import dispatch as dispatch_mod
from gpu_image_processing_tpu.runtime.dispatch import (
    FilterRuntime,
    FusionUnavailable,
)

from .conftest import make_image


@pytest.fixture()
def fake_demotable(monkeypatch):
    """Pretend the process sits on an accelerator that CAN be demoted."""
    calls = []

    def fake_demote(reason=""):
        calls.append(reason)
        return True

    monkeypatch.setattr(device_mod, "demote_to_cpu", fake_demote)
    # Tests fail fast; the anti-blip window would otherwise suppress the
    # demotion they exercise (it has its own test below).
    monkeypatch.setenv("GIP_TPU_DEMOTE_WINDOW_S", "0")
    return calls


def test_breaker_demotes_after_threshold_and_retries(fake_demotable):
    rt = FilterRuntime()
    rt._cache["sentinel"] = object()
    state = {"fail": True}

    def attempt():
        if state["fail"]:
            raise RuntimeError("UNAVAILABLE: lease lost")
        return "served"

    for _ in range(2):
        with pytest.raises(RuntimeError):
            rt._serve(attempt)
    assert not fake_demotable  # below threshold: no demotion yet
    state["fail"] = False

    def attempt_third():
        # Third consecutive failure, then success on the post-demotion retry.
        if not fake_demotable:
            raise RuntimeError("UNAVAILABLE: lease lost")
        return "served"

    assert rt._serve(attempt_third) == "served"
    assert len(fake_demotable) == 1
    assert "3 consecutive" in fake_demotable[0]
    assert rt._cache == {}          # dead-device executables dropped
    assert rt._accel_failures == 0  # breaker reset


def test_success_resets_the_count(fake_demotable):
    rt = FilterRuntime()
    for _ in range(2):
        with pytest.raises(RuntimeError):
            rt._serve(lambda: (_ for _ in ()).throw(RuntimeError("x")))
    rt._serve(lambda: "ok")
    assert rt._accel_failures == 0
    for _ in range(2):
        with pytest.raises(RuntimeError):
            rt._serve(lambda: (_ for _ in ()).throw(RuntimeError("x")))
    assert not fake_demotable  # never reached 3 consecutive


def test_fusion_unavailable_is_not_device_failure(fake_demotable):
    rt = FilterRuntime()
    for _ in range(5):
        with pytest.raises(FusionUnavailable):
            rt._serve(lambda: (_ for _ in ()).throw(FusionUnavailable("no")))
    assert rt._accel_failures == 0
    assert not fake_demotable


def test_deterministic_errors_never_count(fake_demotable):
    """RESOURCE_EXHAUSTED (per-request OOM), shape-specific compile errors,
    and other non-transport RuntimeErrors must not demote a healthy chip."""
    rt = FilterRuntime()
    for msg in ("RESOURCE_EXHAUSTED: HBM OOM", "Mosaic lowering failed",
                "INVALID_ARGUMENT: bad shape"):
        for _ in range(5):
            with pytest.raises(RuntimeError):
                rt._serve(lambda m=msg: (_ for _ in ()).throw(RuntimeError(m)))
    assert rt._accel_failures == 0
    assert not fake_demotable


def test_blip_window_defers_demotion(fake_demotable, monkeypatch):
    """Three failures within one sub-second blip (one request's fused+L1+L2
    attempts) must NOT demote; the failures have to span the window."""
    monkeypatch.setenv("GIP_TPU_DEMOTE_WINDOW_S", "30")
    rt = FilterRuntime()
    for _ in range(4):
        with pytest.raises(RuntimeError):
            rt._serve(lambda: (_ for _ in ()).throw(
                RuntimeError("UNAVAILABLE: blip")))
    assert not fake_demotable
    assert rt._accel_failures == 4
    # Simulate the window having elapsed since the first failure.
    rt._accel_first_failure_ts -= 31.0

    def attempt():
        if not fake_demotable:
            raise RuntimeError("UNAVAILABLE: still down")
        return "served"

    assert rt._serve(attempt) == "served"
    assert len(fake_demotable) == 1


def test_disabled_via_env(fake_demotable, monkeypatch):
    monkeypatch.setenv("GIP_TPU_DEMOTE_AFTER", "0")
    rt = FilterRuntime()
    for _ in range(5):
        with pytest.raises(RuntimeError):
            rt._serve(lambda: (_ for _ in ()).throw(RuntimeError("x")))
    assert not fake_demotable


def test_demote_to_cpu_noop_on_cpu():
    # The CPU test host is already on CPU: demotion must refuse (so the
    # breaker re-raises rather than looping) and record nothing.
    assert device_mod.demote_to_cpu("test") is False
    assert device_mod.demotion_reason() is None


def test_demote_to_cpu_from_accelerator(monkeypatch):
    class FakeTpu:
        platform = "tpu"

    monkeypatch.setattr(device_mod, "_DEVICE_OVERRIDE", None)
    monkeypatch.setattr(device_mod, "_DEMOTION_REASON", None)
    monkeypatch.setattr(device_mod, "_default_device_cached", lambda: FakeTpu())
    assert device_mod.demote_to_cpu("lease lost") is True
    assert device_mod.default_device().platform == "cpu"
    assert device_mod.is_tpu() is False
    assert device_mod.demotion_reason() == "lease lost"
    # One-way within the process: a second call is a no-op on CPU.
    assert device_mod.demote_to_cpu("again") is False


def test_filter_call_recovers_end_to_end(rng, fake_demotable, monkeypatch):
    """Public-method wiring: device_put failures trip the breaker and the
    request is re-served after demotion."""
    rt = FilterRuntime()
    img = make_image(rng, 16, 20, 3)
    real_dd = dispatch_mod.default_device
    state = {"dead": True}

    def dying_device():
        if state["dead"]:
            raise RuntimeError("UNAVAILABLE: relay lease lost")
        return real_dd()

    monkeypatch.setattr(dispatch_mod, "default_device", dying_device)
    for _ in range(2):
        with pytest.raises(RuntimeError):
            rt.box_blur(img, radius=2, level=1)
    # The demotion "revives" the device (the real CPU backend).
    orig_demote = fake_demotable.append

    def demote_and_revive(reason=""):
        state["dead"] = False
        orig_demote(reason)
        return True

    monkeypatch.setattr(device_mod, "demote_to_cpu", demote_and_revive)
    out, metrics = rt.box_blur(img, radius=2, level=1)
    assert out.shape == img.shape
    assert metrics.time_ms > 0
    assert len(fake_demotable) == 1


def test_validation_errors_never_count(rng):
    rt = FilterRuntime()
    with pytest.raises(ValidationError):
        rt.box_blur(make_image(rng, 16, 20, 3), radius=0, level=1)
    assert rt._accel_failures == 0
