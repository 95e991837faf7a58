"""Host-prepad serving (GIP_TPU_HOST_PREPAD, round 5): the dispatch rows
tiers consume a host-padded buffer and emit no in-program pad op.  The
entire contract is that outputs are IDENTICAL to the in-program-pad
route; kernel-level bit-equality lives in test_pallas.py, this file
covers the runtime plumbing: routing tags, operand prep before
device_put, cache-key forking, and the loop-delta timing chain."""

import numpy as np
import pytest

from gpu_image_processing_tpu.runtime import dispatch

from .conftest import make_image


@pytest.fixture
def rng():
    return np.random.default_rng(77)


@pytest.mark.parametrize("filter_name,kwargs", [
    ("gaussian", dict(sigma=2.0, radius=3)),
    ("box", dict(radius=5)),
    ("sobel", dict()),
])
@pytest.mark.parametrize("level", [2, 4])
def test_served_outputs_identical_with_and_without_prepad(
        rng, filter_name, kwargs, level, monkeypatch):
    img = make_image(rng, 57, 83, 3)
    runtime = dispatch.FilterRuntime()

    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "0")
    ref, _ = runtime.run(filter_name, img, level=level, **kwargs)
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "1")
    got, _ = runtime.run(filter_name, img, level=level, **kwargs)
    np.testing.assert_array_equal(got, ref)


def test_prepad_flag_forks_the_cache_key(monkeypatch):
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "1")
    k1 = dispatch.executable_cache_key("gaussian", 2, 64, 80, 3, 3)
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "0")
    k0 = dispatch.executable_cache_key("gaussian", 2, 64, 80, 3, 3)
    assert k1 != k0
    ks1 = dispatch.executable_cache_key("sobel", 2, 64, 80, 3)
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "1")
    assert dispatch.executable_cache_key("sobel", 2, 64, 80, 3) != ks1


def test_prepad_timing_chain_via_loop_delta(rng, monkeypatch):
    """With loop-delta timing forced on, a prepadded executable must
    measure through the corner-chained harness (a raw non-shape-
    preserving fn would fail the fori_loop typing and silently demote
    time_ms to wall)."""
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "1")
    monkeypatch.setenv("GIP_TPU_LOOP_TIMING", "1")
    img = make_image(rng, 40, 48, 3)
    runtime = dispatch.FilterRuntime()
    out, metrics = runtime.run("box", img, level=2, radius=5)
    assert out.shape == img.shape
    exe = next(v for k, v in runtime._cache.items() if k[0] == "box")
    assert exe.host_prepad is not None
    # The loop-delta measurement itself must have succeeded (not the
    # wall-time fallback path).
    assert exe._kernel_ms is not None


def test_prepad_off_has_no_tags(monkeypatch):
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "0")
    fn = dispatch._rows_optimized("gaussian", 2, 3, 64, 80, 3)
    assert getattr(fn, "host_prepad", None) is None


def test_bench_apply_fn_times_the_served_program(monkeypatch):
    """bench L2/L4 rows must be THE dispatch trace builders (identical
    routing incl. prepad), and program_fingerprint must spec the padded
    operand for tagged fns."""
    import bench

    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "1")
    fn = bench._apply_fn("gaussian", 2, width=80, channels=3, height=64)
    assert getattr(fn, "host_prepad", None) is not None
    fp1 = bench.program_fingerprint(
        "gaussian", 2, np.zeros((64, 80, 3), np.uint8))
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "0")
    fp0 = bench.program_fingerprint(
        "gaussian", 2, np.zeros((64, 80, 3), np.uint8))
    assert fp1 != fp0  # different device programs must never pool


def test_prepad_flag_forks_the_fused_levels_key(rng, monkeypatch):
    """The fused all-levels executable's per-level TIMING fns depend on
    the prepad flag; a mid-process flip must re-time, so the flag lives
    in the fused cache key too (round-5 review finding)."""
    monkeypatch.setenv("GIP_TPU_LOOP_TIMING", "1")
    img = make_image(rng, 40, 48, 3)
    runtime = dispatch.FilterRuntime()

    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "1")
    runtime.run_all_levels("box", img, radius=5, levels=(1, 2))
    keys_on = {k for k in runtime._cache if k[0] == "all_levels"}
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "0")
    runtime.run_all_levels("box", img, radius=5, levels=(1, 2))
    keys_both = {k for k in runtime._cache if k[0] == "all_levels"}
    assert len(keys_both) == 2 * len(keys_on)


def test_fused_timing_uses_host_rows_not_device_fetch(rng, monkeypatch):
    """The one-time per-level prepad timing must consume the caller's
    HOST rows (exe.host_rows_np), never a bulk D2H of the device operand
    (~minutes through the relay, held under the compile lock)."""
    monkeypatch.setenv("GIP_TPU_LOOP_TIMING", "1")
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "1")
    img = make_image(rng, 40, 48, 3)
    runtime = dispatch.FilterRuntime()
    runtime.run_all_levels("gaussian", img, sigma=2.0, radius=3,
                           levels=(1, 2))
    exe = next(v for k, v in runtime._cache.items()
               if k[0] == "all_levels")
    # Timing succeeded through the host rows (never a device fetch) and
    # the one-time rows reference was RELEASED afterwards -- keeping it
    # would pin ~20 MB per cached executable for the process lifetime.
    assert exe._kernel_ms is not None and len(exe._kernel_ms) == 2
    assert exe.host_rows_np is None


def test_batch_served_outputs_identical_with_and_without_prepad(
        rng, monkeypatch):
    imgs = np.stack([make_image(rng, 33, 41, 3) for _ in range(3)])
    runtime = dispatch.FilterRuntime()
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "0")
    ref, _ = runtime.run_batch("box", imgs, level=2, radius=5)
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "1")
    got, _ = runtime.run_batch("box", imgs, level=2, radius=5)
    np.testing.assert_array_equal(got, ref)
    # And the prepadded batch executable is tagged.
    exe = next(v for k, v in runtime._cache.items()
               if k[0] == "batch" and k[-1] is True)
    assert exe.host_prepad is not None
