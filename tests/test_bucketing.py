"""Shape bucketing: arbitrary image sizes share compiled executables via
edge-padded bucket shapes, with bit-exact results (clamp-to-edge taps past
the true border read the edge pixel, which is exactly what every replicated
pad pixel holds; Sobel's true border is re-zeroed post-crop)."""

import numpy as np

from gpu_image_processing_tpu.ops.weights import gaussian_kernel_f32
from gpu_image_processing_tpu.runtime import dispatch
from gpu_image_processing_tpu.runtime.dispatch import (RUNTIME, _bucket,
                                                       executable_cache_key)

from . import oracle_numpy as oracle
from .conftest import make_image
from .sobel_tolerance import assert_sobel_close


def test_bucket_values():
    assert _bucket(1) == 64
    assert _bucket(64) == 64
    assert _bucket(65) == 128
    assert _bucket(129) == 192
    for n in (333, 1000, 3239):
        assert _bucket(n) >= n
        assert _bucket(n) % 64 == 0


def test_gaussian_exact_across_bucket_pad(rng):
    # 100x75 pads to 128x128; result must equal the unpadded oracle.
    img = make_image(rng, 100, 75, 3)
    out, m = RUNTIME.gaussian_blur(img, sigma=2.0, radius=3, level=2)
    w = gaussian_kernel_f32(3, 2.0)
    np.testing.assert_array_equal(out, oracle.gaussian_blur(img, w, 3))
    assert out.shape == img.shape


def test_sobel_border_rezeroed(rng):
    img = make_image(rng, 70, 90, 3)
    out, _ = RUNTIME.sobel_edge_detection(img, level=2)
    assert_sobel_close(out, oracle.sobel(img, 2))
    assert (out[0] == 0).all() and (out[-1] == 0).all()
    assert (out[:, 0] == 0).all() and (out[:, -1] == 0).all()


def test_executable_reuse_within_bucket(rng):
    # Two different true sizes in the same bucket share one executable.
    before = len(RUNTIME._cache)
    a = make_image(rng, 97, 70, 3)
    b = make_image(rng, 100, 66, 3)   # same 128x128 bucket
    RUNTIME.box_blur(a, radius=4, level=2)
    n_after_first = len(RUNTIME._cache)
    RUNTIME.box_blur(b, radius=4, level=2)
    assert len(RUNTIME._cache) == n_after_first
    assert n_after_first > before


def test_box_batch_bucketed_exact(rng):
    imgs = np.stack([make_image(rng, 90, 77, 1) for _ in range(2)])
    out, _ = RUNTIME.run_batch("box", imgs, radius=5, level=2)
    for i in range(2):
        np.testing.assert_array_equal(out[i], oracle.box_blur(imgs[i], 5))


def test_bucketing_opt_out(rng, monkeypatch):
    monkeypatch.setenv("GIP_TPU_NO_BUCKETING", "1")
    img = make_image(rng, 33, 41, 3)
    out, _ = RUNTIME.gaussian_blur(img, sigma=2.0, radius=3, level=1)
    w = gaussian_kernel_f32(3, 2.0)
    np.testing.assert_array_equal(out, oracle.gaussian_blur(img, w, 3))
    assert dispatch.executable_cache_key("gaussian", 1, 33, 41, 3, 3) \
        in dispatch.RUNTIME._cache


def test_sobel_bucket_aligned_width_prefix_slice(rng):
    # Width exactly a bucket size + height padded: the unpad slice is a
    # CONTIGUOUS prefix view of the read-only jax output, which used to make
    # the true-border re-zeroing crash ("assignment destination is
    # read-only").
    img = make_image(rng, 48, 64, 3)
    out, _ = RUNTIME.sobel_edge_detection(img, level=2)
    # maxdiff gate only: the 0.1% diff-fraction gate is calibrated for
    # full-size images and is binomially noisy at 48x64.
    diff = np.abs(out.astype(int) - oracle.sobel(img, 2).astype(int))
    assert diff.max() <= 6
    assert (out[0] == 0).all() and (out[-1] == 0).all()
    assert (out[:, 0] == 0).all() and (out[:, -1] == 0).all()


def test_loop_timing_env_override(rng, monkeypatch):
    # Forced ON (CPU default is off): the executable measures loop-delta
    # kernel time once and reports it for every request.
    monkeypatch.setenv("GIP_TPU_LOOP_TIMING", "1")
    img = make_image(rng, 40, 56, 3)
    out, metrics = RUNTIME.box_blur(img, radius=2, level=2)
    np.testing.assert_array_equal(out, oracle.box_blur(img, 2))
    assert metrics.time_ms > 0
    key = executable_cache_key("box", 2, _bucket(40), _bucket(56), 3, 2)
    assert RUNTIME._cache[key]._kernel_ms is not None
    assert metrics.time_ms == RUNTIME._cache[key]._kernel_ms


def test_loop_timing_default_off_on_cpu(rng, monkeypatch):
    monkeypatch.delenv("GIP_TPU_LOOP_TIMING", raising=False)
    from gpu_image_processing_tpu.runtime.dispatch import _loop_timing_enabled

    assert _loop_timing_enabled() is False  # tests force the CPU platform


def test_tier_routing_small_images_use_xla_tier(rng, monkeypatch):
    # Below the measured crossover the level-2 trace fn must come from the
    # interleaved XLA tier; both tiers are bit-exact, so this only checks
    # routing + output correctness.
    monkeypatch.setenv("GIP_TPU_XLA_TIER_MAX_PIXELS", "2500000")
    img = make_image(rng, 30, 44, 3)
    out, _ = RUNTIME.gaussian_blur(img, sigma=2.0, radius=3, level=2)
    w = gaussian_kernel_f32(3, 2.0)
    np.testing.assert_array_equal(out, oracle.gaussian_blur(img, w, 3))
    out, _ = RUNTIME.box_blur(img, radius=4, level=2)
    np.testing.assert_array_equal(out, oracle.box_blur(img, 4))
    # The routing decision is part of the cache key (an earlier run of the
    # same shape under a different threshold must not mask it).
    assert executable_cache_key("gaussian", 2, _bucket(30), _bucket(44), 3, 3) \
        in RUNTIME._cache


def test_box_gate_is_radius_aware(monkeypatch):
    # The MXU box tier moved box's XLA-tier crossover down to 500k px at
    # MXU-eligible radii (scripts/exp_box_small_xover.py: 0.84 MP mxu/xla
    # 0.30-0.51x, 0.26 MP 1.6-1.8x).  r=1 (never MXU) and legacy calls
    # without radius info keep the plain 1 MP gate.
    monkeypatch.delenv("GIP_TPU_XLA_TIER_MAX_PIXELS", raising=False)
    routed = dispatch._routed_to_xla
    # 768x1092 = 0.84 MP: between the two gates.
    assert not routed(2, 768, 1092, "box", radius=5, channels=3)
    assert not routed(4, 768, 1092, "box", radius=2, channels=3)
    assert routed(2, 768, 1092, "box", radius=1, channels=3)   # VPU-only
    assert routed(2, 768, 1092, "box")                          # legacy
    # 480x540 = 0.26 MP: below both gates -> XLA regardless of radius.
    assert routed(2, 480, 540, "box", radius=5, channels=3)
    # Other filters ignore the box-specific fields.
    assert routed(2, 768, 1092, "gaussian", radius=5, channels=3)
    # The env override still wins over the radius-aware default.
    monkeypatch.setenv("GIP_TPU_XLA_TIER_MAX_PIXELS", "0")
    assert not routed(2, 480, 540, "box", radius=5, channels=3)


def test_batch_sobel_bucket_aligned_width(rng):
    # Batch analog of the read-only border-zeroing crash: width exactly a
    # bucket, height padded -> contiguous prefix view of the jax output.
    imgs = np.stack([make_image(rng, 48, 64, 3) for _ in range(2)])
    out, _ = RUNTIME.run_batch("sobel", imgs, level=2)
    for i in range(2):
        diff = np.abs(out[i].astype(int) - oracle.sobel(imgs[i], 2).astype(int))
        assert diff.max() <= 6
        assert (out[i][0] == 0).all() and (out[i][:, -1] == 0).all()


def test_tier_routing_threshold_zero_forces_pallas(rng, monkeypatch):
    monkeypatch.setenv("GIP_TPU_XLA_TIER_MAX_PIXELS", "0")
    from gpu_image_processing_tpu.runtime.dispatch import _rows_optimized

    # With threshold 0 the resolver must NOT return the XLA-tier lambda;
    # it reaches the Pallas branch (interpret mode on CPU).
    fn = _rows_optimized("gaussian", 2, 3, 30, 44, 3)
    assert "gaussian_pallas_rows" in (fn.__code__.co_names + tuple(
        c.cell_contents.__name__ for c in (fn.__closure__ or ())
        if callable(getattr(c, "cell_contents", None))
        and hasattr(c.cell_contents, "__name__")
    ))


def test_extreme_shape_uses_column_tiling():
    # Shapes whose full-width working set exceeds even the raised 64 MB
    # scoped-VMEM budget (ops/pallas/blur.py _VMEM_SCOPE_BYTES) switch to
    # column-tiled grid steps instead of dying in the Mosaic compiler.
    # (Round 1 chunked at 8K x r15 under the default 16 MB scope; the
    # raised scope runs that full-width now -- measured faster.)
    from gpu_image_processing_tpu.ops.pallas.blur import blur_kernel_fits_vmem

    assert not blur_kernel_fits_vmem(16384, 31, 3, True, interleaved=True)
    assert not blur_kernel_fits_vmem(7680, 100, 3, True, interleaved=True)
    assert blur_kernel_fits_vmem(_bucket(7680), 15, 3, True, interleaved=True)
    assert blur_kernel_fits_vmem(3239, 15, 3, True, interleaved=True)


def test_extreme_shape_output_exact(rng):
    # Functional check: the real 8K width (column-tiled kernel) with a few
    # rows; fit depends on width and radius, not height.
    img = make_image(rng, 24, 7680, 3)
    out, _ = RUNTIME.box_blur(img, radius=15, level=2)
    np.testing.assert_array_equal(out, oracle.box_blur(img, 15))


def test_vmem_infeasible_radius_routes_to_xla_tier(rng):
    # Box has no radius cap (reference parity: boxBlur accepts any radius,
    # image_filters.cu:945).  Past a radius in the low hundreds even the
    # column-chunked Pallas working set ((8+2r) halo rows) exceeds VMEM;
    # dispatch must serve such calls from the XLA tier instead of dying in
    # the Mosaic compiler.
    from gpu_image_processing_tpu.ops.pallas.blur import blur_pallas_feasible
    from gpu_image_processing_tpu.runtime.dispatch import RUNTIME, _rows_optimized

    def routed_names(fn):
        return fn.__code__.co_names + tuple(
            c.cell_contents.__name__ for c in (fn.__closure__ or ())
            if callable(getattr(c, "cell_contents", None))
            and hasattr(c.cell_contents, "__name__"))

    # r=500 @ w=3239: the sequenced-tap VPU working set exceeds VMEM but
    # the MXU kernel (one tile of matmul temporaries) still fits -- MXU
    # eligibility is consulted FIRST, so this serves the MXU tier, not a
    # demotion to XLA (the pre-round-4 behavior).
    from gpu_image_processing_tpu.ops.pallas.blur_mxu import use_mxu_box

    assert not blur_pallas_feasible(3239, 500, 3, True, interleaved=True)
    assert use_mxu_box(500, 3239, 3, interleaved=True)
    names = routed_names(_rows_optimized("box", 2, 500, 2146, 3239, 3))
    assert "box_mxu_rows" in names and "box_rows" not in names

    # r=800 @ w=3239: NEITHER kernel fits -- the XLA tier serves it.
    assert not use_mxu_box(800, 3239, 3, interleaved=True)
    names = routed_names(_rows_optimized("box", 2, 800, 2146, 3239, 3))
    assert "box_pallas_rows" not in names and "box_mxu_rows" not in names
    assert "box_rows" in names

    # End-to-end: the runtime serves an extreme radius and matches the
    # oracle (small image -> its own bucketed-shape routing applies).
    img = make_image(rng, 40, 60, 3)
    out, _ = RUNTIME.box_blur(img, radius=800, level=2)
    np.testing.assert_array_equal(out, oracle.box_blur(img, 800))
