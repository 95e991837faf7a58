"""MXU gray-compaction sobel tier (ops/pallas/sobel_mxu.py).

Gate: the tier serves level-2 COLOR images, whose acceptance bar is the
existing FMA gate (maxdiff <= 6 on <= 0.1% of pixels vs the strict-order
oracle -- tests/sobel_tolerance.py); within-pixel channel equality must
hold exactly (image_filters.cu:1311-1313)."""

import numpy as np
import pytest

import jax

from gpu_image_processing_tpu.ops.pallas.sobel_mxu import (
    sobel_mxu_feasible,
    sobel_mxu_rows,
    sobel_mxu_rows_batch,
    use_mxu_sobel,
)

from . import oracle_numpy as oracle


def _assert_gate(got, want):
    """FMA-class gate with a small-image floor.

    The compact gray sits within 1-2 f32 ulps of the sequential chain;
    an isolated floor(g+0.5) tie flip perturbs one pixel's 3x3 gradient
    neighborhood (<= 9*C elements).  The measured flip rate is ~3e-5 per
    pixel on silicon (scripts/exp_sobel_gray_repack.py: 2.97e-4 of
    elements on 7 MP) -- within the standard 0.1% gate -- but on a
    few-thousand-pixel test image ONE flip already exceeds 0.1%, so the
    bound here is count-based with a 2-flip floor."""
    got, want = np.asarray(got), np.asarray(want)
    h, w, c = got.shape
    d = np.abs(got.astype(int) - want.astype(int))
    assert d.max() <= 6, f"sobel maxdiff {d.max()} > 6"
    limit = 9 * c * max(2, round(1e-3 * h * w))
    assert (d > 0).sum() <= limit, \
        f"sobel flipped elements {(d > 0).sum()} > {limit}"


def _assert_gate_l4(got, want):
    """ADVANCED gate: f32 gray differs from the sequential chain by ulps,
    so only an isolated floor(mag+0.5) tie can flip -- by exactly 1."""
    got, want = np.asarray(got), np.asarray(want)
    h, w, c = got.shape
    d = np.abs(got.astype(int) - want.astype(int))
    assert d.max() <= 1, f"sobel L4 maxdiff {d.max()} > 1"
    limit = 9 * c * max(2, round(1e-3 * h * w))
    assert (d > 0).sum() <= limit, \
        f"sobel L4 flipped elements {(d > 0).sum()} > {limit}"


def _run_rows(img):
    h, w, c = img.shape
    got = np.asarray(jax.jit(
        lambda r: sobel_mxu_rows(r, w, c, interpret=True)
    )(img.reshape(h, w * c)))
    return got.reshape(h, w, c)


@pytest.mark.parametrize("shape", [
    (70, 90, 3),
    (41, 33, 4),
    (96, 421, 3),
    (13, 300, 3),     # tile_rows > height
    (200, 17, 3),     # narrow
])
def test_matches_oracle_within_gate(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, np.uint8)
    got = _run_rows(img)
    _assert_gate(got, oracle.sobel(img, 2))
    # Exact channel replication, alpha included.
    assert (got == got[:, :, :1]).all()


def test_batch_matches_single():
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (3, 48, 65, 3), np.uint8)
    b, h, w, c = imgs.shape
    got = np.asarray(jax.jit(
        lambda r: sobel_mxu_rows_batch(r, w, c, interpret=True)
    )(imgs.reshape(b, h, w * c)))
    for i in range(b):
        np.testing.assert_array_equal(
            got[i].reshape(h, w, c), _run_rows(imgs[i]))


def test_borders_zeroed():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (30, 40, 3), np.uint8)
    got = _run_rows(img)
    assert (got[0] == 0).all() and (got[-1] == 0).all()
    assert (got[:, 0] == 0).all() and (got[:, -1] == 0).all()


def test_wide_image_feasible_and_gated():
    """8K-wide working set still fits the raised VMEM scope."""
    assert sobel_mxu_feasible(7680, 3)
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (24, 2000, 3), np.uint8)
    _assert_gate(_run_rows(img), oracle.sobel(img, 2))


def test_routing_predicate(monkeypatch):
    monkeypatch.delenv("GIP_TPU_SOBEL_MXU", raising=False)
    # CPU backend: auto-route stays off (exactness-first off-silicon).
    assert not use_mxu_sobel(3239, 3, 2)
    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "1")
    assert use_mxu_sobel(3239, 3, 2)
    assert use_mxu_sobel(3239, 4, 2)
    # ADVANCED numerics (f32 gray, numerics level 1) rides the tier too.
    assert use_mxu_sobel(3239, 3, 1)
    # Never for grayscale (exact-equality gate; no redundancy to remove)
    # or forced-off.
    assert not use_mxu_sobel(3239, 1, 2)
    assert not use_mxu_sobel(3239, 1, 1)
    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "0")
    assert not use_mxu_sobel(3239, 3, 2)
    assert not use_mxu_sobel(3239, 3, 1)


def test_dispatch_routes_mxu_when_forced(monkeypatch):
    """Serving dispatch routes the L2 rows sobel through the MXU tier when
    forced (the on-silicon auto route is exercised by tpu_validation.py),
    and the served output stays inside the acceptance gate."""
    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "1")
    monkeypatch.setenv("GIP_TPU_XLA_TIER_MAX_PIXELS", "0")
    import gpu_image_processing_tpu.ops.pallas.sobel_mxu as sm
    from gpu_image_processing_tpu.runtime import dispatch

    calls = []
    orig = sm.sobel_mxu_rows

    def spy(rows, width, channels, interpret=False, level=2, **kw):
        calls.append((width, channels, level))
        return orig(rows, width, channels, interpret=interpret, level=level,
                    **kw)

    monkeypatch.setattr(sm, "sobel_mxu_rows", spy)
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "0")
    fn = dispatch._rows_optimized("sobel", 2, 0, 64, 80, 3)
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (64, 80, 3), np.uint8)
    got = np.asarray(jax.jit(fn)(img.reshape(64, -1))).reshape(64, 80, 3)
    assert calls == [(80, 3, 2)]
    _assert_gate(got, oracle.sobel(img, 2))

    # ADVANCED request level routes the same tier at f32-gray numerics.
    fn4 = dispatch._rows_optimized("sobel", 4, 0, 64, 80, 3)
    got4 = np.asarray(jax.jit(fn4)(img.reshape(64, -1))).reshape(64, 80, 3)
    assert calls == [(80, 3, 2), (80, 3, 1)]
    _assert_gate_l4(got4, oracle.sobel(img, 1))

    # Host-prepad serving (default): the routed fn is tagged with the
    # numpy prep + the timing-chain marker and consumes the padded
    # buffer; output identical to the unpadded route.
    monkeypatch.setenv("GIP_TPU_HOST_PREPAD", "1")
    fn_pp = dispatch._rows_optimized("sobel", 2, 0, 64, 80, 3)
    assert fn_pp.host_prepad is not None and fn_pp.timing_chain
    rows_pp = fn_pp.host_prepad(img.reshape(64, -1))
    got_pp = np.asarray(jax.jit(fn_pp)(rows_pp)).reshape(64, 80, 3)
    np.testing.assert_array_equal(got_pp, got)


def test_mxu_routing_is_in_the_executable_cache_key(monkeypatch):
    """Flipping GIP_TPU_SOBEL_MXU must change the sobel cache key, or a
    cached executable built under the other routing keeps serving the
    stale tier for the process lifetime (the key's own rule: every
    routing flag lives in the key)."""
    from gpu_image_processing_tpu.runtime.dispatch import executable_cache_key

    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "1")
    k_on = executable_cache_key("sobel", 2, 64, 128, 3)
    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "0")
    k_off = executable_cache_key("sobel", 2, 64, 128, 3)
    assert k_on != k_off
    # Level 4 (ADVANCED, f32-gray MXU) forks its key on the flag too.
    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "1")
    k4_on = executable_cache_key("sobel", 4, 64, 128, 3)
    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "0")
    assert k4_on != executable_cache_key("sobel", 4, 64, 128, 3)
    # Level 1 serves the naive-parity tier and never rides the MXU:
    # forcing the flag must NOT fork its key (a fork would recompile an
    # identical executable).
    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "1")
    k1 = executable_cache_key("sobel", 1, 64, 128, 3)
    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "0")
    assert k1 == executable_cache_key("sobel", 1, 64, 128, 3)


def test_mxu_routing_in_all_levels_and_batch_keys(monkeypatch):
    """The fused all-levels and batch executables consult use_mxu_sobel in
    their trace builders, so their cache keys must carry the routing bit
    too -- a mid-process GIP_TPU_SOBEL_MXU flip must rebuild them, not
    serve the stale tier from cache."""
    from gpu_image_processing_tpu.runtime.dispatch import _sobel_mxu_routed

    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "1")
    assert _sobel_mxu_routed(2, 128, 3) is True
    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "0")
    assert _sobel_mxu_routed(2, 128, 3) is False
    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "1")
    assert _sobel_mxu_routed(4, 128, 3) is True
    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "0")
    assert _sobel_mxu_routed(4, 128, 3) is False
    # Request level 1 (naive tier) never consults the flag.
    monkeypatch.setenv("GIP_TPU_SOBEL_MXU", "1")
    assert _sobel_mxu_routed(1, 128, 3) is False


@pytest.mark.parametrize("shape", [
    (70, 90, 3),
    (41, 33, 4),
    (13, 300, 3),
])
def test_level4_f32_gray_matches_l1_oracle(shape):
    """ADVANCED numerics (level=1): no gray quantization; the compact
    gray is within f32 ulps of the sequential Rec.601 chain, so the
    output sits within the ADVANCED maxdiff<=1 gate vs the L1 oracle."""
    rng = np.random.default_rng(sum(shape) + 1)
    img = rng.integers(0, 256, shape, np.uint8)
    h, w, c = shape
    got = np.asarray(jax.jit(
        lambda r: sobel_mxu_rows(r, w, c, interpret=True, level=1)
    )(img.reshape(h, w * c))).reshape(h, w, c)
    _assert_gate_l4(got, oracle.sobel(img, 1))
    assert (got == got[:, :, :1]).all()


def test_level4_batch_matches_single():
    rng = np.random.default_rng(15)
    imgs = rng.integers(0, 256, (2, 40, 57, 3), np.uint8)
    b, h, w, c = imgs.shape
    got = np.asarray(jax.jit(
        lambda r: sobel_mxu_rows_batch(r, w, c, interpret=True, level=1)
    )(imgs.reshape(b, h, w * c)))
    for i in range(b):
        single = np.asarray(jax.jit(
            lambda r: sobel_mxu_rows(r, w, c, interpret=True, level=1)
        )(imgs[i].reshape(h, w * c)))
        np.testing.assert_array_equal(got[i], single)
