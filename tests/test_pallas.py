"""Pallas level-2 kernels, run through the interpreter on CPU, held to
EXACT equality against the independent numpy oracle -- the same kernel code
compiles through Mosaic on TPU."""

from functools import partial

import jax
import numpy as np
import pytest

from gpu_image_processing_tpu.ops.pallas.blur import box_pallas, gaussian_pallas
from gpu_image_processing_tpu.ops.pallas.sobel import sobel_pallas
from gpu_image_processing_tpu.ops.weights import gaussian_kernel_f32

from . import oracle_numpy as oracle
from .conftest import make_image
from .sobel_tolerance import assert_sobel_close

SHAPES = [(24, 31, 3), (19, 23, 1), (17, 29, 4)]


@partial(jax.jit, static_argnums=(2,))
def _gauss(img, w, radius):
    return gaussian_pallas(img, w, radius, interpret=True)


@partial(jax.jit, static_argnums=(1,))
def _box(img, radius):
    return box_pallas(img, radius, interpret=True)


@jax.jit
def _sobel(img):
    return sobel_pallas(img, interpret=True)


@pytest.mark.parametrize("shape", SHAPES)
def test_gaussian_pallas_exact(rng, shape):
    img = make_image(rng, *shape)
    w = gaussian_kernel_f32(3, 2.0)
    np.testing.assert_array_equal(
        np.asarray(_gauss(img, w, 3)), oracle.gaussian_blur(img, w, 3)
    )


def test_gaussian_pallas_max_radius(rng):
    # radius=15 (the API's upper bound, app.py:148) with a tiny image.
    img = make_image(rng, 40, 22, 3)
    w = gaussian_kernel_f32(15, 8.0)
    np.testing.assert_array_equal(
        np.asarray(_gauss(img, w, 15)), oracle.gaussian_blur(img, w, 15)
    )


@pytest.mark.parametrize("shape", SHAPES)
def test_box_pallas_exact(rng, shape):
    img = make_image(rng, *shape)
    np.testing.assert_array_equal(np.asarray(_box(img, 5)), oracle.box_blur(img, 5))


@pytest.mark.parametrize("shape", SHAPES)
def test_sobel_pallas_matches_oracle(rng, shape):
    img = make_image(rng, *shape)
    assert_sobel_close(np.asarray(_sobel(img)), oracle.sobel(img, 2))


def test_tile_boundary_rows(rng):
    # Height > one tile: force multiple grid steps even with the default
    # tile_rows by using an image taller than the tile.
    from gpu_image_processing_tpu.core.config import TPU

    h = TPU.blur_tile_rows + 13
    img = make_image(rng, h, 17, 1)
    w = gaussian_kernel_f32(4, 2.5)
    got = np.asarray(jax.jit(
        lambda x, wt: gaussian_pallas(x, wt, 4, interpret=True)
    )(img, w))
    np.testing.assert_array_equal(got, oracle.gaussian_blur(img, w, 4))


# ------------------------------------------------------ interleaved (flat)
# The serving-path kernels: consume the flat HWC byte buffer's natural
# (H, W*C) layout; taps shift by C lanes (see ops/pallas/blur.py
# _separable_blur_interleaved).

@pytest.mark.parametrize("shape", SHAPES)
def test_gaussian_flat_exact(rng, shape):
    from gpu_image_processing_tpu.ops.pallas.blur import gaussian_pallas_flat

    h, w, c = shape
    img = make_image(rng, *shape)
    wts = gaussian_kernel_f32(3, 2.0)
    got = np.asarray(jax.jit(lambda f, wt: gaussian_pallas_flat(
        f, wt, 3, h, w, c, interpret=True))(img.reshape(-1), wts))
    np.testing.assert_array_equal(
        got.reshape(h, w, c), oracle.gaussian_blur(img, wts, 3))


@pytest.mark.parametrize("shape", SHAPES)
def test_sobel_flat_matches_oracle(rng, shape):
    from gpu_image_processing_tpu.ops.pallas.sobel import sobel_pallas_flat

    h, w, c = shape
    img = make_image(rng, *shape)
    got = np.asarray(jax.jit(lambda f: sobel_pallas_flat(
        f, h, w, c, level=2, interpret=True))(img.reshape(-1)))
    assert_sobel_close(got.reshape(h, w, c), oracle.sobel(img, 2))


def test_box_flat_batch_exact(rng):
    from gpu_image_processing_tpu.ops.pallas.blur import box_pallas_flat_batch

    imgs = np.stack([make_image(rng, 25, 31, 3) for _ in range(3)])
    got = np.asarray(jax.jit(lambda f: box_pallas_flat_batch(
        f, 4, 25, 31, 3, interpret=True))(imgs.reshape(3, -1)))
    for i in range(3):
        np.testing.assert_array_equal(
            got[i].reshape(25, 31, 3), oracle.box_blur(imgs[i], 4))


def test_gaussian_flat_folded_gate(rng):
    # ADVANCED tier on the flat path: symmetric folding, maxdiff <= 1 vs
    # the strict-order level 2 (the reference's own L1<->L2 gate).
    from gpu_image_processing_tpu.ops.pallas.blur import gaussian_pallas_flat

    h, w, c = 33, 47, 3
    img = make_image(rng, h, w, c)
    wts = gaussian_kernel_f32(5, 3.0)
    exact = np.asarray(jax.jit(lambda f, wt: gaussian_pallas_flat(
        f, wt, 5, h, w, c, interpret=True))(img.reshape(-1), wts))
    folded = np.asarray(jax.jit(lambda f, wt: gaussian_pallas_flat(
        f, wt, 5, h, w, c, interpret=True, folded=True))(img.reshape(-1), wts))
    assert np.abs(exact.astype(int) - folded.astype(int)).max() <= 1


# -- big-radius halos (no box radius cap, matching the reference's boxBlur:
#    image_filters.cu:945 accepts any radius) ------------------------------

@pytest.mark.parametrize("shape,radius", [
    ((24, 40, 4), 40),   # halo 160 > 128: landing offset must grow
    ((16, 50, 3), 43),   # halo 129, just past one register
    ((10, 20, 1), 60),   # planar-stride halo > tile minimum
])
def test_box_radius_exceeding_land_exact(rng, shape, radius):
    """halo = radius*C > 128 forces a larger register-aligned landing
    offset (blur.py::_landed_geometry); results stay bit-exact."""
    from gpu_image_processing_tpu.ops.pallas.blur import box_pallas_rows

    img = make_image(rng, *shape)
    h, w, c = shape
    rows = img.reshape(h, w * c)
    got = np.asarray(jax.jit(
        lambda x: box_pallas_rows(x, radius, c, interpret=True))(rows))
    np.testing.assert_array_equal(
        got, oracle.box_blur(img, radius).reshape(h, w * c))
    got_hwc = np.asarray(_box(img, radius))
    np.testing.assert_array_equal(got_hwc, oracle.box_blur(img, radius))


def test_box_halo_spanning_column_chunks_exact(rng):
    """Column-tiled kernel with halo (1560 lanes) wider than one column
    chunk (1536): multiple chunks carry clamp-to-edge fills
    (blur.py::_fill_sites)."""
    import jax.numpy as jnp

    from gpu_image_processing_tpu.ops.pallas import blur as B
    from gpu_image_processing_tpu.ops.weights import box_inv_taps_f32

    h, w, c, radius = 16, 4000, 3, 520
    land, cs, n_cols, w_t, _ = B._landed_geometry(w * c, radius * c,
                                                  chunked=True)
    assert n_cols > 1 and radius * c > cs  # the scenario under test
    img = make_image(rng, h, w, c)
    rows = img.reshape(h, w * c)
    inv = np.full(2 * radius + 1, box_inv_taps_f32(radius), dtype=np.float32)
    got = np.asarray(jax.jit(lambda x: B._separable_blur_interleaved(
        x[None], jnp.asarray(inv), radius, box_mode=True, channels=c,
        interpret=True)[0])(rows))
    np.testing.assert_array_equal(
        got, oracle.box_blur(img, radius).reshape(h, w * c))


@pytest.mark.parametrize("h,radius", [(2, 3), (5, 7), (1, 3), (9, 8)])
def test_rowfill_height_smaller_than_radius(rng, h, radius):
    """Round-2 constant-row-pad path: heights at or below the radius make
    BOTH in-kernel clamp fills (top band 0 + bottom band) land in the same
    band -- the fill order (top first) must still reproduce clamp-to-edge
    exactly."""
    from gpu_image_processing_tpu.ops.pallas.blur import (
        box_pallas_rows,
        gaussian_pallas_rows,
    )

    img = make_image(rng, h, 20, 3)
    rows = img.reshape(h, 60)
    w = gaussian_kernel_f32(radius, 2.5)
    got = np.asarray(jax.jit(lambda x, ww: gaussian_pallas_rows(
        x, ww, radius, 3, interpret=True))(rows, w))
    np.testing.assert_array_equal(
        got, oracle.gaussian_blur(img, w, radius).reshape(h, 60))

    got = np.asarray(jax.jit(lambda x: box_pallas_rows(
        x, radius, 3, interpret=True))(rows))
    np.testing.assert_array_equal(
        got, oracle.box_blur(img, radius).reshape(h, 60))


def test_rowfill_last_band_boundary(rng):
    """Heights straddling a tile boundary place the bottom clamp fill in a
    band other than 0; the @pl.when(i == last_band) site must fire there."""
    from gpu_image_processing_tpu.ops.pallas import blur as B

    radius, c = 3, 1
    # Force small tiles so multiple bands exist even at modest heights.
    for h in (17, 24, 25):
        img = make_image(rng, h, 24, c)
        rows = img.reshape(h, 24)
        w = gaussian_kernel_f32(radius, 2.0)
        got = np.asarray(jax.jit(lambda x, ww: B._separable_blur_interleaved(
            x[None], ww, radius, box_mode=False, channels=c,
            interpret=True, tile_rows=8)[0])(rows, w))
        np.testing.assert_array_equal(
            got, oracle.gaussian_blur(img, w, radius).reshape(h, 24),
            err_msg=f"h={h}")


def test_rowfill_last_band_boundary_mxu(rng):
    """MXU tier analog of the trailing-band clamp-fill sites."""
    from gpu_image_processing_tpu.ops.pallas import blur_mxu as M

    radius, c = 5, 3
    w = gaussian_kernel_f32(radius, 3.0)
    for h in (17, 25):
        img = make_image(rng, h, 12, c)
        rows = img.reshape(h, 36)
        got = np.asarray(jax.jit(lambda x, ww: M._gaussian_mxu(
            x[None], ww, radius, tap_stride=c, interpret=True,
            tile_rows=8)[0])(rows, w))
        want = oracle.gaussian_blur(img, w, radius).reshape(h, 36)
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1, f"h={h} maxdiff={diff.max()}"  # MXU gate


@pytest.mark.parametrize("radius", [1, 3, 4])
@pytest.mark.parametrize("folded", [False, True])
def test_chained_taps_exact(rng, radius, folded):
    """Value-chained tap accumulation (chained=True) is bit-identical to
    the oracle: same f32 term/add order as the sequenced-ref path, only
    the accumulator storage differs (ops/pallas/blur.py::conv_value)."""
    img = make_image(rng, 33, 21, 3)
    w = gaussian_kernel_f32(radius, 2.0)
    got = np.asarray(jax.jit(lambda x, ww: gaussian_pallas(
        x, ww, radius, interpret=True, folded=folded, chained=True))(img, w))
    np.testing.assert_array_equal(got, oracle.gaussian_blur(img, w, radius))


def test_chained_taps_rows_and_box(rng):
    from gpu_image_processing_tpu.ops.pallas import blur as B

    img = make_image(rng, 29, 19, 3)
    rows = img.reshape(29, 57)
    w = gaussian_kernel_f32(2, 1.5)
    got = np.asarray(jax.jit(lambda x, ww: B.gaussian_pallas_rows(
        x, ww, 2, 3, interpret=True, chained=True))(rows, w))
    np.testing.assert_array_equal(
        got, oracle.gaussian_blur(img, w, 2).reshape(29, 57))
    got = np.asarray(jax.jit(lambda x: B.box_pallas_rows(
        x, 3, 3, interpret=True, chained=True))(rows))
    np.testing.assert_array_equal(
        got, oracle.box_blur(img, 3).reshape(29, 57))
    # doubling radii ignore the flag (box r>=4 routes to windowed sums)
    got = np.asarray(jax.jit(lambda x: B.box_pallas_rows(
        x, 5, 3, interpret=True, chained=True))(rows))
    np.testing.assert_array_equal(
        got, oracle.box_blur(img, 5).reshape(29, 57))


def test_chained_multiband_tiles(rng):
    """Chained kernels across several row bands (tile_rows=8 forces a
    multi-band grid) keep the row-fill/halo logic intact."""
    from gpu_image_processing_tpu.ops.pallas import blur as B

    for h in (17, 24, 25):
        img = make_image(rng, h, 24, 1)
        rows = img.reshape(h, 24)
        w = gaussian_kernel_f32(3, 2.0)
        got = np.asarray(jax.jit(lambda x, ww: B._separable_blur_interleaved(
            x[None], ww, 3, box_mode=False, channels=1,
            interpret=True, tile_rows=8, chained=True)[0])(rows, w))
        np.testing.assert_array_equal(
            got, oracle.gaussian_blur(img, w, 3).reshape(h, 24),
            err_msg=f"h={h}")


@pytest.mark.parametrize("radius", [2, 4, 5, 9])
def test_box_mxu_bit_exact_planar(rng, radius):
    """The MXU box tier is BIT-EXACT vs the naive oracle (not merely
    maxdiff<=1 like the weighted gaussian tier): the ones band makes every
    f32 partial sum an exact integer, and the epilogue multiplies by the
    same f32 reciprocal the oracle uses (blur_mxu.py module docstring)."""
    from gpu_image_processing_tpu.ops.pallas import blur_mxu as M

    img = make_image(rng, 31, 22, 3)
    got = np.asarray(jax.jit(lambda x: M.box_mxu(
        x, radius, interpret=True))(img))
    np.testing.assert_array_equal(got, oracle.box_blur(img, radius))


def test_box_mxu_bit_exact_rows_and_batch(rng):
    from gpu_image_processing_tpu.ops.pallas import blur_mxu as M

    for h in (17, 24, 25):  # partial trailing band / exact-fit geometries
        img = make_image(rng, h, 18, 3)
        rows = img.reshape(h, 54)
        got = np.asarray(jax.jit(lambda x: M.box_mxu_rows(
            x, 5, 3, interpret=True))(rows))
        np.testing.assert_array_equal(
            got, oracle.box_blur(img, 5).reshape(h, 54), err_msg=f"h={h}")
    imgs = [make_image(rng, 21, 18, 3) for _ in range(3)]
    batch = np.stack([im.reshape(21, 54) for im in imgs])
    got = np.asarray(jax.jit(lambda x: M.box_mxu_rows_batch(
        x, 4, 3, interpret=True))(batch))
    for b in range(3):
        np.testing.assert_array_equal(
            got[b], oracle.box_blur(imgs[b], 4).reshape(21, 54),
            err_msg=f"b={b}")


def test_box_mxu_grayscale_rows(rng):
    from gpu_image_processing_tpu.ops.pallas import blur_mxu as M

    img = make_image(rng, 23, 40, 1)
    rows = img.reshape(23, 40)
    got = np.asarray(jax.jit(lambda x: M.box_mxu_rows(
        x, 6, 1, interpret=True))(rows))
    np.testing.assert_array_equal(
        got, oracle.box_blur(img, 6).reshape(23, 40))


@pytest.mark.parametrize("w,radius", [(2048, 200), (4000, 520)])
def test_box_mxu_column_chunked_exact(rng, w, radius):
    """Column-chunked MXU box geometry (serving-reachable: e.g. w=4000
    r=120 is use_mxu_box-routed AND chunks 8 ways).  (2048, 200): halo
    (600 lanes) within one chunk; (4000, 520): halo (1560) spans chunks,
    so multiple chunks carry clamp-to-edge fills.  Bit-exact like every
    box tier."""
    from gpu_image_processing_tpu.ops.pallas import blur_mxu as M
    from gpu_image_processing_tpu.ops.pallas.blur import (
        _landed_geometry,
        blur_kernel_fits_vmem,
    )

    c = 3
    assert not blur_kernel_fits_vmem(w, radius, c, False, interleaved=True)
    _, cs, n_cols, _, _ = _landed_geometry(w * c, radius * c, chunked=True)
    assert n_cols > 1
    img = make_image(rng, 16, w, c)
    rows = img.reshape(16, w * c)
    got = np.asarray(jax.jit(lambda x: M.box_mxu_rows(
        x, radius, c, interpret=True))(rows))
    np.testing.assert_array_equal(
        got, oracle.box_blur(img, radius).reshape(16, w * c))


def test_box_mxu_routing():
    """Box routes to the MXU tier for BOTH level 2 and 4 (bit-exact on
    every tier, so routing only changes speed) from BOX_MXU_MIN_RADIUS
    up; r=1 stays on the exact VPU kernel (unmeasured on silicon)."""
    from gpu_image_processing_tpu.ops.pallas.blur_mxu import (
        BOX_MXU_MIN_RADIUS,
    )
    from gpu_image_processing_tpu.runtime.dispatch import _rows_optimized

    def names(fn):
        return fn.__code__.co_names + tuple(
            c.cell_contents.__name__ for c in (fn.__closure__ or ())
            if callable(getattr(c, "cell_contents", None))
            and hasattr(c.cell_contents, "__name__"))

    for lvl in (2, 4):
        hot = _rows_optimized("box", lvl, BOX_MXU_MIN_RADIUS, 64, 96, 3)
        assert "box_mxu_rows" in names(hot), f"level {lvl}"
        cold = _rows_optimized("box", lvl, BOX_MXU_MIN_RADIUS - 1, 64, 96, 3)
        assert "box_mxu_rows" not in names(cold), f"level {lvl}"


@pytest.mark.parametrize("g_block", [128, 256])
def test_mxu_gblock_gate(rng, g_block):
    """Non-default horizontal matmul block sizes hold the ADVANCED-tier
    maxdiff<=1 gate (the default _G is covered by the MXU tests above)."""
    from gpu_image_processing_tpu.ops.pallas import blur_mxu as M

    img = make_image(rng, 40, 50, 3)
    rows = img.reshape(40, 150)
    w = gaussian_kernel_f32(5, 2.5)
    got = np.asarray(jax.jit(lambda x, ww: M._gaussian_mxu(
        x[None], ww, 5, tap_stride=3, interpret=True,
        g_block=g_block)[0])(rows, w))
    want = oracle.gaussian_blur(img, w, 5).reshape(40, 150)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


# ---------------------------------------------------------------------------
# Host-side pre-pad mode (VERDICT r4 item 1): the device program receives
# the FULLY padded buffer (host_prepad_planar / host_prepad_rows built on
# the host next to the untimed H2D) and emits NO pad op.  Bit-equality
# with the in-program-pad path is the whole contract.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", SHAPES)
def test_gaussian_host_prepad_planar_bit_equal(rng, shape):
    from gpu_image_processing_tpu.ops.pallas.blur import (
        _separable_blur_planar, host_prepad_planar)

    img = make_image(rng, *shape)
    w = gaussian_kernel_f32(3, 2.0)
    ref = np.asarray(_gauss(jax.numpy.asarray(img), jax.numpy.asarray(w), 3))
    planar = np.ascontiguousarray(img.transpose(2, 0, 1))
    xp = host_prepad_planar(planar, 3, box_mode=False)
    out = _separable_blur_planar(
        jax.numpy.asarray(xp), jax.numpy.asarray(w), 3, box_mode=False,
        interpret=True, host_prepadded=(shape[0], shape[1]))
    np.testing.assert_array_equal(
        np.transpose(np.asarray(out), (1, 2, 0)), ref)


@pytest.mark.parametrize("radius,box", [(3, False), (5, True), (8, True)])
def test_host_prepad_rows_bit_equal(rng, radius, box):
    from gpu_image_processing_tpu.ops.pallas.blur import (
        box_pallas_rows, gaussian_pallas_rows, host_prepad_rows)

    h, w_, c = 37, 53, 3
    img = make_image(rng, h, w_, c)
    rows = img.reshape(h, w_ * c)
    xr = host_prepad_rows(rows, radius, c, box_mode=box)
    if box:
        ref = box_pallas_rows(jax.numpy.asarray(rows), radius, c,
                              interpret=True)
        out = box_pallas_rows(jax.numpy.asarray(xr), radius, c,
                              interpret=True,
                              host_prepadded=(h, w_ * c))
    else:
        wts = jax.numpy.asarray(gaussian_kernel_f32(radius, 2.0))
        ref = gaussian_pallas_rows(jax.numpy.asarray(rows), wts, radius, c,
                                   interpret=True)
        out = gaussian_pallas_rows(jax.numpy.asarray(xr), wts, radius, c,
                                   interpret=True,
                                   host_prepadded=(h, w_ * c))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_host_prepad_shape_validation(rng):
    from gpu_image_processing_tpu.ops.pallas.blur import (
        gaussian_pallas_rows, host_prepad_rows)

    img = make_image(rng, 20, 24, 3)
    rows = img.reshape(20, 72)
    xr = host_prepad_rows(rows, 3, 3, box_mode=False)
    wts = jax.numpy.asarray(gaussian_kernel_f32(3, 2.0))
    with pytest.raises(ValueError, match="host_prepadded buffer"):
        gaussian_pallas_rows(jax.numpy.asarray(xr[:, :-1]), wts, 3, 3,
                             interpret=True, host_prepadded=(20, 72))


@pytest.mark.parametrize("level", [1, 2])
def test_sobel_host_prepad_rows_bit_equal(rng, level):
    from gpu_image_processing_tpu.ops.pallas.sobel import (
        host_prepad_rows as sobel_prepad_rows, sobel_pallas_rows)

    h, w_, c = 41, 47, 3
    img = make_image(rng, h, w_, c)
    rows = img.reshape(h, w_ * c)
    ref = sobel_pallas_rows(jax.numpy.asarray(rows), w_, c, level=level,
                            interpret=True)
    xr = sobel_prepad_rows(rows)
    out = sobel_pallas_rows(jax.numpy.asarray(xr), w_, c, level=level,
                            interpret=True, host_prepadded=(h, w_ * c))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("level", [1, 2])
def test_sobel_mxu_host_prepad_rows_bit_equal(rng, level):
    from gpu_image_processing_tpu.ops.pallas.sobel_mxu import (
        host_prepad_rows_mxu, sobel_mxu_rows)

    h, w_, c = 33, 40, 3
    img = make_image(rng, h, w_, c)
    rows = img.reshape(h, w_ * c)
    ref = sobel_mxu_rows(jax.numpy.asarray(rows), w_, c, interpret=True,
                         level=level)
    xr = host_prepad_rows_mxu(rows, w_, c)
    out = sobel_mxu_rows(jax.numpy.asarray(xr), w_, c, interpret=True,
                         level=level, host_prepadded=(h, w_ * c))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("level", [1, 2])
def test_sobel_host_prepad_planar_bit_equal(rng, level):
    from gpu_image_processing_tpu.ops.pallas.sobel import (
        host_prepad_planar as sobel_prepad_planar, sobel_pallas)

    h, w_, c = 29, 37, 3
    img = make_image(rng, h, w_, c)
    ref = sobel_pallas(jax.numpy.asarray(img), level=level, interpret=True)
    xp = sobel_prepad_planar(img)
    out = sobel_pallas(jax.numpy.asarray(xp), level=level, interpret=True,
                       host_prepadded=(h, w_, c))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("box", [False, True])
def test_mxu_host_prepad_rows_bit_equal(rng, box):
    from gpu_image_processing_tpu.ops.pallas.blur_mxu import (
        box_mxu_rows, gaussian_mxu_rows, host_prepad_mxu)

    h, w_, c, r = 35, 49, 3, 5
    img = make_image(rng, h, w_, c)
    rows = img.reshape(h, w_ * c)
    xr = host_prepad_mxu(rows, r, c)
    if box:
        ref = box_mxu_rows(jax.numpy.asarray(rows), r, c, interpret=True)
        out = box_mxu_rows(jax.numpy.asarray(xr), r, c, interpret=True,
                           host_prepadded=(h, w_ * c))
    else:
        wts = jax.numpy.asarray(gaussian_kernel_f32(r, 2.0))
        ref = gaussian_mxu_rows(jax.numpy.asarray(rows), wts, r, c,
                                interpret=True)
        out = gaussian_mxu_rows(jax.numpy.asarray(xr), wts, r, c,
                                interpret=True, host_prepadded=(h, w_ * c))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
