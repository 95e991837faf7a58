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
