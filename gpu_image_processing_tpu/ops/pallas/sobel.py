"""Sobel edge detection as a Pallas TPU kernel.

The reference's level-2 kernel stages a grayscale tile (+1px halo) in shared
memory with 8 separate halo-load branches (sobelEdgeDetectionShared,
image_filters.cu:1329-1522).  On TPU the grayscale plane is produced once by
XLA (fused conversion, quantized to uint8 exactly like the tile load at
:1444), and each grid step DMAs a (tile_rows + 2) row band into VMEM; the
3x3 gradients are shifted-slice arithmetic on the VPU.

Numerics: gx/gy tap order as in :1555-1579, magnitude min(sqrt, 255) and
floor(+0.5) as in :1582-1584, 1-pixel border zeroed (:1532-1543).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import TPU
from ..ref import grayscale_f32
from ..rounding import quantize_u8_f32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sobel_kernel(in_ref, out_ref, tile_u8, sem, *, tile_rows: int,
                  copy_rows: int, height: int, width: int, w_out: int):
    """in_ref: (Hp+pad, Wp) u8 gray in HBM; out_ref: (TH, Wo) u8 block.
    copy_rows = TH+2 rounded up to the 8-row sublane tiling (Mosaic DMA
    alignment); surplus rows are edge padding the gradients never read."""
    i = pl.program_id(0)

    copy = pltpu.make_async_copy(
        in_ref.at[pl.ds(i * tile_rows, copy_rows), :], tile_u8, sem
    )
    copy.start()
    copy.wait()

    # u8 -> f32 via i32: Mosaic has no direct unsigned->float cast.
    g = tile_u8[:].astype(jnp.int32).astype(jnp.float32)    # (TH+2, Wp)

    def tap(dy: int, dx: int) -> jnp.ndarray:
        return g[dy : dy + tile_rows, 1 + dx : 1 + dx + w_out]

    one, two = jnp.float32(1.0), jnp.float32(2.0)
    gx = (
        (-one) * tap(0, -1) + one * tap(0, 1)
        + (-two) * tap(1, -1) + two * tap(1, 1)
        + (-one) * tap(2, -1) + one * tap(2, 1)
    )
    gy = (
        (-one) * tap(0, -1) + (-two) * tap(0, 0) + (-one) * tap(0, 1)
        + one * tap(2, -1) + two * tap(2, 0) + one * tap(2, 1)
    )
    mag = jnp.minimum(jnp.sqrt(gx * gx + gy * gy), jnp.float32(255.0))
    out = jnp.floor(mag + jnp.float32(0.5))

    # Zero the global 1-pixel border (image_filters.cu:1532-1543).
    grow = i * tile_rows + jax.lax.broadcasted_iota(jnp.int32, (tile_rows, w_out), 0)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, w_out), 1)
    inside = (grow >= 1) & (grow <= height - 2) & (gcol >= 1) & (gcol <= width - 2)
    out_ref[:] = jnp.where(inside, out, 0.0).astype(jnp.int32).astype(jnp.uint8)


def sobel_pallas(img_hwc: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(H, W, C) u8 -> (H, W, C) u8 edge map (level-2 numerics)."""
    height, width, channels = img_hwc.shape
    # Grayscale conversion + uint8 quantization, fused by XLA (the analog of
    # the tile-load conversion at image_filters.cu:1436-1444).
    gray = quantize_u8_f32(grayscale_f32(img_hwc)).astype(jnp.uint8)

    tile_rows = min(TPU.sobel_tile_rows, _round_up(height, 8))
    hp = _round_up(height, tile_rows)
    wp = _round_up(width + 2, 128)
    w_out = wp - 2
    n_tiles = hp // tile_rows
    copy_rows = _round_up(tile_rows + 2, 8)

    bottom = 1 + (hp - height) + (copy_rows - tile_rows - 2)
    g = jnp.pad(gray, ((1, bottom), (1, wp - width - 1)), mode="edge")

    out = pl.pallas_call(
        functools.partial(
            _sobel_kernel,
            tile_rows=tile_rows,
            copy_rows=copy_rows,
            height=height,
            width=width,
            w_out=w_out,
        ),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile_rows, w_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, w_out), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((copy_rows, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(g)

    edge = out[:height, :width]
    return jnp.broadcast_to(edge[..., None], (height, width, channels))
