"""Sobel edge detection as a fully fused Pallas TPU kernel.

The reference's level-2 kernel stages a grayscale tile (+1px halo) in shared
memory with 8 separate halo-load branches, converting RGB->gray (quantized
to uint8) during the load (sobelEdgeDetectionShared,
image_filters.cu:1329-1522).  Here EVERYTHING fuses into one kernel: each
grid step DMAs a (C, tile_rows+2, Wp) planar uint8 row band into VMEM,
computes the quantized gray tile in-register (same f32 op order as the
tile load at :1436-1444), applies the 3x3 gradients on the VPU, and writes
the edge value to every channel plane of the output block
(:1311-1313 -- alpha included).

The pipeline is deliberately shaped exactly like the fused blur: one
uint8 planar transpose in, one out, a single kernel in between.

Lane geometry follows the blur kernels' landed-DMA scheme
(ops/pallas/blur.py): the input is padded with a single register-aligned
jnp.pad (_LAND junk lanes left -- a 1-lane shift pad measured ~0.15 ms of
pure cross-lane relayout), data lands at lane _LAND, and taps read from
_LAND-1.  Sobel needs NO in-kernel edge fill: its halo is exactly the
1-pixel global border, which is zeroed in the output anyway
(image_filters.cu:1532-1543), so the pad's lane-replication junk only ever
feeds masked-off pixels.

Numerics: gx/gy tap order as in :1555-1579, magnitude min(sqrt, 255) and
floor(+0.5) as in :1582-1584, 1-pixel global border zeroed (:1532-1543).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import TPU
from .blur import _LAND

# Right lane overhang past the column block: the gray pass reads x[l+2]
# and the taps reach one pixel past the block -- at most C+2 <= 6 lanes.
# One full 128-lane register keeps w_t register-aligned.  (The left side
# reuses blur's _LAND landing offset; sobel's 1-pixel halo never needs a
# larger landing.)
_OVERHANG = 128


from .blur import _round_up  # noqa: E402  (one definition, blur.py)


# Scoped-VMEM budget: shared with the blur kernels (see the rationale at
# ops/pallas/blur.py::_VMEM_SCOPE_BYTES; bigger tiles measured faster on
# the v5e -- fewer DMA round-trips per image).
from .blur import _VMEM_SCOPE_BYTES  # noqa: E402


def _pick_tile_rows(requested: int, wp: int) -> int:
    """Cap tile rows so the VMEM working set fits for any width: C uint8
    planes + several live f32 tiles (gray, gx, gy, magnitude) cost ~30
    bytes per (row x Wp lane)."""
    budget = 40 * 1024 * 1024
    tile = max(int(budget / (wp * 30.0)) - 2, 8)
    tile = max((tile // 8) * 8, 8)
    return min(requested, tile)


def _edge_tile(tile_u8, gbuf, i, *, channels: int, level: int, tile_rows: int,
               height: int, width: int, w_out: int, zero_rows: bool = True):
    """Compute the (TH, Wo) uint8 edge tile from a (C, CR, W_T) uint8 tile
    whose data lanes start at _LAND.

    gbuf: (CR, W_T) f32 scratch holding the gray plane -- accumulated through
    the ref so Mosaic doesn't keep all three channel casts live at once.
    """
    # u8 -> f32 via i32 (Mosaic lacks a direct unsigned->float cast).
    if channels == 1:
        gbuf[:, :] = tile_u8[0].astype(jnp.int32).astype(jnp.float32)
    else:
        # Rec.601 in the exact f32 order (image_filters.cu:1443).
        gbuf[:, :] = jnp.float32(0.299) * tile_u8[0].astype(jnp.int32).astype(jnp.float32)
        gbuf[:, :] = gbuf[:, :] + jnp.float32(0.587) * tile_u8[1].astype(
            jnp.int32).astype(jnp.float32)
        gbuf[:, :] = gbuf[:, :] + jnp.float32(0.114) * tile_u8[2].astype(
            jnp.int32).astype(jnp.float32)
        if level == 2:
            # Level 2 quantizes gray to uint8 during the tile load (:1444).
            gbuf[:, :] = jnp.floor(gbuf[:, :] + jnp.float32(0.5))
    g = gbuf[:, :]

    def tap(dy: int, dx: int) -> jnp.ndarray:
        return g[dy : dy + tile_rows, _LAND + dx : _LAND + dx + w_out]

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
    gcol = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, w_out), 1)
    inside = (gcol >= 1) & (gcol <= width - 2)
    if zero_rows:
        # zero_rows=False: the caller zeroes global border rows itself
        # (sharded execution, where the global row index depends on the
        # shard position).
        grow = i * tile_rows + jax.lax.broadcasted_iota(
            jnp.int32, (tile_rows, w_out), 0
        )
        inside = inside & (grow >= 1) & (grow <= height - 2)
    return jnp.where(inside, out, 0.0).astype(jnp.int32).astype(jnp.uint8)


def _sobel_kernel(in_ref, out_ref, tile_u8, gbuf, sem, *, channels: int,
                  level: int, tile_rows: int, copy_rows: int, height: int,
                  width: int, w_out: int):
    """in_ref: (C, Hp+pad, W_T) u8 planar in HBM; out_ref: (C, TH, Wo) block.

    copy_rows = TH+2 rounded up to the 8-row sublane tiling (Mosaic DMA
    alignment); surplus rows are edge padding the gradients never read.
    """
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        in_ref.at[:, pl.ds(i * tile_rows, copy_rows), :], tile_u8, sem
    )
    copy.start()
    copy.wait()
    edge = _edge_tile(tile_u8, gbuf, i, channels=channels, level=level,
                      tile_rows=tile_rows, height=height, width=width,
                      w_out=w_out)
    # Same edge value into every channel plane, alpha included (:1311-1313).
    for c in range(channels):
        out_ref[c] = edge


def _sobel_kernel_batch(in_ref, out_ref, tile_u8, gbuf, sem, *, channels: int,
                        level: int, tile_rows: int, copy_rows: int,
                        height: int, width: int, w_out: int,
                        zero_rows: bool = True):
    """Batched: in_ref (B, C, Hp+pad, W_T); out block (1, C, TH, Wo)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(
        in_ref.at[b, :, pl.ds(i * tile_rows, copy_rows), :], tile_u8, sem
    )
    copy.start()
    copy.wait()
    edge = _edge_tile(tile_u8, gbuf, i, channels=channels, level=level,
                      tile_rows=tile_rows, height=height, width=width,
                      w_out=w_out, zero_rows=zero_rows)
    for c in range(channels):
        out_ref[0, c] = edge


def _sobel_kernel_interleaved(in_ref, out_ref, tile_u8, gbuf, mbuf,
                              sem, *, channels: int, level: int,
                              tile_rows: int, copy_rows: int, height: int,
                              width: int, w_out: int):
    """Interleaved-HWC Sobel: in_ref (N, Hp+pad, W_T) u8 rows in HBM, data
    lanes [_LAND, _LAND + W*C).

    Gray is computed at EVERY lane (g[k] = .299*x[k] + .587*x[k+1] +
    .114*x[k+2] over tile lanes starting at _LAND - C): at pixel-phase
    positions it equals gray(pixel), elsewhere it is phase-garbage that the
    channel-replication masks never select.  Pixel-shift taps become C-lane
    shifts, so the whole filter stays in contiguous full-width vector ops --
    no deinterleave gathers.  ~3x the planar kernel's VPU work (every lane
    computes), but it consumes the serving boundary's interleaved row
    layout for free, where materializing a planar image costs a 16 ms
    relayout (ops/pallas/blur.py).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(
        in_ref.at[b, pl.ds(i * tile_rows, copy_rows), :], tile_u8, sem
    )
    copy.start()
    copy.wait()

    base = _LAND - channels   # gray index k <-> data lane k - C
    wg = gbuf.shape[1]        # = w_out + 2C: taps reach G[2C + w_out - 1]
    if channels == 1:
        gbuf[:, :] = tile_u8[:, base : base + wg].astype(
            jnp.int32).astype(jnp.float32)
    else:
        # Rec.601 at every lane, exact f32 order (image_filters.cu:1443).
        gbuf[:, :] = jnp.float32(0.299) * tile_u8[:, base : base + wg].astype(
            jnp.int32).astype(jnp.float32)
        gbuf[:, :] = gbuf[:, :] + jnp.float32(0.587) * tile_u8[
            :, base + 1 : base + wg + 1].astype(jnp.int32).astype(jnp.float32)
        gbuf[:, :] = gbuf[:, :] + jnp.float32(0.114) * tile_u8[
            :, base + 2 : base + wg + 2].astype(jnp.int32).astype(jnp.float32)
    if level == 2:
        # Level 2 quantizes gray to uint8 during the tile load (:1444).
        gbuf[:, :] = jnp.floor(gbuf[:, :] + jnp.float32(0.5))
    g = gbuf[:, :]

    def tap(dy: int, dx: int) -> jnp.ndarray:
        c0 = (1 + dx) * channels
        return g[dy : dy + tile_rows, c0 : c0 + w_out]

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
    mbuf[:, channels:] = jnp.floor(mag + jnp.float32(0.5))
    mbuf[:, :channels] = jnp.zeros((tile_rows, channels), jnp.float32)

    # Zero the global 1-pixel border; lane l belongs to pixel l // C.
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, w_out), 1)
    pix = lane // channels
    grow = i * tile_rows + jax.lax.broadcasted_iota(
        jnp.int32, (tile_rows, w_out), 0
    )
    inside = (
        (pix >= 1) & (pix <= width - 2) & (grow >= 1) & (grow <= height - 2)
    )

    if channels == 1:
        out = jnp.where(inside, mbuf[:, channels:], 0.0)
    else:
        # Replicate each pixel's magnitude to all its channel lanes:
        # out[l] = M[l - l%C], built from C masked shifted slices.
        phase = lane - pix * channels
        out = jnp.zeros((tile_rows, w_out), jnp.float32)
        for j in range(channels):
            shifted = mbuf[:, channels - j : channels - j + w_out]
            out = out + jnp.where((phase == j) & inside, shifted, 0.0)
    out_ref[0] = out.astype(jnp.int32).astype(jnp.uint8)


# Interleaved tiles use the same ~30 B/(row x lane) VMEM model as planar
# (u8 tile + gray/gx/gy/magnitude f32 temporaries); one budget function so a
# retune cannot silently split the two tiers.
_pick_tile_rows_interleaved = _pick_tile_rows


def _rows_plan(height: int, wf: int):
    """(cs, w_t, tile_rows, n_tiles, copy_rows, total_rows) for the
    interleaved rows tier -- single source for the kernel builder and the
    host-side pre-pad (the host buffer must match the in-program pad
    byte-for-byte)."""
    cs = _round_up(wf, 128)        # output lanes; junk >= wf sliced off
    w_t = _LAND + cs + _OVERHANG         # gray reads up to _LAND + cs + C + 1
    tile_rows = min(
        _pick_tile_rows_interleaved(TPU.sobel_tile_rows, w_t),
        _round_up(height, 8),
    )
    hp = _round_up(height, tile_rows)
    n_tiles = hp // tile_rows
    copy_rows = _round_up(tile_rows + 2, 8)
    total_rows = hp - tile_rows + copy_rows
    return cs, w_t, tile_rows, n_tiles, copy_rows, total_rows


def host_prepad_rows(rows_u8, wf: int | None = None):
    """(H, W*C) or (B, H, W*C) uint8 numpy -> the fully padded buffer the
    rows kernel consumes (host-side analog of its single constant pad:
    zeros everywhere except the image block at [1:1+H, _LAND:_LAND+wf]).
    Pass with ``host_prepadded=(H, W*C)`` to delete the in-program pad op
    (~25% of the served sobel's traced time, benchmarks/sol_report.json).
    """

    rows = rows_u8 if rows_u8.ndim == 3 else rows_u8[None]
    b, height, wf_ = rows.shape
    wf = wf or wf_
    _cs, w_t, _tr, _nt, _cr, total_rows = _rows_plan(height, wf)
    from .blur import _host_pad_buffer

    out = _host_pad_buffer(rows, total_rows, w_t, 1, _LAND,
                           edge_lanes=False)
    return out if rows_u8.ndim == 3 else out[0]


def sobel_pallas_rows_batch(
    rows_u8: jnp.ndarray,     # (B, H, W*C) uint8, interleaved rows
    width: int, channels: int,
    level: int = 2, interpret: bool = False,
    host_prepadded: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Serving-path Sobel on interleaved rows; returns (B, H, W*C).

    host_prepadded=(H, WF): input is the fully padded (B, total_rows,
    w_t) buffer from `host_prepad_rows`; no in-program pad op."""
    if host_prepadded is not None:
        b = rows_u8.shape[0]
        height, wf = host_prepadded
    else:
        b, height, wf = rows_u8.shape

    cs, w_t, tile_rows, n_tiles, copy_rows, total_rows = _rows_plan(
        height, wf)

    # Single register-aligned CONSTANT pad: every pad element only feeds
    # border pixels the kernel zeroes or junk lanes/rows the masked store
    # drops, so no replication content is needed at all -- and the
    # edge-mode row pad lowered to a 0.19 ms XLA concatenate on the served
    # README trace (benchmarks/trace_tier_r02.jsonl) while a constant pad
    # is a single cheap fusion.  In host_prepadded mode the buffer arrives
    # already padded and no pad op is emitted at all.
    if host_prepadded is not None:
        if rows_u8.shape != (b, total_rows, w_t):
            raise ValueError(
                f"host_prepadded buffer is {rows_u8.shape}, expected "
                f"{(b, total_rows, w_t)} -- rebuild with host_prepad_rows")
        x = rows_u8
    else:
        x = jnp.pad(
            rows_u8,
            ((0, 0), (1, total_rows - height - 1),
             (_LAND, w_t - _LAND - wf)),
        )

    out = pl.pallas_call(
        functools.partial(
            _sobel_kernel_interleaved,
            channels=channels,
            level=level,
            tile_rows=tile_rows,
            copy_rows=copy_rows,
            height=height,
            width=width,
            w_out=cs,
        ),
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_rows, cs), lambda bb, i: (bb, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, height, wf), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((copy_rows, w_t), jnp.uint8),
            pltpu.VMEM((copy_rows, cs + 2 * channels), jnp.float32),
            pltpu.VMEM((tile_rows, channels + cs), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_SCOPE_BYTES),
        interpret=interpret,
    )(x)

    # Exact out_shape: partial tile stores are masked; no epilogue slice.
    return out


def sobel_pallas_rows(
    rows_u8: jnp.ndarray, width: int, channels: int,
    level: int = 2, interpret: bool = False,
    host_prepadded: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """(H, W*C) interleaved uint8 rows -> same, edge map (serving path)."""
    return sobel_pallas_rows_batch(
        rows_u8[None], width, channels, level=level, interpret=interpret,
        host_prepadded=host_prepadded)[0]


def sobel_pallas_flat_batch(
    flats_u8: jnp.ndarray,    # (B, H*W*C) uint8, HWC byte order
    height: int, width: int, channels: int,
    level: int = 2, interpret: bool = False,
) -> jnp.ndarray:
    """Flat (B, H*W*C) compat wrapper; prefer sobel_pallas_rows_batch (the
    1D<->2D reshapes are device relayouts, not free)."""
    b = flats_u8.shape[0]
    return sobel_pallas_rows_batch(
        flats_u8.reshape(b, height, width * channels), width, channels,
        level=level, interpret=interpret).reshape(b, -1)


def sobel_pallas_flat(
    flat_u8: jnp.ndarray, height: int, width: int, channels: int,
    level: int = 2, interpret: bool = False,
) -> jnp.ndarray:
    """Flat (H*W*C,) compat wrapper; prefer sobel_pallas_rows."""
    return sobel_pallas_rows(
        flat_u8.reshape(height, width * channels), width, channels,
        level=level, interpret=interpret).reshape(-1)


def sobel_pallas_batch(imgs_bhwc: jnp.ndarray, level: int = 2,
                       interpret: bool = False,
                       rows_prepadded: bool = False,
                       zero_rows: bool = True) -> jnp.ndarray:
    """(B, H, W, C) u8 -> u8 batched fused Sobel (no vmap -- the batch is a
    kernel grid dimension, since Pallas ANY-space operands can't be vmapped
    on TPU).

    rows_prepadded=True: input is (B, H+2, W, C) with one valid row above
    and below (halo rows from neighbor shards); zero_rows=False defers
    global border-row zeroing to the caller.
    """
    b, height, width, channels = imgs_bhwc.shape
    if rows_prepadded:
        height -= 2
    planar = jnp.transpose(imgs_bhwc, (0, 3, 1, 2))

    cs = _round_up(width, 128)
    w_t = _LAND + cs + _OVERHANG
    tile_rows = min(_pick_tile_rows(TPU.sobel_tile_rows, w_t),
                    _round_up(height, 8))
    hp = _round_up(height, tile_rows)
    n_tiles = hp // tile_rows
    copy_rows = _round_up(tile_rows + 2, 8)

    # DMA for tile i reads rows [i*TH, i*TH+CR); pad to hp - TH + CR rows:
    # [1 top halo][height rows][1 bottom halo][alignment junk].  Planar
    # edge-lane replication IS edge-pixel replication, so the lane pad is
    # also the correct clamp content.
    total_rows = hp - tile_rows + copy_rows
    if rows_prepadded:
        x = jnp.pad(
            planar,
            ((0, 0), (0, 0), (0, total_rows - height - 2),
             (_LAND, w_t - _LAND - width)),
            mode="edge",
        )
    else:
        # Constant pad: pad content only feeds zeroed border pixels or
        # masked junk (see the rows wrapper).
        x = jnp.pad(
            planar,
            ((0, 0), (0, 0), (1, total_rows - height - 1),
             (_LAND, w_t - _LAND - width)),
        )

    out = pl.pallas_call(
        functools.partial(
            _sobel_kernel_batch,
            channels=channels,
            level=level,
            tile_rows=tile_rows,
            copy_rows=copy_rows,
            height=height,
            width=width,
            w_out=cs,
            zero_rows=zero_rows,
        ),
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, channels, tile_rows, cs), lambda bb, i: (bb, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, channels, height, width), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((channels, copy_rows, w_t), jnp.uint8),
            pltpu.VMEM((copy_rows, w_t), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_SCOPE_BYTES),
        interpret=interpret,
    )(x)

    return jnp.transpose(out, (0, 2, 3, 1))


def _planar_plan(height: int, width: int):
    """(cs, w_t, tile_rows, n_tiles, copy_rows, total_rows) for the planar
    kernel; shared by the builder and host_prepad_planar."""
    cs = _round_up(width, 128)
    w_t = _LAND + cs + _OVERHANG
    tile_rows = min(_pick_tile_rows(TPU.sobel_tile_rows, w_t),
                    _round_up(height, 8))
    hp = _round_up(height, tile_rows)
    n_tiles = hp // tile_rows
    copy_rows = _round_up(tile_rows + 2, 8)
    total_rows = hp - tile_rows + copy_rows
    return cs, w_t, tile_rows, n_tiles, copy_rows, total_rows


def host_prepad_planar(img_hwc):
    """(H, W, C) uint8 numpy -> the fully padded (C, total_rows, w_t)
    planar buffer `sobel_pallas(host_prepadded=...)` consumes: the
    HWC->planar transpose AND the constant pad move to the host, next to
    the untimed H2D."""

    height, width, channels = img_hwc.shape
    _cs, w_t, _tr, _nt, _cr, total_rows = _planar_plan(height, width)
    from .blur import _host_pad_buffer

    return _host_pad_buffer(img_hwc.transpose(2, 0, 1), total_rows, w_t, 1,
                            _LAND, edge_lanes=False)


def sobel_pallas(img_hwc: jnp.ndarray, level: int = 2,
                 interpret: bool = False,
                 host_prepadded: tuple[int, int, int] | None = None,
                 ) -> jnp.ndarray:
    """(H, W, C) u8 -> (H, W, C) u8 edge map.

    level=2 reproduces the shared-memory kernel's uint8 gray quantization;
    level=1 keeps gray in f32 (sobelEdgeDetectionNaive numerics) -- the same
    fused kernel serves both tiers.

    host_prepadded=(H, W, C): input is the (C, total_rows, w_t) buffer
    from `host_prepad_planar`; no in-program transpose or pad ops.
    """
    if host_prepadded is not None:
        height, width, channels = host_prepadded
    else:
        height, width, channels = img_hwc.shape

    cs, w_t, tile_rows, n_tiles, copy_rows, total_rows = _planar_plan(
        height, width)

    if host_prepadded is not None:
        if img_hwc.shape != (channels, total_rows, w_t):
            raise ValueError(
                f"host_prepadded buffer is {img_hwc.shape}, expected "
                f"{(channels, total_rows, w_t)} -- rebuild with "
                "host_prepad_planar")
        x = img_hwc
    else:
        planar = jnp.transpose(img_hwc, (2, 0, 1))
        # Constant pad: content only feeds zeroed border / masked junk.
        x = jnp.pad(planar, ((0, 0), (1, total_rows - height - 1),
                             (_LAND, w_t - _LAND - width)))

    out = pl.pallas_call(
        functools.partial(
            _sobel_kernel,
            channels=channels,
            level=level,
            tile_rows=tile_rows,
            copy_rows=copy_rows,
            height=height,
            width=width,
            w_out=cs,
        ),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (channels, tile_rows, cs), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((channels, height, width), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((channels, copy_rows, w_t), jnp.uint8),
            pltpu.VMEM((copy_rows, w_t), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_SCOPE_BYTES),
        interpret=interpret,
    )(x)

    return jnp.transpose(out, (1, 2, 0))
