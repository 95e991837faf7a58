"""Fused separable blur as a single Pallas TPU kernel.

The reference needs two kernel launches per blur with the intermediate
round-tripping through HBM-global memory (gaussianBlur launches
horizontal+vertical, image_filters.cu:811-875; boxBlur likewise with
shared-memory tiles, :1053-1069).  On TPU both passes fuse into ONE kernel:

* each grid step DMAs a (tile_rows + 2r) x W_T uint8 row band from HBM into
  VMEM (the halo-load analog of the cooperative shared-memory loads,
  image_filters.cu:489-513, but explicit and asynchronous);
* the horizontal pass, the uint8 re-quantization of the intermediate
  (bit-matching the reference's uint8 temp buffer, :761), and the vertical
  pass all happen in VMEM;
* weights sit in SMEM -- the constant-memory analog (image_filters.cu:13);
* only the final uint8 rows are written back.

HBM traffic is therefore ~2x the u8 image instead of ~4x f32, and there is
no second kernel launch.

Lane geometry -- the "landed DMA" scheme.  Clamp-to-edge lane halos are NOT
built in XLA: replicating edge pixels with tile/concatenate shifts every
lane of the image by the halo offset, and that relayout alone measured
1.23 ms on the README interleaved workload -- 2.8x the 0.44 ms kernel it
fed (scripts/exp_interleaved.py, 2026-08-16; the long-suspected C-strided
tap shifts measured irrelevant: a stride-1 control was equally slow).
Instead the input is padded with a single register-aligned jnp.pad (128
junk lanes left, alignment junk right, clamped rows), each tile lands at
lane offset 128 in VMEM, taps read from base = 128 - halo, and the halo
lanes themselves are filled IN-KERNEL by log-doubling copies of the edge
pixel.  For planar input (tap_stride == 1) the jnp.pad edge mode already
lands the correct pixel value in the halo lanes, so no fill is emitted.

Numerics per pass:
  gaussian: sum_t pixel*w[t]  -> floor(x+0.5)      (image_filters.cu:98,102)
  box:      (sum_t pixel)*inv -> floor(x+0.5)      (image_filters.cu:390-394)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_image_processing_tpu.core.config import TPU
from gpu_image_processing_tpu.ops.weights import box_inv_taps_f32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Per-kernel VMEM working-set budget (bytes).  The hard limit is 16 MB;
# leave room for Mosaic's own double-buffered output blocks.
_VMEM_BUDGET = 10 * 1024 * 1024

# Column-chunk width (output lanes, 128-multiple) used when a full-width
# tile would not fit VMEM (blur_kernel_fits_vmem).  Must be a multiple of
# 128 so column DMA starts stay register-aligned.
_COL_CHUNK = 1536

# Landing lane offset: tiles land at this (register-aligned) offset so the
# lanes below it can hold the in-kernel clamp-to-edge halo.  Must exceed
# the largest halo = max_radius * max_channels = 31 * 4 = 124.
_LAND = 128


def _pick_tile_rows(requested: int, wt: int, radius: int,
                    doubling: bool = False) -> int:
    """Cap tile rows so the kernel's VMEM working set fits for any width.

    Live buffers per grid step: tile u8 (CRxW_T), xbuf f32 (CRxW_T), hbuf
    f32 (CRxcs), vbuf f32 (THxcs) plus the double-buffered u8 output block
    -- roughly 13.5 bytes per (row x W_T lane); +4 for the doubling-sum
    ping-pong buffer.  A 3.3k-wide image supports ~190 copy rows; an
    8k-wide image only ~90.
    """
    bytes_per_row = wt * (17.5 if doubling else 13.5)
    max_copy_rows = max(int(_VMEM_BUDGET / bytes_per_row), 8)
    tile = max_copy_rows - 2 * radius
    tile = max((tile // 8) * 8, 8)
    return min(requested, tile)


def _quant(x: jnp.ndarray) -> jnp.ndarray:
    """floor(x + 0.5) staying in f32 (values are within [0, 255.6])."""
    return jnp.floor(x + jnp.float32(0.5))


def blur_kernel_fits_vmem(width: int, radius: int, channels: int,
                          box_mode: bool, interleaved: bool) -> bool:
    """Whether the fused blur kernel's working set fits VMEM at the MINIMUM
    tile height.  At extreme width x radius combinations (e.g. 8K rows with
    radius 15: 28k lanes, 30 halo rows) even an 8-row tile exceeds the
    16 MB budget -- callers must route such shapes to the XLA tier, whose
    own tiling is unconstrained.  Accounting matches the kernel's scratch
    list; measured overhead (Mosaic stack + DMA machinery) is ~1.7 MB.
    """
    dw = width * (channels if interleaved else 1)
    cs = _round_up(dw, 128)
    wt = cs + 2 * _LAND
    tile = 8
    copy_rows = _round_up(tile + 2 * radius, 8)
    total = (
        copy_rows * wt * 1          # tile_u8
        + copy_rows * wt * 4        # xbuf
        + copy_rows * cs * 4        # hbuf
        + tile * cs * 4             # vbuf
        + 2 * tile * cs * 1         # double-buffered output block
    )
    if _use_doubling(box_mode, radius):
        total += copy_rows * wt * 4  # sbuf ping-pong
    return total + 1_800_000 < 16 * 1024 * 1024


def _use_doubling(box_mode: bool, radius: int) -> bool:
    """Box windows with >= 9 taps use doubling sums: ~2*log2+popcount
    full-width adds instead of 2r+1.  Exact -- window sums of uint8 values
    (< 2^24) are exact integers in f32 under ANY association, so the result
    is bit-identical to the sequential CUDA tap order."""
    from gpu_image_processing_tpu.ops.interleaved import BOX_DOUBLING_MIN_RADIUS

    return box_mode and radius >= BOX_DOUBLING_MIN_RADIUS


def _edge_fill(buf, pos: int, group: int, halo: int, left: bool) -> None:
    """Replicate the `group`-lane pixel adjacent to lane `pos` into the
    `halo` lanes beyond it (clamp-to-edge), by log-doubling copies.

    left=True fills [pos-halo, pos) from the pixel at [pos, pos+group);
    left=False fills [pos, pos+halo) from the pixel at [pos-group, pos).
    Copy shifts are always the already-filled width (a multiple of group
    except possibly the final partial step), so the channel phase of the
    replicated pattern is preserved.  All offsets are static.
    """
    if halo <= 0:
        return
    if left:
        buf[:, pos - group : pos] = buf[:, pos : pos + group]
        filled = group
        while filled < halo:
            w = min(filled, halo - filled)
            buf[:, pos - filled - w : pos - filled] = buf[:, pos - w : pos]
            filled += w
    else:
        buf[:, pos : pos + group] = buf[:, pos - group : pos]
        filled = group
        while filled < halo:
            w = min(filled, halo - filled)
            buf[:, pos + filled : pos + filled + w] = buf[:, pos : pos + w]
            filled += w


def _blur_kernel(w_ref, in_ref, out_ref, tile_u8, xbuf, hbuf, vbuf, *rest,
                 radius: int, tile_rows: int, copy_rows: int, w_out: int,
                 box_mode: bool, folded: bool = False, passes: str = "both",
                 tap_stride: int = 1, col_step: int = 0,
                 fill_left: bool = False,
                 right_fills: tuple = ()):
    """One grid step: rows [i*TH, i*TH+TH) of channel c, with halos.

    w_ref:  (1, 2r+1) f32 in SMEM (box: w_ref[0,0] holds 1/(2r+1))
    in_ref: (C, Hp+pad, W_A) u8 in HBM/ANY -- row-padded image, data lanes
            starting at _LAND (no lane-halo content; built in-kernel)
    out_ref:(1, TH, cs) u8 VMEM block      -- output rows
    tile_u8:(CR, W_T) u8 VMEM scratch      -- DMA landing buffer, where
            CR = copy_rows = TH+2r rounded up to the 8-row sublane tiling
            (Mosaic requires 8-aligned DMA slices; surplus rows are junk
            edge padding that the vertical pass never reads).
    xbuf:   (CR, W_T) f32 scratch          -- the tile as f32; halo lanes
            [base, _LAND) and past the data end are edge-filled in-kernel
    hbuf:   (CR, cs) f32 scratch           -- horizontal-pass accumulator
    vbuf:   (TH, cs) f32 scratch           -- vertical-pass accumulator

    fill_left: emit the left clamp-to-edge fill (first column chunk only).
    right_fills: ((chunk_or_None, pos), ...) static right-edge fill sites;
    chunk_or_None=None emits unconditionally (single-column grids).

    Tap accumulation goes THROUGH the scratch refs: with value-chained
    accumulation Mosaic keeps every unrolled tap slice live on the VMEM
    stack at once, which blows the 16 MB budget for large radii (observed
    49 MB at radius 15).  Sequenced ref stores bound liveness to one term
    while keeping the exact CUDA f32 operation order
    (image_filters.cu:86-99).
    """
    if _use_doubling(box_mode, radius):
        sbuf, sem = rest
    else:
        sbuf, (sem,) = None, rest
    c = pl.program_id(0)
    i = pl.program_id(1)
    taps = 2 * radius + 1
    halo = radius * tap_stride
    base = _LAND - halo
    w_t = tile_u8.shape[1]

    if col_step:
        # Column-tiled: this step covers output lanes [j*col_step,
        # (j+1)*col_step) plus the landing/reach overhang; bounds VMEM for
        # arbitrarily wide images.
        j = pl.program_id(2)
        src = in_ref.at[
            c, pl.ds(i * tile_rows, copy_rows),
            pl.ds(j * col_step, w_t),
        ]
    else:
        src = in_ref.at[c, pl.ds(i * tile_rows, copy_rows), :]
    copy = pltpu.make_async_copy(src, tile_u8, sem)
    copy.start()
    copy.wait()

    # u8 -> f32 via i32: Mosaic has no direct unsigned->float cast.
    xbuf[:, :] = tile_u8[:].astype(jnp.int32).astype(jnp.float32)

    # Clamp-to-edge halo lanes, built in VMEM (see module docstring).
    if fill_left:
        if col_step:
            @pl.when(j == 0)
            def _():
                _edge_fill(xbuf, _LAND, tap_stride, halo, left=True)
        else:
            _edge_fill(xbuf, _LAND, tap_stride, halo, left=True)
    for chunk, pos in right_fills:
        fh = min(halo, w_t - pos)
        if chunk is None or not col_step:
            _edge_fill(xbuf, pos, tap_stride, fh, left=False)
        else:
            @pl.when(j == chunk)
            def _(pos=pos, fh=fh):
                _edge_fill(xbuf, pos, tap_stride, fh, left=False)

    def conv(src_ref, acc_ref, take, length):
        """One separable pass: taps in CUDA order, or symmetric-folded.

        `folded` is the ADVANCED tier: kernels are symmetric (gaussian by
        construction, box trivially), so pair taps t and 2r-t to halve the
        multiply count.  The regrouped f32 sum can differ from the strict
        order by 1 ulp -> <=1 after rounding (the reference's own L1<->L2
        gate, tests/test_comparison.cu:204-221).
        """
        if folded:
            for t in range(radius):
                pair = take(src_ref, t, length) + take(src_ref, 2 * radius - t, length)
                term = pair if box_mode else pair * w_ref[0, t]
                if t == 0:
                    acc_ref[:, :] = term
                else:
                    acc_ref[:, :] = acc_ref[:, :] + term
            mid = take(src_ref, radius, length)
            acc_ref[:, :] = acc_ref[:, :] + (
                mid if box_mode else mid * w_ref[0, radius]
            )
        else:
            for t in range(taps):
                sl = take(src_ref, t, length)
                term = sl if box_mode else sl * w_ref[0, t]
                if t == 0:
                    acc_ref[:, :] = term
                else:
                    acc_ref[:, :] = acc_ref[:, :] + term
        if box_mode:
            acc_ref[:, :] = acc_ref[:, :] * w_ref[0, 0]

    def box_cols_doubling(src_ref, tmp_ref, res_ref):
        """Windowed column sum via doubling (see _use_doubling); src is
        clobbered.  Chunks of the binary decomposition of `taps` are taken
        LSB-first at increasing offsets; each doubling halves the remaining
        adds.  ~2*log2(taps) full-width ops instead of taps.  The source
        tile's data starts at `base`; after the first doubling write the
        ping-pong buffers are 0-based."""
        unit = tap_stride
        full = src_ref.shape[1]
        cur, nxt = src_ref, tmp_ref
        cur_base = base
        off = 0
        first = True
        n_bits = taps.bit_length()
        for b in range(n_bits):
            if (taps >> b) & 1:
                sl = cur[:, cur_base + off : cur_base + off + w_out]
                if first:
                    res_ref[:, :] = sl
                    first = False
                else:
                    res_ref[:, :] = res_ref[:, :] + sl
                off += (1 << b) * unit
            if b < n_bits - 1:
                shift = (1 << b) * unit
                width = full - shift - cur_base
                nxt[:, :width] = (
                    cur[:, cur_base : cur_base + width]
                    + cur[:, cur_base + shift : cur_base + shift + width]
                )
                cur, nxt = nxt, cur
                cur_base = 0
        res_ref[:, :] = res_ref[:, :] * w_ref[0, 0]

    def box_rows_doubling(src_ref, tmp_ref, res_ref):
        """Row-axis version; reads/writes column-prefix slices so the wider
        tmp buffer can be shared with the column pass."""
        full = src_ref.shape[0]
        cur, nxt = src_ref, tmp_ref
        off = 0
        first = True
        n_bits = taps.bit_length()
        for b in range(n_bits):
            if (taps >> b) & 1:
                sl = cur[off : off + tile_rows, :w_out]
                if first:
                    res_ref[:, :] = sl
                    first = False
                else:
                    res_ref[:, :] = res_ref[:, :] + sl
                off += 1 << b
            if b < n_bits - 1:
                shift = 1 << b
                height = full - shift
                nxt[:height, :w_out] = (
                    cur[:height, :w_out] + cur[shift : shift + height, :w_out]
                )
                cur, nxt = nxt, cur
        res_ref[:, :] = res_ref[:, :] * w_ref[0, 0]

    # tap_stride > 1 is the interleaved-HWC layout: a horizontal tap at
    # pixel offset t is a lane offset of t*C on the (rows, W*C) tile (all
    # channels shift together; slices stay contiguous).
    take_cols = lambda s, t, n: s[:, base + t * tap_stride : base + t * tap_stride + n]  # noqa: E731
    take_rows = lambda s, t, n: s[t : t + n, :]        # noqa: E731

    # Horizontal pass -> hbuf with uint8 re-quantization, then vertical
    # pass -> vbuf.  `passes` isolates one pass for the profiler's per-pass
    # duration breakdown (the analog of ncu timing the horizontal and
    # vertical kernels separately, ncu_profiler.py:499-557); serving always
    # runs "both".
    if passes in ("both", "horizontal"):
        if sbuf is not None:
            box_cols_doubling(xbuf, sbuf, hbuf)
        else:
            conv(xbuf, hbuf, take_cols, w_out)
        hbuf[:, :] = _quant(hbuf[:, :])
    else:
        hbuf[:, :] = xbuf[:, _LAND : _LAND + w_out]
    if passes == "horizontal":
        # The band's first `radius` rows are top halo; the tile's true
        # output rows start at `radius` (the "both" path reads them via the
        # vertical taps).
        out_ref[0] = (
            jnp.clip(hbuf[radius : radius + tile_rows, :], 0.0, 255.0)
            .astype(jnp.int32).astype(jnp.uint8)
        )
        return
    if sbuf is not None:
        box_rows_doubling(hbuf, sbuf, vbuf)
    else:
        conv(hbuf, vbuf, take_rows, tile_rows)
    out_ref[0] = (
        jnp.clip(_quant(vbuf[:, :]), 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
    )


def _landed_geometry(data_width: int, fits_vmem: bool):
    """(cs, n_cols, w_t, arr_width) for the landed-DMA lane layout.

    cs      output-lane chunk per grid column (128-multiple)
    w_t     VMEM tile width = cs + 2*_LAND (taps reach base..base+2*halo+cs
            which fits because halo <= _LAND)
    arr_width  padded input width = n_cols*cs + 2*_LAND
    """
    if fits_vmem:
        cs = _round_up(data_width, 128)
        n_cols = 1
    else:
        cs = _COL_CHUNK
        n_cols = -(-data_width // cs)
    return cs, n_cols, cs + 2 * _LAND, n_cols * cs + 2 * _LAND


def _right_fill_sites(data_width: int, cs: int, n_cols: int,
                      halo: int) -> tuple:
    """Static (chunk, pos) sites where a column chunk's taps read past the
    data end and need the clamp-to-edge right fill.  At most the last two
    chunks qualify (halo < cs)."""
    sites = []
    for j in range(max(0, n_cols - 2), n_cols):
        pos = _LAND + data_width - j * cs
        if pos < _LAND + cs + halo:
            sites.append((j if n_cols > 1 else None, pos))
    return tuple(sites)


def _separable_blur_planar(
    planar_u8: jnp.ndarray,   # (C, H, W) uint8
    weights: jnp.ndarray,     # (2r+1,) f32 (box: any; w[0] used as inv scale)
    radius: int,
    box_mode: bool,
    interpret: bool = False,
    tile_rows: int | None = None,
    folded: bool = False,
    rows_prepadded: bool = False,
    passes: str = "both",
) -> jnp.ndarray:
    """rows_prepadded=True: the input already carries `radius` valid rows
    above and below (e.g. halo rows exchanged from neighbor shards over
    ICI); only alignment junk is appended, no clamp-to-edge row padding.
    Shape is then (C, H + 2*radius, W) for an (C, H, W) output.

    Lane halos are NOT materialized in XLA: jnp.pad's edge mode replicates
    the edge LANE, which for planar layout IS the edge pixel, so the halo
    content lands correct without any in-kernel fill."""
    channels, height, width = planar_u8.shape
    if rows_prepadded:
        height -= 2 * radius
    doubling = _use_doubling(box_mode, radius)

    cs, n_cols, w_t, arr_width = _landed_geometry(
        width,
        blur_kernel_fits_vmem(width, radius, channels, box_mode,
                              interleaved=False))

    tile_rows = min(
        _pick_tile_rows(tile_rows or TPU.blur_tile_rows, w_t, radius,
                        doubling),
        _round_up(height, 8),
    )
    hp = _round_up(height, tile_rows)
    n_tiles = hp // tile_rows
    copy_rows = _round_up(tile_rows + 2 * radius, 8)

    # Row clamp-to-edge padding, done once in XLA on uint8.  The DMA for
    # tile i reads rows [i*TH, i*TH + CR), so the padded array needs
    # hp - TH + CR rows total: [r top halo][height rows][r bottom halo]
    # [alignment junk, never read].  Lanes: _LAND edge-replicated lanes
    # left (register-aligned -> no cross-lane shuffle), edge replication
    # up to arr_width right.
    total_rows = hp - tile_rows + copy_rows
    if rows_prepadded:
        junk = total_rows - (height + 2 * radius)
        x = jnp.pad(
            planar_u8,
            ((0, 0), (0, junk), (_LAND, arr_width - _LAND - width)),
            mode="edge",
        )
    else:
        x = jnp.pad(
            planar_u8,
            ((0, 0), (radius, total_rows - height - radius),
             (_LAND, arr_width - _LAND - width)),
            mode="edge",
        )

    w2d = weights.reshape(1, -1)

    scratch = [
        pltpu.VMEM((copy_rows, w_t), jnp.uint8),
        pltpu.VMEM((copy_rows, w_t), jnp.float32),
        pltpu.VMEM((copy_rows, cs), jnp.float32),
        pltpu.VMEM((tile_rows, cs), jnp.float32),
    ]
    if doubling:
        scratch.append(pltpu.VMEM((copy_rows, w_t), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA)

    if n_cols == 1:
        grid = (channels, n_tiles)
        out_spec = pl.BlockSpec((1, tile_rows, cs), lambda c, i: (c, i, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (channels, n_tiles, n_cols)
        out_spec = pl.BlockSpec((1, tile_rows, cs),
                                lambda c, i, j: (c, i, j),
                                memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _blur_kernel,
            radius=radius,
            tile_rows=tile_rows,
            copy_rows=copy_rows,
            w_out=cs,
            box_mode=box_mode,
            folded=folded,
            passes=passes,
            col_step=0 if n_cols == 1 else cs,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((channels, hp, n_cols * cs), jnp.uint8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(w2d, x)

    return out[:, :height, :width]


def _separable_blur_interleaved(
    rows_u8: jnp.ndarray,     # (N, H, W*C) uint8 -- N images' interleaved rows
    weights: jnp.ndarray,
    radius: int,
    box_mode: bool,
    channels: int,
    interpret: bool = False,
    tile_rows: int | None = None,
    folded: bool = False,
    passes: str = "both",
) -> jnp.ndarray:
    """Fused separable blur on interleaved-HWC rows; returns (N, H, W*C).

    This is the serving-path variant: the host ships a flat uint8 buffer
    (HWC byte order) and `flat.reshape(H, W*C)` is a contiguity-preserving
    free reshape, whereas materializing an (H, W, C) device array from the
    flat buffer costs a catastrophic relayout (measured 16.3 ms on the
    3239x2146 README image -- 26x the blur kernel itself).  A horizontal
    tap at pixel offset t is a lane offset of t*C, so the same kernel body
    serves both layouts (tap_stride).  Clamp-to-edge halos are built
    in-kernel (jnp.pad's edge mode would replicate the edge LANE, i.e. one
    channel, not the edge pixel; and the tile/concatenate pixel replication
    this replaced measured 1.23 ms -- 2.8x the kernel itself).  Numerics
    are bit-identical: each output element sees the exact same f32
    operation sequence.
    """
    n, height, wf = rows_u8.shape
    halo = radius * channels
    doubling = _use_doubling(box_mode, radius)

    cs, n_cols, w_t, arr_width = _landed_geometry(
        wf,
        blur_kernel_fits_vmem(wf // channels, radius, channels, box_mode,
                              interleaved=True))

    tile_rows = min(
        _pick_tile_rows(tile_rows or TPU.blur_tile_rows, w_t, radius,
                        doubling),
        _round_up(height, 8),
    )
    hp = _round_up(height, tile_rows)
    n_tiles = hp // tile_rows
    copy_rows = _round_up(tile_rows + 2 * radius, 8)
    total_rows = hp - tile_rows + copy_rows

    x = jnp.pad(
        rows_u8,
        ((0, 0), (radius, total_rows - height - radius),
         (_LAND, arr_width - _LAND - wf)),
        mode="edge",
    )

    if n_cols == 1:
        grid = (n, n_tiles)
        out_spec = pl.BlockSpec((1, tile_rows, cs), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (n, n_tiles, n_cols)
        out_spec = pl.BlockSpec((1, tile_rows, cs),
                                lambda b, i, j: (b, i, j),
                                memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _blur_kernel,
            radius=radius,
            tile_rows=tile_rows,
            copy_rows=copy_rows,
            w_out=cs,
            box_mode=box_mode,
            folded=folded,
            passes=passes,
            tap_stride=channels,
            col_step=0 if n_cols == 1 else cs,
            fill_left=True,
            right_fills=_right_fill_sites(wf, cs, n_cols, halo),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, hp, n_cols * cs), jnp.uint8),
        scratch_shapes=(
            [
                pltpu.VMEM((copy_rows, w_t), jnp.uint8),
                pltpu.VMEM((copy_rows, w_t), jnp.float32),
                pltpu.VMEM((copy_rows, cs), jnp.float32),
                pltpu.VMEM((tile_rows, cs), jnp.float32),
            ]
            + ([pltpu.VMEM((copy_rows, w_t), jnp.float32)]
               if doubling else [])
            + [pltpu.SemaphoreType.DMA]
        ),
        interpret=interpret,
    )(weights.reshape(1, -1), x)

    return out[:, :height, :wf]


def gaussian_pallas_rows(
    rows_u8: jnp.ndarray, weights: jnp.ndarray, radius: int, channels: int,
    interpret: bool = False, folded: bool = False, passes: str = "both",
) -> jnp.ndarray:
    """(H, W*C) interleaved uint8 rows -> same, fused Gaussian blur.

    This is the serving boundary: host<->device crossings use (H, W*C)
    arrays, whose minor dim is within one 128-lane tile of full so both
    transfers and the kernel's operand layout are native.  A 1-D flat
    boundary forces a real in-jit relayout each way (measured 0.95 ms on
    the README image -- 2.2x the kernel; scripts/exp_rows_boundary.py)."""
    out = _separable_blur_interleaved(
        rows_u8[None], weights, radius, box_mode=False, channels=channels,
        interpret=interpret, folded=folded, passes=passes)
    return out[0]


def box_pallas_rows(
    rows_u8: jnp.ndarray, radius: int, channels: int,
    interpret: bool = False, folded: bool = False, passes: str = "both",
) -> jnp.ndarray:
    """(H, W*C) interleaved uint8 rows -> same, fused box blur."""
    inv = np.full(2 * radius + 1, box_inv_taps_f32(radius), dtype=np.float32)
    out = _separable_blur_interleaved(
        rows_u8[None], jnp.asarray(inv), radius, box_mode=True,
        channels=channels, interpret=interpret, folded=folded, passes=passes)
    return out[0]


def gaussian_pallas_rows_batch(
    rows_u8: jnp.ndarray, weights: jnp.ndarray, radius: int, channels: int,
    interpret: bool = False, folded: bool = False,
) -> jnp.ndarray:
    """(B, H, W*C) batch -> same, batch riding the kernel grid."""
    return _separable_blur_interleaved(
        rows_u8, weights, radius, box_mode=False, channels=channels,
        interpret=interpret, folded=folded)


def box_pallas_rows_batch(
    rows_u8: jnp.ndarray, radius: int, channels: int,
    interpret: bool = False, folded: bool = False,
) -> jnp.ndarray:
    """(B, H, W*C) batch -> same, batch riding the kernel grid."""
    inv = np.full(2 * radius + 1, box_inv_taps_f32(radius), dtype=np.float32)
    return _separable_blur_interleaved(
        rows_u8, jnp.asarray(inv), radius, box_mode=True, channels=channels,
        interpret=interpret, folded=folded)


def gaussian_pallas_flat(
    flat_u8: jnp.ndarray, weights: jnp.ndarray, radius: int,
    height: int, width: int, channels: int,
    interpret: bool = False, folded: bool = False, passes: str = "both",
) -> jnp.ndarray:
    """Flat (H*W*C,) boundary compat wrapper; prefer gaussian_pallas_rows
    (the 1D<->2D reshapes are device relayouts, not free)."""
    return gaussian_pallas_rows(
        flat_u8.reshape(height, width * channels), weights, radius, channels,
        interpret=interpret, folded=folded, passes=passes).reshape(-1)


def box_pallas_flat(
    flat_u8: jnp.ndarray, radius: int,
    height: int, width: int, channels: int,
    interpret: bool = False, folded: bool = False, passes: str = "both",
) -> jnp.ndarray:
    """Flat (H*W*C,) boundary compat wrapper; prefer box_pallas_rows."""
    return box_pallas_rows(
        flat_u8.reshape(height, width * channels), radius, channels,
        interpret=interpret, folded=folded, passes=passes).reshape(-1)


def gaussian_pallas_flat_batch(
    flats_u8: jnp.ndarray, weights: jnp.ndarray, radius: int,
    height: int, width: int, channels: int,
    interpret: bool = False, folded: bool = False,
) -> jnp.ndarray:
    """(B, H*W*C) flat compat wrapper; prefer gaussian_pallas_rows_batch."""
    b = flats_u8.shape[0]
    return gaussian_pallas_rows_batch(
        flats_u8.reshape(b, height, width * channels), weights, radius,
        channels, interpret=interpret, folded=folded).reshape(b, -1)


def box_pallas_flat_batch(
    flats_u8: jnp.ndarray, radius: int,
    height: int, width: int, channels: int,
    interpret: bool = False, folded: bool = False,
) -> jnp.ndarray:
    """(B, H*W*C) flat compat wrapper; prefer box_pallas_rows_batch."""
    b = flats_u8.shape[0]
    return box_pallas_rows_batch(
        flats_u8.reshape(b, height, width * channels), radius, channels,
        interpret=interpret, folded=folded).reshape(b, -1)


def gaussian_pallas_batch(
    imgs_bhwc: jnp.ndarray, weights: jnp.ndarray, radius: int,
    interpret: bool = False, folded: bool = False,
) -> jnp.ndarray:
    """(B, H, W, C) u8 -> u8 batched fused Gaussian blur.

    The separable blur treats every (image, channel) plane independently, so
    a batch folds into the kernel's channel grid dimension: grid (B*C,
    row-tiles) over a (B*C, H, W) planar stack.  No vmap -- Pallas ANY-space
    operands cannot be batched by vmap on TPU.
    """
    b, height, width, channels = imgs_bhwc.shape
    planar = jnp.transpose(imgs_bhwc, (0, 3, 1, 2)).reshape(b * channels, height, width)
    out = _separable_blur_planar(planar, weights, radius, box_mode=False,
                                 interpret=interpret, folded=folded)
    return jnp.transpose(
        out.reshape(b, channels, height, width), (0, 2, 3, 1)
    )


def box_pallas_batch(
    imgs_bhwc: jnp.ndarray, radius: int, interpret: bool = False,
    folded: bool = False,
) -> jnp.ndarray:
    """(B, H, W, C) u8 -> u8 batched fused box blur."""
    b, height, width, channels = imgs_bhwc.shape
    inv = np.full(2 * radius + 1, box_inv_taps_f32(radius), dtype=np.float32)
    planar = jnp.transpose(imgs_bhwc, (0, 3, 1, 2)).reshape(b * channels, height, width)
    out = _separable_blur_planar(planar, jnp.asarray(inv), radius, box_mode=True,
                                 interpret=interpret, folded=folded)
    return jnp.transpose(
        out.reshape(b, channels, height, width), (0, 2, 3, 1)
    )


def gaussian_pallas(
    img_hwc: jnp.ndarray, weights: jnp.ndarray, radius: int,
    interpret: bool = False, folded: bool = False, passes: str = "both",
) -> jnp.ndarray:
    """(H, W, C) u8 -> u8 fused separable Gaussian blur.

    folded=True is the ADVANCED (level 4) tier: symmetric tap pairing.
    passes isolates one separable pass (profiler breakdown only).
    """
    planar = jnp.transpose(img_hwc, (2, 0, 1))
    out = _separable_blur_planar(planar, weights, radius, box_mode=False,
                                 interpret=interpret, folded=folded,
                                 passes=passes)
    return jnp.transpose(out, (1, 2, 0))


def box_pallas(img_hwc: jnp.ndarray, radius: int, interpret: bool = False,
               folded: bool = False, passes: str = "both") -> jnp.ndarray:
    """(H, W, C) u8 -> u8 fused separable box blur."""
    inv = np.full(2 * radius + 1, box_inv_taps_f32(radius), dtype=np.float32)
    planar = jnp.transpose(img_hwc, (2, 0, 1))
    out = _separable_blur_planar(planar, jnp.asarray(inv), radius, box_mode=True,
                                 interpret=interpret, folded=folded,
                                 passes=passes)
    return jnp.transpose(out, (1, 2, 0))
