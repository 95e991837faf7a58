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

from ...core.config import TPU
from ..weights import box_inv_taps_f32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Column-chunk width (output lanes, 128-multiple) used when a full-width
# tile would not fit VMEM (blur_kernel_fits_vmem).  Must be a multiple of
# 128 so column DMA starts stay register-aligned.
_COL_CHUNK = 1536

# Minimum landing lane offset: tiles land at a register-aligned offset so
# the lanes below it can hold the in-kernel clamp-to-edge halo.  The
# per-call offset is max(_LAND, round_up(halo, 128)) -- box blur has no
# radius cap (the reference's boxBlur accepts any radius), so halo =
# radius * channels can exceed 128.
_LAND = 128


def _working_set_bytes(tile_rows: int, cs: int, w_t: int, radius: int,
                       box_mode: bool, chained: bool = False) -> int:
    """The kernel's total VMEM working set at this tile height: declared
    scratch + double-buffered output block + an estimate of Mosaic's own
    VMEM stack + fixed overhead (~1.8 MB of DMA machinery, measured).

    The stack term is load-bearing: Mosaic keeps live (CR, W_T)-sized f32
    temporaries for the sequenced tap accumulation that scale with the tap
    count -- the 31-tap radius-15 rows kernel OOM'd at 16.14 MB scoped VMEM
    with only 8.96 MB of declared scratch (~2.4 extra full-tile temps).
    Modeled as (1 + taps/16) tiles for the conv path, 1.5 for the doubling
    path (its ping-pong reuses declared scratch).
    """
    taps = 2 * radius + 1
    cr = _round_up(tile_rows + 2 * radius, 8)
    total = (
        cr * w_t * 1            # tile_u8
        + cr * w_t * 4          # xbuf
        + cr * cs * 4           # hbuf
        + 2 * tile_rows * cs    # double-buffered output block
    )
    if not chained:
        total += tile_rows * cs * 4    # vbuf (chained stores out directly)
    if _use_doubling(box_mode, radius):
        total += cr * w_t * 4   # sbuf ping-pong
        stack_tiles = 1.5
    elif chained:
        # Value-chained taps: Mosaic can keep every unrolled tap slice
        # live at once (observed 49 MB at radius 15 in round 1) -- model
        # the stack as one full tile per tap so the picker shrinks tiles
        # instead of OOMing the 64 MB scope.
        stack_tiles = 1.0 + taps
    else:
        stack_tiles = 1.0 + taps / 16.0
    total += int(stack_tiles * cr * w_t * 4)
    return total + 1_800_000


# Scoped-VMEM budget.  Round 1 ran under Mosaic's default 16 MB scope,
# which capped serving tiles at 56 rows; the v5e physically has far more
# VMEM, and raising the scope via CompilerParams(vmem_limit_bytes) to run
# 128-row tiles measured 0.845x alone and 0.745x combined with the
# constant-row-pad fill (scripts/exp_blur_v2.py, 4-round medians, bit-exact
# gated).  Tiles beyond 128 rows measured WORSE (192: 0.96x, 256: 1.02x) --
# the target below deliberately stops growth near the 128-row working set.
_VMEM_TARGET = 48 * 1024 * 1024
_VMEM_SCOPE_BYTES = 64 * 1024 * 1024


def _pick_tile_rows(requested: int, cs: int, w_t: int, radius: int,
                    box_mode: bool, chained: bool = False) -> int:
    """Largest 8-multiple tile height <= requested whose working set fits
    the VMEM target (floor 8; the feasibility gates handle the floor
    still not fitting)."""
    tile = max((requested // 8) * 8, 8)
    while tile > 8 and _working_set_bytes(tile, cs, w_t, radius,
                                          box_mode, chained) > _VMEM_TARGET:
        tile -= 8
    return tile


def _quant(x: jnp.ndarray) -> jnp.ndarray:
    """floor(x + 0.5) staying in f32 (values are within [0, 255.6])."""
    return jnp.floor(x + jnp.float32(0.5))


def _min_vmem_bytes(cs: int, w_t: int, radius: int, box_mode: bool) -> int:
    """Working set at the MINIMUM (8-row) tile height -- the feasibility
    floor the routing gates compare against the hard limit."""
    return _working_set_bytes(8, cs, w_t, radius, box_mode)


_VMEM_HARD_LIMIT = 60 * 1024 * 1024


def blur_kernel_fits_vmem(width: int, radius: int, channels: int,
                          box_mode: bool, interleaved: bool) -> bool:
    """Whether the FULL-WIDTH (single-column) kernel geometry fits VMEM at
    the minimum tile height.  At extreme width x radius combinations (e.g.
    8K rows with radius 15: 28k lanes, 30 halo rows) even an 8-row tile
    exceeds the 16 MB budget and the wrappers switch to column chunking.
    """
    dw = width * (channels if interleaved else 1)
    halo = radius * (channels if interleaved else 1)
    _, cs, _, w_t, _ = _landed_geometry(dw, halo, chunked=False)
    return _min_vmem_bytes(cs, w_t, radius, box_mode) < _VMEM_HARD_LIMIT


def blur_pallas_feasible(width: int, radius: int, channels: int,
                         box_mode: bool, interleaved: bool) -> bool:
    """Whether ANY Pallas blur geometry fits VMEM for this shape.

    Column chunking bounds the tile WIDTH but not the radius-driven halo
    ROWS: a box radius in the hundreds makes even the minimum chunked tile
    ((8 + 2r) rows x 1792 lanes) exceed VMEM.  Dispatch must route such
    calls to the XLA tier, whose tiling is unconstrained.
    """
    if blur_kernel_fits_vmem(width, radius, channels, box_mode, interleaved):
        return True
    dw = width * (channels if interleaved else 1)
    halo = radius * (channels if interleaved else 1)
    _, cs, _, w_t, _ = _landed_geometry(dw, halo, chunked=True)
    return _min_vmem_bytes(cs, w_t, radius, box_mode) < _VMEM_HARD_LIMIT


def _use_doubling(box_mode: bool, radius: int) -> bool:
    """Box windows with >= 9 taps use doubling sums: ~2*log2+popcount
    full-width adds instead of 2r+1.  Exact -- window sums of uint8 values
    (< 2^24) are exact integers in f32 under ANY association, so the result
    is bit-identical to the sequential CUDA tap order."""
    from ..interleaved import BOX_DOUBLING_MIN_RADIUS

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


def _blur_kernel(w_ref, in_ref, out_ref, tile_u8, xbuf, hbuf, *rest,
                 radius: int, tile_rows: int, copy_rows: int, w_out: int,
                 box_mode: bool, folded: bool = False, chained: bool = False,
                 passes: str = "both",
                 tap_stride: int = 1, col_step: int = 0, land: int = _LAND,
                 left_fills: tuple = (),
                 right_fills: tuple = (),
                 row_fill: tuple | None = None):
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
            [base, land) and past the data end are edge-filled in-kernel
    hbuf:   (CR, cs) f32 scratch           -- horizontal-pass accumulator
    vbuf:   (TH, cs) f32 scratch           -- vertical-pass accumulator

    left_fills/right_fills: ((chunk_or_None, pos, fill_halo), ...) static
    clamp-to-edge fill sites; chunk_or_None=None emits unconditionally
    (single-column grids).  Multiple chunks carry fills when the halo
    exceeds a column chunk.

    Tap accumulation goes THROUGH the scratch refs: with value-chained
    accumulation Mosaic keeps every unrolled tap slice live on the VMEM
    stack at once, which blows the 16 MB budget for large radii (observed
    49 MB at radius 15).  Sequenced ref stores bound liveness to one term
    while keeping the exact CUDA f32 operation order
    (image_filters.cu:86-99).

    `chained=True` keeps the accumulator as a VALUE chain instead (same
    f32 term/add order, vertical pass stores straight to the output
    block, no vbuf).  Hypothesis was that the acc-ref's ~3 VMEM touches
    per element per tap dominate at small radii; MEASURED FALSE on v5e
    (scripts/exp_chained_taps.py, 3-round medians 2026-08-18, every arm
    bit-equal): chained is 1.3-1.7x SLOWER at every radius/layout tried
    (r=1 1.53x, r=3 1.34x, r=5 1.30x, folded r=5 1.59x, box r=3 1.70x).
    Mosaic evidently already keeps the sequenced accumulator in
    registers; the chain only inflates live ranges.  The flag stays for
    re-measurement on future toolchains; nothing routes to it.
    """
    if _use_doubling(box_mode, radius):
        vbuf, sbuf, sem = rest
    elif chained:
        vbuf, sbuf, (sem,) = None, None, rest
    else:
        sbuf, (vbuf, sem) = None, rest
    c = pl.program_id(0)
    i = pl.program_id(1)
    taps = 2 * radius + 1
    halo = radius * tap_stride
    base = land - halo

    if col_step:
        # Column-tiled: this step covers output lanes [j*col_step,
        # (j+1)*col_step) plus the landing/reach overhang; bounds VMEM for
        # arbitrarily wide images.
        j = pl.program_id(2)
        src = in_ref.at[
            c, pl.ds(i * tile_rows, copy_rows),
            pl.ds(j * col_step, tile_u8.shape[1]),
        ]
    else:
        src = in_ref.at[c, pl.ds(i * tile_rows, copy_rows), :]
    copy = pltpu.make_async_copy(src, tile_u8, sem)
    copy.start()
    copy.wait()

    # u8 -> f32 via i32: Mosaic has no direct unsigned->float cast.
    xbuf[:, :] = tile_u8[:].astype(jnp.int32).astype(jnp.float32)

    # Clamp-to-edge halo ROWS, built in VMEM.  With row_fill the wrapper
    # pads rows with CONSTANT zeros (a single cheap XLA pad fusion; the
    # edge-replicating row pad lowered to a concatenate that measured
    # 0.19 ms on the served README trace -- benchmarks/trace_tier_r02.jsonl)
    # and the bands touching pad rows rebuild the clamp content here with
    # sublane broadcasts.  Requires radius <= tile_rows so only band 0
    # touches the TOP pad (the wrapper gates this); the BOTTOM junk can be
    # visible to the 1-2 trailing real bands (any band whose tile reaches
    # past the last real row), each with its own static fill site.
    _emit_row_fills(xbuf, i, radius, row_fill)

    # Clamp-to-edge halo lanes, built in VMEM (see module docstring).
    for left, sites in ((True, left_fills), (False, right_fills)):
        for chunk, pos, fh in sites:
            if chunk is None or not col_step:
                _edge_fill(xbuf, pos, tap_stride, fh, left=left)
            else:
                @pl.when(j == chunk)
                def _(pos=pos, fh=fh, left=left):
                    _edge_fill(xbuf, pos, tap_stride, fh, left=left)

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

    def conv_value(src_ref, take, length):
        """Value-chained separable pass (chained=True): identical f32
        term/add order to `conv`, accumulator held as a value instead of
        an acc-ref (folded pairs regroup exactly like the folded ref
        path)."""
        if folded:
            acc = None
            for t in range(radius):
                pair = take(src_ref, t, length) + take(src_ref, 2 * radius - t, length)
                term = pair if box_mode else pair * w_ref[0, t]
                acc = term if acc is None else acc + term
            mid = take(src_ref, radius, length)
            acc = acc + (mid if box_mode else mid * w_ref[0, radius])
        else:
            acc = None
            for t in range(taps):
                sl = take(src_ref, t, length)
                term = sl if box_mode else sl * w_ref[0, t]
                acc = term if acc is None else acc + term
        if box_mode:
            acc = acc * w_ref[0, 0]
        return acc

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
            hbuf[:, :] = _quant(hbuf[:, :])
        elif chained:
            hbuf[:, :] = _quant(conv_value(xbuf, take_cols, w_out))
        else:
            conv(xbuf, hbuf, take_cols, w_out)
            hbuf[:, :] = _quant(hbuf[:, :])
    else:
        hbuf[:, :] = xbuf[:, land : land + w_out]
    # No range clip before the u8 store -- provably dead, and it measured
    # a surprising 0.16 ms on the README image (scripts/exp_hpass_probe.py
    # full_real 0.57 vs full_noclip 0.40, same process).  Proof: every
    # pass value is sum_t w[t] * v_t with v_t in [0, 255] integers and
    # sum(w) = 1 +- ~1e-7 (f32-normalized weights; box: taps * (1/taps)),
    # so x <= 255.0003 << 255.5 and floor(x + 0.5) <= 255 always; values
    # are never negative.  The reference's own (uchar)(sum + 0.5f) cast
    # (image_filters.cu:102) has no clamp either.
    if passes == "horizontal":
        # The band's first `radius` rows are top halo; the tile's true
        # output rows start at `radius` (the "both" path reads them via the
        # vertical taps).
        out_ref[0] = (
            hbuf[radius : radius + tile_rows, :]
            .astype(jnp.int32).astype(jnp.uint8)
        )
        return
    if sbuf is not None:
        box_rows_doubling(hbuf, sbuf, vbuf)
    elif chained:
        # Straight to the output block: no vbuf round trip.
        out_ref[0] = (
            _quant(conv_value(hbuf, take_rows, tile_rows))
            .astype(jnp.int32).astype(jnp.uint8)
        )
        return
    else:
        conv(hbuf, vbuf, take_rows, tile_rows)
    out_ref[0] = _quant(vbuf[:, :]).astype(jnp.int32).astype(jnp.uint8)


def _emit_row_fills(buf, i, radius: int, row_fill: tuple | None) -> None:
    """Emit the constant-row-pad clamp fills into a kernel body.

    buf: the (CR, W_T) working tile ref (f32 or bf16); i: the row-band
    program id; row_fill: _row_fill_sites output (None = edge-pad path).
    Shared by the VPU and MXU kernels so fixes cannot diverge.
    """
    if row_fill is None:
        return

    @pl.when(i == 0)
    def _():
        buf[0:radius, :] = jnp.broadcast_to(
            buf[radius:radius + 1, :], (radius, buf.shape[1]))

    for band, pos, flen in row_fill:
        @pl.when(i == band)
        def _(pos=pos, flen=flen):
            buf[pos + 1:pos + 1 + flen, :] = jnp.broadcast_to(
                buf[pos:pos + 1, :], (flen, buf.shape[1]))


def _row_fill_sites(height: int, radius: int, tile_rows: int,
                    n_tiles: int, copy_rows: int) -> tuple:
    """Static (band, pos, fill_len) bottom clamp-fill sites for the
    constant-row-pad scheme.

    A band needs a fill when its DMA'd tile contains pad-junk rows that a
    REAL output row's vertical taps can read -- that is the last real
    band, and ALSO its predecessor when height lands within `radius` of a
    band boundary (its tail outputs reach up to 2*radius rows past
    themselves).  pos is the in-band index of the last real row."""
    sites = []
    for i in range(n_tiles):
        if i * tile_rows >= height:
            break
        pos = radius + height - i * tile_rows - 1
        if pos + 1 < copy_rows:
            sites.append((i, pos, min(radius, copy_rows - pos - 1)))
    return tuple(sites)


def _landed_geometry(data_width: int, halo: int, chunked: bool):
    """(land, cs, n_cols, w_t, arr_width) for the landed-DMA lane layout.
    The single source of the geometry -- both the kernels' wrappers and the
    VMEM feasibility checks derive from it.

    land    landing lane offset = max(_LAND, round_up(halo, 128)) --
            register-aligned and >= halo, so taps never read below lane 0
    cs      output-lane chunk per grid column (128-multiple)
    w_t     VMEM tile width = cs + 2*land (taps reach base..base+2*halo+cs
            which fits because halo <= land)
    arr_width  padded input width = n_cols*cs + 2*land
    """
    land = max(_LAND, _round_up(halo, 128))
    if chunked:
        cs = _COL_CHUNK
        n_cols = -(-data_width // cs)
    else:
        cs = _round_up(data_width, 128)
        n_cols = 1
    return land, cs, n_cols, cs + 2 * land, n_cols * cs + 2 * land


def _fill_sites(data_width: int, cs: int, n_cols: int, halo: int,
                land: int, w_t: int) -> tuple[tuple, tuple]:
    """Static (chunk, pos, fill_halo) clamp-to-edge fill sites.

    Left: chunk j needs a fill when its taps read below the data start
    (j*cs < halo); the missing lanes are [land - (halo - j*cs), land - j*cs)
    in local coords... i.e. a fill of halo - j*cs lanes below pos =
    land - j*cs (where pixel 0 sits for that chunk).  Right: chunk j needs
    one when its taps read past the data end ((j+1)*cs + halo > dw); fill
    above pos = land + dw - j*cs, capped at the tile width.  With halo
    bigger than a column chunk, several chunks carry fills.
    """
    left, right = [], []
    for j in range(n_cols):
        tag = j if n_cols > 1 else None
        if j * cs < halo:
            left.append((tag, land - j * cs, halo - j * cs))
        pos = land + data_width - j * cs
        if (j + 1) * cs + halo > data_width:
            right.append((tag, pos, min(halo, w_t - pos)))
    return tuple(left), tuple(right)


def _blur_plan(height: int, data_width: int, channels: int, radius: int,
               box_mode: bool, interleaved: bool, chained: bool = False,
               tile_rows: int | None = None):
    """Shared lane/tile geometry: (land, cs, n_cols, w_t, arr_width,
    tile_rows, n_tiles, copy_rows, total_rows).

    Single source for the kernel builders AND the host-side pre-pad
    (host_prepad_planar / host_prepad_rows) -- a host-padded buffer must
    be byte-identical to what the in-program jnp.pad would have built, so
    both derive from this one function.
    """
    halo = radius * (channels if interleaved else 1)
    width_px = data_width // channels if interleaved else data_width
    doubling = _use_doubling(box_mode, radius)
    chained = chained and not doubling
    land, cs, n_cols, w_t, arr_width = _landed_geometry(
        data_width, halo,
        chunked=not blur_kernel_fits_vmem(width_px, radius, channels,
                                          box_mode, interleaved=interleaved))
    tr = min(
        _pick_tile_rows(tile_rows or TPU.blur_tile_rows, cs, w_t, radius,
                        box_mode, chained),
        _round_up(height, 8),
    )
    hp = _round_up(height, tr)
    n_tiles = hp // tr
    copy_rows = _round_up(tr + 2 * radius, 8)
    total_rows = hp - tr + copy_rows
    return (land, cs, n_cols, w_t, arr_width, tr, n_tiles, copy_rows,
            total_rows)


def _host_pad_buffer(x, total_rows: int, arr_width: int, row0: int,
                     col0: int, edge_lanes: bool):
    """Shared body of every host_prepad_* helper: a zeros
    (N, total_rows, arr_width) uint8 buffer with the image block landed at
    [row0:row0+H, col0:col0+W], lane pad edge-replicated on the image rows
    when the kernel's in-program pad used edge mode (the zero rows stay
    zero either way, matching pad-rows-then-pad-lanes ordering)."""
    import numpy as _np

    out = _np.zeros((x.shape[0], total_rows, arr_width), _np.uint8)
    mid = out[:, row0:row0 + x.shape[1]]
    mid[:, :, col0:col0 + x.shape[2]] = x
    if edge_lanes:
        mid[:, :, :col0] = x[:, :, :1]
        mid[:, :, col0 + x.shape[2]:] = x[:, :, -1:]
    return out


def host_prepad_planar(planar_u8, radius: int, box_mode: bool,
                       chained: bool = False,
                       tile_rows: int | None = None):
    """(C, H, W) uint8 numpy -> the FULLY padded (C, total_rows,
    arr_width) buffer the planar kernel consumes, built on the HOST.

    Byte-identical to the in-program pad prologue of
    `_separable_blur_planar` (constant-zero row pad + edge-replicated
    lanes): passing the result with ``host_prepadded=(H, W)`` deletes the
    ~0.1 ms XLA pad op from the device program entirely -- the pad is
    marshalling work, paid once next to the (untimed) H2D upload, exactly
    where the reference pays its cudaMemcpy
    (/root/reference/cuda_lib/src/image_filters.cu:679-804).

    Only the radius <= tile_rows regime is supported (the constant-zero +
    in-kernel-clamp scheme; huge-radius box pads edge rows in-program).
    """

    channels, height, width = planar_u8.shape
    (land, _cs, _n_cols, _w_t, arr_width, tr, _n_tiles, _copy_rows,
     total_rows) = _blur_plan(height, width, channels, radius, box_mode,
                              interleaved=False, chained=chained,
                              tile_rows=tile_rows)
    if radius > tr:
        raise ValueError("host_prepad_planar requires radius <= tile_rows")
    return _host_pad_buffer(planar_u8, total_rows, arr_width, radius, land,
                            edge_lanes=True)


def host_prepad_rows(rows_u8, radius: int, channels: int, box_mode: bool,
                     chained: bool = False,
                     tile_rows: int | None = None):
    """(H, W*C) or (N, H, W*C) uint8 numpy -> host-padded buffer for the
    interleaved rows kernel (`host_prepadded=` mode), matching its
    in-program pad byte-for-byte (zero rows; edge-LANE-replicated lane
    pad, whose halo content the kernel's _edge_fill overwrites anyway)."""

    rows = rows_u8 if rows_u8.ndim == 3 else rows_u8[None]
    n, height, wf = rows.shape
    (land, _cs, _n_cols, _w_t, arr_width, tr, _n_tiles, _copy_rows,
     total_rows) = _blur_plan(height, wf, channels, radius, box_mode,
                              interleaved=True, chained=chained,
                              tile_rows=tile_rows)
    if radius > tr:
        raise ValueError("host_prepad_rows requires radius <= tile_rows")
    out = _host_pad_buffer(rows, total_rows, arr_width, radius, land,
                           edge_lanes=True)
    return out if rows_u8.ndim == 3 else out[0]


def _separable_blur_planar(
    planar_u8: jnp.ndarray,   # (C, H, W) uint8
    weights: jnp.ndarray,     # (2r+1,) f32 (box: any; w[0] used as inv scale)
    radius: int,
    box_mode: bool,
    interpret: bool = False,
    tile_rows: int | None = None,
    folded: bool = False,
    chained: bool = False,
    rows_prepadded: bool = False,
    host_prepadded: tuple[int, int] | None = None,
    passes: str = "both",
) -> jnp.ndarray:
    """rows_prepadded=True: the input already carries `radius` valid rows
    above and below (e.g. halo rows exchanged from neighbor shards over
    ICI); only alignment junk is appended, no clamp-to-edge row padding.
    Shape is then (C, H + 2*radius, W) for an (C, H, W) output.

    host_prepadded=(H, W): the input is ALREADY the fully padded
    (C, total_rows, arr_width) buffer (built by `host_prepad_planar` on
    the host, next to the untimed H2D) -- the device program emits NO pad
    op at all, only the kernel (+ the caller's layout ops).

    Lane halos are NOT materialized in XLA: jnp.pad's edge mode replicates
    the edge LANE, which for planar layout IS the edge pixel, so the halo
    content lands correct without any in-kernel fill."""
    if host_prepadded is not None:
        channels = planar_u8.shape[0]
        height, width = host_prepadded
    else:
        channels, height, width = planar_u8.shape
        if rows_prepadded:
            height -= 2 * radius
    doubling = _use_doubling(box_mode, radius)
    chained = chained and not doubling  # doubling already avoids tap refs

    (land, cs, n_cols, w_t, arr_width, tile_rows, n_tiles, copy_rows,
     total_rows) = _blur_plan(height, width, channels, radius, box_mode,
                              interleaved=False, chained=chained,
                              tile_rows=tile_rows)
    if not interpret and _min_vmem_bytes(cs, w_t, radius,
                                         box_mode) >= _VMEM_HARD_LIMIT:
        raise ValueError(
            f"Pallas blur working set exceeds VMEM for width={width} "
            f"radius={radius}; route to the XLA tier "
            f"(see blur_pallas_feasible)")

    # Row clamp-to-edge padding, done once in XLA on uint8 (or on the
    # host in host_prepadded mode).  The DMA for tile i reads rows
    # [i*TH, i*TH + CR), so the padded array needs hp - TH + CR rows
    # total: [r top halo][height rows][r bottom halo]
    # [alignment junk, never read].  Lanes: `land` edge-replicated lanes
    # left (register-aligned -> no cross-lane shuffle), edge replication
    # up to arr_width right; for planar layout the edge LANE is the edge
    # PIXEL, so the pad content is the correct clamp and no in-kernel
    # fills are needed.
    row_fill = None
    if host_prepadded is not None:
        if radius > tile_rows:
            raise ValueError("host_prepadded requires radius <= tile_rows")
        if planar_u8.shape != (channels, total_rows, arr_width):
            raise ValueError(
                f"host_prepadded buffer is {planar_u8.shape}, expected "
                f"{(channels, total_rows, arr_width)} -- rebuild with "
                "host_prepad_planar")
        row_fill = _row_fill_sites(height, radius, tile_rows, n_tiles,
                                   copy_rows)
        x = planar_u8
    elif rows_prepadded:
        junk = total_rows - (height + 2 * radius)
        x = jnp.pad(
            planar_u8,
            ((0, 0), (0, junk), (land, arr_width - land - width)),
            mode="edge",
        )
    elif radius <= tile_rows:
        # Constant-zero row pad + in-kernel clamp fills (see the
        # interleaved wrapper; measured 0.87x alone, 0.745x with the
        # raised-VMEM 128-row tiles, scripts/exp_blur_v2.py).
        row_fill = _row_fill_sites(height, radius, tile_rows, n_tiles,
                                   copy_rows)
        x = jnp.pad(
            planar_u8,
            ((0, 0), (radius, total_rows - height - radius), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, 0), (land, arr_width - land - width)),
                    mode="edge")
    else:
        x = jnp.pad(
            planar_u8,
            ((0, 0), (radius, total_rows - height - radius),
             (land, arr_width - land - width)),
            mode="edge",
        )

    w2d = weights.reshape(1, -1)

    scratch = [
        pltpu.VMEM((copy_rows, w_t), jnp.uint8),
        pltpu.VMEM((copy_rows, w_t), jnp.float32),
        pltpu.VMEM((copy_rows, cs), jnp.float32),
    ]
    if not chained:
        scratch.append(pltpu.VMEM((tile_rows, cs), jnp.float32))
    if doubling:
        scratch.append(pltpu.VMEM((copy_rows, w_t), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA)

    # Output blocks need not divide the array: the out_shape is the EXACT
    # (C, H, W) and Pallas masks the partial last row-tile / column-chunk
    # stores, so no epilogue slice (a full output copy) is ever emitted.
    if n_cols == 1:
        grid = (channels, n_tiles)
        out_spec = pl.BlockSpec((1, tile_rows, cs), lambda c, i: (c, i, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (channels, n_tiles, n_cols)
        out_spec = pl.BlockSpec((1, tile_rows, cs),
                                lambda c, i, j: (c, i, j),
                                memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            _blur_kernel,
            radius=radius,
            tile_rows=tile_rows,
            copy_rows=copy_rows,
            w_out=cs,
            box_mode=box_mode,
            folded=folded,
            chained=chained,
            passes=passes,
            col_step=0 if n_cols == 1 else cs,
            land=land,
            row_fill=row_fill,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((channels, height, width), jnp.uint8),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_SCOPE_BYTES),
        interpret=interpret,
    )(w2d, x)


def _separable_blur_interleaved(
    rows_u8: jnp.ndarray,     # (N, H, W*C) uint8 -- N images' interleaved rows
    weights: jnp.ndarray,
    radius: int,
    box_mode: bool,
    channels: int,
    interpret: bool = False,
    tile_rows: int | None = None,
    folded: bool = False,
    chained: bool = False,
    host_prepadded: tuple[int, int] | None = None,
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

    host_prepadded=(H, WF): input is the fully padded (N, total_rows,
    arr_width) buffer from `host_prepad_rows`; no in-program pad ops.
    """
    if host_prepadded is not None:
        n = rows_u8.shape[0]
        height, wf = host_prepadded
    else:
        n, height, wf = rows_u8.shape
    halo = radius * channels
    doubling = _use_doubling(box_mode, radius)
    chained = chained and not doubling  # doubling already avoids tap refs

    (land, cs, n_cols, w_t, arr_width, tile_rows, n_tiles, copy_rows,
     total_rows) = _blur_plan(height, wf, channels, radius, box_mode,
                              interleaved=True, chained=chained,
                              tile_rows=tile_rows)
    if not interpret and _min_vmem_bytes(cs, w_t, radius,
                                         box_mode) >= _VMEM_HARD_LIMIT:
        raise ValueError(
            f"Pallas blur working set exceeds VMEM for W*C={wf} "
            f"radius={radius}; route to the XLA tier "
            f"(see blur_pallas_feasible)")
    left_fills, right_fills = _fill_sites(wf, cs, n_cols, halo, land, w_t)

    # Row clamp: constant-zero pad + in-kernel broadcast fills when the
    # radius fits one band (cheap single pad fusion vs the 0.19 ms
    # edge-replication concatenate); edge pad otherwise (huge box radii).
    row_fill = None
    if host_prepadded is not None:
        if radius > tile_rows:
            raise ValueError("host_prepadded requires radius <= tile_rows")
        if rows_u8.shape != (n, total_rows, arr_width):
            raise ValueError(
                f"host_prepadded buffer is {rows_u8.shape}, expected "
                f"{(n, total_rows, arr_width)} -- rebuild with "
                "host_prepad_rows")
        row_fill = _row_fill_sites(height, radius, tile_rows, n_tiles,
                                   copy_rows)
        x = rows_u8
    elif radius <= tile_rows:
        row_fill = _row_fill_sites(height, radius, tile_rows, n_tiles,
                                   copy_rows)
        x = jnp.pad(
            rows_u8, ((0, 0), (radius, total_rows - height - radius), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, 0), (land, arr_width - land - wf)),
                    mode="edge")
    else:
        x = jnp.pad(
            rows_u8,
            ((0, 0), (radius, total_rows - height - radius),
             (land, arr_width - land - wf)),
            mode="edge",
        )

    # Exact (N, H, W*C) out_shape -- partial tile/chunk stores are masked
    # (see the planar variant); no epilogue slice.
    if n_cols == 1:
        grid = (n, n_tiles)
        out_spec = pl.BlockSpec((1, tile_rows, cs), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (n, n_tiles, n_cols)
        out_spec = pl.BlockSpec((1, tile_rows, cs),
                                lambda b, i, j: (b, i, j),
                                memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            _blur_kernel,
            radius=radius,
            tile_rows=tile_rows,
            copy_rows=copy_rows,
            w_out=cs,
            box_mode=box_mode,
            folded=folded,
            chained=chained,
            passes=passes,
            tap_stride=channels,
            col_step=0 if n_cols == 1 else cs,
            land=land,
            left_fills=left_fills,
            right_fills=right_fills,
            row_fill=row_fill,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, height, wf), jnp.uint8),
        scratch_shapes=(
            [
                pltpu.VMEM((copy_rows, w_t), jnp.uint8),
                pltpu.VMEM((copy_rows, w_t), jnp.float32),
                pltpu.VMEM((copy_rows, cs), jnp.float32),
            ]
            + ([] if chained
               else [pltpu.VMEM((tile_rows, cs), jnp.float32)])
            + ([pltpu.VMEM((copy_rows, w_t), jnp.float32)]
               if doubling else [])
            + [pltpu.SemaphoreType.DMA]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_SCOPE_BYTES),
        interpret=interpret,
    )(weights.reshape(1, -1), x)


def gaussian_pallas_rows(
    rows_u8: jnp.ndarray, weights: jnp.ndarray, radius: int, channels: int,
    interpret: bool = False, folded: bool = False, chained: bool = False,
    host_prepadded: tuple[int, int] | None = None,
    passes: str = "both",
) -> jnp.ndarray:
    """(H, W*C) interleaved uint8 rows -> same, fused Gaussian blur.

    This is the serving boundary: host<->device crossings use (H, W*C)
    arrays, whose minor dim is within one 128-lane tile of full so both
    transfers and the kernel's operand layout are native.  A 1-D flat
    boundary forces a real in-jit relayout each way (measured 0.95 ms on
    the README image -- 2.2x the kernel; scripts/exp_rows_boundary.py)."""
    out = _separable_blur_interleaved(
        rows_u8[None], weights, radius, box_mode=False, channels=channels,
        interpret=interpret, folded=folded, chained=chained,
        host_prepadded=host_prepadded, passes=passes)
    return out[0]


def box_pallas_rows(
    rows_u8: jnp.ndarray, radius: int, channels: int,
    interpret: bool = False, folded: bool = False, chained: bool = False,
    host_prepadded: tuple[int, int] | None = None,
    passes: str = "both",
) -> jnp.ndarray:
    """(H, W*C) interleaved uint8 rows -> same, fused box blur."""
    inv = np.full(2 * radius + 1, box_inv_taps_f32(radius), dtype=np.float32)
    out = _separable_blur_interleaved(
        rows_u8[None], jnp.asarray(inv), radius, box_mode=True,
        channels=channels, interpret=interpret, folded=folded,
        chained=chained, host_prepadded=host_prepadded, passes=passes)
    return out[0]


def gaussian_pallas_rows_batch(
    rows_u8: jnp.ndarray, weights: jnp.ndarray, radius: int, channels: int,
    interpret: bool = False, folded: bool = False,
    host_prepadded: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """(B, H, W*C) batch -> same, batch riding the kernel grid."""
    return _separable_blur_interleaved(
        rows_u8, weights, radius, box_mode=False, channels=channels,
        interpret=interpret, folded=folded, host_prepadded=host_prepadded)


def box_pallas_rows_batch(
    rows_u8: jnp.ndarray, radius: int, channels: int,
    interpret: bool = False, folded: bool = False,
    host_prepadded: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """(B, H, W*C) batch -> same, batch riding the kernel grid."""
    inv = np.full(2 * radius + 1, box_inv_taps_f32(radius), dtype=np.float32)
    return _separable_blur_interleaved(
        rows_u8, jnp.asarray(inv), radius, box_mode=True, channels=channels,
        interpret=interpret, folded=folded, host_prepadded=host_prepadded)


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
    interpret: bool = False, folded: bool = False, chained: bool = False,
    passes: str = "both",
) -> jnp.ndarray:
    """(H, W, C) u8 -> u8 fused separable Gaussian blur.

    folded=True is the ADVANCED (level 4) tier: symmetric tap pairing.
    passes isolates one separable pass (profiler breakdown only).
    """
    planar = jnp.transpose(img_hwc, (2, 0, 1))
    out = _separable_blur_planar(planar, weights, radius, box_mode=False,
                                 interpret=interpret, folded=folded,
                                 chained=chained, passes=passes)
    return jnp.transpose(out, (1, 2, 0))


def box_pallas(img_hwc: jnp.ndarray, radius: int, interpret: bool = False,
               folded: bool = False, chained: bool = False,
               passes: str = "both") -> jnp.ndarray:
    """(H, W, C) u8 -> u8 fused separable box blur."""
    inv = np.full(2 * radius + 1, box_inv_taps_f32(radius), dtype=np.float32)
    planar = jnp.transpose(img_hwc, (2, 0, 1))
    out = _separable_blur_planar(planar, jnp.asarray(inv), radius, box_mode=True,
                                 interpret=interpret, folded=folded,
                                 chained=chained, passes=passes)
    return jnp.transpose(out, (1, 2, 0))
