"""ADVANCED-tier Gaussian blur on the MXU: separable passes as banded
bf16x2 matmuls.

The VPU level-2 kernel is compute-bound in its horizontal pass (~21 ops per
element of lane-rotate/multiply/add).  The same pass is a banded matrix
product: out[:, g*G : (g+1)*G] = X[:, g*G .. g*G + G + 2*halo] @ B where
B[k, l] = w[(k - l)/S] on the band (S = tap_stride; zero elsewhere).  That
is ~(1 + 2*halo/G) * G MACs per output element -- a ~10-70x FLOP inflation
that the MXU absorbs at ~2 orders of magnitude higher throughput than the
VPU, turning the pass from compute-bound to layout-bound.  The vertical
pass is one banded matmul from the left: A @ H with A[t_out, k] =
w[k - t_out] on the band.

Numerics (why this passes the ADVANCED gate, maxdiff <= 1 vs level 2, and
in practice is far closer):
* uint8 pixel values and the quantized inter-pass intermediate are
  integers in [0, 255] -- EXACTLY representable in bf16 (8-bit mantissa);
* weights are split bf16x2: w = hi + lo with hi = bf16(w),
  lo = bf16(w - hi), so the represented weight error is ~2^-16 relative;
* every bf16 x bf16 product is EXACT in the MXU's f32 accumulation (8+8
  mantissa bits < 24), leaving only f32 summation-order ulps -- the same
  relaxation the folded-tap VPU tier already makes (ops/pallas/blur.py).
Box blur rides the same kernel with a STRONGER guarantee: its weights are
equal, so the band is all ones — every bf16 operand is an exact small
integer and every f32 partial sum is an exact integer < 2^24, meaning the
matmul result is the exact window sum under ANY association (the same
argument as blur.py's doubling-window tier).  Multiplying by the
reference's own f32 reciprocal (ops/weights.py::box_inv_taps_f32) then
reproduces `sum * (1/taps)` bit-for-bit, so the MXU box tier is BIT-EXACT
vs the naive oracle — no hi/lo split and only ONE matmul per pass (half
the gaussian tier's FLOPs).  Whether it BEATS the VPU doubling-window
kernel is a silicon question (scripts/exp_box_mxu.py decides routing).

Geometry (landing offset, clamp-to-edge fills, row padding, exact masked
out shapes) is shared with ops/pallas/blur.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import TPU
from .blur import (
    _edge_fill,
    _emit_row_fills,
    _fill_sites,
    _landed_geometry,
    _quant,
    _round_up,
    _VMEM_HARD_LIMIT,
    _VMEM_SCOPE_BYTES,
    _VMEM_TARGET,
    blur_kernel_fits_vmem,
)

# Output lanes per horizontal matmul block.  The H-pass costs
# ~4*(G + 2*halo) FLOP per element (hi+lo split x mul+add), so G sets the
# FLOP inflation while every matmul dim stays >= 128 down to G = 128.
# Measured on v5e (scripts/exp_mxu_gblock.py, 3-round medians 2026-08-18,
# interleaved rows, README shape): G=128 beats G=512 at every radius --
# r=3 0.413 vs 0.605 ms, r=5 0.418 vs 0.628, r=15 0.474 vs 0.600 -- and
# beats G=256 consistently too; the pass is MXU-FLOP-bound, not
# ragged-edge-bound.  G=128 makes the tier nearly radius-flat at
# ~0.41-0.47 ms.
_G = 128

# ADVANCED-tier routing: the MXU cost is nearly radius-flat while the VPU
# folded tier scales with taps.  With G=128 the crossover moved DOWN from
# the round-1 value 5: scripts/exp_mxu_r34.py (5-round medians 2026-08-18,
# interleaved rows A/B) measured mxu/vpu r=2 1.003x (tie), r=3 0.735x,
# r=4 0.672x (resolvable, >30%); scripts/exp_mxu_gblock.py independently
# showed the same r=3 direction (0.413 vs 0.45 ms), and a third window
# (end-to-end serving A/B at 1536x2048, 2026-08-18) measured L4-MXU
# 0.199 ms vs L2-VPU 0.235 at r=3.  The single-effect noise floor is 30%
# (CLAUDE.md) and r=3's 26.5% sits under it, but THREE independent
# sessions agreeing in direction is the same standard that set the
# round-1 threshold ("two independent rounds agree"), and the cost of
# being wrong is bounded by r=2's measured tie (~10%).  r=2 stays on the
# VPU folded tier.  Both tiers carry the ADVANCED maxdiff<=1 contract,
# so routing only changes speed, never the numeric guarantee.
GAUSS_MXU_MIN_RADIUS = 3

# Box-tier routing: the MXU box (ones band + f32 reciprocal epilogue) is
# BIT-EXACT (module docstring), so unlike gaussian it can serve level 2 AND
# level 4 -- routing only ever changes speed.  Silicon A/B
# (scripts/exp_box_mxu.py, 5 interleaved rounds in ONE process, v5e,
# 2026-08-20, /tmp/exp_box_mxu.log): mxu/vpu medians planar r=2 0.860x,
# r=5 0.549x, r=9 0.483x, r=15 0.358x; serving rows r=5 0.509x, r=15
# 0.418x -- the MXU won all 5 rounds pairwise at every radius, including
# r=2 (sub-noise-floor in magnitude but unanimous in direction; the cost
# of being wrong there is a ~14% tie-break).  r=1 measured a tie
# (scripts/exp_box_mxu_edges.py, 2026-08-20: planar 0.987x, rows 1.076x
# -- both inside the 30% noise floor) and stays on the exact VPU tier.
#
# No UPPER radius cap: the same edges run probed r=31 (mxu/vpu planar
# 0.657x, rows 0.742x) and r=63 (0.563x / 0.653x) -- the MXU margin
# GROWS with radius (the band matmul is radius-flat per G-block while
# the VPU doubling kernel pays log2(taps) passes), so
# gaussian_mxu_feasible's VMEM working-set gate is the only ceiling;
# past it the router already falls back to the VPU/XLA tiers.  G=128
# re-confirmed for the box band too (g256/g128 r=5 1.389x, r=15 1.598x).
BOX_MXU_MIN_RADIUS = 2


def use_mxu_box(radius: int, width: int, channels: int,
                interleaved: bool) -> bool:
    """THE routing predicate for the box MXU tier (dispatch rows/batch,
    the planar registry, and the profiler all consult it).  Pure function
    of geometry -- no env flag, so the executable cache keys need no new
    component.  Bit-exact on every backend (interpret included), chasing
    the reference's shared-memory box kernel
    (cuda_lib/src/image_filters.cu:448-673) with the MXU instead of the
    VPU doubling-window tier."""
    return (radius >= BOX_MXU_MIN_RADIUS
            and gaussian_mxu_feasible(width, radius, channels, interleaved))


def _mxu_working_set_bytes(tile_rows: int, cs: int, w_t: int, radius: int,
                           halo: int, g_block: int | None = None) -> int:
    """VMEM working set of the MXU kernel at this tile height: its own
    buffer list (bf16 tile, f32+bf16 intermediates, band operands), not the
    VPU conv model -- the MXU kernel has no sequenced tap loop, so its
    Mosaic stack is ~one tile of matmul temporaries, not (1 + taps/16)."""
    cr = _round_up(tile_rows + 2 * radius, 8)
    total = (
        cr * w_t * 1            # tile_u8
        + cr * w_t * 2          # x16 bf16
        + cr * cs * 4           # hbuf f32
        + cr * cs * 2           # h16 bf16
        + tile_rows * cs * 4    # vbuf f32
        + 2 * tile_rows * cs    # double-buffered output block
        + 2 * ((g_block or _G) + 2 * halo) * (g_block or _G) * 2  # b_hi/b_lo
        + 2 * tile_rows * cr * 2         # a_hi/a_lo operands
    )
    total += cr * w_t * 4       # Mosaic stack (matmul accum temps)
    return total + 1_800_000


def gaussian_mxu_feasible(width: int, radius: int, channels: int,
                          interleaved: bool) -> bool:
    """Whether the MXU gaussian working set fits VMEM at the minimum tile
    height."""
    dw = width * (channels if interleaved else 1)
    halo = radius * (channels if interleaved else 1)
    chunked = not blur_kernel_fits_vmem(width, radius, channels, False,
                                        interleaved)
    land, cs, _, _, _ = _landed_geometry(dw, halo, chunked)
    cs = _round_up(cs, _G)
    return _mxu_working_set_bytes(8, cs, cs + 2 * land, radius,
                                  halo) < _VMEM_HARD_LIMIT


def use_mxu_gaussian(radius: int, width: int, channels: int,
                     interleaved: bool) -> bool:
    """THE routing predicate for the ADVANCED gaussian (single source --
    dispatch rows/batch and the planar registry all consult it): MXU wins
    from GAUSS_MXU_MIN_RADIUS up, provided the working set fits VMEM."""
    return (radius >= GAUSS_MXU_MIN_RADIUS
            and gaussian_mxu_feasible(width, radius, channels, interleaved))


def _band_matrices(weights: jnp.ndarray, radius: int, stride: int,
                   k_rows: int, n_cols: int):
    """(B_hi, B_lo) bf16 banded matrices, (k_rows, n_cols), built in-graph
    (weights is a traced operand -- sigma must not trigger recompiles).
    B[k, l] = w[(k - l)/stride] where (k - l) is a multiple of stride in
    [0, 2*radius*stride]."""
    kk = jax.lax.broadcasted_iota(jnp.int32, (k_rows, n_cols), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (k_rows, n_cols), 1)
    d = kk - ll
    valid = (d >= 0) & (d <= 2 * radius * stride) & (d % stride == 0)
    tap = jnp.clip(d // stride, 0, 2 * radius)
    b = jnp.where(valid, weights[tap], jnp.float32(0.0))
    # reduce_precision, NOT a bf16 cast round-trip: under XLA's
    # allow-excess-precision the f32->bf16->f32 trip may be elided, folding
    # b_lo to zero (observed on v5e: the correction vanished and the gate
    # failed at maxdiff 2).  reduce_precision is semantic and survives.
    b_hi_f32 = jax.lax.reduce_precision(b, exponent_bits=8, mantissa_bits=7)
    b_hi = b_hi_f32.astype(jnp.bfloat16)
    b_lo = (b - b_hi_f32).astype(jnp.bfloat16)
    return b_hi, b_lo


def _gauss_mxu_kernel(bh_ref, bl_ref, ah_ref, al_ref, in_ref, out_ref,
                      tile_u8, x16, hbuf, h16, vbuf, sem, *,
                      radius: int, tile_rows: int, copy_rows: int,
                      tap_stride: int, col_step: int,
                      land: int, left_fills: tuple, right_fills: tuple,
                      n_g: int, g_block: int, interp: bool,
                      passes: str = "both",
                      row_fill: tuple | None = None,
                      box_scale: float | None = None):
    """One grid step.  bh/bl: (K, G) bf16 horizontal band (K = G + 2*halo);
    ah/al: (TH, CR) bf16 vertical band; layout/scratch as in
    blur.py::_blur_kernel with bf16 tiles."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    halo = radius * tap_stride
    base = land - halo

    if col_step:
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

    # u8 -> bf16 (exact: integers <= 255) via i32/f32.
    x16[:, :] = tile_u8[:].astype(jnp.int32).astype(
        jnp.float32).astype(jnp.bfloat16)

    # Constant-row-pad clamp fills (see blur.py::_blur_kernel row_fill:
    # the edge-mode row pad cost a 0.19 ms XLA concatenate per request).
    _emit_row_fills(x16, i, radius, row_fill)

    for left, sites in ((True, left_fills), (False, right_fills)):
        for chunk, pos, fh in sites:
            if chunk is None or not col_step:
                _edge_fill(x16, pos, tap_stride, fh, left=left)
            else:
                @pl.when(j == chunk)
                def _(pos=pos, fh=fh, left=left):
                    _edge_fill(x16, pos, tap_stride, fh, left=left)

    # Interpret mode (CPU) lacks a bf16 x bf16 -> f32 dot; upcast there.
    # The math is identical either way: the products are exact.
    up = (lambda a: a.astype(jnp.float32)) if interp else (lambda a: a)

    # Horizontal pass: per-G-block banded matmuls on the MXU.  `passes`
    # isolates one pass for the profiler's per-pass breakdown, mirroring
    # blur.py::_blur_kernel.
    if passes in ("both", "horizontal"):
        k_rows = bh_ref.shape[0]
        for g in range(n_g):
            sl = x16[:, base + g * g_block : base + g * g_block + k_rows]
            acc = jnp.dot(up(sl), up(bh_ref[:, :]),
                          preferred_element_type=jnp.float32)
            if box_scale is None:
                acc = acc + jnp.dot(up(sl), up(bl_ref[:, :]),
                                    preferred_element_type=jnp.float32)
            else:
                # Box: acc is the EXACT integer window sum (ones band, f32
                # accumulation); scale by the reference's f32 reciprocal.
                acc = acc * jnp.float32(box_scale)
            hbuf[:, g * g_block : (g + 1) * g_block] = acc
    else:
        hbuf[:, :] = x16[:, land : land + hbuf.shape[1]].astype(jnp.float32)
    # No range clip before the u8 stores: pass values are bounded by
    # 255 * (1 + ~1e-3 bf16x2 residual) + rounding << 255.5, so
    # floor(x+0.5) <= 255 always (see blur.py::_blur_kernel proof; the
    # clip measured 0.16 ms on the VPU path).
    if passes == "horizontal":
        out_ref[0] = (
            _quant(hbuf[radius : radius + tile_rows, :])
            .astype(jnp.int32).astype(jnp.uint8)
        )
        return
    # Inter-pass uint8 quantization (reference's u8 temp buffer); the
    # quantized integers stay exact in bf16 for the vertical matmul.
    h16[:, :] = _quant(hbuf[:, :]).astype(jnp.bfloat16)

    # Vertical pass: one banded matmul from the left.
    v = jnp.dot(up(ah_ref[:, :]), up(h16[:, :]),
                preferred_element_type=jnp.float32)
    if box_scale is None:
        v = v + jnp.dot(up(al_ref[:, :]), up(h16[:, :]),
                        preferred_element_type=jnp.float32)
    else:
        v = v * jnp.float32(box_scale)
    vbuf[:, :] = v
    out_ref[0] = _quant(vbuf[:, :]).astype(jnp.int32).astype(jnp.uint8)


def _mxu_plan(height: int, dw: int, radius: int, tap_stride: int,
              tile_rows: int | None = None, g_block: int | None = None):
    """Lane/tile geometry shared by the kernel builder and the flop model.

    Returns (halo, g_block, land, cs, n_cols, w_t, arr_width, n_g,
    tile_rows, hp, n_tiles, copy_rows, total_rows) -- exactly the values
    ``_gaussian_mxu`` builds its grid and scratch from, so
    ``gaussian_mxu_modeled_flops`` can never drift from the real kernel.
    """
    halo = radius * tap_stride
    chunked = not blur_kernel_fits_vmem(
        dw // tap_stride if tap_stride > 1 else dw, radius,
        tap_stride if tap_stride > 1 else 1, False,
        interleaved=tap_stride > 1)
    g_block = g_block or _G
    land, cs, n_cols, w_t, arr_width = _landed_geometry(dw, halo, chunked)
    # Horizontal matmul blocks cover cs in G-lane steps.
    cs = _round_up(cs, g_block)
    w_t = cs + 2 * land
    arr_width = n_cols * cs + 2 * land
    n_g = cs // g_block

    tile = max(((tile_rows or TPU.blur_tile_rows) // 8) * 8, 8)
    while tile > 8 and _mxu_working_set_bytes(tile, cs, w_t, radius, halo,
                                              g_block) > _VMEM_TARGET:
        tile -= 8
    tile_rows = min(tile, _round_up(height, 8))
    hp = _round_up(height, tile_rows)
    n_tiles = hp // tile_rows
    copy_rows = _round_up(tile_rows + 2 * radius, 8)
    total_rows = hp - tile_rows + copy_rows
    return (halo, g_block, land, cs, n_cols, w_t, arr_width, n_g,
            tile_rows, hp, n_tiles, copy_rows, total_rows)


def gaussian_mxu_modeled_flops(height: int, dw: int, radius: int,
                               tap_stride: int, box: bool = False,
                               n: int = 1) -> int:
    """MXU matmul FLOPs one ``_gaussian_mxu`` call actually issues.

    Counts the DENSE blocked matmuls the kernel emits (2*M*K*N per dot),
    not the nominal tap arithmetic -- this is the number the MXU pays, so
    rate = flops / time is comparable to the generation's bf16 peak (the
    dual-roofline "Compute Throughput" analog of
    /root/reference/backend/profiling/ncu_profiler.py:795-934).

    Gaussian issues TWO dots per block per pass (the bf16 hi+lo split);
    box issues ONE (the ones band needs no split).
    """
    (halo, g_block, _land, cs, n_cols, _w_t, _aw, n_g, tile_rows,
     _hp, n_tiles, copy_rows, _tr) = _mxu_plan(height, dw, radius,
                                               tap_stride)
    k_rows = g_block + 2 * halo
    n_dots = 1 if box else 2
    flops_h = n_g * n_dots * 2 * copy_rows * k_rows * g_block
    flops_v = n_dots * 2 * tile_rows * copy_rows * cs
    return n * n_tiles * n_cols * (flops_h + flops_v)


def host_prepad_mxu(x_np, radius: int, tap_stride: int,
                    tile_rows: int | None = None,
                    g_block: int | None = None):
    """(N, H, DW) or (H, DW) uint8 numpy -> the fully padded buffer
    `_gaussian_mxu(host_prepadded=...)` consumes, built on the host
    (byte-identical to the in-program pads: constant-zero rows, then
    edge-replicated lanes on the image rows).  Only the
    radius <= tile_rows regime is supported (same constraint as the
    blur.py host pads)."""
    import numpy as _np

    x = x_np if x_np.ndim == 3 else x_np[None]
    n, height, dw = x.shape
    (_halo, _gb, land, _cs, _n_cols, _w_t, arr_width, _n_g, tr,
     _hp, _nt, _cr, total_rows) = _mxu_plan(height, dw, radius, tap_stride,
                                            tile_rows=tile_rows,
                                            g_block=g_block)
    if radius > tr:
        raise ValueError("host_prepad_mxu requires radius <= tile_rows")
    from .blur import _host_pad_buffer

    out = _host_pad_buffer(x, total_rows, arr_width, radius, land,
                           edge_lanes=True)
    return out if x_np.ndim == 3 else out[0]


def _gaussian_mxu(planar_or_rows: jnp.ndarray, weights: jnp.ndarray,
                  radius: int, tap_stride: int, interpret: bool,
                  tile_rows: int | None = None,
                  g_block: int | None = None,
                  passes: str = "both",
                  box_scale: float | None = None,
                  host_prepadded: tuple[int, int] | None = None,
                  ) -> jnp.ndarray:
    """(N, H, W_data) uint8 -> same, MXU separable Gaussian.

    tap_stride=1: planar planes ride N.  tap_stride=C: interleaved rows.
    host_prepadded=(H, DW): input is the fully padded (N, total_rows,
    arr_width) buffer from `host_prepad_mxu`; no in-program pad ops.
    """
    if host_prepadded is not None:
        n = planar_or_rows.shape[0]
        height, dw = host_prepadded
    else:
        n, height, dw = planar_or_rows.shape
    plan = _mxu_plan(height, dw, radius, tap_stride,
                     tile_rows=tile_rows, g_block=g_block)
    (halo, g_block, land, cs, n_cols, w_t, arr_width, n_g, tile_rows,
     hp, n_tiles, copy_rows, total_rows) = plan
    if not interpret and _mxu_working_set_bytes(
            8, cs, w_t, radius, halo, g_block) >= _VMEM_HARD_LIMIT:
        raise ValueError("MXU gaussian working set exceeds VMEM; use the "
                         "VPU/XLA tiers (see gaussian_mxu_feasible)")
    left_fills, right_fills = (
        _fill_sites(dw, cs, n_cols, halo, land, w_t) if tap_stride > 1
        else ((), ()))

    row_fill = None
    if host_prepadded is not None:
        if radius > tile_rows:
            raise ValueError("host_prepadded requires radius <= tile_rows")
        if planar_or_rows.shape != (n, total_rows, arr_width):
            raise ValueError(
                f"host_prepadded buffer is {planar_or_rows.shape}, "
                f"expected {(n, total_rows, arr_width)} -- rebuild with "
                "host_prepad_mxu")
        from .blur import _row_fill_sites

        row_fill = _row_fill_sites(height, radius, tile_rows, n_tiles,
                                   copy_rows)
        x = planar_or_rows
    elif radius <= tile_rows:
        from .blur import _row_fill_sites

        row_fill = _row_fill_sites(height, radius, tile_rows, n_tiles,
                                   copy_rows)
        x = jnp.pad(
            planar_or_rows,
            ((0, 0), (radius, total_rows - height - radius), (0, 0)))
        x = jnp.pad(x, ((0, 0), (0, 0), (land, arr_width - land - dw)),
                    mode="edge")
    else:
        x = jnp.pad(
            planar_or_rows,
            ((0, 0), (radius, total_rows - height - radius),
             (land, arr_width - land - dw)),
            mode="edge",
        )

    k_rows = g_block + 2 * halo
    b_hi, b_lo = _band_matrices(weights, radius, tap_stride, k_rows, g_block)
    # Vertical band: out row t contracts copy-band rows [t, t + 2r], i.e.
    # A[t, k] = w[k - t] -- the transpose of _band_matrices' B[k, l] =
    # w[k - l] orientation, so build at (copy_rows, tile_rows) and
    # transpose once in-graph (tiny).
    a_hi, a_lo = (m.T for m in _band_matrices(
        weights, radius, 1, copy_rows, tile_rows))

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
            _gauss_mxu_kernel,
            radius=radius,
            tile_rows=tile_rows,
            copy_rows=copy_rows,
            tap_stride=tap_stride,
            col_step=0 if n_cols == 1 else cs,
            land=land,
            left_fills=left_fills,
            right_fills=right_fills,
            n_g=n_g,
            g_block=g_block,
            interp=interpret,
            passes=passes,
            row_fill=row_fill,
            box_scale=box_scale,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_hi
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_lo
            pl.BlockSpec(memory_space=pltpu.VMEM),   # a_hi
            pl.BlockSpec(memory_space=pltpu.VMEM),   # a_lo
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, height, dw), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((copy_rows, w_t), jnp.uint8),
            pltpu.VMEM((copy_rows, w_t), jnp.bfloat16),
            pltpu.VMEM((copy_rows, cs), jnp.float32),
            pltpu.VMEM((copy_rows, cs), jnp.bfloat16),
            pltpu.VMEM((tile_rows, cs), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_SCOPE_BYTES),
        interpret=interpret,
    )(b_hi, b_lo, a_hi, a_lo, x)

    return out


def gaussian_mxu(img_hwc: jnp.ndarray, weights: jnp.ndarray, radius: int,
                 interpret: bool = False,
                 passes: str = "both") -> jnp.ndarray:
    """(H, W, C) u8 -> u8 MXU Gaussian (ADVANCED tier, planar)."""
    planar = jnp.transpose(img_hwc, (2, 0, 1))
    out = _gaussian_mxu(planar, weights, radius, tap_stride=1,
                        interpret=interpret, passes=passes)
    return jnp.transpose(out, (1, 2, 0))


def gaussian_mxu_rows(rows_u8: jnp.ndarray, weights: jnp.ndarray,
                      radius: int, channels: int,
                      interpret: bool = False,
                      passes: str = "both",
                      host_prepadded: tuple[int, int] | None = None,
                      ) -> jnp.ndarray:
    """(H, W*C) interleaved u8 rows -> same (ADVANCED tier, serving)."""
    return _gaussian_mxu(rows_u8[None], weights, radius,
                         tap_stride=channels, interpret=interpret,
                         passes=passes, host_prepadded=host_prepadded)[0]


def gaussian_mxu_rows_batch(rows_u8: jnp.ndarray, weights: jnp.ndarray,
                            radius: int, channels: int,
                            interpret: bool = False,
                            host_prepadded: tuple[int, int] | None = None,
                            ) -> jnp.ndarray:
    """(B, H, W*C) batch -> same, batch riding the kernel grid."""
    return _gaussian_mxu(rows_u8, weights, radius, tap_stride=channels,
                         interpret=interpret, host_prepadded=host_prepadded)


# ---------------------------------------------------------------------------
# Box blur on the MXU: ones band + the reference's f32 reciprocal.
# BIT-EXACT vs the naive oracle (see module docstring) — chasing the
# reference's shared-memory box kernel (image_filters.cu:448-673) with the
# MXU instead of the VPU doubling-window tier.  Routing is decided by the
# silicon A/B in scripts/exp_box_mxu.py.
# ---------------------------------------------------------------------------


def _box_operands(radius: int):
    weights = jnp.ones(2 * radius + 1, jnp.float32)
    from ..weights import box_inv_taps_f32

    return weights, float(box_inv_taps_f32(radius))


def box_mxu(img_hwc: jnp.ndarray, radius: int,
            interpret: bool = False, passes: str = "both") -> jnp.ndarray:
    """(H, W, C) u8 -> u8 MXU box blur (planar), bit-exact."""
    weights, scale = _box_operands(radius)
    planar = jnp.transpose(img_hwc, (2, 0, 1))
    out = _gaussian_mxu(planar, weights, radius, tap_stride=1,
                        interpret=interpret, passes=passes, box_scale=scale)
    return jnp.transpose(out, (1, 2, 0))


def box_mxu_rows(rows_u8: jnp.ndarray, radius: int, channels: int,
                 interpret: bool = False,
                 passes: str = "both",
                 host_prepadded: tuple[int, int] | None = None,
                 ) -> jnp.ndarray:
    """(H, W*C) interleaved u8 rows -> same (serving layout), bit-exact."""
    weights, scale = _box_operands(radius)
    return _gaussian_mxu(rows_u8[None], weights, radius,
                         tap_stride=channels, interpret=interpret,
                         passes=passes, box_scale=scale,
                         host_prepadded=host_prepadded)[0]


def box_mxu_rows_batch(rows_u8: jnp.ndarray, radius: int, channels: int,
                       interpret: bool = False,
                       host_prepadded: tuple[int, int] | None = None,
                       ) -> jnp.ndarray:
    """(B, H, W*C) batch -> same, batch riding the kernel grid."""
    weights, scale = _box_operands(radius)
    return _gaussian_mxu(rows_u8, weights, radius, tap_stride=channels,
                         interpret=interpret, box_scale=scale,
                         host_prepadded=host_prepadded)
