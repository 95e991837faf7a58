"""Serving-path Sobel with MXU gray compaction (interleaved rows tier).

The baseline rows kernel (sobel.py::_sobel_kernel_interleaved) computes
gray, gradients, and sqrt at EVERY interleaved lane -- 3x the pixel count
for RGB -- because a stride-C lane deinterleave does not compile on Mosaic
(strided loads need a 128-wide minor dim; scripts/exp_strided_lanes.py).
This tier moves the deinterleave onto the MXU instead (VERDICT r2 item 7;
the CUDA kernel being chased stages a compact gray tile in shared memory,
image_filters.cu:1436-1522):

1. COMPACT: gray pixel j is Rec.601 over input lanes (j*C .. j*C+2).  For
   a 128-gray-pixel block the inputs span exactly 128*C lanes and
   consecutive blocks tile the lane axis contiguously, so the compaction
   is n_gb banded matmuls X[:, g*128C:(g+1)*128C] @ S with
   S[t*C+p, t] = w_p.  S is split bf16x3 (hi+mid+lo cascade): the
   represented-weight residual is ~2^-26 relative, below f32 summation
   ulps, so the compact gray sits within 1-2 ulp of the sequential f32
   chain and quantization-tie flips stay inside the existing FMA gate
   (bf16x2 measured 0.38% of outputs flipped -- too hot; x3 measured
   2.97e-4 on silicon; the third matmul costs nothing measurable,
   scripts/exp_sobel_gray_repack.py).
2. TAPS at 1x lanes: gx/gy/sqrt/quantize on the compact (TH, ~W) plane.
   Border masking happens here (one lane per pixel), so the expansion
   needs no masks.
3. EXPAND on the MXU: out lane l carries magnitude[l // C]; per 128-lane
   output block that is one (TH, 128) @ (128, 128) matmul with a 0/1
   selection matrix built from iota compares (static per block).
   Quantized magnitudes are u8-valued integers -- bf16-exact -- so the
   expansion is EXACT and channel replication (image_filters.cu:1311-1313)
   holds by construction.

Measured on v5e (scripts/exp_sobel_gray_repack.py, 5 interleaved rounds in
one process, README 7 MP workload): 0.361x the every-lane kernel -- well
past the 30% drift noise floor.

Numerics contract: the tier serves color images (C > 1) at two numerics
levels.  `level=2` quantizes the compact gray to u8 in-kernel (the
shared-memory tile-load rounding, image_filters.cu:1444); its CPU/TPU
acceptance gate is already maxdiff <= 6 on <= 0.1% of pixels vs the
strict-order oracle (tests/sobel_tolerance.py, tpu_validation.py) and
the compact gray's f32-ulp wiggle lives inside it.  `level=1` (the
ADVANCED serving tier's numerics) keeps the gray in f32 -- the compact
gray IS an f32 value within 1-2 ulp of the sequential Rec.601 chain, so
skipping the quantization is the whole change; its gate is the ADVANCED
maxdiff <= 1.  Grayscale (C == 1) stays on the exact every-lane kernel
at every level: it has no redundancy to remove and its gate is exact
equality.  Request-level 1 (naive parity tier) never routes here.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import TPU
from .blur import _LAND, _round_up, _VMEM_HARD_LIMIT, _VMEM_SCOPE_BYTES

# bf16 cascade terms for the Rec.601 band (see module docstring).
# Per NUMERICS level: level 2 (u8-quantized gray) needs x3 -- the x2
# residual (~2^-16 relative) measured 0.38% quantization-tie flips,
# too hot for the L2 acceptance gate.  Level 1 (f32 gray, what the
# ADVANCED serving tier requests) carries the maxdiff<=1 gate, which
# tie flips satisfy by definition -- x2 cuts the compaction (the
# dominant ~90% of the kernel's MXU work) by a third.  Routed only
# after the silicon gate+timing run (scripts/exp_sobel_nsplit.py).
_N_SPLIT = 3


def _n_split(level: int) -> int:
    return 2 if level == 1 and _L4_X2 else _N_SPLIT


# Silicon verdict (scripts/exp_sobel_nsplit.py, 5 interleaved rounds,
# 2026-08-21, benchmarks/exp_sobel_nsplit_2026-08-21.log): the expected
# ~30% MXU-FLOP cut did NOT appear on the wall -- x2/x3 per-round
# 0.72/0.88/1.24/1.00/1.17, median 0.998, direction not unanimous.  The
# third cascade matmul evidently hides under the kernel's DMA/VPU work.
# Numerics passed (x2 vs oracle maxdiff 1, flips 3.0e-4 -- inside the
# ADVANCED gate), so this stays a tested-but-unrouted variant; keep x3.
_L4_X2 = False


def _geometry(width: int, channels: int, wf: int):
    """(cs, n_ob, wpad, gw, n_gb, w_t) lane geometry for the tier."""
    cs = _round_up(wf, 128)           # output lanes
    n_ob = cs // 128
    wpad = _round_up(width, 128) + 128  # tap width; expansion slices fit
    gw = wpad + 128                     # tap offsets reach 2 + wpad
    n_gb = gw // 128
    w_t = _LAND + n_gb * 128 * channels + 128
    return cs, n_ob, wpad, gw, n_gb, w_t


def _working_set_bytes(tile_rows: int, width: int, channels: int,
                       wf: int) -> int:
    cs, _, wpad, gw, _, w_t = _geometry(width, channels, wf)
    cr = _round_up(tile_rows + 2, 8)
    total = (
        cr * w_t * 1           # tile_u8
        + cr * w_t * 2         # x16 bf16
        + cr * gw * 4          # gbuf f32
        + tile_rows * wpad * 4   # mq f32
        + 2 * tile_rows * cs     # double-buffered out block
        + _N_SPLIT * 128 * channels * 128 * 2  # band operand
    )
    total += cr * wpad * 4 * 4   # matmul/tap temporaries (Mosaic stack)
    return total + 1_800_000


def _pick_tile_rows(width: int, channels: int, wf: int) -> int:
    tile = min(TPU.sobel_tile_rows, 96)
    tile = max((tile // 8) * 8, 8)
    while tile > 8 and _working_set_bytes(tile, width, channels,
                                          wf) > 48 * 1024 * 1024:
        tile -= 8
    return tile


def sobel_mxu_feasible(width: int, channels: int) -> bool:
    """Whether the MXU sobel working set fits VMEM at the minimum tile."""
    return _working_set_bytes(8, width, channels,
                              width * channels) < _VMEM_HARD_LIMIT


def use_mxu_sobel(width: int, channels: int, level: int) -> bool:
    """THE routing predicate for the rows sobel MXU tier.

    `level` is the NUMERICS level (2 = u8-quantized gray, 1 = f32 gray —
    what the ADVANCED serving tier requests); request-level 1 is served
    by the naive tier and never consults this predicate.  Auto: color
    images on a real TPU, when the working set fits.  GIP_TPU_SOBEL_MXU=1
    forces the tier on any backend (CPU interpret tests drive it this
    way); =0 disables it.
    """
    if (level not in (1, 2) or channels <= 1
            or not sobel_mxu_feasible(width, channels)):
        return False
    force = os.environ.get("GIP_TPU_SOBEL_MXU")
    if force is not None:
        return force == "1"
    from ...runtime.device import is_tpu

    return is_tpu()


def _band_stack(channels: int, n_split: int = _N_SPLIT) -> jnp.ndarray:
    """(n_split, 128*C, 128) bf16 Rec.601 selection band cascade."""
    wvec = np.zeros(channels, np.float32)
    if channels == 1:
        wvec[0] = 1.0
    else:
        wvec[:3] = np.float32([0.299, 0.587, 0.114])[: min(3, channels)]
    s = np.zeros((128 * channels, 128), np.float32)
    for t in range(128):
        for p in range(channels):
            s[t * channels + p, t] = wvec[p]
    rem = jnp.asarray(s)
    terms = []
    for _ in range(n_split):
        # reduce_precision, not a bf16 cast round-trip (the round trip gets
        # elided under --xla_allow_excess_precision; see blur_mxu.py).
        t32 = jax.lax.reduce_precision(rem, exponent_bits=8, mantissa_bits=7)
        terms.append(t32.astype(jnp.bfloat16))
        rem = rem - t32
    return jnp.stack(terms)


def _sobel_mxu_kernel(s_ref, in_ref, out_ref, tile_u8, x16, gbuf, mq, sem,
                      *, channels: int, tile_rows: int, copy_rows: int,
                      height: int, width: int, n_gb: int, n_ob: int,
                      wpad: int, interp: bool, level: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(
        in_ref.at[b, pl.ds(i * tile_rows, copy_rows), :], tile_u8, sem)
    copy.start()
    copy.wait()

    # Interpret mode (CPU) lacks a bf16 x bf16 -> f32 dot; upcast there.
    up = (lambda a: a.astype(jnp.float32)) if interp else (lambda a: a)

    x16[:, :] = tile_u8[:].astype(jnp.int32).astype(
        jnp.float32).astype(jnp.bfloat16)

    # 1. MXU compaction: gray pixel j lands at gbuf lane j+1.
    base = _LAND - channels
    kspan = 128 * channels
    for g in range(n_gb):
        sl_x = x16[:, base + g * kspan : base + (g + 1) * kspan]
        acc = jnp.dot(up(sl_x), up(s_ref[0]),
                      preferred_element_type=jnp.float32)
        for t in range(1, s_ref.shape[0]):
            acc = acc + jnp.dot(up(sl_x), up(s_ref[t]),
                                preferred_element_type=jnp.float32)
        gbuf[:, g * 128 : (g + 1) * 128] = acc
    if level == 2:
        # Level-2 u8 gray quantization during the "load" (:1444).
        # Level 1 (the ADVANCED serving numerics) keeps the f32 gray.
        gbuf[:, :] = jnp.floor(gbuf[:, :] + jnp.float32(0.5))
    g_ = gbuf[:, :]

    # 2. Taps at 1x lanes on the compact plane (:1555-1584 numerics).
    def tap(dy: int, dx: int) -> jnp.ndarray:
        return g_[dy : dy + tile_rows, 1 + dx : 1 + dx + wpad]

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
    q = jnp.floor(mag + jnp.float32(0.5))
    # Border masking on the COMPACT plane; junk pixels >= width die here
    # too, so the expansion is mask-free (:1532-1543).
    jcol = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, wpad), 1)
    grow = i * tile_rows + jax.lax.broadcasted_iota(
        jnp.int32, (tile_rows, wpad), 0)
    inside = ((jcol >= 1) & (jcol <= width - 2)
              & (grow >= 1) & (grow <= height - 2))
    mq[:, :] = jnp.where(inside, q, jnp.float32(0.0))

    # 3. MXU expansion: out[l] = mq[l // C], exact (u8-valued bf16).
    for ob in range(n_ob):
        j0 = (ob * 128) // channels
        r = (ob * 128) % channels
        kk = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        tt = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        e = ((r + tt) // channels == kk).astype(jnp.bfloat16)
        blk = jnp.dot(up(mq[:, j0 : j0 + 128].astype(jnp.bfloat16)),
                      up(e), preferred_element_type=jnp.float32)
        out_ref[0, :, ob * 128 : (ob + 1) * 128] = blk.astype(
            jnp.int32).astype(jnp.uint8)


def _rows_mxu_plan(height: int, width: int, channels: int, wf: int):
    """(cs, n_ob, wpad, gw, n_gb, w_t, tile_rows, n_tiles, copy_rows,
    total_rows) -- THE geometry for the rows MXU tier, shared by the
    kernel builder, the host pre-pad, and the flop model so none can
    drift from the real kernel (the sibling modules' _blur_plan/_mxu_plan
    rule)."""
    cs, n_ob, wpad, gw, n_gb, w_t = _geometry(width, channels, wf)
    tile_rows = min(_pick_tile_rows(width, channels, wf),
                    _round_up(height, 8))
    hp = _round_up(height, tile_rows)
    n_tiles = hp // tile_rows
    copy_rows = _round_up(tile_rows + 2, 8)
    total_rows = hp - tile_rows + copy_rows
    return (cs, n_ob, wpad, gw, n_gb, w_t, tile_rows, n_tiles, copy_rows,
            total_rows)


def sobel_mxu_modeled_flops(height: int, width: int, channels: int,
                            wf: int, b: int = 1, level: int = 2) -> int:
    """MXU matmul FLOPs one ``sobel_mxu_rows_batch`` call actually issues.

    Counts the dense blocked dots the kernel emits (2*M*K*N each): the
    bf16x3-split Rec.601 compaction (n_gb dots of (copy_rows, 128*C) @
    (128*C, 128) per split term) plus the 0/1 expansion (n_ob dots of
    (tile_rows, 128) @ (128, 128)).  The VPU tap/sqrt stage is not MXU
    work and is excluded.  Geometry comes from ``_rows_mxu_plan`` -- the
    same plan the builder uses, so the model cannot drift from the real
    kernel.
    """
    (_cs, n_ob, _wp, _gw, n_gb, _wt, tile_rows, n_tiles, copy_rows,
     _trows) = _rows_mxu_plan(height, width, channels, wf)
    f_compact = (n_gb * _n_split(level) * 2 * copy_rows
                 * (128 * channels) * 128)
    f_expand = n_ob * 2 * tile_rows * 128 * 128
    return b * n_tiles * (f_compact + f_expand)


def host_prepad_rows_mxu(rows_u8, width: int, channels: int):
    """(H, W*C) or (B, H, W*C) uint8 numpy -> the fully padded buffer for
    `sobel_mxu_rows*(host_prepadded=...)`: the single constant pad moves
    to the host (zeros everywhere except [1:1+H, _LAND:_LAND+wf])."""

    rows = rows_u8 if rows_u8.ndim == 3 else rows_u8[None]
    b, height, wf = rows.shape
    (_cs, _n_ob, _wp, _gw, _n_gb, w_t, _tr, _nt, _cr,
     total_rows) = _rows_mxu_plan(height, width, channels, wf)
    from .blur import _host_pad_buffer

    out = _host_pad_buffer(rows, total_rows, w_t, 1, _LAND,
                           edge_lanes=False)
    return out if rows_u8.ndim == 3 else out[0]


def sobel_mxu_rows_batch(
    rows_u8: jnp.ndarray,     # (B, H, W*C) uint8, interleaved rows
    width: int, channels: int,
    interpret: bool = False,
    level: int = 2,
    host_prepadded: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Serving Sobel on interleaved rows, MXU tier; (B, H, W*C).

    ``level`` is the numerics level: 2 = u8-quantized gray, 1 = f32 gray
    (what the ADVANCED request level serves).

    host_prepadded=(H, WF): input is the fully padded (B, total_rows,
    w_t) buffer from `host_prepad_rows_mxu`; no in-program pad op."""
    if host_prepadded is not None:
        b = rows_u8.shape[0]
        height, wf = host_prepadded
    else:
        b, height, wf = rows_u8.shape
    (cs, n_ob, wpad, gw, n_gb, w_t, tile_rows, n_tiles, copy_rows,
     total_rows) = _rows_mxu_plan(height, width, channels, wf)

    # Single constant pad: every pad element only feeds border pixels the
    # kernel zeroes or junk lanes the masks drop (same rationale as the
    # baseline rows kernel).  host_prepadded mode receives it pre-built.
    if host_prepadded is not None:
        if rows_u8.shape != (b, total_rows, w_t):
            raise ValueError(
                f"host_prepadded buffer is {rows_u8.shape}, expected "
                f"{(b, total_rows, w_t)} -- rebuild with "
                "host_prepad_rows_mxu")
        x = rows_u8
    else:
        x = jnp.pad(rows_u8, ((0, 0), (1, total_rows - height - 1),
                              (_LAND, w_t - _LAND - wf)))

    out = pl.pallas_call(
        functools.partial(
            _sobel_mxu_kernel, channels=channels, tile_rows=tile_rows,
            copy_rows=copy_rows, height=height, width=width,
            n_gb=n_gb, n_ob=n_ob, wpad=wpad, interp=interpret,
            level=level),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # band stack
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_rows, cs), lambda bb, i: (bb, i, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, height, wf), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((copy_rows, w_t), jnp.uint8),
            pltpu.VMEM((copy_rows, w_t), jnp.bfloat16),
            pltpu.VMEM((copy_rows, gw), jnp.float32),
            pltpu.VMEM((tile_rows, wpad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_SCOPE_BYTES),
        interpret=interpret,
    )(_band_stack(channels, _n_split(level)), x)
    return out


def sobel_mxu_rows(rows_u8: jnp.ndarray, width: int, channels: int,
                   interpret: bool = False, level: int = 2,
                   host_prepadded: tuple[int, int] | None = None,
                   ) -> jnp.ndarray:
    """(H, W*C) interleaved uint8 rows -> same edge map (numerics level
    2 = u8 gray, 1 = f32 gray)."""
    return sobel_mxu_rows_batch(rows_u8[None], width, channels,
                                interpret=interpret, level=level,
                                host_prepadded=host_prepadded)[0]
