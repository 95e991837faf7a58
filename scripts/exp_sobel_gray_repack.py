#!/usr/bin/env python3
"""A/B: interleaved serving sobel with MXU gray COMPACTION vs the shipped
every-lane kernel (VERDICT r2 item 7).

The shipped rows sobel (ops/pallas/sobel.py::_sobel_kernel_interleaved)
computes gray, taps, and sqrt at EVERY interleaved lane -- 3x the pixel
count for RGB -- because a stride-C lane deinterleave does not compile
(Mosaic strided loads need a 128-wide minor dim; scripts/exp_strided_lanes.py)
and the planar sibling runs 0.075-0.087 ms vs 0.139 for rows.

This experiment moves the deinterleave onto the MXU:

1. COMPACT: gray pixel j = Rec.601 over lanes (j*C .. j*C+2).  For a
   128-gray-pixel block the needed input lanes span exactly 128*C and
   consecutive blocks tile the lane axis contiguously, so the whole
   compaction is n_gb banded matmuls X[:, g*128C : (g+1)*128C] @ S with
   S[t*C+p, t] = w_p -- bf16x2 split (hi + lo) keeps the gray within
   f32-sum ulps of the sequential chain (same argument as
   ops/pallas/blur_mxu.py; u8 values are bf16-exact).
2. TAPS at 1x lanes: gx/gy/sqrt/quantize on the compact (TH, ~W) plane --
   the 3x VPU redundancy gone.  Border masking happens HERE (compact
   lanes), so the expansion needs no masks.
3. EXPAND on the MXU: out lane l must carry magnitude[l // C]; per
   128-lane output block that is one (TH,128) @ (128,128) matmul with a
   0/1 selection matrix built from iota compares (static per block).
   Quantized magnitudes are u8-valued ints -- bf16-exact, so the
   expansion is EXACT.

Cost model (why this may lose): compaction adds ~768 MXU flops/pixel
(K=128*C band, x2 for hi/lo) ~= 15 VPU-equivalent ops, expansion ~10 more,
vs ~60 VPU ops/pixel saved in taps.  Net win only if the MXU time
overlaps/undercuts the saved VPU time -- Mosaic codegen defies reasoning;
measure (CLAUDE.md drift discipline: interleaved arms, one process,
within-round ratios, <30% = noise).

Gate: same as the TPU color-sobel validation gate (maxdiff <= 6 on
<= 0.1% of pixels vs the shipped kernel -- gray ulp differences can flip
isolated floor(g+0.5) ties) AND within-pixel channels-equal.

Run: python scripts/exp_sobel_gray_repack.py [rounds]
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3
ITERS = 48


# ---------------------------------------------------------------------------
# Experimental kernel
# ---------------------------------------------------------------------------


def _build(level: int = 2, n_split: int = 3, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gpu_image_processing_tpu.ops.pallas.blur import (
        _LAND,
        _round_up,
        _VMEM_SCOPE_BYTES,
    )

    def kernel(s_ref, in_ref, out_ref, tile_u8, x16, gbuf, mq, sem,
               *, channels, tile_rows, copy_rows, height, width, cs,
               n_gb, n_ob, wpad):
        b = pl.program_id(0)
        i = pl.program_id(1)
        copy = pltpu.make_async_copy(
            in_ref.at[b, pl.ds(i * tile_rows, copy_rows), :], tile_u8, sem)
        copy.start()
        copy.wait()

        up = (lambda a: a.astype(jnp.float32)) if interpret else (lambda a: a)

        x16[:, :] = tile_u8[:].astype(jnp.int32).astype(
            jnp.float32).astype(jnp.bfloat16)

        # 1. MXU compaction: gray pixel j lands at gbuf lane j+1.
        base = _LAND - channels   # gray lane 0 <-> pixel -1 <-> input lane _LAND-C
        kspan = 128 * channels
        for g in range(n_gb):
            sl_x = x16[:, base + g * kspan : base + (g + 1) * kspan]
            acc = jnp.dot(up(sl_x), up(s_ref[0]),
                          preferred_element_type=jnp.float32)
            for t in range(1, n_split):
                acc = acc + jnp.dot(up(sl_x), up(s_ref[t]),
                                    preferred_element_type=jnp.float32)
            gbuf[:, g * 128 : (g + 1) * 128] = acc
        if level == 2:
            # u8 gray quantization during the "load" (image_filters.cu:1444).
            gbuf[:, :] = jnp.floor(gbuf[:, :] + jnp.float32(0.5))
        g_ = gbuf[:, :]

        # 2. Taps at 1x lanes on the compact plane.
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
        # Border masking on the COMPACT plane (one lane per pixel): junk
        # pixels >= width die here too, so the expansion is mask-free.
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

    def sobel_mxu_rows(rows_u8, width: int, channels: int):
        b, height, wf = rows_u8.shape
        cs = _round_up(wf, 128)
        n_ob = cs // 128
        wpad = _round_up(width, 128) + 128    # taps + expansion slices fit
        gw = wpad + 128                       # tap offsets reach 2 + wpad
        n_gb = gw // 128
        w_t = _LAND + n_gb * 128 * channels + 128
        tile_rows = min(96, _round_up(height, 8))
        hp = _round_up(height, tile_rows)
        n_tiles = hp // tile_rows
        copy_rows = _round_up(tile_rows + 2, 8)
        total_rows = hp - tile_rows + copy_rows

        # Constant pad (content only feeds masked/zeroed outputs).
        x = jnp.pad(rows_u8, ((0, 0), (1, total_rows - height - 1),
                              (_LAND, w_t - _LAND - wf)))

        # Rec.601 selection band, bf16x2 (alpha weight 0 for C=4).
        wvec = np.zeros(channels, np.float32)
        wvec[:3] = np.float32([0.299, 0.587, 0.114])[: min(3, channels)]
        if channels == 1:
            wvec[0] = 1.0
        s = np.zeros((128 * channels, 128), np.float32)
        for t in range(128):
            for p in range(channels):
                s[t * channels + p, t] = wvec[p]
        # bf16 x n_split cascade: residual after 3 terms is ~2^-26
        # relative -- below f32 summation ulps, so the compact gray sits
        # within 1-2 ulp of the sequential f32 chain and quantization-tie
        # flips return to the FMA-gate's own rarity (bf16x2 measured
        # 0.38%% of outputs flipped -- too hot for the 0.1%% gate).
        rem = jnp.asarray(s)
        terms = []
        for _ in range(n_split):
            t32 = jax.lax.reduce_precision(rem, exponent_bits=8,
                                           mantissa_bits=7)
            terms.append(t32.astype(jnp.bfloat16))
            rem = rem - t32
        s_stack = jnp.stack(terms)

        out = pl.pallas_call(
            functools.partial(
                kernel, channels=channels, tile_rows=tile_rows,
                copy_rows=copy_rows, height=height, width=width, cs=cs,
                n_gb=n_gb, n_ob=n_ob, wpad=wpad),
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # s_stack
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
        )(s_stack, x)
        return out

    return sobel_mxu_rows


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import jax

    from gpu_image_processing_tpu.ops.pallas import sobel as shipped
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        is_tpu,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    interp = not is_tpu()
    warmup_transfers()
    dev = default_device()
    print(f"device: {dev} (interpret={interp})", flush=True)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(H, W, C), dtype=np.uint8)
    rows = jax.device_put(img.reshape(1, H, W * C), dev)

    mxu = _build(level=2, n_split=3, interpret=interp)
    mxu_floor = _build(level=2, n_split=1, interpret=interp)

    a = np.asarray(jax.jit(
        lambda x: shipped.sobel_pallas_rows_batch(x, W, C, level=2,
                                                  interpret=interp))(rows))
    b = np.asarray(jax.jit(lambda x: mxu(x, W, C))(rows))
    d = np.abs(a.astype(int) - b.astype(int))
    frac = (d > 0).mean()
    print(f"gate vs shipped: maxdiff={d.max()} frac={frac:.2e} "
          f"(pass: maxdiff<=6 and frac<=1e-3)", flush=True)
    ch = b.reshape(H, W, C)
    print(f"channels-equal: {bool((ch == ch[:, :, :1]).all())}", flush=True)
    if d.max() > 6 or frac > 1e-3:
        print("GATE FAIL", flush=True)
        return 1

    arms = [
        ("shipped", lambda x: shipped.sobel_pallas_rows_batch(
            x, W, C, level=2, interpret=interp), [rows]),
        ("mxu_x3", lambda x: mxu(x, W, C), [rows]),
        ("mxu_x1", lambda x: mxu_floor(x, W, C), [rows]),  # MXU-cost floor probe
    ]
    results: dict[str, list[float]] = {n: [] for n, _, _ in arms}
    for r in range(rounds):
        print(f"--- round {r} ---", flush=True)
        for name, fn, fargs in arms:
            ms = device_time_ms(fn, fargs, iters=ITERS)
            results[name].append(ms)
            print(f"  {name:12} {ms:8.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    med = {}
    for name, xs in results.items():
        s = sorted(xs)
        med[name] = s[len(s) // 2] if len(s) % 2 else 0.5 * (
            s[len(s) // 2 - 1] + s[len(s) // 2])
        print(f"{name:12} {med[name]:8.4f} ms  {[round(x, 4) for x in xs]}",
              flush=True)
    print(f"mxu_x3/shipped = {med['mxu_x3'] / med['shipped']:.3f} "
          f"(route if < 0.7; 0.7-1.3 = noise band)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
