#!/usr/bin/env python3
"""Blur kernel v2 candidates, A/B'd in ONE process (drift discipline).

Variants (serving gaussian r=3, interleaved rows, single column):

  base      live module kernel (pad: edge rows + edge lanes -> the XLA row
            concatenate measured 0.19 ms in the served trace)
  rowfill   rows padded with CONSTANT zeros (single cheap XLA pad fusion);
            clamp-to-edge rows built IN-KERNEL by broadcast fills on the
            first/last real band
  pipe      static 2-slot DMA pipeline: each grid step processes TWO
            128-row bands; band B's DMA overlaps band A's compute (the
            round-1 dynamic-slot version lost 25%; slots here are STATIC)
  both      rowfill + pipe

Every variant is bit-exactness-gated against the live kernel ON DEVICE
before timing.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3
RADIUS = 3


def build_variant(nblur, jnp, jax, pl, pltpu, *, rowfill: bool, pipe: bool,
                  height: int, wf: int, channels: int, radius: int,
                  tile_rows: int | None = None,
                  vmem_limit_mb: int | None = None):
    """Returns fn(rows_u8, weights) -> rows_u8 for the variant kernel."""
    halo = radius * channels
    land, cs, n_cols, w_t, arr_width = nblur._landed_geometry(
        wf, halo, chunked=False)
    assert n_cols == 1
    taps = 2 * radius + 1
    if tile_rows is None:
        tile_rows = nblur._pick_tile_rows(128, cs, w_t, radius, False)
        if pipe:
            # second landing buffer joins the working set
            extra = (nblur._round_up(tile_rows + 2 * radius, 8)) * w_t
            while tile_rows > 8 and nblur._working_set_bytes(
                    tile_rows, cs, w_t, radius, False) + extra > nblur._VMEM_TARGET:
                tile_rows -= 8
    step_rows = 2 * tile_rows if pipe else tile_rows
    copy_rows = nblur._round_up(tile_rows + 2 * radius, 8)
    hp = nblur._round_up(height, step_rows)
    n_bands = hp // tile_rows
    n_steps = hp // step_rows
    total_rows = hp - tile_rows + copy_rows
    left_fills, right_fills = nblur._fill_sites(wf, cs, 1, halo, land, w_t)

    # bottom-edge fill geometry (rowfill): the band holding the last real
    # row, and the in-band sublane position of that row.
    tl_band = (height - 1) // tile_rows
    tl_pos = radius + (height - 1) - tl_band * tile_rows

    def kernel(w_ref, in_ref, out_ref, tile_a, tile_b, xbuf, hbuf, vbuf,
               sem_a, sem_b):
        j = pl.program_id(1)

        def band_dma(band_idx, tile, sem):
            return pltpu.make_async_copy(
                in_ref.at[0, pl.ds(band_idx * tile_rows, copy_rows), :],
                tile, sem)

        def process(tile, band_idx, band_static_hint, out_row0):
            """band_idx: traced band index; band_static_hint: (is_first,
            maybe_tl) static info for the row fills."""
            xbuf[:, :] = tile[:].astype(jnp.int32).astype(jnp.float32)
            if rowfill:
                is_first, maybe_tl = band_static_hint
                if is_first:
                    @pl.when(band_idx == 0)
                    def _():
                        xbuf[0:radius, :] = jnp.broadcast_to(
                            xbuf[radius:radius + 1, :], (radius, w_t))
                if maybe_tl and tl_pos + 1 + radius <= copy_rows:
                    @pl.when(band_idx == tl_band)
                    def _():
                        xbuf[tl_pos + 1:tl_pos + 1 + radius, :] = (
                            jnp.broadcast_to(xbuf[tl_pos:tl_pos + 1, :],
                                             (radius, w_t)))
            for left, sites in ((True, left_fills), (False, right_fills)):
                for _chunk, pos, fh in sites:
                    nblur._edge_fill(xbuf, pos, channels, fh, left=left)
            # horizontal
            for t in range(taps):
                sl = xbuf[:, land - halo + t * channels:
                          land - halo + t * channels + cs]
                term = sl * w_ref[0, t]
                if t == 0:
                    hbuf[:, :] = term
                else:
                    hbuf[:, :] = hbuf[:, :] + term
            hbuf[:, :] = jnp.floor(hbuf[:, :] + jnp.float32(0.5))
            # vertical
            for t in range(taps):
                term = hbuf[t:t + tile_rows, :] * w_ref[0, t]
                if t == 0:
                    vbuf[:, :] = term
                else:
                    vbuf[:, :] = vbuf[:, :] + term
            out_ref[0, out_row0:out_row0 + tile_rows, :] = (
                jnp.clip(jnp.floor(vbuf[:, :] + jnp.float32(0.5)), 0.0, 255.0)
                .astype(jnp.int32).astype(jnp.uint8))

        if not pipe:
            copy = band_dma(j, tile_a, sem_a)
            copy.start()
            copy.wait()
            process(tile_a, j, (True, True), 0)
            return

        # static 2-slot pipeline: bands 2j (slot a) and 2j+1 (slot b)
        @pl.when(j == 0)
        def _():
            band_dma(0, tile_a, sem_a).start()
        band_dma(2 * j + 1, tile_b, sem_b).start()
        pltpu.make_async_copy(
            in_ref.at[0, pl.ds(2 * j * tile_rows, copy_rows), :],
            tile_a, sem_a).wait()
        process(tile_a, 2 * j, (True, tl_band % 2 == 0), 0)
        @pl.when(j + 1 < n_steps)
        def _():
            band_dma(2 * j + 2, tile_a, sem_a).start()
        pltpu.make_async_copy(
            in_ref.at[0, pl.ds((2 * j + 1) * tile_rows, copy_rows), :],
            tile_b, sem_b).wait()
        process(tile_b, 2 * j + 1, (False, tl_band % 2 == 1), tile_rows)

    def wrapper(rows_u8, weights):
        if rowfill:
            x = jnp.pad(rows_u8[None],
                        ((0, 0), (radius, total_rows - height - radius),
                         (0, 0)))
            x = jnp.pad(x, ((0, 0), (0, 0), (land, arr_width - land - wf)),
                        mode="edge")
        else:
            x = jnp.pad(rows_u8[None],
                        ((0, 0), (radius, total_rows - height - radius),
                         (land, arr_width - land - wf)),
                        mode="edge")
        params = {}
        if vmem_limit_mb:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
        out = pl.pallas_call(
            kernel,
            grid=(1, n_steps),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, step_rows, cs), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, height, wf), jnp.uint8),
            scratch_shapes=[
                pltpu.VMEM((copy_rows, w_t), jnp.uint8),
                pltpu.VMEM((copy_rows, w_t), jnp.uint8),
                pltpu.VMEM((copy_rows, w_t), jnp.float32),
                pltpu.VMEM((copy_rows, cs), jnp.float32),
                pltpu.VMEM((tile_rows, cs), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            **params,
        )(weights.reshape(1, -1), x)
        return out[0]

    return wrapper


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gpu_image_processing_tpu.ops.pallas import blur as nblur
    from gpu_image_processing_tpu.ops.weights import gaussian_kernel_f32
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    print(f"device: {default_device()}", flush=True)

    rng = np.random.default_rng(7)
    wf = W * C
    rows = jax.device_put(
        rng.integers(0, 256, size=(H, wf), dtype=np.uint8), default_device())
    w3 = jax.device_put(gaussian_kernel_f32(RADIUS, 2.0), default_device())

    base = lambda x, w: nblur.gaussian_pallas_rows(x, w, RADIUS, C)
    variants = {
        "rf_t128_v64": dict(rowfill=True, pipe=False, tile_rows=128,
                            vmem_limit_mb=64),
        "rf_t192_v96": dict(rowfill=True, pipe=False, tile_rows=192,
                            vmem_limit_mb=96),
        "rf_t256_v110": dict(rowfill=True, pipe=False, tile_rows=256,
                             vmem_limit_mb=110),
        "t192_v96": dict(rowfill=False, pipe=False, tile_rows=192,
                         vmem_limit_mb=96),
        "rf_t64": dict(rowfill=True, pipe=False, tile_rows=64,
                       vmem_limit_mb=32),
    }
    arms = [("base", base)]
    for name, kw in variants.items():
        try:
            arms.append((name, build_variant(
                nblur, jnp, jax, pl, pltpu, height=H, wf=wf, channels=C,
                radius=RADIUS, **kw)))
        except Exception as exc:  # keep the run alive if a variant OOMs
            print(f"{name}: build failed: {exc}", flush=True)

    # bit-exactness gates ON DEVICE; compile-failing variants are dropped
    want = np.asarray(jax.jit(base)(rows, w3))
    live = [arms[0]]
    for name, fn in arms[1:]:
        try:
            got = np.asarray(jax.jit(fn)(rows, w3))
        except Exception as exc:
            print(f"{name}: compile/run failed: {str(exc)[:200]}", flush=True)
            continue
        if not np.array_equal(got, want):
            bad = np.abs(got.astype(int) - want.astype(int))
            print(f"{name}: MISMATCH maxdiff={bad.max()} at "
                  f"{np.unravel_index(bad.argmax(), bad.shape)}", flush=True)
            continue
        print(f"{name}: bit-exact vs base", flush=True)
        live.append((name, fn))
    arms = live

    samples = {name: [] for name, _ in arms}
    for r in range(rounds):
        for name, fn in arms:
            t = device_time_ms(fn, [rows, w3], iters=32, sync_reps=2)
            samples[name].append(t)
            print(f"round {r} {name}: {t:.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    base_med = float(np.median(samples["base"]))
    for name in samples:
        med = float(np.median(samples[name]))
        print(f"{name}: {med:.4f} ms ({med / base_med:.3f}x of base)",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
