#!/usr/bin/env python3
"""Roofline attribution for the serving gaussian L2 (VERDICT r2 item 1).

Breaks the 0.54 ms README-image serving time into its parts, interleaved
in ONE process (drift discipline):

  pad_only   the jnp.pad prologue (XLA relayout cost)
  copy_u8    minimal Pallas kernel: same grid + DMA + u8 store (no compute)
  copy_cast  + the u8->i32->f32 cast and f32->u8 quantize/store
  rows_h     horizontal pass only (unaligned-lane taps)
  rows_v     vertical pass only (sublane taps)
  rows_full  the served both-pass kernel
  tr###      tile_rows sweep on the full kernel

The split tells us whether the gap to the HBM roofline (~0.05 ms I/O
floor) is DMA, cast, or VPU tap arithmetic -- each has a different fix.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3
RADIUS = 3


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
    dev = default_device()
    print(f"device: {dev}", flush=True)

    rng = np.random.default_rng(7)
    wf = W * C
    rows = jax.device_put(
        rng.integers(0, 256, size=(H, wf), dtype=np.uint8), dev)
    w3 = jax.device_put(gaussian_kernel_f32(RADIUS, 2.0), dev)

    halo = RADIUS * C
    land, cs, n_cols, w_t, arr_width = nblur._landed_geometry(
        wf, halo, chunked=False)
    tile_rows = 128
    copy_rows = nblur._round_up(tile_rows + 2 * RADIUS, 8)
    hp = nblur._round_up(H, tile_rows)
    n_tiles = hp // tile_rows
    total_rows = hp - tile_rows + copy_rows

    def pad_fn(x):
        # the wrapper's prologue, output forced to stay (cheap dummy op so
        # XLA cannot elide the pad)
        return jnp.pad(
            x, ((RADIUS, total_rows - H - RADIUS), (land, arr_width - land - wf)),
            mode="edge")[:H, land:land + wf]

    # --- minimal structural kernels -------------------------------------
    def _copy_kernel(in_ref, out_ref, tile_u8, sem, *, cast: bool):
        i = pl.program_id(1)
        copy = pltpu.make_async_copy(
            in_ref.at[0, pl.ds(i * tile_rows, copy_rows), :], tile_u8, sem)
        copy.start()
        copy.wait()
        if cast:
            x = tile_u8[:].astype(jnp.int32).astype(jnp.float32)
            out_ref[0] = (
                jnp.clip(jnp.floor(x[RADIUS:RADIUS + tile_rows,
                                     land:land + cs] + 0.5), 0.0, 255.0)
                .astype(jnp.int32).astype(jnp.uint8))
        else:
            out_ref[0] = tile_u8[RADIUS:RADIUS + tile_rows, land:land + cs]

    def structural(x, cast):
        xp = jnp.pad(
            x[None], ((0, 0), (RADIUS, total_rows - H - RADIUS),
                      (land, arr_width - land - wf)), mode="edge")
        out = pl.pallas_call(
            functools.partial(_copy_kernel, cast=cast),
            grid=(1, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, tile_rows, cs), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, H, wf), jnp.uint8),
            scratch_shapes=[
                pltpu.VMEM((copy_rows, w_t), jnp.uint8),
                pltpu.SemaphoreType.DMA,
            ],
        )(xp)
        return out[0]

    arms = [
        ("pad_only", pad_fn, [rows]),
        ("copy_u8", lambda x: structural(x, False), [rows]),
        ("copy_cast", lambda x: structural(x, True), [rows]),
        ("rows_h", lambda x, w: nblur.gaussian_pallas_rows(
            x, w, RADIUS, C, passes="horizontal"), [rows, w3]),
        ("rows_v", lambda x, w: nblur.gaussian_pallas_rows(
            x, w, RADIUS, C, passes="vertical"), [rows, w3]),
        ("rows_full", lambda x, w: nblur.gaussian_pallas_rows(
            x, w, RADIUS, C), [rows, w3]),
    ]
    for tr in (192, 256, 512):
        arms.append((
            f"tr{tr}",
            (lambda tr: lambda x, w: nblur._separable_blur_interleaved(
                x[None], w, RADIUS, box_mode=False, channels=C,
                tile_rows=tr)[0])(tr),
            [rows, w3],
        ))

    # correctness gate: structural copy must reproduce the image
    got = np.asarray(jax.jit(lambda x: structural(x, False))(rows))
    np.testing.assert_array_equal(got, np.asarray(rows))
    got = np.asarray(jax.jit(lambda x: structural(x, True))(rows))
    np.testing.assert_array_equal(got, np.asarray(rows))
    print("structural copy kernels: bit-exact", flush=True)

    samples = {name: [] for name, _, _ in arms}
    for r in range(rounds):
        for name, fn, args in arms:
            t = device_time_ms(fn, args, iters=32, sync_reps=2)
            samples[name].append(t)
            print(f"round {r} {name}: {t:.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    for name in samples:
        med = float(np.median(samples[name]))
        print(f"{name}: {med:.4f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
