#!/usr/bin/env python3
"""Probe: is the horizontal pass's unaligned (stride-C) tap slicing a real
cost, or is the conv floor just mul/add throughput?

Arms (timing probes; aligned/noquant arms are numerically WRONG on purpose
-- they only isolate codegen costs):

  h_real      H-pass-only serving kernel (stride-3 unaligned tap slices)
  h_aligned   same loop, taps at 128-lane-aligned offsets (no rotates)
  h_notaps    no taps: hbuf = xbuf center * w0 (pure copy+mul floor)
  full_real   the served both-pass kernel (reference point)
  full_noclip drop the defensive clip in the output store

If h_real ~= h_aligned, Mosaic's unaligned loads are already cheap and the
conv pass is at its arithmetic floor -> stop optimizing, document.
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
    print(f"device: {default_device()}", flush=True)

    rng = np.random.default_rng(7)
    wf = W * C
    rows = jax.device_put(
        rng.integers(0, 256, size=(H, wf), dtype=np.uint8), default_device())
    w3 = jax.device_put(gaussian_kernel_f32(RADIUS, 2.0), default_device())

    halo = RADIUS * C
    land, cs, _, w_t, arr_width = nblur._landed_geometry(wf, halo, chunked=False)
    taps = 2 * RADIUS + 1
    tile_rows = nblur._pick_tile_rows(128, cs, w_t, RADIUS, False)
    copy_rows = nblur._round_up(tile_rows + 2 * RADIUS, 8)
    hp = nblur._round_up(H, tile_rows)
    n_tiles = hp // tile_rows
    total_rows = hp - tile_rows + copy_rows
    print(f"tile_rows={tile_rows}", flush=True)

    def make(mode):
        def kernel(w_ref, in_ref, out_ref, tile_u8, xbuf, hbuf, vbuf, sem):
            i = pl.program_id(1)
            copy = pltpu.make_async_copy(
                in_ref.at[0, pl.ds(i * tile_rows, copy_rows), :], tile_u8, sem)
            copy.start()
            copy.wait()
            xbuf[:, :] = tile_u8[:].astype(jnp.int32).astype(jnp.float32)

            def hpass(offsets):
                for t in range(taps):
                    off = offsets[t]
                    sl = xbuf[:, off:off + cs]
                    term = sl * w_ref[0, t]
                    if t == 0:
                        hbuf[:, :] = term
                    else:
                        hbuf[:, :] = hbuf[:, :] + term

            if mode in ("h_real", "full_real", "full_noclip"):
                hpass([land - halo + t * C for t in range(taps)])
            elif mode == "h_aligned":
                # numerically wrong on purpose: 128-aligned tap offsets so
                # Mosaic needs no lane rotates; isolates the rotate cost
                hpass([128 * (t % 2) for t in range(taps)])
            elif mode == "h_notaps":
                hbuf[:, :] = xbuf[:, land:land + cs] * w_ref[0, 0]
            hbuf[:, :] = jnp.floor(hbuf[:, :] + jnp.float32(0.5))

            if mode.startswith("full"):
                for t in range(taps):
                    term = hbuf[t:t + tile_rows, :] * w_ref[0, t]
                    if t == 0:
                        vbuf[:, :] = term
                    else:
                        vbuf[:, :] = vbuf[:, :] + term
                v = jnp.floor(vbuf[:, :] + jnp.float32(0.5))
                if mode == "full_real":
                    v = jnp.clip(v, 0.0, 255.0)
                out_ref[0] = v.astype(jnp.int32).astype(jnp.uint8)
            else:
                out_ref[0] = (
                    jnp.clip(hbuf[RADIUS:RADIUS + tile_rows, :], 0.0, 255.0)
                    .astype(jnp.int32).astype(jnp.uint8))

        def fn(x, w):
            xp = jnp.pad(x[None], ((0, 0), (RADIUS, total_rows - H - RADIUS),
                                   (land, arr_width - land - wf)), mode="edge")
            out = pl.pallas_call(
                kernel,
                grid=(1, n_tiles),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((1, tile_rows, cs),
                                       lambda b, i: (b, i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, H, wf), jnp.uint8),
                scratch_shapes=[
                    pltpu.VMEM((copy_rows, w_t), jnp.uint8),
                    pltpu.VMEM((copy_rows, w_t), jnp.float32),
                    pltpu.VMEM((copy_rows, cs), jnp.float32),
                    pltpu.VMEM((tile_rows, cs), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=nblur._VMEM_SCOPE_BYTES),
            )(w.reshape(1, -1), xp)
            return out[0]

        return fn

    arms = [(m, make(m)) for m in
            ("h_real", "h_aligned", "h_notaps", "full_real", "full_noclip")]
    arms.append(("served", lambda x, w: nblur.gaussian_pallas_rows(x, w, RADIUS, C)))

    samples = {name: [] for name, _ in arms}
    for r in range(rounds):
        for name, fn in arms:
            t = device_time_ms(fn, [rows, w3], iters=32, sync_reps=2)
            samples[name].append(t)
            print(f"round {r} {name}: {t:.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    for name in samples:
        print(f"{name}: {float(np.median(samples[name])):.4f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
