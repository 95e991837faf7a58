#!/usr/bin/env python3
"""Probe: can a Pallas TPU DMA copy a (CR, 9717)-lane band (lane size NOT a
multiple of 128) from an unpadded HBM array into a VMEM tile at an aligned
lane offset -- and at what speed vs the padded-width DMA?

If supported and fast, the blur prologue's full-image pad copy can be
replaced by zero-copy main-band DMAs + tiny XLA-built edge strips.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, WF = 2146, 9717          # README rows
TH, CR = 64, 72
LAND = 128
W_T = 9984 + 2 * LAND       # round_up(9717,128) + 256


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    dev = default_device()
    print(f"device: {dev}", flush=True)

    # Only bands that provably stay inside the unpadded array: row starts
    # i*TH (Mosaic must PROVE 8-divisibility -- a clamped min() start was
    # rejected: "Failed to prove that a tile index ... divisible by 8").
    n_tiles = (H - CR) // TH + 1
    hp = n_tiles * TH
    rows_padded = hp - TH + CR

    def kern_unpadded(in_ref, o_ref, tile, sem):
        i = pl.program_id(0)
        copy = pltpu.make_async_copy(
            in_ref.at[pl.ds(i * TH, CR), :],       # lanes: full 9717, odd size
            tile.at[:, LAND : LAND + WF],          # aligned dest offset
            sem,
        )
        copy.start()
        copy.wait()
        o_ref[:, :] = tile[CR - TH :, LAND : LAND + o_ref.shape[1]]

    def kern_padded(in_ref, o_ref, tile, sem):
        i = pl.program_id(0)
        copy = pltpu.make_async_copy(
            in_ref.at[pl.ds(i * TH, CR), :], tile, sem)
        copy.start()
        copy.wait()
        o_ref[:, :] = tile[CR - TH :, LAND : LAND + o_ref.shape[1]]

    out_w = 9600

    unpadded_call = pl.pallas_call(
        kern_unpadded,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TH, out_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, out_w), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((CR, W_T), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
    )
    padded_call = pl.pallas_call(
        kern_padded,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TH, out_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, out_w), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((CR, W_T), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
    )

    rng = np.random.default_rng(0)
    raw = jax.device_put(
        rng.integers(0, 256, size=(H, WF), dtype=np.uint8), dev)

    # Chainable shapes: out (H, out_w) != in (H, WF); wrap so in==out.
    def chain_unpadded(x):
        y = unpadded_call(x)
        return jnp.pad(y, ((0, H - hp), (0, WF - out_w)), mode="edge") \
            if hp < H else jnp.pad(y, ((0, 0), (0, WF - out_w)),
                                   mode="edge")[:H]

    padded_src = jax.device_put(
        rng.integers(0, 256, size=(rows_padded, W_T), dtype=np.uint8), dev)

    def chain_padded(x):
        y = padded_call(x)
        return jnp.pad(y, ((0, rows_padded - H), (0, W_T - out_w)),
                       mode="edge")

    # Correctness of the unpadded DMA (middle tiles).
    got = np.asarray(jax.jit(lambda x: unpadded_call(x))(raw))
    # Tile i outputs landing rows [CR-TH, CR) of the band starting at i*TH;
    # lanes [0, out_w) hold raw lanes [0, out_w).
    i = 5
    np.testing.assert_array_equal(
        got[i * TH : (i + 1) * TH],
        np.asarray(raw)[i * TH + CR - TH : i * TH + CR, :out_w])
    print("unpadded odd-width DMA: compiles + correct", flush=True)

    arms = [("unpadded", chain_unpadded, [raw]),
            ("padded", chain_padded, [padded_src])]
    results = {n: [] for n, _, _ in arms}
    for r in range(rounds):
        print(f"--- round {r} ---", flush=True)
        for name, fn, fargs in arms:
            ms = device_time_ms(fn, fargs, iters=64)
            results[name].append(ms)
            print(f"  {name:9} {ms:8.4f} ms", flush=True)
    for name, xs in results.items():
        ss = sorted(xs)
        m = ss[len(ss) // 2]
        print(f"{name:9} median {m:8.4f} ms  {[round(v, 4) for v in xs]}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
