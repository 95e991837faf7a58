#!/usr/bin/env python3
"""Probe: how expensive are stride-3 lane loads/stores in Mosaic?

If a strided (deinterleaving) VMEM access costs <~2x a contiguous one, the
serving sobel could deinterleave in-kernel, compute gray/gradients on W
lanes instead of W*C (3x less VPU work), and reinterleave on store.

Arms (all (H, 3840) f32 -> same shape, chainable for the loop-delta timer):
  base    contiguous copy-scale of all lanes
  sload   full deinterleave via three stride-3 loads
  sstore  full reinterleave via three stride-3 stores
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 2048, 3840
TH = 256
WQ = W // 3


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

    def base_kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * np.float32(1.0001)

    def sload_kernel(x_ref, o_ref):
        for c in range(3):
            o_ref[:, c * WQ : (c + 1) * WQ] = (
                x_ref[:, pl.Slice(c, WQ, 3)] * np.float32(1.0001))

    def sstore_kernel(x_ref, o_ref):
        for c in range(3):
            o_ref[:, pl.Slice(c, WQ, 3)] = (
                x_ref[:, c * WQ : (c + 1) * WQ] * np.float32(1.0001))

    def make(kernel):
        call = pl.pallas_call(
            kernel,
            grid=(H // TH,),
            in_specs=[pl.BlockSpec((TH, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TH, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        )
        return lambda x: call(x)

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.random((H, W), dtype=np.float32), dev)

    arms = [("base", make(base_kernel), [x]),
            ("sload", make(sload_kernel), [x]),
            ("sstore", make(sstore_kernel), [x])]

    results = {n: [] for n, _, _ in arms}
    for r in range(rounds):
        print(f"--- round {r} ---", flush=True)
        for name, fn, fargs in arms:
            ms = device_time_ms(fn, fargs, iters=64)
            results[name].append(ms)
            print(f"  {name:7} {ms:8.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    med = {}
    for name, xs in results.items():
        ss = sorted(xs)
        med[name] = ss[len(ss) // 2] if len(ss) % 2 else 0.5 * (
            ss[len(ss) // 2 - 1] + ss[len(ss) // 2])
        print(f"{name:7} {med[name]:8.4f} ms  {[round(v, 4) for v in xs]}",
              flush=True)
    print(f"sload/base  = {med['sload'] / med['base']:.2f}", flush=True)
    print(f"sstore/base = {med['sstore'] / med['base']:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
