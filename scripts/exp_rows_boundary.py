#!/usr/bin/env python3
"""Measure the serving-boundary layout cost: flat (N,) vs rows (H, W*C).

exp_landed_ab.py showed the landed-DMA prologue is roughly neutral on the
full flat path -- the remaining gap between the 0.44 ms interleaved kernel
and the 1.6 ms flat serving function must be the 1D<->2D reshapes at the
boundary: on TPU a (H*W*C,) <-> (H, W*C) reshape is a real relayout
whenever W*C is not a multiple of 128 (9717 here).

Arms (one process, interleaved within rounds):
  rows_full   (H, W*C) u8 in -> gaussian -> (H, W*C) u8 out (no 1D<->2D)
  flat_full   (H*W*C,) u8 in/out -- the current serving path
  reshape_rt  flat -> (H, W*C) -> +1 -> flat (reshape round trip + epsilon)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3
ITERS = 48


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax

    from gpu_image_processing_tpu.ops.pallas.blur import (
        _separable_blur_interleaved,
        gaussian_pallas_flat,
    )
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
    img = rng.integers(0, 256, size=(H, W, C), dtype=np.uint8)
    wf = W * C
    flat = jax.device_put(img.reshape(-1), dev)
    rows = jax.device_put(img.reshape(H, wf), dev)
    w3 = jax.device_put(gaussian_kernel_f32(3, 2.0), dev)

    def rows_full(x, w):
        out = _separable_blur_interleaved(
            x.reshape(1, H, wf), w, 3, box_mode=False, channels=C)
        return out.reshape(H, wf)

    def flat_full(x, w):
        return gaussian_pallas_flat(x, w, 3, H, W, C)

    def reshape_rt(x, w):
        return (x.reshape(H, wf) + jnp_one).reshape(-1)

    import jax.numpy as jnp
    jnp_one = jnp.uint8(1)

    arms = [
        ("rows_full", rows_full, [rows, w3]),
        ("flat_full", flat_full, [flat, w3]),
        ("reshape_rt", reshape_rt, [flat, w3]),
    ]
    results: dict[str, list[float]] = {n: [] for n, _, _ in arms}
    for r in range(rounds):
        print(f"--- round {r} ---", flush=True)
        for name, fn, fargs in arms:
            ms = device_time_ms(fn, fargs, iters=ITERS)
            results[name].append(ms)
            print(f"  {name:12} {ms:8.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    for name, xs in results.items():
        s = sorted(xs)
        m = s[len(s) // 2] if len(s) % 2 else 0.5 * (s[len(s) // 2 - 1] + s[len(s) // 2])
        print(f"{name:12} {m:8.4f} ms  {[round(x, 4) for x in xs]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
