#!/usr/bin/env python3
"""Tuning sweep on the landed-DMA geometry (one process, within-round A/B).

1. Planar gaussian tile_rows sweep (the old 'tile size irrelevant' result
   predates the landed scheme).
2. XLA tier vs Pallas rows kernels across image sizes: re-locate the
   routing crossover (config.TPU.xla_tier_max_pixels = 2.5 MP) now that the
   rows boundary removed the reshape tax from both tiers.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax

    from gpu_image_processing_tpu.ops import interleaved as il
    from gpu_image_processing_tpu.ops.pallas import blur as nblur
    from gpu_image_processing_tpu.ops.pallas import sobel as nsobel
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
    planar = jax.device_put(np.ascontiguousarray(img.transpose(2, 0, 1)), dev)
    w3 = jax.device_put(gaussian_kernel_f32(3, 2.0), dev)

    arms = []
    for tr in (64, 128, 192):
        arms.append((
            f"plnr_tr{tr}",
            (lambda tr: lambda x, w: nblur._separable_blur_planar(
                x, w, 3, False, tile_rows=tr))(tr),
            [planar, w3],
        ))

    # Crossover sizes (pixels): roughly 0.6, 1.3, 2.2, 3.1, 4.2 MP.
    sizes = [(600, 1000), (1000, 1300), (1300, 1700), (1550, 2000), (1750, 2400)]
    for h, w in sizes:
        im = rng.integers(0, 256, size=(h, w * C), dtype=np.uint8)
        rows = jax.device_put(im, dev)
        mp = h * w / 1e6
        arms.append((
            f"xla_g_{mp:.1f}MP",
            (lambda w: lambda x, wt: il.gaussian_rows(x, wt, 3, C))(w),
            [rows, w3],
        ))
        arms.append((
            f"pls_g_{mp:.1f}MP",
            (lambda w: lambda x, wt: nblur.gaussian_pallas_rows(x, wt, 3, C))(w),
            [rows, w3],
        ))
        arms.append((
            f"xla_s_{mp:.1f}MP",
            (lambda w: lambda x, wt: il.sobel_rows(x, 2, w, C))(w),
            [rows, w3],
        ))
        arms.append((
            f"pls_s_{mp:.1f}MP",
            (lambda w: lambda x, wt: nsobel.sobel_pallas_rows(x, w, C, level=2))(w),
            [rows, w3],
        ))

    results: dict[str, list[float]] = {n: [] for n, _, _ in arms}
    for r in range(rounds):
        print(f"--- round {r} ---", flush=True)
        for name, fn, fargs in arms:
            ms = device_time_ms(fn, fargs, iters=32)
            results[name].append(ms)
            print(f"  {name:14} {ms:8.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    for name, xs in results.items():
        s = sorted(xs)
        m = s[len(s) // 2] if len(s) % 2 else 0.5 * (s[len(s) // 2 - 1] + s[len(s) // 2])
        print(f"{name:14} {m:8.4f} ms  {[round(x, 4) for x in xs]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
