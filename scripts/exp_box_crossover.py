#!/usr/bin/env python3
"""Box-blur XLA-vs-Pallas crossover with the round-2 kernels (the shared
2.5 MP threshold was calibrated on gaussian; sobel's moved to 1.4 MP --
does box's move too?).  One-process interleaved A/B, r=5 (doubling on in
both tiers)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

C = 3
RADIUS = 5


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax

    from gpu_image_processing_tpu.ops import interleaved as il
    from gpu_image_processing_tpu.ops.pallas import blur as nblur
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    print(f"device: {default_device()}", flush=True)

    rng = np.random.default_rng(7)
    sizes = [(1000, 1300), (1300, 1700), (1550, 2000), (1750, 2400)]
    arms = []
    for h, w in sizes:
        rows = jax.device_put(
            rng.integers(0, 256, size=(h, w * C), dtype=np.uint8),
            default_device())
        mp = h * w / 1e6
        arms.append((f"xla_{mp:.1f}MP", lambda x: il.box_rows(
            x, RADIUS, C, doubling=True), [rows]))
        arms.append((f"pls_{mp:.1f}MP", lambda x: nblur.box_pallas_rows(
            x, RADIUS, C), [rows]))

    samples = {name: [] for name, _, _ in arms}
    for r in range(rounds):
        for name, fn, args in arms:
            t = device_time_ms(fn, args, iters=32, sync_reps=2)
            samples[name].append(t)
            print(f"round {r} {name}: {t:.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    for name in samples:
        print(f"{name}: {float(np.median(samples[name])):.4f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
