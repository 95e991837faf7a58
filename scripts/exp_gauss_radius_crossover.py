#!/usr/bin/env python3
"""Gaussian XLA-vs-Pallas crossover as a function of RADIUS below the
2.5 MP size threshold (which was calibrated at r=3).  If the XLA tier's
31-tap conv scales worse than the Pallas kernel's, mid-size large-radius
requests are being mis-routed."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

C = 3


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax

    from gpu_image_processing_tpu.ops import interleaved as il
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
    arms = []
    for h, w in ((1000, 1300), (1300, 1700)):
        rows = jax.device_put(
            rng.integers(0, 256, size=(h, w * C), dtype=np.uint8),
            default_device())
        mp = h * w / 1e6
        for r in (7, 15):
            wts = jax.device_put(gaussian_kernel_f32(r, r / 3), default_device())
            arms.append((f"xla_{mp:.1f}MP_r{r}",
                         (lambda r: lambda x, wt: il.gaussian_rows(x, wt, r, C))(r),
                         [rows, wts]))
            arms.append((f"pls_{mp:.1f}MP_r{r}",
                         (lambda r: lambda x, wt: nblur.gaussian_pallas_rows(
                             x, wt, r, C))(r),
                         [rows, wts]))

    samples = {name: [] for name, _, _ in arms}
    for rd in range(rounds):
        for name, fn, args in arms:
            t = device_time_ms(fn, args, iters=32, sync_reps=2)
            samples[name].append(t)
            print(f"round {rd} {name}: {t:.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    for name in samples:
        print(f"{name}: {float(np.median(samples[name])):.4f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
