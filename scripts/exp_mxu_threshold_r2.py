#!/usr/bin/env python3
"""Re-locate GAUSS_MXU_MIN_RADIUS with the round-2 kernels (both the
folded VPU tier and the MXU tier got the constant-pad + 64 MB scope
treatment; the round-1 crossover at radius 5 may have moved).  Serving
rows layout, one-process interleaved A/B."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax

    from gpu_image_processing_tpu.ops.pallas import blur as nblur
    from gpu_image_processing_tpu.ops.pallas import blur_mxu as nmxu
    from gpu_image_processing_tpu.ops.weights import gaussian_kernel_f32
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    print(f"device: {default_device()}", flush=True)

    rng = np.random.default_rng(7)
    rows = jax.device_put(
        rng.integers(0, 256, size=(H, W * C), dtype=np.uint8),
        default_device())

    # control arm: the r=3 serving kernel measured ~0.4-0.6 ms all day --
    # if IT reads as degenerate too, the window is unusable, not the arms
    w3 = jax.device_put(gaussian_kernel_f32(3, 2.0), default_device())
    arms = [("control_r3", lambda x, wt: nblur.gaussian_pallas_rows(
        x, wt, 3, C), [rows, w3])]
    for r in (4, 5, 6, 8):
        w = jax.device_put(gaussian_kernel_f32(r, r / 3), default_device())
        arms.append((f"vpu_r{r}", (lambda r: lambda x, wt:
                     nblur.gaussian_pallas_rows(x, wt, r, C, folded=True))(r),
                     [rows, w]))
        arms.append((f"mxu_r{r}", (lambda r: lambda x, wt:
                     nmxu.gaussian_mxu_rows(x, wt, r, C))(r),
                     [rows, w]))

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
