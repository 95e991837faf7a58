#!/usr/bin/env python3
"""Refine GAUSS_MXU_MIN_RADIUS: MXU vs folded-VPU at r=5 and r=8 (the
r=3 / r=15 endpoints are already measured: 1.15x slower / 2.6-3.4x
faster).  README workload, arms interleaved within rounds."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax

    from gpu_image_processing_tpu.ops.pallas import blur as vpu
    from gpu_image_processing_tpu.ops.pallas import blur_mxu as mxu
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
    rows = jax.device_put(img.reshape(H, W * C), dev)
    planar = jax.device_put(np.ascontiguousarray(img.transpose(2, 0, 1)), dev)

    arms = []
    for r in (5, 8):
        w = jax.device_put(gaussian_kernel_f32(r, float(r) / 2.5), dev)
        arms += [
            (f"mxu_plnr_r{r}",
             (lambda rr: lambda x, ww: mxu._gaussian_mxu(x, ww, rr, 1, False))(r),
             [planar, w]),
            (f"l4_plnr_r{r}",
             (lambda rr: lambda x, ww: vpu._separable_blur_planar(
                 x, ww, rr, False, folded=True))(r),
             [planar, w]),
            (f"mxu_rows_r{r}",
             (lambda rr: lambda x, ww: mxu.gaussian_mxu_rows(x, ww, rr, C))(r),
             [rows, w]),
            (f"l4_rows_r{r}",
             (lambda rr: lambda x, ww: vpu.gaussian_pallas_rows(
                 x, ww, rr, C, folded=True))(r),
             [rows, w]),
        ]

    results = {n: [] for n, _, _ in arms}
    for rd in range(rounds):
        print(f"--- round {rd} ---", flush=True)
        for name, fn, fargs in arms:
            ms = device_time_ms(fn, fargs, iters=48)
            results[name].append(ms)
            print(f"  {name:13} {ms:8.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    med = {}
    for name, xs in results.items():
        s = sorted(xs)
        med[name] = s[len(s) // 2] if len(s) % 2 else 0.5 * (
            s[len(s) // 2 - 1] + s[len(s) // 2])
        print(f"{name:13} {med[name]:8.4f} ms  {[round(x, 4) for x in xs]}",
              flush=True)
    for r in (5, 8):
        for p in ("plnr", "rows"):
            print(f"r{r} {p}: mxu/l4 = "
                  f"{med[f'mxu_{p}_r{r}'] / med[f'l4_{p}_r{r}']:.3f}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
