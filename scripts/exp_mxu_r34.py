#!/usr/bin/env python3
"""MXU-vs-VPU crossover at r=3/4 with the G=128 block size, one process.

Follow-up to exp_mxu_gblock.py (which set _G=128 and showed the MXU tier
nearly radius-flat at ~0.41-0.47 ms): re-measures the small radii that
set GAUSS_MXU_MIN_RADIUS, with 5 rounds for the <30% effects.

Usage: exp_mxu_r34.py [rounds=5]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import jax
    import jax.numpy as jnp

    from gpu_image_processing_tpu.ops.pallas import blur as nblur
    from gpu_image_processing_tpu.ops.pallas import blur_mxu as M
    from gpu_image_processing_tpu.ops.weights import gaussian_kernel_f32
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    print(f"device: {default_device()}  _G={M._G}", flush=True)

    rng = np.random.default_rng(7)
    wf = W * C
    rows = jax.device_put(
        rng.integers(0, 256, size=(H, wf), dtype=np.uint8), default_device())
    planar = jax.device_put(
        rng.integers(0, 256, size=(C, H, W), dtype=np.uint8),
        default_device())
    weights = {
        r: jax.device_put(gaussian_kernel_f32(r, max(1.0, r / 2.0)),
                          default_device())
        for r in (2, 3, 4)
    }

    arms = []
    for r in (2, 3, 4):
        arms.append((
            f"vpu_rows_r{r}",
            (lambda r: lambda x, w: nblur.gaussian_pallas_rows(
                x, w, r, C, folded=True))(r),
            (lambda r: lambda x, w: nblur.gaussian_pallas_rows(
                x, w, r, C))(r),
            [rows, weights[r]]))
        arms.append((
            f"mxu_rows_r{r}",
            (lambda r: lambda x, w: M._gaussian_mxu(
                x[None], w, r, tap_stride=C, interpret=False)[0])(r),
            (lambda r: lambda x, w: nblur.gaussian_pallas_rows(
                x, w, r, C))(r),
            [rows, weights[r]]))
    arms.append((
        "vpu_planar_r3",
        lambda x, w: nblur._separable_blur_planar(
            x, w, 3, box_mode=False, folded=True),
        lambda x, w: nblur._separable_blur_planar(x, w, 3, box_mode=False),
        [planar, weights[3]]))
    arms.append((
        "mxu_planar_r3",
        lambda x, w: M._gaussian_mxu(x, w, 3, tap_stride=1, interpret=False),
        lambda x, w: nblur._separable_blur_planar(x, w, 3, box_mode=False),
        [planar, weights[3]]))

    live = []
    for name, fn, gate_fn, args in arms:
        try:
            got = jax.jit(fn)(*args)
            want = jax.jit(gate_fn)(*args)
            d = int(jnp.abs(got.astype(jnp.int32)
                            - want.astype(jnp.int32)).max())
        except Exception as exc:
            print(f"{name}: build/run failed: {str(exc)[:200]}", flush=True)
            continue
        print(f"{name}: maxdiff {d} vs exact L2", flush=True)
        if d > 1:
            continue
        live.append((name, fn, args))

    samples: dict = {}
    for rd in range(rounds):
        for name, fn, args in live:
            t = device_time_ms(fn, args, iters=32, sync_reps=2)
            samples.setdefault(name, []).append(t)
            print(f"round {rd} {name}: {t:.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    meds = {n: float(np.median(v)) for n, v in samples.items()}
    for name, med in meds.items():
        print(f"{name}: {med:.4f} ms", flush=True)
    for r in (2, 3, 4):
        a, b = meds.get(f"mxu_rows_r{r}"), meds.get(f"vpu_rows_r{r}")
        if a and b:
            print(f"r={r}: mxu/vpu = {a / b:.3f}x", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
