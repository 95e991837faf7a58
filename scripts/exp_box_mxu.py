#!/usr/bin/env python3
"""Integer-MXU box blur vs the VPU doubling-window kernel, one process.

VERDICT-r3 #7: box weights are equal, so the MXU banded matmul with an
all-ones band produces EXACT integer window sums in f32 accumulation (no
hi/lo split, one matmul per pass — half the gaussian MXU tier's FLOPs),
and scaling by the reference's f32 reciprocal reproduces the naive math
bit-for-bit (ops/pallas/blur_mxu.py module docstring).  This script
answers the remaining question — is it FASTER than the doubling-window
VPU kernel? — per the drift discipline (CLAUDE.md): both arms interleaved
in ONE process, slope-based device timing, medians across rounds, <30%
treated as noise.

Arms (bit-exactness gated on-device before timing, maxdiff must be 0):
  planar r in {2, 5, 9, 15}: box_pallas (bench L2 path) vs box_mxu
  rows   r in {5, 15}:       box_pallas_rows (serving) vs box_mxu_rows

Usage: exp_box_mxu.py [rounds=5]
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
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    print(f"device: {default_device()}  _G={M._G}", flush=True)

    rng = np.random.default_rng(11)
    img = jax.device_put(
        rng.integers(0, 256, size=(H, W, C), dtype=np.uint8),
        default_device())
    rows = jax.device_put(
        rng.integers(0, 256, size=(H, W * C), dtype=np.uint8),
        default_device())

    arms = []
    for r in (2, 5, 9, 15):
        arms.append((
            f"vpu_planar_r{r}",
            (lambda r: lambda x: nblur.box_pallas(x, r))(r),
            (lambda r: lambda x: nblur.box_pallas(x, r))(r),
            [img]))
        arms.append((
            f"mxu_planar_r{r}",
            (lambda r: lambda x: M.box_mxu(x, r))(r),
            (lambda r: lambda x: nblur.box_pallas(x, r))(r),
            [img]))
    for r in (5, 15):
        arms.append((
            f"vpu_rows_r{r}",
            (lambda r: lambda x: nblur.box_pallas_rows(x, r, C))(r),
            (lambda r: lambda x: nblur.box_pallas_rows(x, r, C))(r),
            [rows]))
        arms.append((
            f"mxu_rows_r{r}",
            (lambda r: lambda x: M.box_mxu_rows(x, r, C))(r),
            (lambda r: lambda x: nblur.box_pallas_rows(x, r, C))(r),
            [rows]))

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
        print(f"{name}: maxdiff {d} vs exact VPU box", flush=True)
        if d != 0:  # box tiers are BIT-exact; any diff disqualifies
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
    for layout in ("planar", "rows"):
        for r in (2, 5, 9, 15):
            a = meds.get(f"mxu_{layout}_r{r}")
            b = meds.get(f"vpu_{layout}_r{r}")
            if a and b:
                print(f"{layout} r={r}: mxu/vpu = {a / b:.3f}x", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
