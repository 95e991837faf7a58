#!/usr/bin/env python3
"""Box small-image routing: XLA tier vs Pallas VPU vs MXU, guarded timing.

Follow-up to scripts/exp_box_mxu_edges.py, whose small-image arms came
back polluted by degenerate slope samples (0.0001 ms readings at 0.26 MP;
the relay's RPC jitter swamps sub-0.1 ms kernels at the default loop
lengths).  This run makes the small-shape comparison trustworthy:

* loop lengths 32/128 (4x the default) so the long-loop wall is well
  above the 2-30 ms per-execute RPC noise;
* every slope sample below the physical floor (read + write bytes at
  2x the HBM roofline -- the bench.py guard, commit 770f990) is
  REJECTED and the round retried once; rounds still degenerate after
  retry are dropped from the median and counted in the report;
* per-round arm RATIOS (same round, same congestion window) rather
  than cross-round medians of absolute times.

Question: config.TPU.box_xla_tier_max_pixels (1 MP) predates the MXU box
tier (it was measured against the VPU doubling kernel, round 2).  If the
MXU rows kernel beats the XLA interleaved tier below 1 MP, the gate
should drop for box at MXU-eligible radii.  r=1 (never MXU) checks
whether the VPU Pallas kernel also moved the crossover.

Usage: exp_box_small_xover.py [rounds=5]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = ((480, 540), (768, 1092), (1024, 1024))  # 0.26 / 0.84 / 1.05 MP
RADII = (1, 2, 5)
C = 3


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import jax

    from gpu_image_processing_tpu.ops import interleaved as il
    from gpu_image_processing_tpu.ops.pallas import blur as nblur
    from gpu_image_processing_tpu.ops.pallas import blur_mxu as M
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    print(f"device: {default_device()}", flush=True)

    try:
        from gpu_image_processing_tpu.profiling.profiler import device_peaks

        peaks = device_peaks()
        peak_gbps = peaks[0] if peaks else 819.0
    except Exception:
        peak_gbps = 819.0

    rng = np.random.default_rng(29)
    rows_by_shape = {}
    for (h, w) in SHAPES:
        rows_by_shape[(h, w)] = jax.device_put(
            rng.integers(0, 256, size=(h, w * C), dtype=np.uint8),
            default_device())

    # (name, shape, fn) arms; all bit-exact vs the sequential VPU kernel
    # (gated below), so routing between them is purely a speed decision.
    arms = []
    for (h, w) in SHAPES:
        x = rows_by_shape[(h, w)]
        for r in RADII:
            arms.append((f"{h}x{w}_r{r}_xla", (h, w), (lambda r: lambda a:
                il.box_rows(a, r, C,
                            doubling=r >= il.BOX_DOUBLING_MIN_RADIUS_XLA))(r),
                x))
            arms.append((f"{h}x{w}_r{r}_vpu", (h, w), (lambda r: lambda a:
                nblur.box_pallas_rows(a, r, C))(r), x))
            if M.use_mxu_box(r, w, C, interleaved=True):
                arms.append((f"{h}x{w}_r{r}_mxu", (h, w), (lambda r: lambda a:
                    M.box_mxu_rows(a, r, C))(r), x))

    # Correctness gates once per arm (cheap shapes).
    for name, (h, w), fn, x in arms:
        got = np.asarray(jax.jit(fn)(x))
        want = np.asarray(jax.jit(
            lambda a, r=int(name.split("_r")[1].split("_")[0]):
            nblur.box_pallas_rows(a, r, C))(x))
        d = int(np.abs(got.astype(np.int32) - want.astype(np.int32)).max())
        print(f"{name}: maxdiff {d}", flush=True)
        if d != 0:
            print("BIT-EXACT GATE FAILED", flush=True)
            return 1

    results: dict[str, list[float]] = {name: [] for name, *_ in arms}
    rejected: dict[str, int] = {name: 0 for name, *_ in arms}
    for rd in range(rounds):
        for name, (h, w), fn, x in arms:
            floor_ms = 2 * x.nbytes / (2 * peak_gbps * 1e9) * 1e3
            t = device_time_ms(fn, [x], iters=128, sync_reps=4)
            if t < floor_ms:  # one retry inside the same window
                rejected[name] += 1
                t = device_time_ms(fn, [x], iters=128, sync_reps=4)
            if t < floor_ms:
                rejected[name] += 1
                print(f"round {rd} {name}: DEGENERATE ({t:.4f} ms "
                      f"< floor {floor_ms:.4f})", flush=True)
                continue
            results[name].append(t)
            print(f"round {rd} {name}: {t:.4f} ms", flush=True)

    def med(xs):
        s = sorted(xs)
        return s[len(s) // 2] if s else float("nan")

    print("\n== medians (valid rounds only) ==")
    for name, *_ in arms:
        print(f"{name}: {med(results[name]):.4f} ms  "
              f"({len(results[name])}/{rounds} valid, "
              f"{rejected[name]} rejected)")

    print("\n== ratios vs the XLA tier (same shape/radius) ==")
    for (h, w) in SHAPES:
        for r in RADII:
            base = med(results[f"{h}x{w}_r{r}_xla"])
            for tier in ("vpu", "mxu"):
                key = f"{h}x{w}_r{r}_{tier}"
                if key in results and results[key] and base == base:
                    print(f"{h}x{w} r={r}: {tier}/xla = "
                          f"{med(results[key]) / base:.3f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
