#!/usr/bin/env python3
"""MXU gaussian horizontal block size (G) A/B, one process.

The H-pass banded matmul costs ~4*(G + 2*halo) FLOP per element (hi+lo
split x mul+add), so G=512 carries ~4x the FLOPs of G=128 while every
matmul dim stays >= 128 either way.  If the pass is MXU-bound, smaller G
should win outright; if layout-bound, G won't matter.  Also re-tests the
r=3 VPU-vs-MXU crossover at the cheaper G (GAUSS_MXU_MIN_RADIUS=5 was set
with G=512).

Arms (interleaved rows README shape + planar r=3), each gated ON DEVICE
at maxdiff <= 1 vs the bit-exact VPU L2 kernel (the ADVANCED-tier gate):

  mxu rows r=3/5/15 x G=128/256/512
  vpu folded rows r=3/5/15 (the current L4 routing baseline)
  mxu planar r=3 x G=128/512 + vpu folded planar r=3

Usage: exp_mxu_gblock.py [rounds=3]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SMALL = os.environ.get("GIP_EXP_SMALL", "0") == "1"
H, W, C = (96, 53, 3) if SMALL else (2146, 3239, 3)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

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
    print(f"device: {default_device()}", flush=True)

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
        for r in (3, 5, 15)
    }
    interp = SMALL

    def mxu_rows(r, g):
        return lambda x, w: M._gaussian_mxu(
            x[None], w, r, tap_stride=C, interpret=interp, g_block=g)[0]

    def mxu_planar(r, g):
        return lambda x, w: M._gaussian_mxu(
            x, w, r, tap_stride=1, interpret=interp, g_block=g)

    def vpu_rows(r):
        return lambda x, w: nblur.gaussian_pallas_rows(
            x, w, r, C, folded=True, interpret=interp)

    def vpu_planar(r):
        return lambda x, w: nblur._separable_blur_planar(
            x, w, r, box_mode=False, folded=True, interpret=interp)

    def exact_rows(r):
        return lambda x, w: nblur.gaussian_pallas_rows(
            x, w, r, C, interpret=interp)

    def exact_planar(r):
        return lambda x, w: nblur._separable_blur_planar(
            x, w, r, box_mode=False, interpret=interp)

    # (name, fn, gate_fn, args)
    arms = []
    for r in (3, 5, 15):
        arms.append((f"vpu_rows_r{r}", vpu_rows(r), exact_rows(r),
                     [rows, weights[r]]))
        for g in (128, 256, 512):
            arms.append((f"mxu_rows_r{r}_g{g}", mxu_rows(r, g),
                         exact_rows(r), [rows, weights[r]]))
    arms.append(("vpu_planar_r3", vpu_planar(3), exact_planar(3),
                 [planar, weights[3]]))
    for g in (128, 512):
        arms.append((f"mxu_planar_r3_g{g}", mxu_planar(3, g),
                     exact_planar(3), [planar, weights[3]]))

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
    for name, vals in samples.items():
        print(f"{name}: {float(np.median(vals)):.4f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
