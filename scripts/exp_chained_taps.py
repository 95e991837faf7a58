#!/usr/bin/env python3
"""Value-chained vs sequenced-ref tap accumulation, A/B'd in ONE process.

Hypothesis (docs/ROOFLINE.md): at small radii the blur kernels are bound
by the VMEM traffic of the sequenced acc-ref stores -- each tap costs
~3 VMEM touches per element (read acc + write acc + read src), ~12B x taps
per element against 2B of HBM traffic.  12B x 14 taps x 20.85M elem at
~8 TB/s VMEM is ~0.44 ms: almost exactly the measured r=3 gaussian.  The
chained variant (ops/pallas/blur.py, chained=True) keeps the accumulator
in vector registers with the SAME f32 term/add order, and the vertical
pass writes straight to the output block.

Arms (all public wrappers, bit-equality gated ON DEVICE, scalar fetch
only -- bulk D2H through the relay is ~0.15 MB/s):

  gauss rows  r=1/3/5, folded=False (L2 serving, bit-exact tier)
  gauss rows  r=3/5,   folded=True  (L4)
  gauss planar r=3,    folded=True  (L4 benchmark path)
  box   rows  r=3      (conv path; doubling takes over at r>=4)

Usage: exp_chained_taps.py [rounds=3]
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
        r: jax.device_put(gaussian_kernel_f32(r, 2.0), default_device())
        for r in (1, 3, 5)
    }

    interp = SMALL  # CPU smoke mode runs the kernels interpreted

    def gauss_rows(r, folded, chained):
        return lambda x, w: nblur.gaussian_pallas_rows(
            x, w, r, C, folded=folded, chained=chained, interpret=interp)

    def gauss_planar(r, folded, chained):
        return lambda x, w: nblur._separable_blur_planar(
            x, w, r, box_mode=False, folded=folded, chained=chained,
            interpret=interp)

    def box_rows(r, chained):
        return lambda x: nblur.box_pallas_rows(x, r, C, chained=chained,
                                               interpret=interp)

    # (name, exact_required, base_fn, chained_fn, args)
    pairs = []
    for r in (1, 3, 5):
        pairs.append((f"gauss_rows_r{r}_L2", True,
                      gauss_rows(r, False, False), gauss_rows(r, False, True),
                      [rows, weights[r]]))
    # Folded pairs live in the maxdiff<=1 (L4) tier: a <=1 drift vs base
    # is acceptable there, so time them even if not bit-equal.
    for r in (3, 5):
        pairs.append((f"gauss_rows_r{r}_folded", False,
                      gauss_rows(r, True, False), gauss_rows(r, True, True),
                      [rows, weights[r]]))
    pairs.append(("gauss_planar_r3_folded", False,
                  gauss_planar(3, True, False), gauss_planar(3, True, True),
                  [planar, weights[3]]))
    pairs.append(("box_rows_r3", True, box_rows(3, False), box_rows(3, True),
                  [rows]))

    # Correctness gates on device: same storage, same op order => the
    # chained arm must be BIT-EQUAL to its base arm (both folded and not).
    live = []
    for name, exact, base_fn, ch_fn, args in pairs:
        try:
            a = jax.jit(base_fn)(*args)
            b = jax.jit(ch_fn)(*args)
            d = int(jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32)).max())
        except Exception as exc:
            print(f"{name}: build/run failed: {str(exc)[:200]}", flush=True)
            continue
        tag = "bit-equal" if d == 0 else f"MAXDIFF {d}"
        print(f"{name}: {tag}", flush=True)
        if exact and d != 0:
            continue
        live.append((name, base_fn, ch_fn, args))

    samples: dict = {}
    for rd in range(rounds):
        for name, base_fn, ch_fn, args in live:
            tb = device_time_ms(base_fn, args, iters=32, sync_reps=2)
            tc = device_time_ms(ch_fn, args, iters=32, sync_reps=2)
            samples.setdefault(name, []).append((tb, tc))
            print(f"round {rd} {name}: base {tb:.4f}  chained {tc:.4f} "
                  f"({tc / tb:.3f}x)", flush=True)

    print("\n=== medians ===", flush=True)
    for name, vals in samples.items():
        tb = float(np.median([v[0] for v in vals]))
        tc = float(np.median([v[1] for v in vals]))
        print(f"{name}: base {tb:.4f} ms  chained {tc:.4f} ms "
              f"({tc / tb:.3f}x)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
