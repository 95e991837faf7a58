#!/usr/bin/env python3
"""A/B sobel gx/gy scratch-ref accumulation vs value-chained (legacy).

Legacy = scripts/archive/legacy_sobel_snapshot.py (value-chained gx/gy, frozen at
commit 6317748); package now accumulates gx/gy through VMEM scratch refs
(bounded liveness -- the trick that gave the gray plane 3x).  Bit-equality
gates on hardware, then within-round timing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3
ITERS = 48


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import jax

    import scripts.archive.legacy_sobel_snapshot as legacy
    from gpu_image_processing_tpu.ops.pallas import sobel as new
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
    hwc = jax.device_put(img, dev)
    rows = jax.device_put(img.reshape(H, W * C), dev)

    ok = True
    for name, a, b in (
        ("planar L2",
         jax.jit(lambda x: new.sobel_pallas(x, level=2))(hwc),
         jax.jit(lambda x: legacy.sobel_pallas(x, level=2))(hwc)),
        ("rows L2",
         jax.jit(lambda x: new.sobel_pallas_rows(x, W, C, level=2))(rows),
         jax.jit(lambda x: legacy.sobel_pallas_rows(x, W, C, level=2))(rows)),
    ):
        a, b = np.asarray(a), np.asarray(b)
        if np.array_equal(a, b):
            print(f"equal: {name}", flush=True)
        else:
            d = np.abs(a.astype(int) - b.astype(int)).max()
            print(f"EQUALITY FAIL {name}: maxdiff {d}", flush=True)
            ok = False
    if not ok:
        return 1

    arms = [
        ("planar_new", lambda x: new.sobel_pallas(x, level=2), [hwc]),
        ("planar_legacy", lambda x: legacy.sobel_pallas(x, level=2), [hwc]),
        ("rows_new", lambda x: new.sobel_pallas_rows(x, W, C, level=2), [rows]),
        ("rows_legacy", lambda x: legacy.sobel_pallas_rows(x, W, C, level=2), [rows]),
    ]
    results: dict[str, list[float]] = {n: [] for n, _, _ in arms}
    for r in range(rounds):
        print(f"--- round {r} ---", flush=True)
        for name, fn, fargs in arms:
            ms = device_time_ms(fn, fargs, iters=ITERS)
            results[name].append(ms)
            print(f"  {name:14} {ms:8.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    med = {}
    for name, xs in results.items():
        s = sorted(xs)
        med[name] = s[len(s) // 2] if len(s) % 2 else 0.5 * (
            s[len(s) // 2 - 1] + s[len(s) // 2])
        print(f"{name:14} {med[name]:8.4f} ms  {[round(x, 4) for x in xs]}",
              flush=True)
    for p in ("planar", "rows"):
        print(f"{p}: new/legacy = {med[p + '_new'] / med[p + '_legacy']:.3f}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
