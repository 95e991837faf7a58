#!/usr/bin/env python3
"""A/B exact-out-shape (masked partial stores, no epilogue slice) vs the
padded-out + slice epilogue (legacy snapshots at commit b164bb2).

Gates bitwise equality on hardware first, then times within rounds.
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

    import scripts.archive.legacy_blur_landed_snapshot as lblur
    import scripts.archive.legacy_sobel_snapshot as lsobel
    from gpu_image_processing_tpu.ops.pallas import blur as nblur
    from gpu_image_processing_tpu.ops.pallas import sobel as nsobel
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
    w3 = jax.device_put(gaussian_kernel_f32(3, 2.0), dev)

    ok = True
    for name, a, b in (
        ("gauss rows", jax.jit(lambda x, w: nblur.gaussian_pallas_rows(x, w, 3, C))(rows, w3),
         jax.jit(lambda x, w: lblur.gaussian_pallas_rows(x, w, 3, C))(rows, w3)),
        ("gauss planar", jax.jit(lambda x, w: nblur._separable_blur_planar(x, w, 3, False))(planar, w3),
         jax.jit(lambda x, w: lblur._separable_blur_planar(x, w, 3, False))(planar, w3)),
        ("box rows r15", jax.jit(lambda x: nblur.box_pallas_rows(x, 15, C))(rows),
         jax.jit(lambda x: lblur.box_pallas_rows(x, 15, C))(rows)),
        ("sobel rows", jax.jit(lambda x: nsobel.sobel_pallas_rows(x, W, C, level=2))(rows),
         jax.jit(lambda x: lsobel.sobel_pallas_rows(x, W, C, level=2))(rows)),
        ("sobel planar", jax.jit(lambda x: nsobel.sobel_pallas(x, level=2))(
            jax.device_put(img, dev)),
         jax.jit(lambda x: lsobel.sobel_pallas(x, level=2))(jax.device_put(img, dev))),
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

    hwc = jax.device_put(img, dev)
    arms = [
        ("gauss_rows_new", lambda x, w: nblur.gaussian_pallas_rows(x, w, 3, C), [rows, w3]),
        ("gauss_rows_leg", lambda x, w: lblur.gaussian_pallas_rows(x, w, 3, C), [rows, w3]),
        ("gauss_plnr_new", lambda x, w: nblur._separable_blur_planar(x, w, 3, False), [planar, w3]),
        ("gauss_plnr_leg", lambda x, w: lblur._separable_blur_planar(x, w, 3, False), [planar, w3]),
        ("sobel_plnr_new", lambda x: nsobel.sobel_pallas(x, level=2), [hwc]),
        ("sobel_plnr_leg", lambda x: lsobel.sobel_pallas(x, level=2), [hwc]),
    ]
    results: dict[str, list[float]] = {n: [] for n, _, _ in arms}
    for r in range(rounds):
        print(f"--- round {r} ---", flush=True)
        for name, fn, fargs in arms:
            ms = device_time_ms(fn, fargs, iters=ITERS)
            results[name].append(ms)
            print(f"  {name:15} {ms:8.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    med = {}
    for name, xs in results.items():
        s = sorted(xs)
        med[name] = s[len(s) // 2] if len(s) % 2 else 0.5 * (
            s[len(s) // 2 - 1] + s[len(s) // 2])
        print(f"{name:15} {med[name]:8.4f} ms  {[round(x, 4) for x in xs]}",
              flush=True)
    for p in ("gauss_rows", "gauss_plnr", "sobel_plnr"):
        print(f"{p}: new/legacy = {med[p + '_new'] / med[p + '_leg']:.3f}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
