#!/usr/bin/env python3
"""A/B the landed-DMA blur prologue vs the legacy tile/concat/pad prologue.

Legacy implementation is a frozen snapshot (scripts/archive/legacy_blur_snapshot.py)
of ops/pallas/blur.py as of commit ecbd0d5; the package now carries the
landed-DMA scheme.  Both run in ONE process with arms interleaved within
rounds (the shared chip drifts up to 2.7x between rounds -- only
within-round ratios count).

Also asserts bit-equality of new-vs-legacy outputs ON HARDWARE (interpret
mode already matches the oracle; Mosaic codegen is the remaining risk),
including a column-tiled case.

Usage: python scripts/exp_landed_ab.py [rounds]
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

    import scripts.archive.legacy_blur_snapshot as legacy
    from gpu_image_processing_tpu.ops.pallas import blur as new
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
    flat = jax.device_put(img.reshape(-1), dev)
    planar = jax.device_put(np.ascontiguousarray(img.transpose(2, 0, 1)), dev)
    w3 = jax.device_put(gaussian_kernel_f32(3, 2.0), dev)

    # --- on-hardware equality gates (new == legacy, bitwise) ---
    def check(name, a, b):
        a, b = np.asarray(a), np.asarray(b)
        if not np.array_equal(a, b):
            diff = (a.astype(np.int16) - b.astype(np.int16))
            print(f"EQUALITY FAIL {name}: maxdiff {np.abs(diff).max()} "
                  f"at {np.unravel_index(np.abs(diff).argmax(), diff.shape)}",
                  flush=True)
            return False
        print(f"equal: {name}", flush=True)
        return True

    ok = True
    ok &= check(
        "gaussian flat r3",
        jax.jit(lambda x, w: new.gaussian_pallas_flat(x, w, 3, H, W, C))(flat, w3),
        jax.jit(lambda x, w: legacy.gaussian_pallas_flat(x, w, 3, H, W, C))(flat, w3),
    )
    ok &= check(
        "box flat r5 (doubling)",
        jax.jit(lambda x: new.box_pallas_flat(x, 5, H, W, C))(flat),
        jax.jit(lambda x: legacy.box_pallas_flat(x, 5, H, W, C))(flat),
    )
    ok &= check(
        "box flat r15 (doubling)",
        jax.jit(lambda x: new.box_pallas_flat(x, 15, H, W, C))(flat),
        jax.jit(lambda x: legacy.box_pallas_flat(x, 15, H, W, C))(flat),
    )
    ok &= check(
        "gaussian planar r3",
        jax.jit(lambda x, w: new._separable_blur_planar(x, w, 3, False))(planar, w3),
        jax.jit(lambda x, w: legacy._separable_blur_planar(x, w, 3, False))(planar, w3),
    )
    # Column-tiled path: bucketed-8K width box r15 does not fit VMEM.
    wide = rng.integers(0, 256, size=(24, 9472, 3), dtype=np.uint8)
    wflat = jax.device_put(wide.reshape(-1), dev)
    assert not new.blur_kernel_fits_vmem(9472, 15, 3, True, interleaved=True)
    ok &= check(
        "box flat r15 9472-wide (column-tiled)",
        jax.jit(lambda x: new.box_pallas_flat(x, 15, 24, 9472, 3))(wflat),
        jax.jit(lambda x: legacy.box_pallas_flat(x, 15, 24, 9472, 3))(wflat),
    )
    if not ok:
        print("ABORT: equality gate failed", flush=True)
        return 1

    # --- timing arms ---
    arms = [
        ("flat_g3_new", lambda x, w: new.gaussian_pallas_flat(x, w, 3, H, W, C), [flat, w3]),
        ("flat_g3_legacy", lambda x, w: legacy.gaussian_pallas_flat(x, w, 3, H, W, C), [flat, w3]),
        ("flat_box5_new", lambda x: new.box_pallas_flat(x, 5, H, W, C), [flat]),
        ("flat_box5_legacy", lambda x: legacy.box_pallas_flat(x, 5, H, W, C), [flat]),
        ("planar_g3_new", lambda x, w: new._separable_blur_planar(x, w, 3, False), [planar, w3]),
        ("planar_g3_legacy", lambda x, w: legacy._separable_blur_planar(x, w, 3, False), [planar, w3]),
    ]
    results: dict[str, list[float]] = {name: [] for name, _, _ in arms}
    for r in range(rounds):
        print(f"--- round {r} ---", flush=True)
        for name, fn, fargs in arms:
            ms = device_time_ms(fn, fargs, iters=ITERS)
            results[name].append(ms)
            print(f"  {name:18} {ms:8.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    med = {}
    for name, xs in results.items():
        s = sorted(xs)
        med[name] = s[len(s) // 2] if len(s) % 2 else 0.5 * (
            s[len(s) // 2 - 1] + s[len(s) // 2])
        print(f"{name:18} {med[name]:8.4f} ms  {[round(x, 4) for x in xs]}",
              flush=True)
    for pair in ("flat_g3", "flat_box5", "planar_g3"):
        print(f"{pair}: new/legacy = "
              f"{med[pair + '_new'] / med[pair + '_legacy']:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
