#!/usr/bin/env python3
"""On-silicon validation + A/B of the MXU ADVANCED gaussian tier.

Gates: maxdiff <= 1 vs the bit-exact level-2 kernel (the ADVANCED
contract) on the README workload, planar + rows, r=3 and r=15.
Timing: MXU vs folded-VPU (current L4) vs L2, within rounds.
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

    ok = True
    for r, sig in ((3, 2.0), (15, 4.0)):
        w = jax.device_put(gaussian_kernel_f32(r, sig), dev)
        l2p = np.asarray(jax.jit(lambda x, ww, rr=r: vpu._separable_blur_planar(
            x, ww, rr, False))(planar, w)).astype(int)
        mxp = np.asarray(jax.jit(lambda x, ww, rr=r: mxu._gaussian_mxu(
            x, ww, rr, 1, False))(planar, w)).astype(int)
        d = np.abs(mxp - l2p).max()
        frac = (mxp != l2p).mean()
        print(f"planar r{r}: maxdiff {d} fraction {frac:.2e}", flush=True)
        ok &= d <= 1
        l2r = np.asarray(jax.jit(lambda x, ww, rr=r: vpu.gaussian_pallas_rows(
            x, ww, rr, C))(rows, w)).astype(int)
        mxr = np.asarray(jax.jit(lambda x, ww, rr=r: mxu.gaussian_mxu_rows(
            x, ww, rr, C))(rows, w)).astype(int)
        d = np.abs(mxr - l2r).max()
        print(f"rows   r{r}: maxdiff {d} fraction {(mxr != l2r).mean():.2e}",
              flush=True)
        ok &= d <= 1
    if not ok:
        print("GATE FAILED", flush=True)
        return 1

    w3 = jax.device_put(gaussian_kernel_f32(3, 2.0), dev)
    w15 = jax.device_put(gaussian_kernel_f32(15, 4.0), dev)
    arms = [
        ("mxu_planar", lambda x, ww: mxu._gaussian_mxu(x, ww, 3, 1, False), [planar, w3]),
        ("l4_planar", lambda x, ww: vpu._separable_blur_planar(x, ww, 3, False, folded=True), [planar, w3]),
        ("l2_planar", lambda x, ww: vpu._separable_blur_planar(x, ww, 3, False), [planar, w3]),
        ("mxu_rows", lambda x, ww: mxu.gaussian_mxu_rows(x, ww, 3, C), [rows, w3]),
        ("l4_rows", lambda x, ww: vpu.gaussian_pallas_rows(x, ww, 3, C, folded=True), [rows, w3]),
        ("mxu_plnr15", lambda x, ww: mxu._gaussian_mxu(x, ww, 15, 1, False), [planar, w15]),
        ("l4_plnr15", lambda x, ww: vpu._separable_blur_planar(x, ww, 15, False, folded=True), [planar, w15]),
        ("l2_plnr15", lambda x, ww: vpu._separable_blur_planar(x, ww, 15, False), [planar, w15]),
        ("mxu_rows15", lambda x, ww: mxu.gaussian_mxu_rows(x, ww, 15, C), [rows, w15]),
        ("l4_rows15", lambda x, ww: vpu.gaussian_pallas_rows(x, ww, 15, C, folded=True), [rows, w15]),
    ]
    results = {n: [] for n, _, _ in arms}
    for rd in range(rounds):
        print(f"--- round {rd} ---", flush=True)
        for name, fn, fargs in arms:
            ms = device_time_ms(fn, fargs, iters=ITERS)
            results[name].append(ms)
            print(f"  {name:11} {ms:8.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    med = {}
    for name, xs in results.items():
        s = sorted(xs)
        med[name] = s[len(s) // 2] if len(s) % 2 else 0.5 * (
            s[len(s) // 2 - 1] + s[len(s) // 2])
        print(f"{name:11} {med[name]:8.4f} ms  {[round(x, 4) for x in xs]}",
              flush=True)
    for a, b in (("mxu_planar", "l4_planar"), ("mxu_rows", "l4_rows"),
                 ("mxu_plnr15", "l4_plnr15"), ("mxu_rows15", "l4_rows15")):
        print(f"{a} / {b} = {med[a] / med[b]:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
