#!/usr/bin/env python3
"""Localize the interleaved-kernel slowdown (CLAUDE.md backlog item).

The interleaved serving kernel is ~2.8x slower per element than the planar
kernel (1.66 vs 0.60 ms on the README gaussian workload).  Row tiling and
column chunking were already measured irrelevant; remaining suspect is the
C-strided tap shifts.  This experiment decomposes the cost in ONE process
with arms interleaved within rounds (the chip's speed drifts between
rounds; only within-round ratios are meaningful):

  flat_full       gaussian_pallas_flat, the serving path (both passes)
  flat_hpass      same, horizontal pass only
  flat_prologue   ONLY the XLA prologue (pixel-replication tile/concat/pad)
                  with a 1-row offset slice back (defeats identity folding)
  flat_stride1    same kernel/buffer widths but tap_stride=1 (channels=1):
                  if stride-3 lane shifts are the cost, this arm collapses
                  to ~planar speed.  (Output is image-wrong; perf probe.)
  planar_full     _separable_blur_planar on pre-planarized (3,H,W)
  planar_hpass    same, horizontal pass only
  planar_prologue jnp.pad prologue only, offset slice back

Usage: python scripts/exp_interleaved.py [rounds]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3
RADIUS, SIGMA = 3, 2.0
ITERS = 48


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import jax
    import jax.numpy as jnp

    from gpu_image_processing_tpu.ops.pallas.blur import (
        _round_up,
        _separable_blur_interleaved,
        _separable_blur_planar,
        gaussian_pallas_flat,
    )
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
    w = jax.device_put(gaussian_kernel_f32(RADIUS, SIGMA), dev)

    wf = W * C
    halo = RADIUS * C

    def flat_full(x, wts):
        return gaussian_pallas_flat(x, wts, RADIUS, H, W, C)

    def flat_hpass(x, wts):
        return gaussian_pallas_flat(x, wts, RADIUS, H, W, C,
                                    passes="horizontal")

    def flat_prologue(x, wts):
        # Mirrors _separable_blur_interleaved's pre-kernel XLA work
        # (blur.py:448-453) for the no-column-tiling README shape.
        rows = x.reshape(1, H, wf)
        tile_lanes = _round_up(wf + 2 * halo, 128)
        arr_width = tile_lanes
        left = jnp.tile(rows[:, :, :C], (1, 1, RADIUS))
        right_reps = (arr_width - halo - wf + C - 1) // C
        right = jnp.tile(rows[:, :, wf - C:], (1, 1, right_reps))
        xx = jnp.concatenate([left, rows, right], axis=2)[:, :, :arr_width]
        xx = jnp.pad(xx, ((0, 0), (RADIUS, 8), (0, 0)), mode="edge")
        # 1-row offset so the round trip is not foldable to identity.
        return xx[:, RADIUS + 1 : RADIUS + 1 + H, halo : halo + wf].reshape(-1)

    def flat_stride1(x, wts):
        rows = x.reshape(1, H, wf)
        out = _separable_blur_interleaved(
            rows, wts, RADIUS, box_mode=False, channels=1)
        return out.reshape(-1)

    def planar_full(x, wts):
        return _separable_blur_planar(x, wts, RADIUS, box_mode=False)

    def planar_hpass(x, wts):
        return _separable_blur_planar(x, wts, RADIUS, box_mode=False,
                                      passes="horizontal")

    def planar_prologue(x, wts):
        arr_width = _round_up(W + 2 * RADIUS, 128) - RADIUS
        xx = jnp.pad(x, ((0, 0), (RADIUS, 8), (RADIUS, arr_width - W)),
                     mode="edge")
        return xx[:, RADIUS + 1 : RADIUS + 1 + H, RADIUS : RADIUS + W]

    arms = [
        ("flat_full", flat_full, [flat, w]),
        ("flat_hpass", flat_hpass, [flat, w]),
        ("flat_prologue", flat_prologue, [flat, w]),
        ("flat_stride1", flat_stride1, [flat, w]),
        ("planar_full", planar_full, [planar, w]),
        ("planar_hpass", planar_hpass, [planar, w]),
        ("planar_prologue", planar_prologue, [planar, w]),
    ]

    results: dict[str, list[float]] = {name: [] for name, _, _ in arms}
    for r in range(rounds):
        print(f"--- round {r} ---", flush=True)
        for name, fn, fargs in arms:
            ms = device_time_ms(fn, fargs, iters=ITERS)
            results[name].append(ms)
            print(f"  {name:16} {ms:8.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    med = {}
    for name, xs in results.items():
        s = sorted(xs)
        med[name] = s[len(s) // 2] if len(s) % 2 else 0.5 * (
            s[len(s) // 2 - 1] + s[len(s) // 2])
        print(f"{name:16} {med[name]:8.4f} ms  {xs}", flush=True)

    print("\n=== derived (from medians) ===", flush=True)
    print(f"flat kernel-only   ~ {med['flat_full'] - med['flat_prologue']:.4f} ms"
          f"  (full - prologue)", flush=True)
    print(f"planar kernel-only ~ {med['planar_full'] - med['planar_prologue']:.4f} ms",
          flush=True)
    print(f"flat vertical part ~ {med['flat_full'] - med['flat_hpass']:.4f} ms",
          flush=True)
    print(f"planar vertical    ~ {med['planar_full'] - med['planar_hpass']:.4f} ms",
          flush=True)
    print(f"stride1 vs flat    : {med['flat_stride1']:.4f} vs "
          f"{med['flat_full']:.4f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
