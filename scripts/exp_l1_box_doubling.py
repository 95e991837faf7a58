#!/usr/bin/env python3
"""Should the LEVEL-1 box tier use the doubling-window sums?

The doubling formulation is bit-identical to the sequential CUDA tap
order (box window sums of uint8 are exact integers in f32 under any
association -- ops/interleaved.py::_windowed_sum_doubling), so routing
level 1 through it is NOT a numerics change; the only question is speed.
The optimized tiers already engage it at radius >= 4; level 1 was left
on the sequential order out of tier-identity caution.

One-process interleaved A/B at the README bench shape (3239x2146 RGB,
r=5) plus a larger radius, with an on-device bit-equality gate per arm
pair.  Decision rule per CLAUDE.md drift discipline: adopt only if the
within-round median ratio clears 1.3x.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

C = 3
H, W = 2146, 3239


def main() -> int:
    global H, W
    argv = [a for a in sys.argv[1:] if a != "--small"]
    if "--small" in sys.argv:  # CPU smoke: tiny shape, one round
        H, W = 64, 96
    rounds = int(argv[0]) if argv else 5

    import jax
    import jax.numpy as jnp

    from gpu_image_processing_tpu.ops import interleaved as il
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    print(f"device: {default_device()}", flush=True)

    rng = np.random.default_rng(42)
    rows = jax.device_put(
        rng.integers(0, 256, size=(H, W * C), dtype=np.uint8),
        default_device())

    arms = []
    for radius in (5, 9):
        arms.append((f"seq_r{radius}",
                     (lambda r: lambda x: il.box_rows(x, r, C))(radius)))
        arms.append((f"dbl_r{radius}",
                     (lambda r: lambda x: il.box_rows(
                         x, r, C, doubling=True))(radius)))

    # Bit-equality gate, compared ON DEVICE (bulk D2H through the relay is
    # ~0.1 MB/s -- fetch only the scalar).
    for radius in (5, 9):
        a = jax.jit(lambda x: il.box_rows(x, radius, C))(rows)
        b = jax.jit(lambda x: il.box_rows(x, radius, C, doubling=True))(rows)
        md = int(jnp.max(jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))))
        print(f"r={radius} maxdiff seq vs dbl: {md}", flush=True)
        if md != 0:
            print("NOT bit-identical -- do not adopt", flush=True)
            return 1

    samples = {name: [] for name, _ in arms}
    for r in range(rounds):
        for name, fn in arms:
            t = device_time_ms(fn, [rows], iters=32, sync_reps=2)
            samples[name].append(t)
            print(f"round {r} {name}: {t:.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    med = {n: float(np.median(s)) for n, s in samples.items()}
    for n, m in med.items():
        print(f"{n}: {m:.4f} ms", flush=True)
    for radius in (5, 9):
        ratio = med[f"seq_r{radius}"] / med[f"dbl_r{radius}"]
        print(f"r={radius}: doubling is {ratio:.2f}x vs sequential", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
