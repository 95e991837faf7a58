#!/usr/bin/env python3
"""Sobel rows-kernel tile sweep under the raised VMEM scope (one-process
A/B).  The blur kernels measured 128-row tiles best; sobel's requested cap
is still the round-1 96.  Arms bypass the frozen config by calling the
wrapper internals with a patched _pick_tile_rows_interleaved."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax

    from gpu_image_processing_tpu.ops.pallas import sobel as nsobel
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    print(f"device: {default_device()}", flush=True)

    rng = np.random.default_rng(7)
    rows = jax.device_put(
        rng.integers(0, 256, size=(H, W * C), dtype=np.uint8),
        default_device())

    orig_pick = nsobel._pick_tile_rows_interleaved

    def make(tile):
        def fn(x):
            nsobel._pick_tile_rows_interleaved = (
                lambda requested, wp, t=tile: t)
            try:
                return nsobel.sobel_pallas_rows(x, W, C, level=2)
            finally:
                nsobel._pick_tile_rows_interleaved = orig_pick
        return fn

    arms = [(f"t{t}", make(t)) for t in (64, 96, 128, 192, 256)]

    # bit-exactness gate across tiles
    want = np.asarray(jax.jit(make(96))(rows))
    live = []
    for name, fn in arms:
        try:
            got = np.asarray(jax.jit(fn)(rows))
        except Exception as exc:
            print(f"{name}: failed: {str(exc)[:160]}", flush=True)
            continue
        ok = np.array_equal(got, want)
        print(f"{name}: {'bit-exact' if ok else 'MISMATCH'}", flush=True)
        if ok:
            live.append((name, fn))

    samples = {name: [] for name, _ in live}
    for r in range(rounds):
        for name, fn in live:
            t = device_time_ms(fn, [rows], iters=32, sync_reps=2)
            samples[name].append(t)
            print(f"round {r} {name}: {t:.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    for name in samples:
        print(f"{name}: {float(np.median(samples[name])):.4f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
