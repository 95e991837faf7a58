#!/usr/bin/env python3
"""A/B the level-1 tier layouts at the README bench shape.

bench.py currently times level 1 through the planar oracle (ops/ref.py):
HWC -> (C, H, W) f32 transposes inside the timed region.  Serving routes
level 1 through the interleaved rows tier (ops/interleaved.py) on the
(H, W*C) boundary -- no relayout, but 3x lane redundancy for sobel gray.
This experiment interleaves both arms per filter in ONE process (drift
discipline, CLAUDE.md) to decide which implementation bench.py should time
and whether the rows tier should also replace the planar one elsewhere.

Correctness gates (on-device): gaussian/box rows output must equal the
planar output bit-exactly; sobel color is gated at maxdiff <= 1 (XLA FMA
contraction can flip floor(x+0.5) ties on TPU -- CLAUDE.md invariants).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3
BOX_RADIUS = 5
GAUSS_RADIUS = 3


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax

    from gpu_image_processing_tpu.ops import interleaved as il
    from gpu_image_processing_tpu.ops import ref
    from gpu_image_processing_tpu.ops.weights import gaussian_kernel_f32
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    dev = default_device()
    print(f"device: {dev}", flush=True)

    rng = np.random.default_rng(99)
    img_np = rng.integers(0, 256, size=(H, W, C), dtype=np.uint8)
    img = jax.device_put(img_np, dev)
    rows = jax.device_put(img_np.reshape(H, W * C), dev)
    w3 = jax.device_put(gaussian_kernel_f32(GAUSS_RADIUS, 2.0), dev)

    arms = [
        ("g1_planar", lambda x, w: ref.gaussian_blur(x, w, GAUSS_RADIUS), [img, w3]),
        ("g1_rows", lambda x, w: il.gaussian_rows(x, w, GAUSS_RADIUS, C), [rows, w3]),
        ("b1_planar", lambda x: ref.box_blur(x, BOX_RADIUS), [img]),
        ("b1_rows", lambda x: il.box_rows(x, BOX_RADIUS, C), [rows]),
        ("s1_planar", lambda x: ref.sobel(x, 1), [img]),
        ("s1_rows", lambda x: il.sobel_rows(x, 1, W, C), [rows]),
    ]

    # correctness gates (device vs device; the suite separately gates vs the
    # CPU oracle)
    for name_p, name_r, maxdiff in (
        ("g1_planar", "g1_rows", 0),
        ("b1_planar", "b1_rows", 0),
        ("s1_planar", "s1_rows", 1),
    ):
        fp = dict((n, (f, a)) for n, f, a in arms)[name_p]
        fr = dict((n, (f, a)) for n, f, a in arms)[name_r]
        out_p = np.asarray(jax.jit(fp[0])(*fp[1])).reshape(H, W * C)
        out_r = np.asarray(jax.jit(fr[0])(*fr[1]))
        diff = np.abs(out_p.astype(np.int16) - out_r.astype(np.int16)).max()
        assert diff <= maxdiff, f"{name_r} vs {name_p}: maxdiff {diff}"
        print(f"{name_r} vs {name_p}: maxdiff {diff} (gate {maxdiff})", flush=True)

    samples = {name: [] for name, _, _ in arms}
    for r in range(rounds):
        for name, fn, args in arms:
            t = device_time_ms(fn, args, iters=32, sync_reps=2)
            samples[name].append(t)
            print(f"round {r} {name}: {t:.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    for name in samples:
        med = float(np.median(samples[name]))
        print(f"{name}: {med:.4f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
