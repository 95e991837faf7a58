#!/usr/bin/env python3
"""Serving crossover for the MXU sobel tier: XLA interleaved tier vs the
every-lane Pallas rows kernel vs the MXU gray-compaction tier across image
sizes.

The sobel Pallas/XLA crossover was tuned at 1.4 MP against the EVERY-LANE
kernel (core/config.py::sobel_xla_tier_max_pixels, exp_tuning.py
2026-08-17).  The MXU tier measured 0.361x the every-lane kernel at 7 MP
(exp_sobel_gray_repack.py), so the crossover against the XLA tier likely
sits lower.  All arms interleaved in one process per the drift discipline;
treat <30% as noise.

Run: python scripts/exp_mxu_sobel_crossover.py [rounds]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZES = [          # (H, W) bucketed-ish serving shapes
    (600, 800),    # 0.5 MP
    (832, 1216),   # 1.0 MP
    (1088, 1344),  # 1.5 MP
    (1536, 1472),  # 2.3 MP
    (2146, 3239),  # 7.0 MP README workload
]
C = 3
ITERS = 48


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import jax

    from gpu_image_processing_tpu.ops import interleaved as il
    from gpu_image_processing_tpu.ops.pallas.sobel import sobel_pallas_rows
    from gpu_image_processing_tpu.ops.pallas.sobel_mxu import sobel_mxu_rows
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    dev = default_device()
    print(f"device: {dev}", flush=True)
    rng = np.random.default_rng(11)

    med = {}
    for h, w in SIZES:
        img = rng.integers(0, 256, size=(h, w * C), dtype=np.uint8)
        rows = jax.device_put(img, dev)
        arms = [
            ("xla", lambda x, w=w: il.sobel_rows(x, 2, w, C), [rows]),
            ("lane", lambda x, w=w: sobel_pallas_rows(x, w, C, level=2), [rows]),
            ("mxu", lambda x, w=w: sobel_mxu_rows(x, w, C), [rows]),
        ]
        results = {n: [] for n, _, _ in arms}
        for r in range(rounds):
            for name, fn, fargs in arms:
                results[name].append(device_time_ms(fn, fargs, iters=ITERS))
        for name, xs in results.items():
            s = sorted(xs)
            med[(h, w, name)] = s[len(s) // 2] if len(s) % 2 else 0.5 * (
                s[len(s) // 2 - 1] + s[len(s) // 2])
        mp = h * w / 1e6
        print(f"{h}x{w} ({mp:.1f} MP): "
              f"xla {med[(h, w, 'xla')]:.4f}  "
              f"lane {med[(h, w, 'lane')]:.4f}  "
              f"mxu {med[(h, w, 'mxu')]:.4f} ms  "
              f"(mxu/xla {med[(h, w, 'mxu')] / med[(h, w, 'xla')]:.3f})",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
