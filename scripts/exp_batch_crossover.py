#!/usr/bin/env python3
"""A/B the batch tiers: Pallas batch kernels vs the batched interleaved XLA
tier, at shapes on both sides of the single-image routing crossover.

Motivation: `dispatch._trace_batch` routes every feasible level-2/4 batch to
the Pallas batch kernels, but the SINGLE-image path routes small shapes to
the interleaved XLA tier because it measures faster there
(config.TPU.*xla_tier_max_pixels).  benchmarks/results.json shows the
symptom: gaussian L2 on 1024x1023 measures 0.047 ms single (XLA tier) but
0.081 ms/image at batch 16 (Pallas batch kernel).  If the XLA tier's win
survives batching (it vectorizes over leading dims for free), the batch
path should follow the same per-filter crossover.

Arms interleaved WITHIN rounds (CLAUDE.md drift discipline); correctness is
gated bit-exact between the tiers (both are bit-exact by contract).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax

    from gpu_image_processing_tpu.ops import interleaved as il
    from gpu_image_processing_tpu.ops.pallas.blur import (
        box_pallas_rows_batch,
        gaussian_pallas_rows_batch,
    )
    from gpu_image_processing_tpu.ops.pallas.sobel import sobel_pallas_rows_batch
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
    C = 3

    cases = [
        ("1MPx16", 1023, 1024, 16),
        ("7MPx4", 2146, 3239, 4),
    ]
    w3 = jax.device_put(gaussian_kernel_f32(3, 2.0), dev)

    for label, h, w, b in cases:
        rows = jax.device_put(
            rng.integers(0, 256, (b, h, w * C), dtype=np.uint8), dev)
        arms = [
            (f"{label} gauss pallas",
             lambda x, wt: gaussian_pallas_rows_batch(x, wt, 3, C), [rows, w3]),
            (f"{label} gauss xla",
             lambda x, wt: il.gaussian_rows(x, wt, 3, C), [rows, w3]),
            (f"{label} box pallas",
             lambda x: box_pallas_rows_batch(x, 5, C), [rows]),
            (f"{label} box xla",
             lambda x: il.box_rows(x, 5, C, doubling=True), [rows]),
            (f"{label} sobel pallas",
             lambda x: sobel_pallas_rows_batch(x, w, C, level=2), [rows]),
            (f"{label} sobel xla",
             lambda x: il.sobel_rows(x, 2, w, C), [rows]),
        ]
        # correctness gates: tiers must agree bit-exactly (blurs) / <=1
        # (sobel).  Compare ON DEVICE and fetch only the scalar -- bulk D2H
        # through the relay runs ~0.1-0.2 MB/s (an 83 MB fetch took ~12 min).
        import jax.numpy as jnp

        for i in (0, 2, 4):
            name_p, fp, ap = arms[i]
            name_x, fx, ax = arms[i + 1]

            def _gate(p=fp, x=fx, pa=tuple(ap), xa=tuple(ax)):
                return jnp.abs(
                    p(*pa).astype(jnp.int16) - x(*xa).astype(jnp.int16)
                ).max()

            d = int(jax.jit(_gate)())
            gate = 1 if "sobel" in name_p else 0
            assert d <= gate, f"{name_p} vs {name_x}: maxdiff {d}"
            print(f"{name_p} vs xla: maxdiff {d} (gate {gate})", flush=True)

        samples: dict[str, list] = {n: [] for n, _, _ in arms}
        for r in range(rounds):
            for name, fn, args in arms:
                t = device_time_ms(fn, args, iters=16, sync_reps=2)
                samples[name].append(t)
        for name in samples:
            med = float(np.median(samples[name]))
            print(f"{name}: {med:.4f} ms total, {med / rows.shape[0]:.4f} ms/img",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
