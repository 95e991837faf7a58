#!/usr/bin/env python3
"""Is the XLA-tier doubling-window box sum actually faster ON TPU?

Round-3 silicon A/B of exp_l1_box_doubling.py found the opposite of the
CPU result at the README shape: doubling 0.59x (r=5) / 0.81x (r=9) vs the
sequential tap order.  But the XLA interleaved tier's real serving regime
is different -- small images (box crossover 1.0 MP) and Pallas-infeasible
radii -- so this measures seq-vs-doubling exactly where dispatch's
`doubling=radius >= BOX_DOUBLING_MIN_RADIUS` routing applies:

  * small shapes (0.5 MP, 1.0 MP) at r = 4, 9      [XLA tier by crossover]
  * README shape (7 MP) at r = 15, 28              [large radii; r=28 is
    near the 64-tap cap, where doubling's 2*log2(taps) vs taps adds is
    most favorable]

Arms interleaved within rounds (CLAUDE.md drift discipline), bit-equality
gated on device.  Decision rule: keep doubling in a regime only if it
clears 1.3x there; otherwise route the XLA tier sequential.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

C = 3


def main() -> int:
    small = "--small" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--small"]
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

    # (label, H, W, radii)
    cases = [
        ("0.5MP", 640, 800, (4, 9)),
        ("1.0MP", 910, 1100, (4, 9)),
        ("7MP", 2146, 3239, (15, 28)),
    ]
    if small:  # CPU smoke
        cases = [("tiny", 48, 64, (4, 9))]
        rounds = 1

    rng = np.random.default_rng(42)
    arms = []  # (name, fn, operand)
    for label, h, w, radii in cases:
        rows = jax.device_put(
            rng.integers(0, 256, size=(h, w * C), dtype=np.uint8),
            default_device())
        for radius in radii:
            # Bit-equality gate ON DEVICE (bulk D2H is ~0.1 MB/s here).
            a = jax.jit(lambda x, r=radius: il.box_rows(x, r, C))(rows)
            b = jax.jit(lambda x, r=radius: il.box_rows(
                x, r, C, doubling=True))(rows)
            md = int(jnp.max(jnp.abs(a.astype(jnp.int32)
                                     - b.astype(jnp.int32))))
            print(f"{label} r={radius} maxdiff seq vs dbl: {md}", flush=True)
            if md != 0:
                print("NOT bit-identical -- do not adopt", flush=True)
                return 1
            for mode, dbl in (("seq", False), ("dbl", True)):
                arms.append((
                    f"{label}_{mode}_r{radius}",
                    (lambda r, d: lambda x: il.box_rows(x, r, C, doubling=d)
                     )(radius, dbl),
                    rows,
                ))

    samples: dict[str, list] = {name: [] for name, _, _ in arms}
    for rnd in range(rounds):
        for name, fn, rows in arms:
            t = device_time_ms(fn, [rows], iters=32, sync_reps=2)
            samples[name].append(t)
            print(f"round {rnd} {name}: {t:.4f} ms", flush=True)

    print("\n=== medians (seq/dbl ratio: >1 means doubling faster) ===",
          flush=True)
    med = {n: float(np.median(s)) for n, s in samples.items()}
    for label, h, w, radii in cases:
        for radius in radii:
            s, d = med[f"{label}_seq_r{radius}"], med[f"{label}_dbl_r{radius}"]
            print(f"{label} r={radius}: seq {s:.4f} ms, dbl {d:.4f} ms, "
                  f"doubling is {s / d:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
