#!/usr/bin/env python3
"""Measure the relay PJRT client's per-device_put host-memory leak.

Methodology behind the worker-recycle watchdog (server/app.py,
README "serving"; first measured 2026-08-18):

  1. burst: N device_put of a serving-sized uint8 rows array, each
     explicitly .delete()d -- RSS grows ~2.4 MB/transfer during the burst;
  2. idle decay: ~45% of the growth is returned asynchronously within
     ~5 s, then NOTHING more (60 s idle, malloc_trim, gc, and further tiny
     RPCs all change nothing);
  3. the remaining ~1.3 MB/transfer is permanent.  The CPU backend run
     (GIP_TPU_PLATFORM=cpu) is flat -- the leak is the relay client's,
     not this repo's.

Run on the TPU (one process, bounded, exits on its own):
    python scripts/exp_relay_leak.py [burst=100]
"""

from __future__ import annotations

import ctypes
import gc
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1])
    return -1


def main() -> int:
    burst = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    import jax

    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        platform,
        warmup_transfers,
    )

    libc = ctypes.CDLL("libc.so.6")
    warmup_transfers()
    dev = default_device()
    # Serving-sized rows payload: 600x800 RGB as (H, W*C) uint8.
    rows = np.random.default_rng(0).integers(0, 256, (600, 2400), np.uint8)
    per_put_kb = rows.nbytes / 1024.0

    jax.device_put(rows, dev).delete()
    gc.collect()
    base = rss_kb()
    print(f"platform={platform()} payload={per_put_kb:.0f} kB "
          f"baseline rss={base} kB", flush=True)

    for _ in range(burst):
        jax.device_put(rows, dev).delete()
    gc.collect()
    after = rss_kb()
    print(f"after burst of {burst}: {after} kB "
          f"(+{(after - base) / burst:.1f} kB/transfer)", flush=True)

    settled = after
    for t in range(12):
        time.sleep(5)
        gc.collect()
        libc.malloc_trim(0)
        settled = rss_kb()
        print(f"idle {5 * (t + 1):3d}s: {settled} kB", flush=True)

    leak_per = (settled - base) / burst
    print(f"\npermanent growth: {settled - base} kB over {burst} transfers "
          f"= {leak_per:.1f} kB/transfer "
          f"({leak_per / per_put_kb:.2f}x the payload)", flush=True)
    print("LEAKY" if leak_per > 0.25 * per_put_kb else "CLEAN", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
