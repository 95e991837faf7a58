#!/usr/bin/env python3
"""Drive profile_filter (per-pass breakdown) and run_batch on the REAL TPU.
(throwaway)
  nohup python scripts/exp_profile_batch.py > /tmp/exp_pb.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gpu_image_processing_tpu.profiling.profiler import (  # noqa: E402
    get_common_metrics, profile_filter)
from gpu_image_processing_tpu.runtime.device import warmup_transfers  # noqa: E402
from gpu_image_processing_tpu.runtime.dispatch import RUNTIME  # noqa: E402


def main():
    t0 = time.time()
    warmup_transfers()
    print(f"[{time.time() - t0:.0f}s] ready", flush=True)
    rng = np.random.default_rng(7)

    img = rng.integers(0, 256, (720, 1080, 3), np.uint8)
    deep = profile_filter(img, "gaussian", 2, sigma=2.0, radius=3)
    common = get_common_metrics(deep, ncu_data=deep)
    print("deep profile gaussian L2 @720x1080:", flush=True)
    print("  duration_ms:", round(deep["total_kernel_duration_ms"], 4), flush=True)
    print("  per_pass:", {k: round(v, 4) for k, v in
                          deep.get("per_pass_durations_ms", {}).items()}, flush=True)
    print("  kernels:", common.get("kernels_profiled"), flush=True)
    print("  mem GB/s:", round(common.get("memory_throughput_gbps", 0), 1), flush=True)

    # Batch throughput: 16 x 512x512 RGB, level 2.
    imgs = rng.integers(0, 256, (16, 512, 512, 3), np.uint8)
    outs, metrics = RUNTIME.run_batch("gaussian", imgs, sigma=2.0, radius=3, level=2)
    t1 = time.time()
    outs, metrics = RUNTIME.run_batch("gaussian", imgs, sigma=2.0, radius=3, level=2)
    wall = time.time() - t1
    print(f"batch 16x512x512 gaussian L2: device {metrics.time_ms:.3f} ms, "
          f"warm wall {wall*1000:.0f} ms -> {16/wall:.0f} img/s wall, "
          f"{16/(metrics.time_ms/1000):.0f} img/s device", flush=True)


if __name__ == "__main__":
    main()
