#!/usr/bin/env python3
"""Randomized fused-vs-per-level soak (CPU, one-off).

For random (filter, shape, sigma, radius) configs, run_all_levels (forced
on via GIP_TPU_LOOP_TIMING=1) must return BITWISE the per-level outputs and
positive per-level times.  Complements tests/test_fused_levels.py's fixed
cases with random shapes across bucket boundaries.
"""
import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("GIP_TPU_PLATFORM", "cpu")
os.environ["GIP_TPU_LOOP_TIMING"] = "1"

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), "tests", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from gpu_image_processing_tpu.runtime.dispatch import RUNTIME

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60
rng = np.random.default_rng(20260818)
fails = 0
for trial in range(N):
    h = int(rng.integers(8, 160))
    w = int(rng.integers(8, 160))
    c = int(rng.choice([1, 3, 4]))
    filt = str(rng.choice(["gaussian", "box", "sobel"]))
    sigma = float(rng.uniform(0.5, 8.0))
    radius = int(rng.integers(1, 9))
    img = rng.integers(0, 256, (h, w, c), np.uint8)
    kw = {}
    if filt == "gaussian":
        kw = dict(sigma=sigma, radius=radius)
    elif filt == "box":
        kw = dict(radius=radius)
    try:
        fused = RUNTIME.run_all_levels(filt, img, sigma=sigma, radius=radius)
    except Exception as exc:
        fails += 1
        print(f"[{trial}] {filt} {h}x{w}x{c} r{radius}: fused raised {exc}",
              flush=True)
        continue
    for level in (1, 2):
        want, _ = RUNTIME.run(filt, img, level=level, sigma=sigma,
                              radius=radius)
        got, metrics = fused[level]
        if not np.array_equal(got, want) or metrics.time_ms <= 0:
            fails += 1
            d = np.abs(got.astype(int) - want.astype(int)).max()
            print(f"[{trial}] {filt} {h}x{w}x{c} r{radius} L{level}: "
                  f"maxdiff={d} t={metrics.time_ms}", flush=True)
    if trial % 10 == 9:
        print(f"{trial + 1}/{N} done", flush=True)

print(f"FUSED SOAK DONE: {fails} failures / {N} configs", flush=True)
sys.exit(1 if fails else 0)
