#!/usr/bin/env python3
"""A/B: ADVANCED (f32-gray) serving sobel -- every-lane baseline vs the
MXU gray-compaction tier at level-1 numerics (README 7 MP rows shape).

Drift discipline: both arms interleaved in ONE process, per-round pairs,
device-timed via the loop-delta method.  Correctness gate compared ON
DEVICE (bulk D2H through the relay is ~0.1-0.2 MB/s).

Run: nohup python -u scripts/exp_sobel_mxu_l4.py > /tmp/exp_l4.log 2>&1 &
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from gpu_image_processing_tpu.runtime.device import (default_device,
                                                     warmup_transfers)

warmup_transfers()

import jax

from gpu_image_processing_tpu.ops.pallas.sobel import sobel_pallas_rows
from gpu_image_processing_tpu.ops.pallas.sobel_mxu import sobel_mxu_rows
from gpu_image_processing_tpu.runtime.timing import device_time_ms

H, W, C = 2146, 3239, 3
rng = np.random.default_rng(0)
rows = jax.device_put(
    rng.integers(0, 256, size=(H, W * C), dtype=np.uint8), default_device())

base = jax.jit(lambda r: sobel_pallas_rows(r, W, C, level=1))
mxu = jax.jit(lambda r: sobel_mxu_rows(r, W, C, level=1))

# On-device gate first (ADVANCED bar: maxdiff <= 1, rare tie flips).
a = base(rows)
b = mxu(rows)
d = jnp_abs = jax.numpy.abs(
    a.astype(jax.numpy.int32) - b.astype(jax.numpy.int32))
mx = int(d.max())
frac = float((d > 0).mean())
print(f"gate: maxdiff={mx} flip_frac={frac:.2e}", flush=True)
assert mx <= 1 and frac <= 1e-3, "L4 MXU gate FAILED"

for rnd in range(5):
    t_base = device_time_ms(base, [rows], iters=48)
    t_mxu = device_time_ms(mxu, [rows], iters=48)
    print(f"round {rnd}: every-lane {t_base:7.3f} ms   "
          f"mxu {t_mxu:7.3f} ms   ratio {t_mxu / t_base:5.3f}", flush=True)
print("done", flush=True)
