"""Device-time measurement: the CUDA-event analog for (remote) TPUs.

CUDA events time the kernels on-stream, excluding launch latency
(image_filters.cu:804-894).  The TPU equivalent must exclude per-execute
RPC/dispatch overhead, which on remote-attached devices can be 50x the
kernel itself.  `device_time_ms` therefore runs the op N times inside ONE
jitted `lax.fori_loop` (uint8 image in == out, so iterations chain) and
reports (T(1+N) - T(1)) / N -- pure device time, no host round-trips in the
delta.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
from jax import lax


def _loop_time(apply: Callable, args: Sequence, n_iters: int, sync_reps: int) -> float:
    def fn(x, *rest):
        return lax.fori_loop(0, n_iters, lambda i, a: apply(a, *rest), x)

    compiled = jax.jit(fn).lower(*args).compile()
    compiled(*args).block_until_ready()   # program load
    best = float("inf")
    for _ in range(sync_reps):
        t0 = time.perf_counter()
        compiled(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def device_time_ms(
    apply: Callable,
    args: Sequence,
    iters: int = 16,
    sync_reps: int = 4,
) -> float:
    """Per-iteration device time (ms) of `apply(img, *rest) -> img`."""
    args = list(args)
    jax.block_until_ready(args)
    t1 = _loop_time(apply, args, 1, sync_reps)
    tn = _loop_time(apply, args, 1 + iters, sync_reps)
    return max((tn - t1) / iters * 1000.0, 1e-4)
