"""Device-time measurement: the CUDA-event analog for (remote) TPUs.

CUDA events time the kernels on-stream, excluding launch latency
(image_filters.cu:804-894).  The TPU equivalent must exclude per-execute
RPC/dispatch overhead, which on remote-attached devices can be 50x the
kernel itself.  `device_time_ms` therefore runs the op inside ONE jitted
`lax.fori_loop` (uint8 image in == out, so iterations chain) at TWO loop
lengths and reports the slope (T(hi) - T(lo)) / (hi - lo).

Both loop lengths are kept well above 1: the per-execute RPC overhead
through a relay drifts by tens of ms between calls, so a T(1) baseline
poisons the delta (measured on the axon v5e: back-to-back estimates of the
same kernel spread 0.15-0.51 ms with a T(1) baseline, vs 0.60-0.63 ms with
a T(17)/T(65) slope).  Medians over the repetition samples, not minima --
min pairs an unlucky-fast baseline with the true larger loop and
systematically underestimates.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
from jax import lax


def _loop_samples(
    apply: Callable, args: Sequence, n_iters: int, sync_reps: int,
    cache: dict | None = None,
) -> list[float]:
    """`sync_reps` wall times of an n_iters fori_loop of `apply`.

    `cache` (keyed on n_iters) memoizes the compiled loop program across
    calls within one measurement: a fresh closure gets no jit-cache hit, so
    without it every degenerate-slope retry would re-trace and re-lower the
    loop (seconds of host work on this 1-core host; the persistent disk
    cache only skips the XLA backend compile)."""
    compiled = cache.get(n_iters) if cache is not None else None
    if compiled is None:
        def fn(x, *rest):
            return lax.fori_loop(0, n_iters, lambda i, a: apply(a, *rest), x)

        compiled = jax.jit(fn).lower(*args).compile()
        compiled(*args).block_until_ready()   # program load
        if cache is not None:
            cache[n_iters] = compiled
    out = []
    for _ in range(sync_reps):
        t0 = time.perf_counter()
        compiled(*args).block_until_ready()
        out.append(time.perf_counter() - t0)
    return out


def _median(xs: Sequence[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def device_time_ms(
    apply: Callable,
    args: Sequence,
    iters: int = 16,
    sync_reps: int = 4,
) -> float:
    """Per-iteration device time (ms) of `apply(img, *rest) -> img`.

    `iters` sets the larger loop length; the smaller is iters//4.  Larger
    values buy noise rejection with wall time (the loop runs sync_reps
    times at each length).
    """
    args = list(args)
    jax.block_until_ready(args)
    lo = max(1, iters // 4)
    hi = max(lo + 1, iters)
    t_lo = _median(_loop_samples(apply, args, lo, sync_reps))
    t_hi = _median(_loop_samples(apply, args, hi, sync_reps))
    return max((t_hi - t_lo) / (hi - lo) * 1000.0, 1e-4)


def device_time_ms_auto(
    apply: Callable,
    args: Sequence,
    target_ms: float = 30.0,
    sync_reps: int = 3,
    max_hi: int = 1024,
) -> float:
    """Like device_time_ms, but sizes the larger loop so the measured work
    rises above relay jitter regardless of kernel size.

    A pilot slope over (16, 64) iterations sets the scale (a raw T(N)/N
    bound is useless here -- per-execute RPC inflates it by RPC/N, which for
    sub-ms kernels keeps the loop far too short).  If 64 iterations of the
    estimated kernel are still below target_ms of device work, one longer
    loop is run and the slope re-taken against it.  2-3 loop compiles.

    A congestion spike during the SHORT loop can push the delta to ~zero or
    negative (the clamp floor, 0.0001 ms) -- nonsense that would surface in
    served metrics as million-fps readings.  Degenerate slopes are re-taken
    with fresh samples at both lengths (executables are cached, so a retry
    costs only the loop executions)."""
    args = list(args)
    jax.block_until_ready(args)
    n_a, n_b = 16, 64
    compiled_loops: dict = {}

    def take_slope() -> float:
        t_a = _median(_loop_samples(apply, args, n_a, sync_reps,
                                    compiled_loops))
        t_b = _median(_loop_samples(apply, args, n_b, sync_reps,
                                    compiled_loops))
        slope = max((t_b - t_a) / (n_b - n_a), 1e-9)  # s/iter, jitter-noisy
        if slope * n_b * 1000.0 < target_ms:
            n_c = int(min(max(target_ms / 1000.0 / slope, 2 * n_b), max_hi))
            t_c = _median(_loop_samples(apply, args, n_c, sync_reps,
                                        compiled_loops))
            slope = (t_c - t_b) / (n_c - n_b)
        return slope

    slope = take_slope()
    for _ in range(2):
        if slope * 1000.0 > 2e-4:
            break
        slope = take_slope()
    return max(slope * 1000.0, 1e-4)


def chain_corner(fn):
    """Wrap a NON-shape-preserving filter fn for the loop-delta harness.

    The host-prepad tiers consume a padded (total_rows, arr_width) buffer
    and return the unpadded image -- which cannot carry a fori_loop.  A
    Mosaic custom-call cannot be partially dead-code-eliminated, so
    writing just an 8x128 CORNER of the output back into the padded carry
    forces the whole kernel to execute while the chain itself is a ~1 KB
    aligned write (measured 0.0001 ms -- indistinguishable from zero --
    vs 0.33-0.92 ms for any full-image chain write, which is a relayout
    that swamps the quantity being measured; scripts/exp_host_prepad.py
    runs 3-4, 2026-08-21)."""
    def chained(x, *rest):
        out = fn(x, *rest)
        ch = min(8, out.shape[-2])
        cw = min(128, out.shape[-1])
        tile = jax.lax.slice(out, (0,) * out.ndim,
                             (1,) * (out.ndim - 2) + (ch, cw))
        return jax.lax.dynamic_update_slice(x, tile, (0,) * x.ndim)

    return chained
