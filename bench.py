"""Flagship benchmark: Gaussian blur sigma=2.0 radius=3 on 3239x2146 RGB,
level 2 -- the reference README's headline workload (README.md:234-235:
22.157 ms naive / 0.953 ms optimized on an RTX 4050 Laptop GPU).

Prints ONE JSON line:
    {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <speedup>}
where vs_baseline > 1 means faster than the reference's optimized level-2
CUDA kernel time.

Methodology -- the device-side analog of CUDA-event timing
(image_filters.cu:804-894: events bracket kernels only, no transfers):
the filter is iterated inside ONE jitted `lax.fori_loop` program (uint8
image in, uint8 image out, so iterations chain) at two loop lengths;
per-iteration device time = the median slope (runtime/timing.py).  This
excludes host->device transfers, PNG codecs, compilation, AND per-call RPC
overhead on remote-attached devices, which per-call wall timing cannot
(observed ~2.5 ms/call through the axon tunnel -- 50x the actual kernel
time).  The shared chip's effective speed also drifts between rounds
(observed up to 2.7x over minutes -- neighbor-tenant contention, not our
kernel), so the reported value is the MIN of ROUNDS independent
measurements: the least-contended window, matching the reference's
idle-GPU CUDA-event conditions (and timeit's min-of-repeats rationale).
Each round's slope already uses within-length medians, so the min is
across real chip-speed variation, not estimator noise.

Run `python bench.py --full` for the whole README table (stderr).
"""

from __future__ import annotations

import json
import sys

_METRIC = "gaussian_blur_l2_3239x2146_rgb_time_ms"
BASELINE_GAUSSIAN_L2_MS = 0.953   # README.md:235
BASELINES_FULL = {
    ("gaussian", 1): 22.157,
    ("gaussian", 2): 0.953,
    ("box", 1): 12.311,
    ("box", 2): 2.766,
    ("sobel", 1): 18.339,
    ("sobel", 2): 0.528,
    # Level 4 (ADVANCED) is declared-but-unimplemented in the reference
    # (README.md:316); compared against its fastest published number for
    # each filter (the level-2 kernel time).
    ("gaussian", 4): 0.953,
    ("box", 4): 2.766,
    ("sobel", 4): 0.528,
}
H, W, C = 2146, 3239, 3          # README workload: 3239x2146 RGB
BOX_RADIUS = 5                    # README.md:242
GAUSS_SIGMA, GAUSS_RADIUS = 2.0, 3
LOOP_ITERS = 64
ROUNDS = 5


def _apply_fn(filter_name: str, level: int, width: int = W, channels: int = C,
              height: int = H):
    """(img_u8, *rest) -> img_u8 pure filter function for the given level.

    EVERY level is timed through the implementation serving actually uses,
    on the (H, W*C) serving boundary.  Level 1: the interleaved rows XLA
    tier (ops/interleaved.py) -- same bytes as HWC, bit-exact naive
    numerics, and 1.8-2.9x faster than timing the planar oracle whose
    HWC<->planar transposes are relayout cost the served path never pays
    (scripts/exp_l1_rows.py, A/B'd on silicon).  Levels 2/4: THE served
    single-image trace builders (runtime/dispatch.py) -- identical routing
    to /api/process, including the host-prepad tiers (the returned fn may
    carry `host_prepad`/`timing_chain` attributes, which measure_ms and
    program_fingerprint honor; scripts/exp_host_prepad.py run 4 measured
    the prepadded programs 0.75-0.83x the in-program-pad ones).
    """
    from gpu_image_processing_tpu.ops import interleaved as il

    if level == 1:
        impls = {
            "gaussian": lambda x, w: il.gaussian_rows(x, w, GAUSS_RADIUS, channels),
            "box": lambda x: il.box_rows(x, BOX_RADIUS, channels),
            "sobel": lambda x: il.sobel_rows(x, 1, width, channels),
        }
        return impls[filter_name]
    from gpu_image_processing_tpu.runtime import dispatch as _d

    if filter_name == "gaussian":
        return _d._trace_gaussian(level, GAUSS_RADIUS, height, width, channels)
    if filter_name == "box":
        return _d._trace_box(level, BOX_RADIUS, height, width, channels)
    return _d._trace_sobel(level, height, width, channels)


def program_fingerprint(filter_name: str, level: int, img) -> str:
    """sha256 of the traced program (jaxpr) `measure_ms` would time.

    Rows with equal fingerprints execute IDENTICAL device code, so their
    timing samples are exchangeable (e.g. box L2 vs L4 at the bench
    radius: the doubling-window path ignores `folded`, so the traces are
    identical).  Used by benchmarks/run_benchmarks.py to pool same-session
    samples across such rows -- otherwise per-row min-merge luck on this
    drift-prone chip (2.7x between windows) can publish the relaxed tier
    as "slower" than the exact tier it is the same program as.

    Hashes the JAXPR, not `.lower().as_text()`: the Mosaic custom-call
    lowering embeds per-trace naming (observed on the v5e 2026-08-19: two
    traces of the SAME code in one process hash differently, and every
    Pallas-tier row's text hash changed between sessions while the
    XLA-tier rows' stayed fixed), so a text hash silently never pools on
    the device it exists for -- caught by the on-silicon identity check
    in scripts/tpu_validation.py.  The jaxpr string is trace-deterministic
    (stable var naming, no instance counters), identical jaxprs lower to
    identical modules under the deterministic compiler, and it captures
    everything routing can change (kernel bodies, tile geometry, scratch
    shapes, interpret flags, compiler params).  jax version + backend are
    folded in so fingerprints never match across toolchains or platforms.
    """
    import hashlib

    import jax
    import numpy as np

    h, w_, c = img.shape
    fn = _apply_fn(filter_name, level, width=w_, channels=c, height=h)
    prep = getattr(fn, "host_prepad", None)
    if prep is not None:
        # Host-prepad tiers consume the padded buffer; derive its shape
        # from the prep itself so the fingerprinted program is exactly
        # the one measure_ms times.
        op_shape = prep(np.zeros((h, w_ * c), np.uint8)).shape
    else:
        op_shape = (h, w_ * c)
    spec = [jax.ShapeDtypeStruct(op_shape, np.uint8)]
    if filter_name == "gaussian":
        spec.append(
            jax.ShapeDtypeStruct((2 * GAUSS_RADIUS + 1,), np.float32))
    txt = (f"jax={jax.__version__} backend={jax.default_backend()}\n"
           + str(jax.make_jaxpr(fn)(*spec)))
    return hashlib.sha256(txt.encode()).hexdigest()


def measure_ms(filter_name: str, level: int, img, rounds: int = ROUNDS) -> float:
    """Min of `rounds` slope-based device timings (see module docstring)."""
    import jax

    from gpu_image_processing_tpu.ops.weights import gaussian_kernel_f32
    from gpu_image_processing_tpu.runtime.device import default_device
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    import numpy as np

    h, w_, c = img.shape
    fn = _apply_fn(filter_name, level, width=w_, channels=c, height=h)
    # Serving boundary: (H, W*C) rows -- a free host-side reshape of the
    # same HWC bytes (runtime/dispatch.py header).  Host-prepad tiers
    # additionally consume the host-padded buffer and are corner-chained
    # for the loop harness (runtime/timing.py::chain_corner) -- both
    # marshalling steps sit next to the untimed H2D, exactly where the
    # reference's cudaMemcpy sits (image_filters.cu:679-804).
    rows_np = np.ascontiguousarray(img).reshape(h, w_ * c)
    prep = getattr(fn, "host_prepad", None)
    if prep is not None:
        rows_np = prep(rows_np)
        from gpu_image_processing_tpu.runtime.timing import chain_corner

        fn = chain_corner(fn)
    dev_img = jax.device_put(rows_np, default_device())
    args = [dev_img]
    if filter_name == "gaussian":
        args.append(
            jax.device_put(
                gaussian_kernel_f32(GAUSS_RADIUS, GAUSS_SIGMA), default_device()
            )
        )

    # Physical floor: any filter must at least read + write the image once,
    # so per-iteration times below those bytes at TWICE the device's HBM
    # roofline are congestion artifacts (a spike during the SHORT loop
    # drives the slope to ~zero/clamp), not fast kernels.  The med/3 guard
    # alone fails when >= half the rounds degenerate in one bad window --
    # observed 2026-08-20: gaussian L4 published 0.0001 ms (9530x).
    try:
        from gpu_image_processing_tpu.profiling.profiler import device_peaks

        peaks = device_peaks()
        peak_gbps = peaks[0] if peaks else 819.0
    except Exception:
        peak_gbps = 819.0
    floor_ms = 2 * img.nbytes / (2 * peak_gbps * 1e9) * 1e3

    def take(n):
        return [device_time_ms(fn, args, iters=LOOP_ITERS) for _ in range(n)]

    samples = take(rounds)
    valid = [s for s in samples if s >= floor_ms]
    if not valid:  # whole batch degenerate: one retry (executables cached)
        samples = take(rounds)
        valid = [s for s in samples if s >= floor_ms] or samples
    valid = sorted(valid)
    med = valid[len(valid) // 2]
    return min(s for s in valid if s >= med / 3.0)


def main() -> None:
    import numpy as np

    from gpu_image_processing_tpu.runtime.device import warmup_transfers

    warmup_transfers()
    rng = np.random.default_rng(12345)
    img = rng.integers(0, 256, size=(H, W, C), dtype=np.uint8)

    if "--full" in sys.argv:
        print(
            f"{'filter':10} {'level':5} {'ours (ms)':>10} {'ref (ms)':>9} {'speedup':>8}",
            file=sys.stderr,
        )
        for (fname, level), ref_ms in BASELINES_FULL.items():
            ms = measure_ms(fname, level, img)
            print(
                f"{fname:10} {level:5} {ms:10.3f} {ref_ms:9.3f} {ref_ms / ms:8.2f}x",
                file=sys.stderr,
            )

    ms = measure_ms("gaussian", 2, img)
    print(json.dumps({
        "metric": _METRIC,
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_GAUSSIAN_L2_MS / ms, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # device unreachable, init failure, ...
        # Still emit ONE machine-readable JSON line so the harness records
        # WHY there is no number (an axon endpoint outage blocks jax init
        # ~22 min then raises UNAVAILABLE; see CLAUDE.md).  Never fabricate
        # a value.  benchmarks/results.json carries the last real numbers.
        print(json.dumps({
            "metric": _METRIC,
            "value": None,
            "unit": "ms",
            "vs_baseline": None,
            "error": f"{type(exc).__name__}: {exc}",
        }))
        raise
