"""Deep profiling: the TPU-native replacement for the Nsight Compute sidecar.

The reference shells out to `ncu --set full` around a throwaway script and
parses CSV/JSON/text into a categorized metric dict
(backend/profiling/ncu_profiler.py:39-331,795-934).  On TPU nothing needs a
subprocess: the compiled XLA executable carries its own cost model
(`compiled.cost_analysis()`) and memory footprint (`memory_analysis()`), and
`jax.profiler` can capture a full trace on demand.  This module keeps the
same three-tier contract (SURVEY 5.1):

(a) the primary ``time_ms`` is always the direct device timing measured by
    the dispatch runtime -- profiled numbers NEVER override it (the server
    layer enforces this, mirroring backend/app.py:391-427);
(b) `profile_filter` populates the same categorized dict shape the ncu
    parser produced: {"execution": ..., "memory": ..., "occupancy": ...,
    "config": ..., "total_kernel_duration_ms": ..., "kernels_profiled": ...};
(c) `get_common_metrics` flattens it to the UI-ready keys
    (`occupancy_pct`, `memory_throughput_gbps`, `compute_throughput_pct`,
    `kernel_durations`, `total_kernels`, ...) like
    ncu_profiler.get_common_ncu_metrics (:795-934).
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

import numpy as np

from ..runtime.device import default_device, platform

# Peak specs used to turn measured rates into utilization percentages (the
# TPU analog of ncu's "% of speed-of-light" columns).  Keyed by TPU
# GENERATION read from `device_kind` -- a v5e table applied to a v5p would
# silently misreport every percentage.  Public spec-sheet numbers; f32 is
# modeled as half the bf16 MXU rate.
_TPU_GENERATION_PEAKS = {
    # generation -> (HBM GB/s, f32 TFLOP/s, bf16 TFLOP/s)
    "v4": (1228.0, 137.0, 275.0),
    "v5e": (819.0, 98.0, 197.0),
    "v5p": (2765.0, 229.0, 459.0),
    "v6e": (1640.0, 459.0, 918.0),
}

# Non-TPU hosts have NO trustworthy peak table, so they get no utilization
# percentages at all (same contract as an unknown TPU generation) -- a
# CPU-demoted serving process must not render guessed percentages as
# hardware truth (ncu reads real clocks instead: ncu_profiler.py:559-626).
# Tests exercising the UI percentage path opt in via GIP_TPU_TEST_PEAKS=1,
# which enables these rough placeholders.
_FALLBACK_PEAKS = {"cpu": (50.0, 0.5, 0.5), "gpu": (500.0, 20.0, 40.0)}


def _tpu_generation(device_kind: str) -> Optional[str]:
    """Map a jax `device_kind` string to a generation key, or None.

    Known spellings: "TPU v4", "TPU v5 lite"/"TPU v5e", "TPU v5p",
    "TPU v6 lite"/"TPU v6e" (trailing core index tolerated).
    """
    kind = device_kind.lower()
    if "v6 lite" in kind or "v6e" in kind:
        return "v6e"
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    if "v5p" in kind:
        return "v5p"
    if "v4" in kind:
        return "v4"
    return None


def device_peaks(device_kind: Optional[str] = None,
                 plat: Optional[str] = None) -> Optional[tuple[float, float, float]]:
    """(HBM GB/s, f32 TFLOP/s, bf16 TFLOP/s) for the attached device.

    Returns None for a TPU generation not in the table (unless env
    overrides supply the numbers): callers must then OMIT utilization
    percentages rather than compute them against a wrong peak.
    Env overrides: GIP_TPU_PEAK_HBM_GBPS, GIP_TPU_PEAK_F32_TFLOPS,
    GIP_TPU_PEAK_BF16_TFLOPS.
    """
    plat = plat or platform()
    if device_kind is None:
        device_kind = getattr(default_device(), "device_kind", "") or ""

    def _env_peak(k: str) -> Optional[float]:
        try:
            return float(os.environ.get(k, 0.0)) or None
        except ValueError:
            # Garbage must not kill profiling for every request (same
            # contract as dispatch's env parsing); ignore the override.
            return None

    env = [_env_peak(k) for k in (
        "GIP_TPU_PEAK_HBM_GBPS", "GIP_TPU_PEAK_F32_TFLOPS",
        "GIP_TPU_PEAK_BF16_TFLOPS")]

    if plat == "tpu":
        gen = _tpu_generation(device_kind)
        peaks = _TPU_GENERATION_PEAKS.get(gen) if gen else None
    elif os.environ.get("GIP_TPU_TEST_PEAKS", "0") == "1":
        # Test-only: placeholder peaks so the UI percentage path has
        # coverage on the CPU mesh.  Production off-TPU (e.g. a demoted
        # serving worker) falls through to None -> percentages omitted.
        peaks = _FALLBACK_PEAKS.get(plat, _FALLBACK_PEAKS["cpu"])
    else:
        peaks = None

    if peaks is None:
        if all(v is not None for v in env):
            return (env[0], env[1], env[2])
        return None
    return tuple(e if e is not None else p for e, p in zip(env, peaks))


def check_profiler_available() -> bool:
    """Analog of check_ncu_available (ncu_profiler.py:25): the XLA profiler
    ships with jax, so deep profiling is available wherever jax runs."""
    return True


def _pass_fn(filter_type: str, lvl: int, radius: int, which: str,
             h: int, w: int, c: int):
    """A jittable (H, W*C) u8 -> u8 fn running ONE separable pass of a blur.

    Matches the implementation tier the runtime actually serves: the
    interleaved Pallas kernel with the other pass elided (levels 2/4), or
    the interleaved XLA shifted-slice pass (level 1 / Pallas disabled).
    Rows-native like the serving trace fns, so no relayout pollutes the
    measured split.
    """
    from ..runtime.dispatch import _pallas_disabled, _routed_to_xla

    if (lvl >= 2 and not _routed_to_xla(lvl, h, w, filter_type, radius, c)
            and not _pallas_disabled()):
        try:
            from ..ops.pallas.blur import (blur_pallas_feasible,
                                           box_pallas_rows,
                                           gaussian_pallas_rows)
            from ..runtime.device import is_tpu

            # Mirror dispatch's routing (_rows_optimized), including its
            # ordering: MXU eligibility FIRST (at extreme radii only the
            # MXU kernel fits VMEM), then the VPU feasibility gate; radii
            # the runtime serves from the XLA tier measure the XLA passes
            # actually served instead of tracing a Pallas kernel that
            # raises (and silently killed the breakdown).
            interp = not is_tpu()
            folded = lvl == 4
            if filter_type == "gaussian":
                if folded:
                    from ..ops.pallas.blur_mxu import (gaussian_mxu_rows,
                                                       use_mxu_gaussian)

                    # Match the tier the runtime actually serves: L4 at
                    # MXU-routed radii breaks down the MXU kernel's own
                    # passes, not the VPU kernel's.
                    if use_mxu_gaussian(radius, w, c, interleaved=True):
                        return lambda rows, wts: gaussian_mxu_rows(
                            rows, wts, radius, c,
                            interpret=interp, passes=which,
                        )
                if blur_pallas_feasible(w, radius, c, False,
                                        interleaved=True):
                    return lambda rows, wts: gaussian_pallas_rows(
                        rows, wts, radius, c,
                        interpret=interp, folded=folded, passes=which,
                    )
            else:
                from ..ops.pallas.blur_mxu import (box_mxu_rows,
                                                   use_mxu_box)

                # Match the served tier (dispatch._rows_optimized):
                # MXU-routed radii break down the MXU kernel's passes.
                if use_mxu_box(radius, w, c, interleaved=True):
                    return lambda rows: box_mxu_rows(
                        rows, radius, c, interpret=interp, passes=which)
                if blur_pallas_feasible(w, radius, c, True,
                                        interleaved=True):
                    return lambda rows: box_pallas_rows(
                        rows, radius, c,
                        interpret=interp, folded=folded, passes=which,
                    )
        except ImportError:  # pragma: no cover - env without Mosaic
            pass

    from ..ops import interleaved as il
    from ..ops.rounding import quantize_u8
    from ..ops.weights import box_inv_taps_f32

    if filter_type == "gaussian":
        def fn(rows, wts):
            x = rows.astype("float32")
            y = (il._conv_cols(x, wts, radius, c) if which == "horizontal"
                 else il._conv_rows(x, wts, radius))
            return quantize_u8(y)

        return fn

    doubling = lvl >= 2 and radius >= il.BOX_DOUBLING_MIN_RADIUS_XLA

    def fn(rows):
        inv = box_inv_taps_f32(radius)
        x = rows.astype("float32")
        if doubling:
            taps = 2 * radius + 1
            y = (il._windowed_sum_doubling(
                    il._pad_pixels_lr(x, radius, c), taps, c, x.ndim - 1)
                 if which == "horizontal"
                 else il._windowed_sum_doubling(
                    il._pad_rows_edge(x, radius), taps, 1, x.ndim - 2))
        else:
            y = (il._sum_cols(x, radius, c) if which == "horizontal"
                 else il._sum_rows(x, radius))
        return quantize_u8(y * inv)

    return fn


# (filter, level, radius, H, W, C, platform) -> (h_ms, v_ms); per-pass
# variants are compile-heavy, so measure each profiled config once.
_PASS_CACHE: dict[tuple, tuple[float, float]] = {}

# Same key -> {kernel: {count, total_ms, avg_ms}} parsed from an xplane
# trace of the served executable; None caches "trace tier unavailable".
_TRACE_CACHE: dict[tuple, Optional[dict]] = {}
_TRACE_LOCK = __import__("threading").Lock()


def _trace_kernel_breakdown(key: tuple, run_fn) -> Optional[dict]:
    """Tier-1 per-kernel durations: capture a jax.profiler trace around the
    ACTUAL served executable and parse the device plane (profiling/xplane.py).

    The reference's primary tier parses ncu CSV of the re-run kernels
    (ncu_profiler.py:177-203,406-723); here the trace wraps the very
    executable the runtime serves, so the durations are the served
    kernels' own.  Returns None when the capture yields no device events
    (CPU backend, profiler unavailable) -- callers fall to the estimate
    tier.  Cached per config: capture + parse costs ~100 ms.
    """
    if os.environ.get("GIP_TPU_DISABLE_TRACE_TIER", "0") == "1":
        return None
    if key in _TRACE_CACHE:
        return _TRACE_CACHE[key]
    result: Optional[dict] = None
    # One capture at a time: jax.profiler supports a single in-process
    # session (a concurrent one raises), and the trace window records
    # PROCESS-WIDE device activity -- serializing keeps a concurrent
    # request's kernels out of this config's table and keeps a losing
    # thread from permanently caching None for its config.
    with _TRACE_LOCK:
        if key in _TRACE_CACHE:
            return _TRACE_CACHE[key]
        try:
            import shutil
            import tempfile

            import jax

            from .xplane import serving_kernel_durations

            out_dir = tempfile.mkdtemp(prefix="gip_tpu_xplane_")
            try:
                with jax.profiler.trace(out_dir):
                    run_fn()
                kernels = serving_kernel_durations(out_dir)
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)
            result = kernels or None
        except Exception:  # pragma: no cover - profiler unsupported here
            result = None
        _TRACE_CACHE[key] = result
    return result


def _pass_breakdown(
    filter_type: str, lvl: int, radius: int,
    kh: int, kw: int, channels: int, args,
) -> tuple[float, float]:
    """Measured durations of isolated horizontal/vertical pass kernels.

    The analog of ncu reporting per-kernel Durations for the two separable
    launches (ncu_profiler.py:499-557).  Our level-2 kernel fuses both
    passes, so each is timed as a pass-isolated kernel variant; callers
    rescale the pair to the fused kernel's measured total (the reference
    itself estimates missing pass durations by ratio, ncu_profiler.py:630).
    """
    from ..runtime.dispatch import _pallas_disabled, _routed_to_xla

    # Fold the routing env flags in (same reason dispatch's
    # executable_cache_key does): a mid-process flip must not serve
    # stale pass timings measured on the other tier.
    key = (filter_type, lvl, radius, kh, kw, channels, platform(),
           _routed_to_xla(lvl, kh, kw, filter_type, radius, channels),
           _pallas_disabled())
    if key in _PASS_CACHE:
        return _PASS_CACHE[key]
    from ..runtime.device import is_tpu
    from ..runtime.timing import device_time_ms

    iters = 64 if is_tpu() else 4
    out = []
    for which in ("horizontal", "vertical"):
        fn = _pass_fn(filter_type, lvl, radius, which, kh, kw, channels)
        out.append(device_time_ms(fn, args, iters=iters, sync_reps=2))
    _PASS_CACHE[key] = (out[0], out[1])
    return out[0], out[1]


def _kernel_label(filter_type: str, level: int) -> str:
    names = {
        ("gaussian", 1): "gaussian_blur_oracle_l1",
        ("gaussian", 2): "gaussian_blur_fused_l2",
        ("box", 1): "box_blur_oracle_l1",
        ("box", 2): "box_blur_fused_l2",
        ("sobel", 1): "sobel_oracle_l1",
        ("sobel", 2): "sobel_fused_l2",
    }
    return names.get((filter_type, level), f"{filter_type}_l{level}")


def _assemble_metrics(
    *,
    duration_ms: float,
    times_ms: list[float],
    fallback_ms: float,
    compiled,
    label: str,
    shape_str: str,
    io_bytes: int,
    trace_kernels: Optional[dict],
    per_pass: Optional[tuple[float, float]],
    extra_config: Optional[dict[str, Any]] = None,
    mxu_flops: Optional[int] = None,
) -> dict[str, Any]:
    """Assemble the categorized metric dict (shared by profile_filter and
    profile_batch): XLA cost/memory analyses from `compiled`, utilization
    percentages against the generation peak table, and the provenance-
    tagged per-kernel tier rows (xplane trace / isolated-pass estimate /
    device timing).  `io_bytes` is the traffic floor (bytes any
    implementation must move) the percentages are computed against."""
    mean_ms = float(np.mean(times_ms)) if times_ms else fallback_ms

    # XLA's own analyses.
    flops = bytes_accessed = None
    peak_vmem_bytes = temp_bytes = argument_bytes = output_bytes = None
    if compiled is not None:
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            flops = float(ca.get("flops", 0.0)) or None
            bytes_accessed = float(ca.get("bytes accessed", 0.0)) or None
        except Exception:
            pass
        try:
            ma = compiled.memory_analysis()
            peak_vmem_bytes = getattr(ma, "peak_memory_in_bytes", None)
            temp_bytes = getattr(ma, "temp_size_in_bytes", None)
            argument_bytes = getattr(ma, "argument_size_in_bytes", None)
            output_bytes = getattr(ma, "output_size_in_bytes", None)
        except Exception:
            pass

    peaks = device_peaks()

    seconds = duration_ms / 1000.0 if duration_ms > 0 else 1e-9
    achieved_io_gbps = io_bytes / seconds / 1e9
    achieved_hlo_gbps = (bytes_accessed / seconds / 1e9) if bytes_accessed else None
    achieved_tflops = (flops / seconds / 1e12) if flops else None

    metrics: dict[str, Any] = {
        "execution": {
            "Duration (ms)": duration_ms,
            "Mean Duration (ms)": mean_ms,
            "Launch Count": len(times_ms) or 1,
        },
        "memory": {
            "Memory Throughput (Gbyte/s)": achieved_hlo_gbps or achieved_io_gbps,
            "IO Throughput (Gbyte/s)": achieved_io_gbps,
            "HLO Bytes Accessed": bytes_accessed,
            "Peak Device Memory (bytes)": peak_vmem_bytes,
            "Temp Buffer Bytes": temp_bytes,
            "Argument Bytes": argument_bytes,
            "Output Bytes": output_bytes,
        },
        "occupancy": {},
        "config": {
            "Image Shape": shape_str,
            "Platform": platform(),
            "Device": str(default_device()),
            "HLO FLOPs": flops,
        },
        "total_kernel_duration_ms": duration_ms,
        "kernels_profiled": [label],
        "profiler": "xla_cost_analysis",
    }

    # Utilization percentages ONLY when the device generation's peaks are
    # known (or env-supplied) -- an unknown chip gets no percentages rather
    # than percentages against the wrong table.
    if peaks is not None:
        peak_hbm_gbps, peak_f32_tflops, peak_bf16_tflops = peaks
        # Percentages are computed from the IO FLOOR (image in + out), the
        # bytes any implementation must move through HBM.  XLA's cost-model
        # "bytes accessed" counts VMEM-internal fusion traffic and can
        # exceed physical HBM peak several-fold (observed 384% on a served
        # trace) -- it stays available as its own throughput row, never as
        # a utilization percentage.
        dram_pct = 100.0 * achieved_io_gbps / peak_hbm_gbps
        metrics["execution"]["Compute Throughput (% of peak f32)"] = (
            100.0 * achieved_tflops / peak_f32_tflops if achieved_tflops else 0.0
        )
        if mxu_flops:
            # Mosaic custom-calls carry no XLA cost model, so the served
            # MXU tiers (box L2/L4, sobel L2/L4 color, gaussian L4) would
            # show 0% compute -- attach the MODELED matmul flops (from the
            # kernels' own geometry, traffic.served_mxu_flops) against the
            # bf16 MXU peak: the live-API completion of ncu's "Compute
            # Throughput" (ncu_profiler.py:795-934).  Tagged modeled, not
            # a hardware counter.
            mxu_tf = mxu_flops / seconds / 1e12
            metrics["execution"]["MXU Throughput (% of bf16 peak, modeled)"] = (
                100.0 * mxu_tf / peak_bf16_tflops)
            metrics["config"]["Modeled MXU FLOPs"] = mxu_flops
        metrics["memory"]["DRAM Throughput (% of peak)"] = dram_pct
        # TPU has no warp occupancy; report bandwidth-bound utilization,
        # the nearest "how busy is the hot resource" analog.
        metrics["occupancy"]["Achieved Occupancy (% of peak HBM bandwidth)"] = dram_pct
        metrics["config"]["Peak HBM Bandwidth (Gbyte/s)"] = peak_hbm_gbps
    else:
        plat = platform()
        if plat == "tpu":
            reason = ("unknown device generation %r"
                      % (getattr(default_device(), "device_kind", ""),))
        else:
            reason = "no trusted peak table for platform %r" % (plat,)
        metrics["config"]["Peak Table"] = (
            reason + ": utilization percentages omitted"
        )

    # Per-kernel rows, by tier (the ncu analog of per-kernel Duration rows,
    # ncu_profiler.py:499-557), tagged with their provenance:
    #   "xplane_trace"          -- measured device events of the SERVED
    #                              executable (tier 1, the real thing);
    #   "isolated_pass_estimate" -- isolated-pass kernels rescaled to the
    #                              fused total (tier 2, an estimate);
    #   "device_timing"         -- no breakdown, loop-delta total only.
    if trace_kernels:
        names = sorted(
            trace_kernels, key=lambda n: -trace_kernels[n]["total_ms"]
        )
        metrics["kernels_profiled"] = names
        metrics["kernel_durations_ms"] = {
            n: trace_kernels[n]["avg_ms"] for n in names
        }
        metrics["trace_kernel_stats"] = trace_kernels
        metrics["duration_source"] = "xplane_trace"
        metrics["profiler"] = "jax_xplane_trace"
        # Sum of per-op traced durations: the self-consistent denominator
        # for per-op share accounting (shares against it sum to exactly
        # 100%).  It can exceed the device-timed total_kernel_duration_ms
        # when XLA overlaps async ops -- per-op `overlap_ms` (xplane.py)
        # marks the rows responsible.
        metrics["trace_total_ms"] = sum(
            trace_kernels[n]["avg_ms"] for n in names)

        # Human-facing metric labels use the op's short name ("%fusion.1"
        # from "%fusion.1 = u8[...] custom-call(...)"): on real TPU planes
        # the event name is the FULL HLO instruction text, which would put
        # multi-hundred-character keys into the UI metric table.  The full
        # text stays available in trace_kernel_stats / kernel_durations_ms
        # for programmatic consumers.  Collisions (two ops shortening
        # identically, or no " = " to split on) fall back to the full name.
        shorts: dict[str, str] = {}
        used: set[str] = set()
        for n in names:
            s = n.split(" = ")[0]
            if not s.startswith("%") or s in used:
                s = n
            used.add(s)
            shorts[n] = s
        for n in names:
            metrics["execution"][f"Duration {shorts[n]} (ms)"] = (
                trace_kernels[n]["avg_ms"])

        # Per-op XStat harvest (VERDICT r2 item 3): the trace events carry
        # XLA's per-op counters (flops, bytes accessed, ... -- whatever the
        # plane provides), the ncu-table analog of per-kernel counters
        # (ncu_profiler.py:406-723).  Stats are summed over the capture
        # window by the parser; divide by count for per-execution values.
        op_stats: dict[str, dict[str, float]] = {}
        trace_flops = trace_bytes = 0.0
        for n in names:
            rec = trace_kernels[n]
            stats = rec.get("stats")
            if not stats or not rec.get("count"):
                continue
            per_exec = {k: v / rec["count"] for k, v in stats.items()}
            op_stats[n] = per_exec
            f = per_exec.get("flops") or per_exec.get("model_flops") or 0.0
            b = (per_exec.get("bytes accessed")
                 or per_exec.get("bytes_accessed") or 0.0)
            trace_flops += f
            trace_bytes += b
            if b and rec["avg_ms"] > 0:
                # Measured per-op bandwidth: XLA's own bytes over the op's
                # own measured duration -- the per-kernel "% of
                # speed-of-light" ingredient ncu reports directly.
                metrics["occupancy"][
                    f"Bandwidth {shorts[n]} (Gbyte/s, trace)"] = (
                    b / (rec["avg_ms"] / 1e3) / 1e9
                )
        if op_stats:
            metrics["trace_op_stats"] = op_stats
            if trace_flops:
                metrics["execution"]["Trace FLOPs (per exec)"] = trace_flops
            if trace_bytes:
                metrics["memory"]["Trace Bytes Accessed (per exec)"] = (
                    trace_bytes
                )
    elif per_pass is not None and (per_pass[0] + per_pass[1]) > 0:
        # Rescaled so the pair sums to the fused kernel's measured total.
        share = per_pass[0] / (per_pass[0] + per_pass[1])
        h_ms = duration_ms * share
        v_ms = duration_ms - h_ms
        metrics["kernels_profiled"] = [f"{label}_horizontal", f"{label}_vertical"]
        metrics["per_pass_durations_ms"] = {
            "horizontal": h_ms,
            "vertical": v_ms,
        }
        metrics["duration_source"] = "isolated_pass_estimate"
        metrics["execution"]["Duration horizontal pass (ms)"] = h_ms
        metrics["execution"]["Duration vertical pass (ms)"] = v_ms
    else:
        metrics["duration_source"] = "device_timing"

    if extra_config:
        metrics["config"].update(extra_config)
    return metrics


def _locate_spatial(runtime, filter_type: str, lvl: int,
                    img_exec: np.ndarray, kwargs: dict):
    """(exe_key, exe, sharded args) of the served ROW-SHARDED executable,
    or None when spatial serving is inactive for this shape.

    Profiled requests on a GIP_TPU_MESH_SPATIAL deployment serve through
    the spatial executable (dispatch._run_spatial_attempt), so the deep
    profile must time/trace THAT program -- the single-chip cache key
    finds nothing (VERDICT r3 item 6).
    """
    from ..runtime import dispatch as _dispatch

    if not _dispatch._mesh_spatial_devices(img_exec.shape[0]):
        return None
    weights = None
    if filter_type == "gaussian":
        from ..ops.weights import gaussian_kernel_f32

        weights = gaussian_kernel_f32(kwargs["radius"], float(kwargs["sigma"]))
    try:
        handle = runtime.spatial_profile_handle(
            filter_type, lvl, img_exec, kwargs.get("radius", 0), weights)
    except Exception:
        return None
    if handle is None:
        return None
    key, exe, args = handle
    if exe._compiled is None:
        # Compile lazily like serving does (first profiled request can
        # precede any served one for this config).
        exe(*args)
    return key, exe, args


def profile_filter(
    image: np.ndarray,
    filter_type: str,
    level: int,
    sigma: Optional[float] = None,
    radius: Optional[int] = None,
    capture_trace: bool = False,
    trace_dir: Optional[str] = None,
) -> dict[str, Any]:
    """Profile one filter execution; returns the categorized metric dict.

    Unlike the ncu flow (fresh python under `ncu` re-running the filter,
    ncu_profiler.py:93-156), this reuses the already-compiled executable in
    the process-wide runtime, measures steady-state device time over several
    repetitions, and reads XLA's own cost/memory analyses.  On a spatial-
    serving deployment (GIP_TPU_MESH_SPATIAL) the profiled program is the
    row-sharded executable the runtime actually serves.
    """
    from ..runtime import dispatch as _dispatch
    from ..core.params import normalize_level

    runtime = _dispatch.RUNTIME
    lvl = normalize_level(filter_type, level)
    height, width, channels = image.shape

    kwargs: dict[str, Any] = {"level": lvl}
    if filter_type == "gaussian":
        kwargs.update(sigma=sigma if sigma is not None else 2.0,
                      radius=radius if radius is not None else 3)
    elif filter_type == "box":
        kwargs.update(radius=radius if radius is not None else 3)

    # Warm + locate the executable via a normal run.  Cache keys use the
    # BUCKETED shape (see dispatch shape bucketing).
    _, first_metrics = runtime.run(filter_type, image, **kwargs)
    kh, kw = height, width
    if _dispatch._bucketing_enabled():
        kh, kw = _dispatch._bucket(height), _dispatch._bucket(width)

    img_exec = np.ascontiguousarray(image, dtype=np.uint8)
    if (kh, kw) != (height, width):
        img_exec = np.pad(
            img_exec, ((0, kh - height), (0, kw - width), (0, 0)), mode="edge"
        )

    serving_path = "single_chip"
    spatial = _locate_spatial(runtime, filter_type, lvl, img_exec, kwargs)
    if spatial is not None:
        exe_key, exe, args = spatial
        serving_path = "spatial"
    else:
        exe_key = _dispatch.executable_cache_key(
            filter_type, lvl, kh, kw, channels, kwargs.get("radius"))
        exe = runtime._cache.get(exe_key)
        args = None

    # Device-side kernel timing via the loop-delta method (the analog of
    # ncu's on-device measurement with --launch-count 10,
    # ncu_profiler.py:142); also keep a wall-time sample set.
    times_ms: list[float] = []
    duration_ms = first_metrics.time_ms
    per_pass: Optional[tuple[float, float]] = None
    trace_kernels: Optional[dict] = None
    if exe is not None and exe._compiled is not None:
        import jax

        from ..runtime.timing import device_time_ms

        if args is None:
            rows_np = img_exec.reshape(kh, -1)
            if getattr(exe, "host_prepad", None) is not None:
                # Host-prepad serving (dispatch._host_prepad_enabled):
                # the served executable consumes the padded buffer.
                rows_np = exe.host_prepad(rows_np)
            args = [jax.device_put(rows_np, default_device())]
            if filter_type == "gaussian":
                from ..ops.weights import gaussian_kernel_f32

                args.append(
                    jax.device_put(
                        gaussian_kernel_f32(kwargs["radius"],
                                            float(kwargs["sigma"])),
                        default_device(),
                    )
                )
            jax.block_until_ready(args)
        for _ in range(3):
            t0 = time.perf_counter()
            exe._compiled(*args).block_until_ready()
            times_ms.append((time.perf_counter() - t0) * 1000.0)
        try:
            from ..runtime import dispatch as _d

            if serving_path == "spatial":
                # The served fn itself is u8-in == u8-out, so it chains in
                # the loop-delta harness directly (sharded operands stay
                # sharded across iterations).
                fn = exe._raw_fn
            else:
                fn = {
                    "gaussian": lambda f=filter_type: _d._trace_gaussian(
                        lvl, kwargs["radius"], kh, kw, channels
                    ),
                    "box": lambda f=filter_type: _d._trace_box(
                        lvl, kwargs["radius"], kh, kw, channels
                    ),
                    "sobel": lambda f=filter_type: _d._trace_sobel(
                        lvl, kh, kw, channels
                    ),
                }[filter_type]()
            if getattr(fn, "timing_chain", False):
                # Non-shape-preserving prepadded fn: corner-chain it for
                # the loop harness (runtime/timing.py::chain_corner).
                from ..runtime.timing import chain_corner

                fn = chain_corner(fn)
            duration_ms = device_time_ms(fn, args, iters=32, sync_reps=3)
        except Exception:
            duration_ms = min(times_ms) if times_ms else first_metrics.time_ms

        # Tier 1: REAL per-kernel durations from an xplane trace of the
        # served executable (device plane only).
        def _traced_run(compiled=exe._compiled, a=args):
            out = None
            for _ in range(4):
                out = compiled(*a)
            jax.block_until_ready(out)

        trace_kernels = _trace_kernel_breakdown(exe_key, _traced_run)

        # Tier 2 (trace unavailable): isolated-pass estimate for the
        # separable blurs, rescaled to the fused total (see _pass_breakdown).
        # Spatial shards run the same per-pass kernels per row band, so the
        # single-chip pass RATIO remains the right splitting estimate.
        if filter_type in ("gaussian", "box") and trace_kernels is None:
            try:
                pass_args = args
                if (serving_path == "spatial"
                        or getattr(exe, "host_prepad", None) is not None):
                    # The isolated-pass kernels consume UNPADDED rows;
                    # rebuild plain operands for them (the served args may
                    # be sharded or host-prepadded).
                    dev = default_device()
                    pass_args = [jax.device_put(
                        img_exec.reshape(kh, -1), dev)]
                    if filter_type == "gaussian":
                        from ..ops.weights import gaussian_kernel_f32

                        pass_args.append(jax.device_put(
                            gaussian_kernel_f32(kwargs["radius"],
                                                float(kwargs["sigma"])), dev))
                    jax.block_until_ready(pass_args)
                per_pass = _pass_breakdown(
                    filter_type, lvl, kwargs["radius"], kh, kw, channels,
                    pass_args
                )
            except Exception:
                per_pass = None

    try:
        from .traffic import served_mxu_flops

        mxu_flops = served_mxu_flops(filter_type, lvl, kh, kw, channels,
                                     kwargs.get("radius"))
    except Exception:
        mxu_flops = None
    metrics = _assemble_metrics(
        duration_ms=duration_ms,
        times_ms=times_ms,
        fallback_ms=first_metrics.time_ms,
        compiled=exe._compiled if exe is not None else None,
        label=_kernel_label(filter_type, lvl),
        shape_str=f"{height}x{width}x{channels}",
        io_bytes=2 * height * width * channels,
        trace_kernels=trace_kernels,
        per_pass=per_pass,
        extra_config={"Serving Path": serving_path},
        mxu_flops=mxu_flops,
    )

    if capture_trace:
        metrics["trace_dir"] = capture_xla_trace(
            lambda: runtime.run(filter_type, image, **kwargs), trace_dir
        )

    return metrics


def profile_batch(
    images: np.ndarray,
    filter_type: str,
    level: int,
    sigma: Optional[float] = None,
    radius: Optional[int] = None,
) -> dict[str, Any]:
    """Deep-profile the BATCHED serving path (/api/process-batch).

    Same three-tier contract as profile_filter, aimed at the batch
    executable the runtime actually serves (dispatch.run_batch): locate it
    under batch_cache_key, loop-delta time the batched trace fn, and trace
    the served executable's own device plane.  Closes the r3 observability
    gap where batch requests produced no trace-tier metrics at all (the
    §5.1 bar is the single-image contract, ncu_profiler.py:39-90).
    """
    from ..core.params import normalize_level
    from ..runtime import dispatch as _dispatch

    runtime = _dispatch.RUNTIME
    lvl = normalize_level(filter_type, level)
    batch, height, width, channels = images.shape

    kwargs: dict[str, Any] = {"level": lvl}
    if filter_type == "gaussian":
        kwargs.update(sigma=sigma if sigma is not None else 2.0,
                      radius=radius if radius is not None else 3)
    elif filter_type == "box":
        kwargs.update(radius=radius if radius is not None else 3)

    # Warm + locate the served batch executable (bucketed-shape key, same
    # single-source rule as the single-image path).
    _, first_metrics = runtime.run_batch(filter_type, images, **kwargs)
    kh, kw = height, width
    if _dispatch._bucketing_enabled():
        kh, kw = _dispatch._bucket(height), _dispatch._bucket(width)
    exe_key = _dispatch.batch_cache_key(
        filter_type, lvl, batch, kh, kw, channels, kwargs.get("radius"))
    exe = runtime._cache.get(exe_key)

    times_ms: list[float] = []
    duration_ms = first_metrics.time_ms
    per_pass: Optional[tuple[float, float]] = None
    trace_kernels: Optional[dict] = None
    mesh_n = _dispatch._mesh_batch_devices()
    if exe is not None and exe._compiled is not None:
        import jax

        from ..runtime.timing import device_time_ms

        imgs = np.ascontiguousarray(images, dtype=np.uint8)
        if (kh, kw) != (height, width):
            imgs = np.pad(
                imgs, ((0, 0), (0, kh - height), (0, kw - width), (0, 0)),
                mode="edge")
        weights = None
        if filter_type == "gaussian":
            from ..ops.weights import gaussian_kernel_f32

            weights = gaussian_kernel_f32(kwargs["radius"],
                                          float(kwargs["sigma"]))
        rows_b = imgs.reshape(batch, kh, -1)
        if mesh_n:
            # Same host-side batch pad + dp commit as _run_batch_attempt.
            pad_b = -batch % mesh_n
            if pad_b:
                rows_b = np.concatenate(
                    [rows_b, np.repeat(rows_b[-1:], pad_b, axis=0)], axis=0)
            batch_sh, repl_sh = _dispatch._mesh_batch_shardings(mesh_n)
            args = [jax.device_put(rows_b, batch_sh)]
            if weights is not None:
                args.append(jax.device_put(weights, repl_sh))
        else:
            dev = default_device()
            if getattr(exe, "host_prepad", None) is not None:
                # Host-prepad serving: the batch executable consumes the
                # padded stack (dispatch._run_batch_attempt).
                rows_b = exe.host_prepad(rows_b)
            args = [jax.device_put(rows_b, dev)]
            if weights is not None:
                args.append(jax.device_put(weights, dev))
        jax.block_until_ready(args)
        for _ in range(3):
            t0 = time.perf_counter()
            exe._compiled(*args).block_until_ready()
            times_ms.append((time.perf_counter() - t0) * 1000.0)
        try:
            # The batched trace fn is u8 rows in == out and chains in the
            # loop-delta harness directly; prepadded fns (padded in,
            # unpadded out) are corner-chained like everywhere else.
            fn = exe._raw_fn
            if getattr(exe, "_timing_chain", False):
                from ..runtime.timing import chain_corner

                fn = chain_corner(fn)
            duration_ms = device_time_ms(fn, args, iters=16, sync_reps=3)
        except Exception:
            duration_ms = min(times_ms) if times_ms else first_metrics.time_ms

        def _traced_run(compiled=exe._compiled, a=args):
            out = None
            for _ in range(4):
                out = compiled(*a)
            jax.block_until_ready(out)

        trace_kernels = _trace_kernel_breakdown(exe_key, _traced_run)

        # Tier 2: the batch runs the same per-image pass kernels, so the
        # single-image pass RATIO is the right splitting estimate;
        # _assemble_metrics rescales the pair to the batched total.
        if filter_type in ("gaussian", "box") and trace_kernels is None:
            try:
                dev = default_device()
                pass_args = [jax.device_put(imgs[0].reshape(kh, -1), dev)]
                if weights is not None:
                    pass_args.append(jax.device_put(weights, dev))
                jax.block_until_ready(pass_args)
                per_pass = _pass_breakdown(
                    filter_type, lvl, kwargs["radius"], kh, kw, channels,
                    pass_args)
            except Exception:
                per_pass = None

    try:
        from .traffic import served_mxu_flops

        per_img = served_mxu_flops(filter_type, lvl, kh, kw, channels,
                                   kwargs.get("radius"))
        mxu_flops = per_img * batch if per_img else None
    except Exception:
        mxu_flops = None
    return _assemble_metrics(
        duration_ms=duration_ms,
        times_ms=times_ms,
        fallback_ms=first_metrics.time_ms,
        compiled=exe._compiled if exe is not None else None,
        label=f"{filter_type}_batch_l{lvl}",
        shape_str=f"{batch}x{height}x{width}x{channels}",
        io_bytes=2 * batch * height * width * channels,
        trace_kernels=trace_kernels,
        per_pass=per_pass,
        extra_config={
            "Serving Path": f"batch(dp={mesh_n})" if mesh_n else "batch",
            "Batch Size": batch,
        },
        mxu_flops=mxu_flops,
    )


def capture_xla_trace(fn, trace_dir: Optional[str] = None) -> str:
    """Capture a jax.profiler trace of `fn()` (the deep-profile tier).

    The trace directory is kept for offline inspection, as the reference
    keeps its ncu temp dirs (ncu_profiler.py:320-324).
    """
    import tempfile

    import jax

    out_dir = trace_dir or tempfile.mkdtemp(prefix="gip_tpu_trace_")
    with jax.profiler.trace(out_dir):
        fn()
    return out_dir


def get_common_metrics(
    metrics: dict[str, Any], ncu_data: Optional[dict] = None
) -> dict[str, Any]:
    """Flatten the categorized dict to UI-ready keys.

    Same output keys as get_common_ncu_metrics (ncu_profiler.py:795-934)
    where they have a TPU meaning; warp-specific keys are omitted.
    """
    if not metrics or not isinstance(metrics, dict):
        return {}
    common: dict[str, Any] = {}

    occ = metrics.get("occupancy", {})
    for key, value in occ.items():
        if "occupancy" in key.lower() and isinstance(value, (int, float)):
            common["occupancy_pct"] = float(value)

    mem = metrics.get("memory", {})
    for key, value in mem.items():
        if not isinstance(value, (int, float)) or value is None:
            continue
        kl = key.lower()
        if "memory throughput" in kl:
            common["memory_throughput_gbps"] = float(value)
        elif "dram throughput" in kl:
            common["dram_throughput_pct"] = float(value)
        elif "peak device memory" in kl:
            common["peak_device_memory_bytes"] = float(value)

    ex = metrics.get("execution", {})
    for key, value in ex.items():
        if not isinstance(value, (int, float)) or value is None:
            continue
        kl = key.lower()
        if kl.startswith("duration") and "pass" not in kl:
            common.setdefault("kernel_durations", []).append(float(value))
        elif "compute throughput" in kl:
            common["compute_throughput_pct"] = float(value)

    source = ncu_data if (ncu_data and "total_kernel_duration_ms" in ncu_data) else metrics
    if "kernel_durations_ms" in source:
        # Tier-1 trace: one row per device kernel actually executed.
        common["kernel_durations"] = [
            float(v) for v in source["kernel_durations_ms"].values()
        ]
    elif "per_pass_durations_ms" in source:
        # Separable blurs: one duration per pass, like ncu's per-kernel rows.
        common["kernel_durations"] = [
            float(v) for v in source["per_pass_durations_ms"].values()
        ]
    if "duration_source" in source:
        common["kernel_duration_source"] = source["duration_source"]
    if "total_kernel_duration_ms" in source:
        common["time_ms"] = source["total_kernel_duration_ms"]
        common["kernel_duration_ms"] = source["total_kernel_duration_ms"]
        if "kernels_profiled" in source:
            common["kernels_profiled"] = source["kernels_profiled"]
            common["total_kernels"] = len(source["kernels_profiled"])
    elif "kernel_durations" in common:
        common["time_ms"] = sum(common["kernel_durations"])
        common["kernel_duration_ms"] = common["time_ms"]
        common["total_kernels"] = len(common["kernel_durations"])

    return common
