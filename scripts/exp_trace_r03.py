"""Round-3 on-silicon trace-tier artifact: per-op XStat stats, L1 + L2.

Extends the r02 check (scripts/exp_trace_tpu.py: duration_source ==
xplane_trace for the served L2 executables) with the XStat harvest
landed in round 3 (profiling/xplane.py field-4 payloads):

* L2 rows: the Pallas/Mosaic tiers serve ONE custom-call each -- XLA
  attaches no flop model to a custom-call, so the expectation is
  duration + (whatever stats the plane carries), NOT flops.
* L1 rows: the interleaved XLA tier lowers to ordinary fusions, where
  the plane DOES carry XLA's per-op flops / bytes-accessed -- these are
  the measured numbers that pin the L1 roofline attribution
  (docs/ROOFLINE.md; VERDICT r2 weak #6 asked for exactly this).

Writes benchmarks/trace_tier_r03.jsonl (one JSON line per config).
PASS iff every config reports xplane_trace with >=1 kernel row, and at
least one L1 config surfaces a stat-derived metric (trace flops or a
measured per-op bandwidth).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from gpu_image_processing_tpu.runtime.device import warmup_transfers

warmup_transfers()

from gpu_image_processing_tpu.profiling.profiler import profile_filter

OUT = "/root/repo/benchmarks/trace_tier_r03.jsonl"

rng = np.random.default_rng(0)
img = rng.integers(0, 256, size=(2146, 3239, 3), dtype=np.uint8)

ok = True
stat_hits = 0
lines = []
for level in (1, 2):
    for filt, kwargs in (
        ("gaussian", dict(sigma=2.0, radius=3)),
        ("box", dict(radius=5)),
        ("sobel", dict()),
    ):
        deep = profile_filter(img, filt, level, **kwargs)
        src = deep.get("duration_source")
        rows = deep.get("kernel_durations_ms", {})
        op_stats = deep.get("trace_op_stats", {})
        bw_rows = {
            k: round(v, 1)
            for k, v in deep.get("occupancy", {}).items()
            if k.startswith("Bandwidth ") and k.endswith("(Gbyte/s, trace)")
        }
        rec = {
            "filter": filt,
            "level": level,
            "duration_source": src,
            "total_ms": deep.get("total_kernel_duration_ms"),
            "kernels": {k: round(v, 4) for k, v in rows.items()},
            "trace_flops": deep.get("execution", {}).get(
                "Trace FLOPs (per exec)"),
            "trace_bytes": deep.get("memory", {}).get(
                "Trace Bytes Accessed (per exec)"),
            "bandwidth_gbps_trace": bw_rows,
            "op_stat_keys": sorted(
                {k for st in op_stats.values() for k in st}),
        }
        print(json.dumps(rec), flush=True)
        lines.append(rec)
        if src != "xplane_trace" or not rows:
            ok = False
        if rec["trace_flops"] or rec["trace_bytes"] or bw_rows:
            stat_hits += 1

with open(OUT, "w") as f:
    for rec in lines:
        f.write(json.dumps(rec) + "\n")

if stat_hits == 0:
    print("FAIL: no config surfaced a stat-derived metric")
    ok = False
print("PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
