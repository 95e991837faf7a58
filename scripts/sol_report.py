#!/usr/bin/env python3
"""Per-op speed-of-light report for the served executables (real TPU).

Uses the trace tier's per-op counters (XEventMetadata XStats:
bytes_accessed + measured duration) to print, for every served config,
each device op's share of the HBM roofline -- the continuous-evidence
analog of ncu's per-kernel %-of-peak table.  Mosaic custom-calls carry
no cost model, so their row reports duration + share of total only
(their bound is argued in docs/ROOFLINE.md's ablation instead).

Writes benchmarks/sol_report.json; prints a table.  Not a CI gate: the
chip is multi-tenant (2.7x drift between windows) -- treat %SoL as a
within-window attribution, not an absolute.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from gpu_image_processing_tpu.runtime.device import warmup_transfers

warmup_transfers()

from gpu_image_processing_tpu.profiling.profiler import (
    device_peaks,
    profile_filter,
)

OUT = "/root/repo/benchmarks/sol_report.json"

rng = np.random.default_rng(0)
img = rng.integers(0, 256, size=(2146, 3239, 3), dtype=np.uint8)

peaks = device_peaks()
peak_gbps = peaks[0] if peaks else None

report = []
for level in (1, 2, 4):
    for filt, kwargs in (
        ("gaussian", dict(sigma=2.0, radius=3)),
        ("box", dict(radius=5)),
        ("sobel", dict()),
    ):
        deep = profile_filter(img, filt, level, **kwargs)
        stats = deep.get("trace_kernel_stats") or {}
        total = deep.get("total_kernel_duration_ms") or sum(
            r["avg_ms"] for r in stats.values())
        ops = []
        for name, rec in sorted(stats.items(),
                                key=lambda kv: -kv[1]["avg_ms"]):
            per_exec_bytes = None
            st = rec.get("stats")
            if st and rec.get("count"):
                b = st.get("bytes_accessed") or st.get("bytes accessed")
                if b:
                    per_exec_bytes = b / rec["count"]
            gbps = (per_exec_bytes / (rec["avg_ms"] / 1e3) / 1e9
                    if per_exec_bytes and rec["avg_ms"] > 0 else None)
            ops.append({
                "op": name.split(" = ")[0] if " = " in name else name,
                "avg_ms": round(rec["avg_ms"], 4),
                "share_pct": round(100 * rec["avg_ms"] / total, 1)
                if total else None,
                "bytes": per_exec_bytes,
                "gbps": round(gbps, 1) if gbps else None,
                "sol_pct": round(100 * gbps / peak_gbps, 1)
                if gbps and peak_gbps else None,
            })
        row = {
            "filter": filt, "level": level,
            "duration_source": deep.get("duration_source"),
            "total_ms": round(total, 4) if total else None,
            "ops": ops,
        }
        report.append(row)
        print(f"\n{filt} L{level}: total {row['total_ms']} ms "
              f"[{row['duration_source']}]")
        for o in ops:
            sol = f"{o['sol_pct']}% SoL" if o["sol_pct"] else "no cost model"
            print(f"  {o['op'][:40]:40} {o['avg_ms']:8.4f} ms "
                  f"{o['share_pct']:5.1f}%  {sol}")

with open(OUT, "w") as f:
    json.dump({"peak_hbm_gbps": peak_gbps, "rows": report}, f, indent=2)
print(f"\nwritten: {OUT}")
