"""On-silicon check of the xplane trace tier (VERDICT r2 item 2 done-bar).

Runs profile_filter for gaussian/box/sobel L2 on the README-size image and
prints each duration_source + kernel rows.  PASS iff every L2 config
reports source == xplane_trace with at least one device kernel row.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from gpu_image_processing_tpu.runtime.device import warmup_transfers

warmup_transfers()

from gpu_image_processing_tpu.profiling.profiler import profile_filter

rng = np.random.default_rng(0)
img = rng.integers(0, 256, size=(2146, 3239, 3), dtype=np.uint8)

ok = True
for filt, kwargs in (
    ("gaussian", dict(sigma=2.0, radius=3)),
    ("box", dict(radius=5)),
    ("sobel", dict()),
):
    deep = profile_filter(img, filt, 2, **kwargs)
    src = deep.get("duration_source")
    rows = deep.get("kernel_durations_ms", {})
    print(json.dumps({
        "filter": filt,
        "duration_source": src,
        "total_ms": deep.get("total_kernel_duration_ms"),
        "kernels": {k: round(v, 4) for k, v in rows.items()},
    }))
    if src != "xplane_trace" or not rows:
        ok = False

print("TRACE_TIER_ON_TPU:", "PASS" if ok else "FAIL")
