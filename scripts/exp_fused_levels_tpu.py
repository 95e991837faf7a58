#!/usr/bin/env python3
"""Measure the fused all-levels serving win on silicon.

Serves /api/process-all in-process (app.dispatch; no HTTP, no codec — the
request carries a raw PNG but encode cost is identical across arms) with
the fused path ON vs OFF (monkeypatched to raise), interleaved per round.
The fused program uploads once / executes once / fetches one stacked
array; the per-level path pays that boundary per level.  Warm executables
in both arms (compile + loop-delta timing excluded by a warmup call).
"""

from __future__ import annotations

import base64
import io
import json
import os
import sys
import time
# This script VALIDATES the accelerator: transient relay errors must
# fail the run, never silently demote it to CPU (the results would
# be recorded as on-silicon).
os.environ.setdefault("GIP_TPU_DEMOTE_AFTER", "0")


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    from PIL import Image

    import gpu_image_processing_tpu.server.app as app_mod
    from gpu_image_processing_tpu.runtime.device import warmup_transfers
    from gpu_image_processing_tpu.runtime.dispatch import RUNTIME
    from gpu_image_processing_tpu.server.http import Request

    warmup_transfers()
    app = app_mod.create_app()
    rng = np.random.default_rng(11)

    real_fused = RUNTIME.run_all_levels

    def fused_off(*a, **k):
        raise RuntimeError("arm: per-level")

    cases = [("600x800", 600, 800), ("2146x3239", 2146, 3239)]
    if "--small" in sys.argv:   # CPU smoke of the harness itself
        cases = cases[:1]
    for label, h, w in cases:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        b64 = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

        def serve(filt: str):
            status, body = app.dispatch(Request(
                method="POST", path="/api/process-all",
                json={"image": b64, "filter": filt}))
            assert status == 200, body
            return body

        # Warm both arms' executables (compile + timing outside the A/B).
        for filt in ("gaussian", "box", "sobel"):
            RUNTIME.run_all_levels = fused_off
            serve(filt)
            RUNTIME.run_all_levels = real_fused
            serve(filt)

        samples: dict[str, list] = {}
        for r in range(rounds):
            for arm, hook in (("fused", real_fused), ("per-level", fused_off)):
                RUNTIME.run_all_levels = hook
                for filt in ("gaussian", "box", "sobel"):
                    t0 = time.perf_counter()
                    serve(filt)
                    dt = (time.perf_counter() - t0) * 1000.0
                    samples.setdefault(f"{label} {filt} {arm}", []).append(dt)
        RUNTIME.run_all_levels = real_fused
        for k in sorted(samples):
            s = sorted(samples[k])
            print(f"{k}: p50 {s[len(s) // 2]:.1f} ms  min {s[0]:.1f} ms",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
