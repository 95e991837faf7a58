#!/usr/bin/env python3
"""Bounded worker-recycle soak under CURRENT production routing.

VERDICT r4 item 5: the 38-min RSS-watchdog soak (2026-08-18, 960/960,
13 recycles) predates the MXU box tier, the radius-aware 0.5 MP box
gate, and the round-4/5 HTTP framing changes.  This re-validates the
recycle stack on the current tree:

* serve.py start (supervisor + socket-handoff worker) on the REAL TPU
  with a deliberately low GIP_TPU_MAX_RSS_MB so the relay's
  ~1.3 MB/device_put host leak forces several recycles inside the
  bounded window;
* loadgen waves rotating three payloads chosen to exercise the
  production tiers: gaussian L2 (VPU rows kernel), box L2 at >=0.5 MP
  with r=5 (the radius-aware MXU gate), sobel level 4 color (MXU f32
  gray tier);
* after every wave, /api/stats is polled for worker_generation, rss_mb
  and decode_tiers.

Everything is bounded INSIDE the script (CLAUDE.md: never SIGKILL a TPU
process); the server is stopped with serve.py stop (SIGTERM drain).

Writes benchmarks/soak_recycle_<UTC-date>.json.

Usage: soak_recycle.py [minutes=25] [rss_cap_mb=1000] [port=8492]
"""

from __future__ import annotations

import base64
import io
import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOADGEN = os.path.join(REPO, "native", "build", "loadgen")
SERVE = os.path.join(REPO, "scripts", "serve.py")


def _payloads(tmpdir: str) -> list[str]:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(7)
    paths = []

    def png_b64(h, w):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        return base64.b64encode(buf.getvalue()).decode()

    cases = [
        # (name, h, w, body-extra) -- sizes chosen against the CURRENT
        # routing: 1050x1000 = 1.05 MP >= the 0.5 MP radius-aware box
        # gate (MXU tier); 768x1024 sobel L4 rides the MXU f32-gray
        # tier; gaussian L2 is the bit-exact VPU rows kernel.
        ("gauss_l2", 640, 800,
         {"filter": "gaussian", "level": 2, "sigma": 2.0, "radius": 3}),
        ("box_mxu_l2", 1050, 1000, {"filter": "box", "level": 2,
                                    "radius": 5}),
        ("sobel_l4", 768, 1024, {"filter": "sobel", "level": 4}),
    ]
    for name, h, w, extra in cases:
        body = {"image": png_b64(h, w), **extra}
        p = os.path.join(tmpdir, f"{name}.json")
        with open(p, "w") as f:
            json.dump(body, f)
        paths.append(p)
    # Batch wave: /api/process-batch through the natively batched
    # (prepadded) kernels -- the one serving surface the earlier soaks
    # never pushed under load.
    body = {"images": [png_b64(480, 640) for _ in range(3)],
            "filter": "gaussian", "level": 2, "sigma": 2.0, "radius": 3}
    p = os.path.join(tmpdir, "batch_gauss.json")
    with open(p, "w") as f:
        json.dump(body, f)
    paths.append((p, "/api/process-batch"))
    return paths


def _stats(port: int) -> dict:
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/stats", timeout=30) as r:
        return json.loads(r.read())


def main() -> int:
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 25.0
    rss_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    port = int(sys.argv[3]) if len(sys.argv) > 3 else 8492

    import tempfile

    tmpdir = tempfile.mkdtemp(prefix="gip_soak_")
    payloads = _payloads(tmpdir)

    env = {
        **os.environ,
        "GIP_TPU_BACKEND_PORT": str(port),
        "GIP_TPU_MAX_RSS_MB": str(rss_cap),
        "GIP_TPU_RUN_DIR": tmpdir,
    }
    print(f"starting supervised server on :{port} "
          f"(rss cap {rss_cap} MB, {minutes} min soak)")
    start = subprocess.run(
        [sys.executable, SERVE, "start", "--no-frontend"],
        env=env, capture_output=True, text=True, timeout=3600)
    print(start.stdout.strip())
    if start.returncode != 0:
        print(start.stderr)
        return 1

    waves = []
    ok_total = fail_total = 0
    gen_seen = set()
    rss_hw = 0.0
    t_end = time.time() + minutes * 60
    try:
        wave = 0
        while time.time() < t_end:
            payload = payloads[wave % len(payloads)]
            endpoint = "/api/process"
            if isinstance(payload, tuple):
                payload, endpoint = payload
            r = subprocess.run(
                [LOADGEN, "127.0.0.1", str(port), "4", "10", payload,
                 endpoint],
                capture_output=True, text=True, timeout=900)
            line = (r.stdout.splitlines() or [""])[0]
            ok = fail = 0
            if "requests:" in line:
                parts = line.split()
                ok, fail = int(parts[1]), int(parts[3])
            ok_total += ok
            fail_total += fail
            st = _stats(port)
            gen = st.get("worker_generation")
            rss = st.get("rss_mb") or 0.0
            gen_seen.add(gen)
            rss_hw = max(rss_hw, rss)
            waves.append({"wave": wave, "payload": os.path.basename(payload),
                          "ok": ok, "failed": fail, "generation": gen,
                          "rss_mb": rss})
            print(f"wave {wave:3d} [{os.path.basename(payload):16}] "
                  f"ok={ok} fail={fail} gen={gen} rss={rss:.0f} MB")
            wave += 1
    finally:
        final_tiers = None
        try:
            final_tiers = _stats(port).get("decode_tiers")
        except Exception:
            pass
        stop = subprocess.run([sys.executable, SERVE, "stop"], env=env,
                              capture_output=True, text=True, timeout=300)
        print(stop.stdout.strip())

    gens = sorted(g for g in gen_seen if g is not None)
    recycles = (gens[-1] - gens[0]) if gens else 0
    out = {
        "date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "minutes": minutes,
        "rss_cap_mb": rss_cap,
        "requests_ok": ok_total,
        "requests_failed": fail_total,
        "generations": gens,
        "recycles": recycles,
        "rss_high_water_mb": rss_hw,
        "decode_tiers": final_tiers,
        "waves": waves,
    }
    path = os.path.join(REPO, "benchmarks",
                        f"soak_recycle_{time.strftime('%Y-%m-%d')}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nsoak: {ok_total} ok / {fail_total} failed, "
          f"{recycles} recycles, RSS high-water {rss_hw:.0f} MB "
          f"-> {path}")
    return 1 if fail_total else 0


if __name__ == "__main__":
    sys.exit(main())
