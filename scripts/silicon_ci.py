#!/usr/bin/env python3
"""One-command on-silicon CI: the full validation + benchmark queue.

Runs each stage as its OWN sequential process (one TPU client at a time
-- the relay deadlocks concurrent leases, CLAUDE.md) and writes a
consolidated verdict to benchmarks/silicon_ci.json.  Stages:

  validate   scripts/tpu_validation.py          correctness matrix
  benchmark  benchmarks/run_benchmarks.py --merge   README table (min-merge)
  bench      bench.py                           flagship driver metric
  sol        scripts/sol_report.py --check      per-op %-of-SoL gate
  serving    serve.py start -> test_client.py -> loadgen -> stop

Usage: python scripts/silicon_ci.py [--skip serving] [--skip benchmark] ...
Exit code 0 iff every non-skipped stage passed.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str], timeout_s: int) -> tuple[bool, float, str]:
    """Run a stage with a graceful timeout.

    subprocess.run(timeout=...) SIGKILLs -- forbidden for TPU processes
    (an orphaned relay lease stalls every later stage 5-25 min, CLAUDE.md
    hazards).  On expiry: SIGTERM, a 120 s grace, and if the process is
    STILL alive it is LEFT RUNNING (reported failed) rather than killed;
    a wedged TPU client must exit on its own terms."""
    t0 = time.time()
    import tempfile

    with tempfile.TemporaryFile(mode="w+") as logf:
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=logf,
                                stderr=subprocess.STDOUT, text=True)
        abandoned = False
        try:
            rc = proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            proc.terminate()
            try:
                rc = proc.wait(timeout=120)
            except subprocess.TimeoutExpired:
                rc = None
                abandoned = True
        logf.seek(0)
        out = logf.read()
    if abandoned:
        out += (f"\n<timeout after {timeout_s}s; SIGTERM ignored -- process "
                f"pid {proc.pid} LEFT RUNNING (never SIGKILL a TPU client)>")
    elif rc != 0:
        out += f"\n<exit {rc}>"
    tail = "\n".join(out.strip().splitlines()[-8:])
    return rc == 0, time.time() - t0, tail


def stage_serving(timeout_s: int) -> tuple[bool, float, str]:
    t0 = time.time()
    serve = os.path.join(REPO, "scripts", "serve.py")
    logs = []
    try:
        ok, _, tail = run([sys.executable, serve, "start", "--no-frontend"],
                          timeout_s)
        logs.append("start: " + tail.splitlines()[-1] if tail else "start")
        if not ok:
            return False, time.time() - t0, "\n".join(logs)
        # 600 s: the client's sobel-L4 + HDR checks can compile fresh
        # Mosaic executables through the relay on a cold cache.
        ok_client, _, tail = run(
            [sys.executable, os.path.join(REPO, "test_client.py")], 600)
        logs.append("test_client: " + (tail.splitlines()[-1] if tail else ""))
        sys.path.insert(0, REPO)
        from gpu_image_processing_tpu.core import config

        loadgen = os.path.join(REPO, "native", "build", "loadgen")
        ok_load = True
        if os.path.exists(loadgen):
            ok_load, _, tail = run(
                [loadgen, "127.0.0.1", str(config.BACKEND_PORT), "4", "20"],
                300)
            logs.append("loadgen: " + (tail.splitlines()[0] if tail else ""))
        return ok_client and ok_load, time.time() - t0, "\n".join(logs)
    finally:
        run([sys.executable, serve, "stop"], 120)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip", action="append", default=[],
                        choices=["validate", "benchmark", "bench", "sol",
                                 "serving"])
    parser.add_argument("--out", default="benchmarks/silicon_ci.json")
    args = parser.parse_args()

    stages = {
        # validate passed at 2147 s on a quiet chip and TIMED OUT at 2400 s
        # under congestion (2026-08-19 21:39Z run, two checks from done) --
        # the multi-tenant drift is up to 2.7x, so give it real headroom.
        "validate": lambda: run(
            [sys.executable, "scripts/tpu_validation.py"], 4500),
        "benchmark": lambda: run(
            [sys.executable, "benchmarks/run_benchmarks.py", "--merge"], 3600),
        "bench": lambda: run([sys.executable, "bench.py"], 1200),
        # --check: fail if a dominant served op lacks bytes/%SoL -- keeps
        # the per-op report honest for the flagship Pallas kernels
        # (VERDICT r3 item 1).
        "sol": lambda: run(
            [sys.executable, "scripts/sol_report.py", "--check"], 2400),
        # 3000 s: covers serve.py's 2700 s first-D2H warmup headroom
        # (observed 40-min relay stalls in contended windows, 2026-08-20).
        "serving": lambda: stage_serving(3000),
    }
    results = {}
    all_ok = True
    for name, fn in stages.items():
        if name in args.skip:
            results[name] = {"skipped": True}
            print(f"[skip] {name}")
            continue
        print(f"[run ] {name} ...", flush=True)
        ok, secs, tail = fn()
        results[name] = {"ok": ok, "seconds": round(secs, 1), "tail": tail}
        all_ok &= ok
        print(f"[{'PASS' if ok else 'FAIL'}] {name} ({secs:.0f}s)", flush=True)
        if not ok:
            print(tail, flush=True)

    payload = {"ok": all_ok, "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                 time.gmtime()),
               "stages": results}
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(payload, f, indent=2)
    print(("ALL PASS" if all_ok else "FAILURES") + f" -> {args.out}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
