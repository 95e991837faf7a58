#!/usr/bin/env python3
"""One-command on-silicon CI: the full validation + benchmark queue.

Runs each stage as its OWN sequential process (one TPU client at a time
-- the relay deadlocks concurrent leases, CLAUDE.md) and writes a
consolidated verdict to benchmarks/silicon_ci.json.  Stages:

  validate   scripts/tpu_validation.py          correctness matrix
  benchmark  benchmarks/run_benchmarks.py --merge   README table (min-merge)
  bench      bench.py                           flagship driver metric
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
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        out = proc.stdout
        ok = proc.returncode == 0
    except subprocess.TimeoutExpired as exc:
        # NEVER SIGKILL a TPU process (orphaned relay lease); the run()
        # timeout sends SIGKILL only after SIGTERM had its grace period.
        out = (exc.stdout or b"").decode() if isinstance(exc.stdout, bytes) \
            else (exc.stdout or "")
        out += f"\n<timeout after {timeout_s}s>"
        ok = False
    tail = "\n".join(out.strip().splitlines()[-8:])
    return ok, time.time() - t0, tail


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
        ok_client, _, tail = run(
            [sys.executable, os.path.join(REPO, "test_client.py")], 300)
        logs.append("test_client: " + (tail.splitlines()[-1] if tail else ""))
        loadgen = os.path.join(REPO, "native", "build", "loadgen")
        ok_load = True
        if os.path.exists(loadgen):
            ok_load, _, tail = run([loadgen, "127.0.0.1", "8000", "4", "20"],
                                   300)
            logs.append("loadgen: " + (tail.splitlines()[0] if tail else ""))
        return ok_client and ok_load, time.time() - t0, "\n".join(logs)
    finally:
        run([sys.executable, serve, "stop"], 120)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip", action="append", default=[],
                        choices=["validate", "benchmark", "bench", "serving"])
    parser.add_argument("--out", default="benchmarks/silicon_ci.json")
    args = parser.parse_args()

    stages = {
        "validate": lambda: run(
            [sys.executable, "scripts/tpu_validation.py"], 2400),
        "benchmark": lambda: run(
            [sys.executable, "benchmarks/run_benchmarks.py", "--merge"], 2400),
        "bench": lambda: run([sys.executable, "bench.py"], 1200),
        "serving": lambda: stage_serving(600),
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
