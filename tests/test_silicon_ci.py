"""scripts/silicon_ci.py plumbing: the graceful-timeout run() helper.

The stage runner must NEVER SIGKILL (an orphaned relay lease wedges the
TPU for the next 5-25 min); on timeout it SIGTERMs, waits, and abandons.
These tests drive run() with plain shell children on CPU.
"""

import importlib.util
import os
import sys
import time

import pytest

_CI = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "scripts", "silicon_ci.py")


@pytest.fixture(scope="module")
def ci():
    spec = importlib.util.spec_from_file_location("silicon_ci", _CI)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["silicon_ci"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_run_success_captures_tail(ci):
    ok, secs, tail = ci.run([sys.executable, "-c", "print('hello ci')"], 60)
    assert ok
    assert "hello ci" in tail


def test_run_failure_reports_exit_code(ci):
    ok, _, tail = ci.run([sys.executable, "-c", "raise SystemExit(3)"], 60)
    assert not ok
    assert "<exit 3>" in tail


def test_run_timeout_terminates_gracefully(ci):
    """A child past the deadline gets SIGTERM (and, being well-behaved,
    exits) -- the stage fails without any SIGKILL."""
    t0 = time.time()
    ok, _, tail = ci.run([sys.executable, "-c", "import time; time.sleep(600)"],
                         2)
    assert not ok
    assert time.time() - t0 < 60  # SIGTERM ended it well inside the grace
    assert "LEFT RUNNING" not in tail


def test_run_timeout_abandons_sigterm_ignorer(ci):
    """A child that ignores SIGTERM is LEFT RUNNING (never SIGKILLed) and
    the stage reports that explicitly."""
    # A shell trap arms before any signal can arrive (python -c would race
    # interpreter startup against the SIGTERM on this 1-core host).
    cmd = ["sh", "-c", 'trap "" TERM; echo armored; sleep 600']
    # Short timeout; patch the grace period so the test doesn't wait 120 s.
    import subprocess

    orig_wait = subprocess.Popen.wait

    def fast_grace(self, timeout=None):
        return orig_wait(self, timeout=2 if timeout == 120 else timeout)

    subprocess.Popen.wait = fast_grace
    try:
        ok, _, tail = ci.run(cmd, 2)
    finally:
        subprocess.Popen.wait = orig_wait
    assert not ok
    assert "LEFT RUNNING" in tail
    # clean up the armored child so it doesn't outlive the suite
    import re
    import signal as _signal

    m = re.search(r"pid (\d+)", tail)
    assert m
    os.kill(int(m.group(1)), _signal.SIGKILL)  # plain sleep, not a TPU client
