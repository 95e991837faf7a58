"""Unit tests for benchmarks/run_benchmarks.py's rev-gated min-merge.

The results file keeps each row's MINIMUM time across sessions (the
least-contended window on a multi-tenant chip), but rows measured on
DIFFERENT implementations must never merge -- that is what the rev
fields guard.  These tests pin that contract for both the main table
(keyed by (filter, level)) and the extended cases (keyed by case label).
"""

import importlib.util
import os
import sys

import pytest

_RB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "run_benchmarks.py")


@pytest.fixture(scope="module")
def rb():
    spec = importlib.util.spec_from_file_location("run_benchmarks", _RB)
    mod = importlib.util.module_from_spec(spec)
    # run_benchmarks imports repo-root bench.py via its own sys.path insert
    sys.modules["run_benchmarks"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_min_merge_keeps_faster_previous_row(rb):
    rows = [{"filter": "box", "level": 2, "rev": 2, "time_ms": 0.7,
             "wall_s": 3.0}]
    prev = [{"filter": "box", "level": 2, "rev": 2, "time_ms": 0.5,
             "wall_s": 9.0}]
    rb._merge_rows(rows, prev, ("filter", "level"))
    assert rows[0]["time_ms"] == 0.5
    # wall_s reports THIS run's cost, not the historical minimum's
    assert rows[0]["wall_s"] == 3.0


def test_min_merge_keeps_faster_new_row(rb):
    rows = [{"filter": "box", "level": 2, "rev": 2, "time_ms": 0.4}]
    prev = [{"filter": "box", "level": 2, "rev": 2, "time_ms": 0.5}]
    rb._merge_rows(rows, prev, ("filter", "level"))
    assert rows[0]["time_ms"] == 0.4


def test_rev_mismatch_discards_stale_minimum(rb):
    """A row whose timed implementation changed (rev bump) must NOT
    inherit a faster minimum measured on the old code."""
    rows = [{"filter": "gaussian", "level": 4, "rev": 3, "time_ms": 0.45}]
    prev = [{"filter": "gaussian", "level": 4, "rev": 2, "time_ms": 0.30}]
    rb._merge_rows(rows, prev, ("filter", "level"))
    assert rows[0]["time_ms"] == 0.45


def test_missing_rev_in_previous_file_defaults_to_global(rb):
    """Entries written before per-row revs carry the file's global
    impl_rev implicitly; they merge with same-rev rows only."""
    label = "gaussian r15 L4 (MXU, maxdiff<=1)"
    # extended case with a bumped rev: old rev-less entry must not merge
    ext = [{"case": label, "rev": rb._ext_rev(label), "time_ms": 0.47}]
    prev = [{"case": label, "time_ms": 0.30}]
    assert rb._ext_rev(label) != rb._IMPL_REV  # guards the scenario itself
    rb._merge_rows(ext, prev, ("case",))
    assert ext[0]["time_ms"] == 0.47
    # and an un-bumped case still min-merges with a rev-less entry
    ext2 = [{"case": "other", "rev": rb._ext_rev("other"), "time_ms": 0.9}]
    prev2 = [{"case": "other", "time_ms": 0.6}]
    rb._merge_rows(ext2, prev2, ("case",))
    assert ext2[0]["time_ms"] == 0.6


def test_row_rev_overrides_stay_ahead_of_global(rb):
    """The module-level assert guards this; re-state it as a test so a
    future _IMPL_REV bump that forgets to clear overrides fails loudly."""
    vals = list(rb._ROW_REV_OVERRIDES.values()) + list(
        rb._EXT_REV_OVERRIDES.values())
    assert all(v > rb._IMPL_REV for v in vals)
