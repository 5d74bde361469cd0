"""Unit tests for bench.py's host-state instrumentation (pure helpers)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import bench


def test_steal_pct_of_demanded():
    # (steal, idle+iowait, total): 100 total ticks elapsed, 60 idle,
    # 40 demanded of which 10 stolen -> 25%
    before = (0, 0, 0)
    after = (10, 60, 100)
    assert bench._steal_pct(before, after) == 25.0


def test_steal_pct_none_on_no_demand_or_no_elapsed():
    assert bench._steal_pct((0, 0, 0), (0, 100, 100)) is None  # all idle
    assert bench._steal_pct((0, 0, 100), (0, 0, 100)) is None  # no ticks
    assert bench._steal_pct(None, (0, 0, 100)) is None
    assert bench._steal_pct((0, 0, 0), None) is None


def test_cpu_counters_shape():
    c = bench._cpu_counters()
    # on Linux this must parse; tuple (steal, idle, total), monotone totals
    assert c is not None and len(c) == 3
    assert c[2] >= c[1] >= 0 and c[0] >= 0
    c2 = bench._cpu_counters()
    assert c2[2] >= c[2]
