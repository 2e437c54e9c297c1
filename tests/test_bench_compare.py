"""tools/bench_compare.py: per-query diff between two BENCH_LOCAL records."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_compare import compare  # noqa: E402


def test_compare_classifies_moves():
    old = {"queries": {"a": 1.0, "b": 2.0, "c": 0.5, "gone": 1.0}}
    new = {"queries": {"a": 1.6, "b": 1.0, "c": 0.55, "fresh": 0.2}}
    d = compare(old, new, threshold=1.5)
    assert d["regressed"] == [("a", 1.0, 1.6, 1.6)]
    assert d["improved"] == [("b", 2.0, 1.0, 0.5)]
    assert d["added"] == ["fresh"]
    assert d["removed"] == ["gone"]
    assert d["n_common"] == 3
    # median of [1.6, 0.5, 1.1] -> 1.1
    assert d["ratio_median"] == 1.1


def test_compare_empty_overlap():
    d = compare({"queries": {"a": 1.0}}, {"queries": {"b": 1.0}})
    assert d["ratio_median"] is None
    assert d["regressed"] == [] and d["improved"] == []
