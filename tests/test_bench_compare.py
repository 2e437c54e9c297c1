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
    # r13: mover tuples gained the anchor-normalized ratio (== raw when no
    # anchor pair is present in both records, as here)
    assert d["regressed"] == [("a", 1.0, 1.6, 1.6, 1.6)]
    assert d["improved"] == [("b", 2.0, 1.0, 0.5, 0.5)]
    assert d["added"] == ["fresh"]
    assert d["removed"] == ["gone"]
    assert d["n_common"] == 3
    assert d["anchors"] is None
    assert d["still_regressed_normalized"] == ["a"]
    # median of [1.6, 0.5, 1.1] -> 1.1
    assert d["ratio_median"] == 1.1


def test_compare_empty_overlap():
    d = compare({"queries": {"a": 1.0}}, {"queries": {"b": 1.0}})
    assert d["ratio_median"] is None
    assert d["regressed"] == [] and d["improved"] == []


def test_compare_normalizes_by_class_anchor():
    """A hash-bound mover that merely tracked the hash anchor's machine
    drift must vanish from the normalized list; a scan-class mover that
    outran its anchor must survive."""
    from tools.bench_compare import HASH_BOUND

    hashq = sorted(HASH_BOUND)[0]
    old = {
        "queries": {hashq: 1.0, "plain": 1.0},
        "anchors": {"hash_md5_1m_sec": 0.10, "scan_lineitem_sec": 0.10},
    }
    new = {
        "queries": {hashq: 2.0, "plain": 2.0},
        # hash anchor doubled (machine), scan anchor flat
        "anchors": {"hash_md5_1m_sec": 0.20, "scan_lineitem_sec": 0.10},
    }
    d = compare(old, new, threshold=1.5)
    assert d["anchors"] == {"hash": 2.0, "scan": 1.0}
    raw = {t[0]: t for t in d["regressed"]}
    assert raw[hashq][4] == 1.0  # normalized away by the hash anchor
    assert raw["plain"][4] == 2.0  # survives its flat scan anchor
    assert d["still_regressed_normalized"] == ["plain"]
