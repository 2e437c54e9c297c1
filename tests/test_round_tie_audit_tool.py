"""Unit pins for tools/round_tie_audit.py's headline semantics (round-10
code-review finding): the min-margin headline must come from columns the
rewriter MAPPED to an actual ``round(x, k) AS name`` call; speculative
what-if measurements of unmapped columns (e.g. a floor display with no
round at all) must never silently become the headline — when nothing
maps at all, the fallback is allowed but must be flagged.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import duckdb

_spec = importlib.util.spec_from_file_location(
    "round_tie_audit",
    Path(__file__).resolve().parent.parent / "tools" / "round_tie_audit.py",
)
_mod = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("round_tie_audit", _mod)
_spec.loader.exec_module(_mod)


def _con():
    con = duckdb.connect()
    con.execute("CREATE MACRO __nr2(x, k) AS x")
    # one row; v maps to round(,6) far from a tie; w is a floor display
    # whose raw value sits EXACTLY on a .5e-6 boundary (the phantom class)
    con.execute(
        "CREATE VIEW t AS SELECT CAST(0.1234561 AS DOUBLE) AS raw_v,"
        " CAST(0.0000005 AS DOUBLE) AS raw_w"
    )
    return con


def test_headline_uses_mapped_columns_only():
    sql = (
        "SELECT round(raw_v, 6) AS v, floor(raw_w * 1000000) / 1000000.0"
        " AS w FROM t"
    )
    r = _mod.audit_query(_con(), "q", sql)
    assert r is not None and not r.get("headline_unmapped")
    assert "v@k=6" in r["columns"] and r["columns"]["v@k=6"]["mapped"]
    # the unmapped what-if entries exist for reading but carry the '?' key
    assert any(k.endswith("?") for k in r["columns"])
    # headline = v's margin (0.1 grid units at k=6), NOT w's exact tie
    assert r["min_margin"] > 0, r
    mapped_min = r["columns"]["v@k=6"]["min_margin"]
    assert r["min_margin"] == mapped_min


def test_unmapped_only_fallback_is_flagged():
    # round() nested inside another call, so no trailing AS maps (the
    # rewriter's AS matcher tolerates only the `+ 0.0` negative-zero
    # idiom): colk stays empty and the headline falls back FLAGGED
    sql = "SELECT greatest(round(raw_v, 6), 0.0) AS v FROM t"
    r = _mod.audit_query(_con(), "q", sql)
    assert r is not None
    assert r.get("headline_unmapped") is True
