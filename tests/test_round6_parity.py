"""Independent-reference parity tests for the round-6 operators.

The DuckDB oracles prove cross-engine agreement; these prove agreement
with a THIRD, definition-level implementation (pandas / pure-Python brute
force), so a shared misreading of the operator's semantics in both SQL
dialects can't certify itself.
"""

from __future__ import annotations

import itertools
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from talkinghead_datapipeline_spark.queries import all_queries

_SPECS = all_queries()


def _events_pdf(sf_dir: str) -> pd.DataFrame:
    import duckdb

    return duckdb.connect().execute(
        f"SELECT user_id, event_id, value FROM '{sf_dir}/events.parquet'"
    ).fetchdf()


def test_ewma_matches_pandas_ewm_prefix(spark, sf_dir):
    """For row i < 24 the truncation is inactive, so the operator must equal
    pandas ewm(alpha=0.2, adjust=True) EXACTLY (to the round-6 quantum) —
    the genuinely independent reference. Deeper rows use the documented
    24-lag truncated form, checked against its numpy definition."""
    got = (
        _SPECS["ewma_user_values"].spark(spark, sf_dir).toPandas()
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    )
    src = _events_pdf(sf_dir).sort_values(["user_id", "event_id"])
    for uid, g in src.groupby("user_id"):
        x = g["value"].to_numpy()
        ours = got[got.user_id == uid]["ewma_value"].to_numpy()
        ref_full = pd.Series(x).ewm(alpha=0.2, adjust=True).mean().to_numpy()
        head = min(24, len(x))
        assert np.allclose(ours[:head], np.round(ref_full[:head], 6), atol=2e-6)
        # truncated-definition reference for the deeper rows
        w = (1.0 - 0.2) ** np.arange(24)
        for i in range(head, len(x)):
            lags = x[max(0, i - 23): i + 1][::-1]
            ref = float((lags * w[: len(lags)]).sum() / w[: len(lags)].sum())
            assert abs(ours[i] - round(ref, 6)) < 2e-6


def test_substring_dup_coverage_matches_bruteforce(spark, sf_dir):
    """Brute-force ExactSubstr coverage: dict-count every 8-gram, mark
    covered positions with plain Python sets."""
    import duckdb

    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchdf()
    grams: Counter = Counter()
    toks_by_doc: dict[int, list[str]] = {}
    for _, r in docs.iterrows():
        toks = r["text"].lower().split()
        toks_by_doc[r["doc_id"]] = toks
        for i in range(len(toks) - 7):
            grams[" ".join(toks[i : i + 8])] += 1
    want: dict[int, int] = {}
    for doc_id, toks in toks_by_doc.items():
        covered: set[int] = set()
        for i in range(len(toks) - 7):
            if grams[" ".join(toks[i : i + 8])] >= 2:
                covered.update(range(i, i + 8))
        want[doc_id] = len(covered)
    got = _SPECS["substring_dup_coverage"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(docs)
    for _, r in got.iterrows():
        assert r["dup_tokens"] == want[r["doc_id"]], r["doc_id"]


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    """Enumerate triangles with itertools over the support->=2 edge set."""
    import duckdb

    li = duckdb.connect().execute(
        f"SELECT DISTINCT l_orderkey o, l_partkey p FROM '{sf_dir}/lineitem.parquet'"
    ).fetchdf()
    by_order: dict[int, list[int]] = defaultdict(list)
    for _, r in li.iterrows():
        by_order[r["o"]].append(r["p"])
    pair_cnt: Counter = Counter()
    for parts in by_order.values():
        for a, b in itertools.combinations(sorted(set(parts)), 2):
            pair_cnt[(a, b)] += 1
    edges = {e for e, c in pair_cnt.items() if c >= 2}
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri_per_node: Counter = Counter()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c: count each triangle once
                tri_per_node[a] += 1
                tri_per_node[b] += 1
                tri_per_node[c] += 1
    want = sorted(
        tri_per_node.items(), key=lambda kv: (-kv[1], kv[0])
    )[:15]
    got = _SPECS["triangle_count_copart"].spark(spark, sf_dir).toPandas()
    assert [(r["p_partkey"], r["n_triangles"]) for _, r in got.iterrows()] == want


def test_ohlc_matches_pandas_resample(spark, sf_dir):
    """OHLC vs pandas groupby-first/last/max/min on the 6h floor bucket."""
    import duckdb

    ev = duckdb.connect().execute(
        f"SELECT event_type, epoch_us(ts) ts_us, event_id, value"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchdf()
    bar_us = 6 * 3600 * 1_000_000
    ev["bar"] = (ev["ts_us"] // bar_us) * bar_us
    ev = ev.sort_values(["event_type", "bar", "ts_us", "event_id"])
    ref = ev.groupby(["event_type", "bar"]).agg(
        open=("value", "first"),
        high=("value", "max"),
        low=("value", "min"),
        close=("value", "last"),
        n_events=("value", "size"),
    )
    got = _SPECS["ohlc_6h_bars"].spark(spark, sf_dir).toPandas()
    got["bar"] = got["bar_ts"].astype("int64") // 1000  # ns -> us
    got = got.set_index(["event_type", "bar"]).sort_index()
    ref = ref.sort_index()
    assert len(got) == len(ref)
    for col in ("open", "high", "low", "close"):
        assert np.allclose(got[col].to_numpy(), np.round(ref[col].to_numpy(), 6), atol=2e-6), col
    assert (got["n_events"].to_numpy() == ref["n_events"].to_numpy()).all()
