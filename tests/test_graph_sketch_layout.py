"""Unit tests for the round-6 graph / sketch / layout / CDC operators —
invariants the DuckDB differential can't see (error bounds, conservation
laws, branch coverage on synthetic corpora)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.queries import all_queries
from talkinghead_datapipeline_spark.queries.sketches import (
    _HLL_M,
    _hll_registers,
    hll_estimate,
)

_SPECS = all_queries()


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_error_within_bound(spark, sf_dir):
    """Every per-type estimate lands within 3σ of the p=9 standard error
    (σ = 1.04/√512 ≈ 4.6%) — the AofA'07 guarantee the sketch is sold on."""
    rows = _SPECS["hll_distinct_users"].spark(spark, sf_dir).collect()
    assert rows, "fixture has event types"
    for r in rows:
        assert r["rel_err"] <= 3 * 1.04 / math.sqrt(_HLL_M), dict(r.asDict())


def test_hll_raw_branch_high_cardinality(spark):
    """The fixture's 150-distinct groups all take the linear-counting
    branch; a synthetic 20k-distinct corpus (≫ 2.5·m = 1280) exercises the
    RAW harmonic-mean branch and must still land within 3σ."""
    n = 20_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("k")
    )
    regs = _hll_registers(df, "g", "k")
    est = hll_estimate(regs, "g").collect()[0]
    assert est["zeros"] == 0 or est["hll_est"] > 2.5 * _HLL_M  # raw branch
    assert abs(est["hll_est"] - n) / n <= 3 * 1.04 / math.sqrt(_HLL_M)


def test_hll_registers_merge(spark):
    """Register tables are mergeable: sketch(A ∪ B) == max-merge of
    sketch(A), sketch(B) — the property that makes HLL a partial aggregate
    (daily sketches roll up without rescanning raw data)."""
    a = spark.range(0, 5_000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("k")
    )
    b = spark.range(3_000, 9_000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("k")
    )
    direct = _hll_registers(a.unionAll(b), "g", "k")
    merged = (
        _hll_registers(a, "g", "k")
        .unionAll(_hll_registers(b, "g", "k"))
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("r"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def test_pagerank_conserves_mass_and_orders(spark, sf_dir):
    """With a bidirectional edge set (no dangling nodes) total rank is
    conserved at 1.0 every iteration; the registered top-20 must be
    strictly rank-sorted with the documented tiebreak."""
    rows = _SPECS["pagerank_trade_network"].spark(spark, sf_dir).collect()
    assert len(rows) == 20
    ranks = [r["rank_x1000"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # suppliers are ~15× rarer than customers in the trade graph, so they
    # concentrate rank: the top of the list should be supplier-heavy
    assert rows[0]["node_kind"] == "supplier"


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def test_zorder_buckets_narrow_both_dimensions(spark, sf_dir):
    """The point of the Morton key: the row-weighted average per-bucket
    extent must be a small fraction of the global extent in BOTH dimensions
    simultaneously (a 1-D sort gives ~1/nbuckets on one dimension and ~1.0
    on the other)."""
    rows = _SPECS["zorder_data_skipping"].spark(spark, sf_dir).collect()
    assert len(rows) > 4
    n = sum(r["n_rows"] for r in rows)
    cust_glob = max(r["cust_hi"] for r in rows) - min(r["cust_lo"] for r in rows)
    day_glob = max(r["day_hi"] for r in rows) - min(r["day_lo"] for r in rows)
    cust_frac = (
        sum((r["cust_hi"] - r["cust_lo"]) * r["n_rows"] for r in rows)
        / n
        / cust_glob
    )
    day_frac = (
        sum((r["day_hi"] - r["day_lo"]) * r["n_rows"] for r in rows) / n / day_glob
    )
    # 16×16 grid → ideal 1/16 ≈ 6.25% per dimension; allow slack for
    # partially-filled edge cells but demand BOTH dimensions narrow hard.
    assert cust_frac < 0.25, cust_frac
    assert day_frac < 0.25, day_frac


# ---------------------------------------------------------------------------
# SCD-2 intervals
# ---------------------------------------------------------------------------


def test_scd2_intervals_partition_timeline(spark, sf_dir):
    """Per user: exactly one open (is_current) interval; versions are
    dense from 1; each closed interval's valid_to equals the next
    version's valid_from (no gaps, no overlaps)."""
    rows = _SPECS["scd2_user_value_intervals"].spark(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(r["is_current"] for r in ivs) == 1
        assert ivs[-1]["is_current"] == 1 and ivs[-1]["valid_to_us"] == -1
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"], (user, a, b)


# ---------------------------------------------------------------------------
# Unigram entropy
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "text,n_tokens,n_types,entropy",
    [
        ("a b c d", 4, 4, 2.0),  # uniform → log2(4)
        ("x x x x x", 5, 1, 0.0),  # constant → 0
        ("a a b b", 4, 2, 1.0),
    ],
)
def test_entropy_closed_forms(spark, tmp_path, text, n_tokens, n_types, entropy):
    df = spark.createDataFrame(
        [(1, text, "en", "t", len(text))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = (
        _SPECS["text_unigram_entropy"].spark(spark, str(tmp_path)).collect()[0]
    )
    assert out["n_tokens"] == n_tokens
    assert out["n_types"] == n_types
    assert out["entropy"] == pytest.approx(entropy, abs=1e-6)


# ---------------------------------------------------------------------------
# Funnel ordering semantics (crafted corpus — the differential fixture may
# never exercise an out-of-order stage)
# ---------------------------------------------------------------------------


def test_funnel_requires_strict_stage_order(spark, tmp_path):
    """A click BEFORE the first view and a purchase BEFORE the click must
    not convert; later same-session stages must."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: click(t0) view(t1) click(t2) purchase(t3) → full funnel
        (1, base, 1, "click", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=1), 1, "view", 1.0, "{}"),
        (3, base + dt.timedelta(minutes=2), 1, "click", 1.0, "{}"),
        (4, base + dt.timedelta(minutes=3), 1, "purchase", 1.0, "{}"),
        # user 2: purchase view click (purchase precedes click) → stops at click
        (5, base, 2, "purchase", 1.0, "{}"),
        (6, base + dt.timedelta(minutes=1), 2, "view", 1.0, "{}"),
        (7, base + dt.timedelta(minutes=2), 2, "click", 1.0, "{}"),
        # user 3: view only
        (8, base, 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = (
        _SPECS["session_funnel_conversion"].spark(spark, str(tmp_path)).collect()[0]
    )
    assert out["n_sessions"] == 3
    assert out["n_viewed"] == 3
    assert out["n_clicked"] == 2  # users 1 and 2
    assert out["n_purchased"] == 1  # user 1 only
