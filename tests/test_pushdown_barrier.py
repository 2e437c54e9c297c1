"""Unit tests for catalog.pushdown_barrier — the CollectMetrics fence that
keeps PushDownPredicates from re-evaluating heavy projections (round 7).
The global net lives in tests/test_plans.py::
test_no_pushed_filter_reevaluates_heavy_projection; these pin the helper's
own contract so a refactor cannot quietly weaken it."""

from __future__ import annotations

from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.catalog import pushdown_barrier


def _heavy(col):
    # Stand-in for a shingle chain: HOF work whose duplication is visible
    # in the optimized plan as a second transform(...) occurrence.
    return F.array_sort(F.transform(F.split(col, " "), F.length))


def test_barrier_blocks_filter_pushdown(spark):
    df = spark.createDataFrame(
        [(1, "a bb ccc"), (2, ""), (3, "dd e")], "id long, text string"
    )
    base = df.select("id", _heavy(F.col("text")).alias("g"))

    plain = base.filter(F.size("g") >= 2)
    fenced = pushdown_barrier(base, "test").filter(F.size("g") >= 2)

    plan_plain = plain._jdf.queryExecution().optimizedPlan().toString()
    plan_fenced = fenced._jdf.queryExecution().optimizedPlan().toString()

    # Control: without the barrier the filter sinks below the projection,
    # duplicating the chain (transform appears in Filter AND Project). If
    # Catalyst ever stops doing this, the barrier is dead weight — this
    # assertion is the signal to remove it.
    filter_lines = [
        ln for ln in plan_plain.splitlines() if ln.strip().startswith(("Filter", "+- Filter"))
    ]
    assert any("transform(" in ln for ln in filter_lines), plan_plain

    # With the barrier: CollectMetrics present, and the filter condition is
    # the bare size(g) probe — no substituted chain.
    assert "CollectMetrics" in plan_fenced
    fenced_filters = [
        ln for ln in plan_fenced.splitlines() if "Filter" in ln
    ]
    assert fenced_filters and all(
        "transform(" not in ln for ln in fenced_filters
    ), plan_fenced

    # Semantics unchanged.
    assert sorted(r.id for r in fenced.collect()) == sorted(
        r.id for r in plain.collect()
    ) == [1, 3]


def test_barrier_names_are_unique_and_self_join_safe(spark):
    df = spark.range(10).select(
        F.col("id"), _heavy(F.lit("x y z")).alias("g")
    )
    b1 = pushdown_barrier(df, "same")
    b2 = pushdown_barrier(df, "same")
    # Two calls with the same tag still get distinct observation names.
    n1 = b1._jdf.queryExecution().analyzed().toString()
    n2 = b2._jdf.queryExecution().analyzed().toString()
    name1 = [t for t in n1.split() if t.startswith("_pdbar_same_")][0].rstrip(",")
    name2 = [t for t in n2.split() if t.startswith("_pdbar_same_")][0].rstrip(",")
    assert name1 != name2

    # One barriered frame consumed on both sides of a self-join (the
    # incremental-dedup shape: the SAME observation name appears twice in
    # one query) must execute.
    fenced = pushdown_barrier(df, "selfjoin").filter(F.size("g") >= 1)
    left = fenced.select(F.col("id").alias("l"), "g")
    right = fenced.select(F.col("id").alias("r"), "g")
    out = left.join(right, F.col("l") == F.col("r")).count()
    assert out == 10
