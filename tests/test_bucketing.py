"""Bucketed-table co-located join: the write-side layout machinery that
removes the join shuffle entirely at 100 TB.

The registered queries all read the driver's plain-parquet fixtures, so
bucketing can't appear on that surface; this test owns the full loop —
write orders and lineitem BUCKETED BY the join key into a temp warehouse,
read them back, and pin that the join plan contains NO Exchange on either
side (SortMergeJoin straight over the bucket layout). The result is also
differentially checked against DuckDB on the same source parquet, so the
layout optimization is proven value-neutral."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.catalog import load_table, table_path


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("bucketed_warehouse")
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdb")
    for name, key, cols in (
        ("orders", "o_orderkey", ("o_orderkey", "o_custkey", "o_totalprice")),
        ("lineitem", "l_orderkey", ("l_orderkey", "l_quantity", "l_extendedprice")),
    ):
        (
            load_table(spark, sf_dir, name)
            .select(*cols)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(warehouse / name))
            .mode("overwrite")
            .saveAsTable(f"bucketdb.{name}_b")
        )
    yield spark
    spark.sql("DROP TABLE IF EXISTS bucketdb.orders_b")
    spark.sql("DROP TABLE IF EXISTS bucketdb.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS bucketdb")


def _joined(spark):
    o = spark.table("bucketdb.orders_b")
    l = spark.table("bucketdb.lineitem_b")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


def test_bucketed_join_has_no_exchange(bucketed):
    """Both sides are bucketed by the join key with matching bucket counts,
    so neither the SortMergeJoin nor the same-key groupBy may introduce an
    Exchange — the entire plan runs shuffle-free off the bucket layout.
    (AQE keeps the plan as-is: no exchanges means nothing to re-optimize.)"""
    spark = bucketed
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _joined(spark)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_bucketed_join_matches_duckdb(bucketed, sf_dir):
    """Layout must not change values: the bucketed join's result equals
    DuckDB's plain join over the original parquet."""
    spark = bucketed
    got = {
        (r["o_orderkey"], r["n_items"], r["revenue"])
        for r in _joined(spark).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"""
            SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_items,
                   round(sum(l_extendedprice), 2) AS revenue
            FROM '{table_path(sf_dir, "orders")}' o
            JOIN '{table_path(sf_dir, "lineitem")}' l
              ON l.l_orderkey = o.o_orderkey
            GROUP BY o_orderkey
            """
        ).fetchall()
    }
    assert got == want
