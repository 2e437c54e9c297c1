"""Partition-pruned scans: the directory-layout half of data skipping
(tests/test_bucketing.py covers the in-file half).

At 100 TB a date/type-partitioned landing zone means a filtered query
never LISTS — let alone reads — the irrelevant partitions. The registered
queries read the driver's flat fixtures, so the layout loop lives here:
write events partitioned by event_type, read back with a partition
predicate, and pin that (a) the predicate lands in the scan's
PartitionFilters, (b) only the matching partition's files are scanned,
and (c) values survive the layout round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.catalog import load_table


@pytest.fixture(scope="module")
def partitioned_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_by_type"))
    load_table(spark, sf_dir, "events").write.partitionBy(
        "event_type"
    ).mode("overwrite").parquet(out)
    return out


def test_partition_filter_reaches_scan(spark, partitioned_dir):
    df = spark.read.parquet(partitioned_dir).filter(
        F.col("event_type") == "purchase"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan
    # the predicate must NOT degrade to a post-scan Filter on the data rows
    assert "PushedFilters: []" in plan, plan


def _files_read(df) -> int:
    """numFiles metric of the (single) file scan after executing df —
    the pruned count, unlike inputFiles(), which lists the unpruned
    FileIndex. collect() runs the DataFrame's own cached QueryExecution,
    so its plan objects carry the populated metrics (a write would spawn
    a separate execution and leave these at 0)."""
    df.collect()
    scan = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    return int(scan.metrics().apply("numFiles").value())


def test_only_matching_partition_scanned(spark, partitioned_dir):
    pruned = spark.read.parquet(partitioned_dir).filter(
        F.col("event_type") == "purchase"
    )
    full = spark.read.parquet(partitioned_dir)
    n_pruned, n_full = _files_read(pruned), _files_read(full)
    assert n_pruned > 0
    # 5 event types → the pruned scan must touch ~1/5 of the files
    assert n_pruned * 4 <= n_full, (n_pruned, n_full)


def test_values_survive_partition_layout(spark, sf_dir, partitioned_dir):
    src = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()[0]
    )
    back = (
        spark.read.parquet(partitioned_dir)
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()[0]
    )
    assert (src["n"], src["s"]) == (back["n"], back["s"])
