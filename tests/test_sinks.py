"""Sink-layer tests (SURVEY §2.b N19-N23): partitioned parquet, bucketed
tables (exchange-free joins), npz container export round-trip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.catalog import load_table
from talkinghead_datapipeline_spark.operators import sinks


def test_write_partitioned_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    sinks.write_partitioned(orders, path, ["o_orderstatus"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # Partition pruning: reading one status only lists that directory.
    pruned = back.filter(F.col("o_orderstatus") == "O")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "O").count()
    assert "PartitionFilters" in plan or "o_orderstatus" in plan


def test_write_partitioned_orc_roundtrip_and_prunes(spark, sf_dir, tmp_path):
    """ORC through the same partitioned sink: exact frame round-trip (the
    interchange format for Hive/Trino consumers) with the same
    directory-key pruning and predicate pushdown as parquet."""
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    sinks.write_partitioned(orders, path, ["o_orderstatus"], fmt="orc")
    back = spark.read.orc(path)
    cols = sorted(orders.columns)
    a = orders.select(cols).toPandas().sort_values(cols).reset_index(drop=True)
    b = back.select(cols).toPandas().sort_values(cols).reset_index(drop=True)
    assert a.equals(b)  # exact round-trip, types included
    pruned = back.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 1000)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "PushedFilters: [" in plan and "o_totalprice" in plan


def test_write_partitioned_rejects_unknown_format(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="fmt must be one of"):
        sinks.write_partitioned(orders, str(tmp_path / "x"), ["o_orderstatus"], fmt="avro")


def test_write_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    # Managed tables land in the session's default warehouse (static conf);
    # DROP TABLE in the finally removes the files.
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    sinks.write_bucketed(orders, "t_orders_b", ["o_orderkey"], 4)
    sinks.write_bucketed(li, "t_lineitem_b", ["l_orderkey"], 4)
    a = spark.table("t_orders_b")
    b = spark.table("t_lineitem_b")
    # Disable broadcast so the join must co-locate — bucketing makes both
    # sides exchange-free (no ShuffleExchange above the scans).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_write_npz_per_key_roundtrip(spark, sf_dir, tmp_path):
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 20)
        .select(
            (F.col("vec_id") % 4).alias("clip"),
            F.col("vec_id").alias("_row_idx"),
            "embedding",
            F.col("label").cast("double").alias("label"),
        )
    )
    out_dir = str(tmp_path / "npz")
    manifest = sinks.write_npz_per_key(
        emb, out_dir, "clip", ["embedding", "label"]
    ).collect()
    assert {r.key for r in manifest} == {"0", "1", "2", "3"}
    assert sum(r.n_rows for r in manifest) == 20
    # Round-trip one container against the source of truth.
    rows = (
        emb.filter(F.col("clip") == 1).orderBy("_row_idx").collect()
    )
    with np.load(f"{out_dir}/1.npz") as z:
        assert z["embedding"].shape == (len(rows), 64)
        np.testing.assert_allclose(
            z["embedding"], np.stack([np.asarray(r.embedding) for r in rows])
        )
        np.testing.assert_allclose(z["label"], [r.label for r in rows])


def test_hdf5_sink_is_feature_gated():
    with pytest.raises(NotImplementedError):
        sinks.write_hdf5_per_key()


def test_write_image_folders_roundtrip(spark, tmp_path):
    from talkinghead_datapipeline_spark.sources.media import image_frames_from_dir

    df = spark.createDataFrame(
        [("clipA", i, bytes([i] * 16)) for i in range(3)]
        + [("clipB", 0, b"\xff" * 8)],
        "clip_name string, frame_idx bigint, image binary",
    )
    out = str(tmp_path / "frames")
    manifest = {r.key: r.n_frames for r in sinks.write_image_folders(df, out).collect()}
    assert manifest == {"clipA": 3, "clipB": 1}
    # Read back through the E1 frame-sequence source: same rows, same bytes.
    back = image_frames_from_dir(spark, out).orderBy("clip_name", "frame_idx")
    rows = back.collect()
    assert [(r.clip_name, r.frame_idx) for r in rows] == [
        ("clipA", 0), ("clipA", 1), ("clipA", 2), ("clipB", 0),
    ]
    assert bytes(rows[1].image) == bytes([1] * 16)
