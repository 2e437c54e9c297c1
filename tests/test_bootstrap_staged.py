"""Poisson-bootstrap CI (STAGED for r9 registration)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.queries.mlstats import (
    _BOOT_B,
    _POIS_CDF,
    BOOTSTRAP_CI_ORACLE,
    bootstrap_ci_order_value,
)
from tests.oracle_harness import run_compare


def test_staged_oracle_matches(spark, sf_dir):
    res = run_compare(
        spark,
        sf_dir,
        "bootstrap_ci_order_value",
        bootstrap_ci_order_value,
        BOOTSTRAP_CI_ORACLE,
    )
    assert res.ok, res.mismatches


def test_ci_brackets_mean_and_is_ordered(spark, sf_dir):
    """Statistical sanity: for group sizes in the hundreds+ the 95%
    bootstrap CI must be a proper interval around (or at least ordered
    against) the point estimate, and narrow relative to the mean."""
    for r in bootstrap_ci_order_value(spark, sf_dir).collect():
        assert r.ci_lo < r.ci_hi
        assert r.ci_lo < r.mean_price < r.ci_hi
        assert (r.ci_hi - r.ci_lo) < 0.5 * r.mean_price


def test_poisson_weights_mean_one(spark, sf_dir):
    """The weight generator must actually behave like Poisson(1): mean
    weight within 2% of 1 over all (row, replicate) draws — a corrupted
    CDF table or hash scaling would show up here long before it skewed a
    CI enough to notice."""
    from talkinghead_datapipeline_spark.catalog import load_table
    from talkinghead_datapipeline_spark.operators.dedup import portable_hash32

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    rep = o.withColumn("b", F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))))
    u = portable_hash32(
        F.concat(
            F.lit("boot|"),
            F.col("b").cast("string"),
            F.lit("|"),
            F.col("o_orderkey").cast("string"),
        )
    ) / F.lit(4294967296.0)
    wgt = F.lit(6)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        wgt = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(wgt)
    mean_w = rep.select(wgt.alias("w")).agg(F.avg("w")).first()[0]
    assert abs(mean_w - 1.0) < 0.02


def test_split_invariance(spark, sf_dir, tmp_path):
    """Fully exact by construction (hash-driven integer weights, BIGINT
    cent sums, single-division means): a 4-split re-write must reproduce
    the frame bit-for-bit, not merely within rounding."""
    from talkinghead_datapipeline_spark.catalog import load_table

    load_table(spark, sf_dir, "orders").repartition(4).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    canon = lambda pdf: (
        pdf[sorted(pdf.columns)]
        .sort_values(sorted(pdf.columns))
        .reset_index(drop=True)
    )
    base = canon(bootstrap_ci_order_value(spark, sf_dir).toPandas())
    split = canon(bootstrap_ci_order_value(spark, str(tmp_path)).toPandas())
    assert base.equals(split)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
