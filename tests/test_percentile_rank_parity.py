"""Parity pin for operators/percentiles.exact_percentiles_by_rank.

The winsorized pair and psi_snapshot_drift swapped ``F.percentile`` —
whose final merge sorts each group's whole value multiset in one task —
for the range-partitioned two-level exact rank (r15; the theil_sen
precedent). The swap is only legal because the helper reproduces
Percentile's interpolation arithmetic BIT FOR BIT (same position/index
math, same integral-position and equal-boundary-value special cases, same
operation order — see the module docstring). This suite pins that
equality on the fixture tables and on crafted tie/degenerate inputs, so
any drift in either side fails loudly before a driver hash can move.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.catalog import load_table
from talkinghead_datapipeline_spark.operators.percentiles import (
    exact_percentiles_by_rank,
)


def _bits(x: float | None) -> bytes | None:
    return None if x is None else struct.pack("<d", x)


def _assert_rows_bitequal(ref: dict, got: dict):
    assert set(ref) == set(got), (sorted(ref), sorted(got))
    for k in ref:
        for i, (a, b) in enumerate(zip(ref[k], got[k])):
            assert _bits(a) == _bits(b), (
                f"group {k!r} fraction #{i}: percentile {a!r} != rank {b!r}"
            )


def test_grouped_lineitem_bounds_bitequal(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    ps = [0.01, 0.99]
    ref = {
        r["l_returnflag"]: list(r["b"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile(
                "l_extendedprice", F.array(*[F.lit(p) for p in ps])
            ).alias("b")
        )
        .collect()
    }
    got = {
        r["l_returnflag"]: [r[f"p{i}"] for i in range(len(ps))]
        for r in exact_percentiles_by_rank(
            li, ["l_returnflag"], "l_extendedprice", ps, 8
        ).collect()
    }
    _assert_rows_bitequal(ref, got)


def test_global_nine_cuts_bitequal(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("price")
    )
    ps = [i / 10 for i in range(1, 10)]
    ref = o.agg(
        F.percentile("price", F.array(*[F.lit(p) for p in ps])).alias("b")
    ).collect()[0]["b"]
    row = exact_percentiles_by_rank(o, [], "price", ps, 8, out_prefix="c").collect()[0]
    got = [row[f"c{i}"] for i in range(len(ps))]
    _assert_rows_bitequal({"": list(ref)}, {"": got})


@pytest.mark.parametrize(
    "ps",
    [
        [0.5],
        [0.0, 1.0, 0.25],
        [0.01, 0.99, 0.5, 0.975],
    ],
)
def test_crafted_ties_and_degenerates_bitequal(spark, ps):
    """Tie-heavy values (the equal-boundary-value special case), n=1/2/3
    groups (integral and fractional positions at the extremes), and odd/
    even counts around the median."""
    import random

    random.seed(7)
    rows = []
    for g, n in [("a", 1), ("b", 2), ("c", 3), ("d", 100), ("e", 101), ("f", 997)]:
        for _ in range(n):
            rows.append(
                (
                    g,
                    float(
                        random.choice(
                            [1.0, 2.0, 2.0, 3.5, 7.25, 7.25, 7.25,
                             random.random() * 100]
                        )
                    ),
                )
            )
    df = spark.createDataFrame(rows, "g string, v double")
    ref = {
        r["g"]: list(r["b"])
        for r in df.groupBy("g")
        .agg(F.percentile("v", F.array(*[F.lit(p) for p in ps])).alias("b"))
        .collect()
    }
    got = {
        r["g"]: [r[f"p{i}"] for i in range(len(ps))]
        for r in exact_percentiles_by_rank(
            df.select("g", "v"), ["g"], "v", ps, 8
        ).collect()
    }
    _assert_rows_bitequal(ref, got)


def test_partition_count_invariance(spark):
    """The rank construction must give the same doubles at ANY partition
    count — offsets + within-partition ranks are a permutation of the
    global rank regardless of where the range bounds land."""
    import random

    random.seed(11)
    rows = [("g", float(random.random() * 1000)) for _ in range(5000)]
    df = spark.createDataFrame(rows, "g string, v double")
    ps = [0.01, 0.5, 0.99]
    outs = []
    for npart in (1, 3, 8, 64):
        row = exact_percentiles_by_rank(
            df.select("g", "v"), ["g"], "v", ps, npart
        ).collect()[0]
        outs.append([_bits(row[f"p{i}"]) for i in range(len(ps))])
        # fresh cache per layout: the helper persists its ranked frame
        spark.catalog.clearCache()
    assert all(o == outs[0] for o in outs), outs
