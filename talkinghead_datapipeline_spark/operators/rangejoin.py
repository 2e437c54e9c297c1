"""Point-in-interval (range) joins that scale: bin + equi-join + refine.

A raw non-equi join (``e.ts BETWEEN a.start AND a.end``) gives Catalyst no
equality to hash on, so the physical plan degenerates to
BroadcastNestedLoopJoin — O(|points|·|intervals|) and a broadcast of a
whole side. The classic scale shape instead:

1. quantize time into fixed bins of ``bin_width`` seconds;
2. explode each interval into the bins it covers (a point can only match
   an interval through the point's OWN bin, so each qualifying pair is
   produced exactly once — no distinct pass);
3. equi-join on (keys…, bin) — a plain shuffled hash join that partitions
   by key+time like every other time-series operator here;
4. refine with the exact containment predicate.

Interval length should be on the order of ``bin_width`` (each interval
explodes into ~len/bin_width + 1 rows). This is the same binning idea
Databricks' range-join hints and PostGIS grid joins use — expressed with
plain DataFrame ops so it runs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    keys: list[str] | None = None,
    bin_width_sec: int = 600,
) -> DataFrame:
    """Join point rows to interval rows with ``start <= ts < end`` (end
    exclusive), optionally co-keyed on ``keys``. Returns the matched pairs
    with all columns of both sides (interval columns suffixed only where
    they collide is the caller's concern — pre-alias them).

    Bin arithmetic runs on BIGINT epoch-microseconds, so engines with
    different sub-second timestamp precisions agree exactly.
    """
    keys = list(keys or [])
    w_us = int(bin_width_sec) * 1_000_000

    # Alias both sides: points and intervals often derive from the SAME
    # scan (self-join), and pt[k] == iv[k] on shared attribute ids makes
    # Column log a 'trivially true equals predicate' warning per key.
    pt = points.withColumn(
        "_bin", F.expr(f"unix_micros({point_ts}) div {w_us}")
    ).alias("_pt")
    # Guard degenerate/corrupt intervals BEFORE the explode: F.sequence on a
    # reversed range (end <= start) yields a DESCENDING sequence, so one bad
    # row would explode into arbitrarily many bin rows. Such intervals can
    # match no point under `start <= ts < end` anyway, so dropping them is
    # semantics-preserving.
    iv = (
        intervals.filter(F.col(end_ts) > F.col(start_ts))
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros({start_ts}) div {w_us}"),
                    # end is exclusive: the last covered bin holds end - 1µs
                    F.expr(f"(unix_micros({end_ts}) - 1) div {w_us}"),
                )
            ),
        )
        .alias("_iv")
    )
    cond = [
        F.col("_pt._bin") == F.col("_iv._bin"),
        *[F.col(f"_pt.{k}") == F.col(f"_iv.{k}") for k in keys],
    ]
    exact = (F.col(f"_pt.{point_ts}") >= F.col(f"_iv.{start_ts}")) & (
        F.col(f"_pt.{point_ts}") < F.col(f"_iv.{end_ts}")
    )
    joined = pt.join(iv, [*cond, exact])
    drop = [F.col(f"_iv.{k}") for k in keys] + [
        F.col("_pt._bin"),
        F.col("_iv._bin"),
    ]
    for c in drop:
        joined = joined.drop(c)
    return joined
