"""Distributed exact selection for stratified sampling.

The textbook exact per-stratum sample — ``row_number() OVER (PARTITION BY
stratum ORDER BY hash)`` then ``rn <= ceil(f·n)`` — has a hidden scale
cliff: one window partition per stratum means ONE task sorts the whole
stratum. With fixed stratum cardinality (languages, sources) a stratum is
a constant fraction of the corpus, so at 100 TB that task sorts terabytes.

``stratified_exact_sample`` computes the SAME set (ascending (hash, key)
rank, exact ceil(f·n) rows per stratum) via distributed selection:

1. histogram: count rows per (stratum, hash-prefix bucket) — one shuffle
   of a tiny aggregate (|strata| × n_buckets rows);
2. per stratum, find the pivot bucket where the cumulative count crosses
   k = ceil(f·n): every row in a lower bucket is selected outright, no
   ordering needed;
3. only the PIVOT bucket's rows (≈ stratum/n_buckets of the data) are
   ranked — the one remaining window sort runs on ~1/4096 of a stratum.

The output is bit-identical to the window-rank form because the bucket is
a monotone prefix of the hash: lower-bucket rows always rank before
pivot-bucket rows, and within the pivot bucket the exact (hash, key) rank
plus the lower-bucket offset reproduces the global rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def stratified_exact_sample(
    df: DataFrame,
    stratum: str,
    key: str,
    hash_col: Column,
    fraction: float | None = None,
    k_expr: Column | None = None,
    n_buckets: int = 4096,
) -> DataFrame:
    """Rows of ``df`` whose ascending (hash, key) rank within their stratum
    is ≤ k — exactly the window-rank sample, without ever sorting a whole
    stratum in one task. k is ``ceil(fraction · stratum_size)`` or, for
    absolute caps (class balancing), ``k_expr`` — a Column evaluated over
    the per-stratum histogram totals (``_total`` is in scope, as is any
    literal/scalar-subquery expression).

    ``hash_col`` must be a deterministic value in [0, 2^32) (the portable
    md5 prefix); the bucket is its high bits, so bucket order == hash
    order."""
    if (fraction is None) == (k_expr is None):
        raise ValueError("exactly one of fraction / k_expr is required")
    bucket_width = 4294967296 // n_buckets  # power of two: division is exact
    base = df.withColumns(
        {"_h": hash_col, "_b": F.floor(hash_col / bucket_width).cast("bigint")}
    )
    # 1. per-(stratum, bucket) histogram — tiny aggregate
    hist = base.groupBy(stratum, "_b").agg(F.count(F.lit(1)).alias("_n"))
    wcum = (
        W.partitionBy(stratum)
        .orderBy("_b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    totals = hist.withColumn("_cum", F.sum("_n").over(wcum)).withColumn(
        "_total", F.sum("_n").over(W.partitionBy(stratum))
    )
    if fraction is not None:
        k = F.ceil(F.lit(fraction) * F.col("_total")).cast("bigint")
    else:
        k = k_expr.cast("bigint")
    marked = totals.select(
        stratum,
        "_b",
        k.alias("_k"),
        (F.col("_cum") - F.col("_n")).alias("_below"),  # rows before bucket
        F.col("_cum").alias("_cum"),
    )
    # 2. bucket verdicts: fully selected / fully rejected / pivot
    verdicts = marked.select(
        stratum,
        "_b",
        "_k",
        "_below",
        F.when(F.col("_cum") <= F.col("_k"), F.lit("all"))
        .when(F.col("_below") >= F.col("_k"), F.lit("none"))
        .otherwise(F.lit("pivot"))
        .alias("_verdict"),
    )
    joined = base.join(F.broadcast(verdicts), [stratum, "_b"])
    keep_all = joined.filter(F.col("_verdict") == "all")
    # 3. rank ONLY the pivot bucket (~1/n_buckets of each stratum)
    wpivot = W.partitionBy(stratum).orderBy("_h", key)
    keep_pivot = (
        joined.filter(F.col("_verdict") == "pivot")
        .withColumn("_rn", F.row_number().over(wpivot))
        .filter(F.col("_below") + F.col("_rn") <= F.col("_k"))
        .drop("_rn")
    )
    out_cols = df.columns
    return keep_all.select(*out_cols).unionByName(keep_pivot.select(*out_cols))
