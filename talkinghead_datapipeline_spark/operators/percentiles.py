"""Exact percentiles without a per-group single-task sort.

``F.percentile`` (Catalyst's ``Percentile`` TypedImperativeAggregate)
buffers every (value, count) pair of a group into one OpenHashMap and
sorts it in the group's single final-merge task — the same
one-partition-sorts-everything shape the r14 theil_sen rewrite removed
from the global ``row_number`` window (guide §2.3/§2.5). At 3 groups over
a 600k-row column that final stage runs 3 tasks wide no matter how many
cores exist; at 100 TB it is a straggler by construction.

``exact_percentiles_by_rank`` computes the identical doubles from a
RANGE-partitioned two-level rank: partitions are (group, value)-ordered,
so partition-offset + within-partition row_number is a valid per-group
rank for ORDER BY value; the value at every rank — all the interpolation
reads — is tie-order-free. Each partition sorts ~n/P rows in parallel;
the offset/count frames are ≤ P·|groups| rows.

Bit-equality contract (pinned by tests/test_percentile_rank_parity.py):
Spark's ``Percentile.getPercentile`` computes, per requested fraction p,

    position = (n - 1).toDouble * p            // Long * Double
    lower    = floor(position); higher = ceil(position)
    if higher == lower          -> v[lower]
    else if v[higher] == v[lower] -> v[lower]  // no interpolation on ties
    else (higher - position) * v[lower] + (position - lower) * v[higher]

(`sql/catalyst/.../aggregate/percentiles.scala`). The expressions below
replicate that arithmetic operation for operation in Spark SQL doubles —
same operands, same order, same special cases — so the output is
bit-identical to ``F.percentile`` on any input, which is what lets a
registered query swap the aggregate without its oracle hash moving.

Build-cost note (guide §4 — the py4j boundary is a DRIVER cost paid per
bench rep): the per-fraction expression loops are assembled as SQL
strings parsed JVM-side (selectExpr / F.expr), not as Column-API trees —
the first Column-API draft of this helper spent ~12k py4j round-trips
per build at 9 fractions (measured with a send_command counter); the
string form is ~30× fewer. Python float ``repr`` round-trips exactly
through Spark's ``<digits>D`` double-literal syntax, so the literals are
the same doubles ``F.lit(float(p))`` would embed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_percentiles_by_rank(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float],
    npart: int,
    out_prefix: str = "p",
) -> DataFrame:
    """One row per group: ``n`` (bigint count) and ``{out_prefix}{i}``
    (double, Spark-percentile-exact) for each fraction ``ps[i]``.

    ``df`` must be projected to ``group_cols + [value_col]`` with no NULL
    values in ``value_col`` (``F.percentile`` ignores NULLs; callers here
    operate on non-null measure columns). With ``group_cols == []`` the
    rank is global (one output row).
    """
    from talkinghead_datapipeline_spark.catalog import persist_once

    gc = list(group_cols)
    by_gc = ", ".join(gc)
    part_gc = f"_pid, {by_gc}" if gc else "_pid"
    range_keys = [F.col(c) for c in gc] + [F.col(value_col)]
    sl = df.repartitionByRange(npart, *range_keys).selectExpr(
        "*", "spark_partition_id() AS _pid"
    )
    # persist: the ranked frame feeds BOTH the per-partition-count branch
    # and the rank-probe join below. Un-persisted, each consumer plans its
    # own repartitionByRange whose bounds are SAMPLED independently — the
    # partitionings disagree and offset+lrn stops being a permutation (the
    # theil_sen staging lesson, caught by the oracle diff there).
    loc = persist_once(
        sl.selectExpr(
            "*",
            f"row_number() OVER (PARTITION BY {part_gc}"
            f" ORDER BY {value_col}) AS _lrn",
        )
    )
    pc = loc.groupBy("_pid", *gc).agg(F.expr("max(_lrn) AS _pcnt"))
    over_gc = f"PARTITION BY {by_gc} " if gc else ""
    off = pc.selectExpr(
        "_pid",
        *gc,
        f"COALESCE(SUM(_pcnt) OVER ({over_gc}ORDER BY _pid"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _off",
    )
    counts = pc.groupBy(*gc).agg(F.expr("CAST(SUM(_pcnt) AS BIGINT) AS n"))

    # Target ranks per group (1-based): for fraction p, position =
    # (n-1)*p; the probe needs the values at ranks floor(position)+1 and
    # ceil(position)+1. The frame is |groups| rows — broadcast to the
    # ranked frame, probed in one pass.
    tgt_exprs = [*gc, "n"]
    for i, p in enumerate(ps):
        pos = f"CAST(n - 1 AS DOUBLE) * {float(p)!r}D"
        tgt_exprs += [
            f"{pos} AS _pos{i}",
            f"CAST(FLOOR({pos}) AS BIGINT) + 1 AS _lo{i}",
            f"CAST(CEIL({pos}) AS BIGINT) + 1 AS _hi{i}",
        ]
    targets = counts.selectExpr(*tgt_exprs)

    probe = loc.join(F.broadcast(off), ["_pid", *gc]).selectExpr(
        *gc, value_col, "_off + _lrn AS _rn"
    )
    if gc:
        probe = probe.join(F.broadcast(targets), gc)
    else:
        probe = probe.crossJoin(F.broadcast(targets))
    hit = " OR ".join(
        f"_rn = _lo{i} OR _rn = _hi{i}" for i in range(len(ps))
    )
    vals = probe.filter(F.expr(hit)).groupBy(*gc).agg(
        F.expr("first(n) AS n"),
        *[
            F.expr(s)
            for i in range(len(ps))
            for s in (
                f"first(_pos{i}) AS _pos{i}",
                f"first(_lo{i}) AS _lo{i}",
                f"first(_hi{i}) AS _hi{i}",
                f"min(CASE WHEN _rn = _lo{i} THEN {value_col} END) AS _vlo{i}",
                f"min(CASE WHEN _rn = _hi{i} THEN {value_col} END) AS _vhi{i}",
            )
        ],
    )
    out_exprs = [*gc, "n"]
    for i in range(len(ps)):
        # Spark's exact special cases first (see module docstring): an
        # integral position or equal boundary VALUES return v[lower]
        # untouched — the interpolation expression would re-derive it only
        # up to ULP noise.
        out_exprs.append(
            f"CASE WHEN _hi{i} = _lo{i} THEN _vlo{i}"
            f" WHEN _vhi{i} = _vlo{i} THEN _vlo{i}"
            f" ELSE (CAST(_hi{i} AS DOUBLE) - 1.0D - _pos{i}) * _vlo{i}"
            f" + (_pos{i} - (CAST(_lo{i} AS DOUBLE) - 1.0D)) * _vhi{i}"
            f" END AS {out_prefix}{i}"
        )
    return vals.selectExpr(*out_exprs)
