"""Window & time-series layer (SURVEY §2 N12, S6, S8, S9; §7 phase 3).

The reference's frame-axis kernels become window specs over the `events`
time-series fixture: partition = clip (`user_id`), order = frame time
(`ts, event_id` full tiebreak so every window frame is deterministic).

Frame-spec parity note: `as_windowed` (dpl/processor/utils.py:68-98) pads
edges by replication; SQL window frames shrink at partition edges instead.
Queries here either restrict to interior rows (savgol) or adopt shrinking
frames on BOTH engine and oracle sides — the documented divergence from
SURVEY §2.c S6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from talkinghead_datapipeline_spark.catalog import load_table
from talkinghead_datapipeline_spark.functions.windows import (
    as_windowed_bounds,
    centered_frame_bounds,
    savgol_coefficients,
)
from talkinghead_datapipeline_spark.queries import register

# ---------------------------------------------------------------------------
# N12 — rolling min/max extent over neighboring frames
# (dpl/processor/nodes/bboxes.py:123-145; window_size=5)
# ---------------------------------------------------------------------------

_N12_LO, _N12_HI = centered_frame_bounds(5)  # (-2, 2): w//2 preceding/following


@register(
    "n12_rolling_extent",
    oracle=f"""
    SELECT user_id, event_id,
           round(min(value) OVER w, 6) AS roll_min,
           round(max(value) OVER w, 6) AS roll_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN {-_N12_LO} PRECEDING AND {_N12_HI} FOLLOWING)
    """,
    tags=("window", "N12"),
)
def n12_rolling_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling extent over w=5 neighbor frames (bboxes.py:123-145), O(N) via
    sliding window frame instead of the reference's O(N·w) loop
    (bboxes.py:128-129 TODO)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(_N12_LO, _N12_HI)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.min("value").over(w), 6).alias("roll_min"),
        F.round(F.max("value").over(w), 6).alias("roll_max"),
    )


# ---------------------------------------------------------------------------
# S6 / N23 — sliding-window mean, reference frame convention
# window i covers [i-(size-size//2), i+size//2) (dpl/processor/utils.py:68-98)
# ---------------------------------------------------------------------------

_S6_LO, _S6_HI = as_windowed_bounds(16)  # (-8, 7)


@register(
    "s6_sliding_mean",
    oracle=f"""
    SELECT user_id, event_id,
           round(avg(value) OVER w, 6) AS win_avg,
           count(*) OVER w AS win_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN {-_S6_LO} PRECEDING AND {_S6_HI} FOLLOWING)
    """,
    tags=("window", "S6", "N23"),
)
def s6_sliding_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`average_features` sliding mean, w=16 (dpl/processor/nodes/h5.py:235-237
    via utils.py:68-98): frame [i-8, i+8) → ROWS BETWEEN 8 PRECEDING AND 7
    FOLLOWING, shrinking at edges."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(_S6_LO, _S6_HI)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("win_avg"),
        F.count(F.lit(1)).over(w).alias("win_n"),
    )


# ---------------------------------------------------------------------------
# S8 — Savitzky–Golay smoothing as FIR dot product over lags
# (scipy savgol_filter(x, 7, 3) parity on interior rows)
# ---------------------------------------------------------------------------


def _savgol_fir_sql(window: int = 7, order: int = 3) -> str:
    coefs = savgol_coefficients(window, order)
    half = window // 2
    terms = []
    for k, c in enumerate(coefs):
        off = k - half
        if off < 0:
            col = f"lag(value, {-off}) OVER w"
        elif off > 0:
            col = f"lead(value, {off}) OVER w"
        else:
            col = "value"
        terms.append(f"({c!r}) * ({col})")
    expr = " + ".join(terms)
    return f"""
    SELECT user_id, event_id, round(smoothed, 6) AS smoothed
    FROM (
      SELECT user_id, event_id, {expr} AS smoothed,
             count(*) OVER (PARTITION BY user_id ORDER BY event_id
                            ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING) AS n_in
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ) WHERE n_in = {window}
    """


@register("s8_savgol_fir", oracle=_savgol_fir_sql(7, 3), tags=("window", "S8"))
def s8_savgol_fir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Savgol(w=7, o=3) smoothing (callers: bboxes.py:159-162, emoca.py:91-97)
    as a fixed-coefficient FIR over lag/lead columns; interior rows only
    (scipy's 'interp' edge mode is handled by the applyInPandas variant in
    operators.rolling)."""
    ev = load_table(spark, sf_dir, "events")
    coefs = savgol_coefficients(7, 3)
    half = 7 // 2
    w = W.partitionBy("user_id").orderBy("event_id")
    wcnt = w.rowsBetween(-half, half)
    acc = None
    for k, c in enumerate(coefs):
        off = k - half
        if off < 0:
            term = F.lit(c) * F.lag("value", -off).over(w)
        elif off > 0:
            term = F.lit(c) * F.lead("value", off).over(w)
        else:
            term = F.lit(c) * F.col("value")
        acc = term if acc is None else acc + term
    return (
        ev.select(
            "user_id",
            "event_id",
            acc.alias("_smoothed"),
            F.count(F.lit(1)).over(wcnt).alias("_n_in"),
        )
        .filter(F.col("_n_in") == 7)
        .select("user_id", "event_id", F.round("_smoothed", 6).alias("smoothed"))
    )


@register("s8_savgol_exact", oracle=None, tags=("window", "S8", "udf"))
def s8_savgol_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact scipy-parity savgol(w=25, o=3) incl. 'interp' edge refit —
    applyInPandas per user series (operators.rolling). Non-SQL-expressible
    (polynomial edge refit), so no oracle: correctness is pinned by
    tests/test_kernels.py against the numpy reference."""
    from talkinghead_datapipeline_spark.operators.rolling import savgol_smooth

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    out = savgol_smooth(ev, "user_id", "event_id", ["value"], window=25)
    return out.select(
        "user_id", "event_id", F.round("value", 6).alias("smoothed")
    )


@register("n12_emoca_bbox_pipeline", oracle=None, tags=("window", "N12", "udf"))
def n12_emoca_bbox_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full EmocaLikeBboxes chain (bboxes.py:84-195): rolling extent w=5 →
    exact savgol(25,3) center smoothing → q=0.75 size equalization. The
    savgol stage's edge refit is non-SQL-expressible → rows-only check;
    the SQL-expressible stages are oracle-covered by n12_rolling_extent +
    s10_quantile_per_flag."""
    from talkinghead_datapipeline_spark.operators.rolling import rolling_extent_bboxes

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    out = rolling_extent_bboxes(
        ev, "user_id", "event_id", "value", window=5, smooth_window=25, equalize_q=0.75
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        F.round("center", 6).alias("center"),
        F.round("size", 6).alias("size"),
        F.round("size_eq", 6).alias("size_eq"),
    )


# ---------------------------------------------------------------------------
# S9 — tumbling windows (volume envelope, dpl/wav2vec/inference.py:94-106)
# ---------------------------------------------------------------------------


@register(
    "s9_tumbling_volume",
    oracle="""
    SELECT user_id,
           CAST(floor(event_id / 50) AS BIGINT) AS block,
           round(avg(abs(value)), 6) AS volume,
           count(*) AS n_samples
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "S9"),
)
def s9_tumbling_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume envelope: mean |amp| per fixed-count block
    (dpl/wav2vec/inference.py:94-106) → floor-bucketed groupBy."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id",
        F.floor(F.col("event_id") / 50).cast("bigint").alias("block"),
    ).agg(
        F.round(F.avg(F.abs("value")), 6).alias("volume"),
        F.count(F.lit(1)).alias("n_samples"),
    )


@register(
    "s9_tumbling_hourly",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts) AS hour_ts,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "S9", "date"),
)
def s9_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based tumbling window (the streaming `window()` analog in batch)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Running / cumulative + lag-delta surface (general window coverage)
# ---------------------------------------------------------------------------


@register(
    "running_sum_per_user",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS running_value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT)
             AS frame_idx
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("window",),
)
def running_sum_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum + frame index assignment (the engine's ordinal frame_idx
    derivation for frame-grain tables, SURVEY §1.4)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(
            F.sum("value").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 4
        ).alias("running_value"),
        F.row_number().over(w).cast("bigint").alias("frame_idx"),
    )


@register(
    "lag_delta_per_user",
    oracle="""
    SELECT user_id, event_id,
           round(value - lag(value, 1) OVER w, 6) AS delta,
           CAST(date_diff('second', lag(ts, 1) OVER w, ts) AS BIGINT) AS gap_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    tags=("window",),
)
def lag_delta_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-to-frame delta (lag) + inter-event gap in whole seconds."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    prev_ts = F.lag("ts", 1).over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value", 1).over(w), 6).alias("delta"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
        ).cast("bigint").alias("gap_s"),
    )


# ---------------------------------------------------------------------------
# S6/N23 EXACT edge-replicated sliding mean (as_windowed, utils.py:68-98 +
# average_features, h5.py:235-237). Spark's shrinking frames differ at the
# edges; the reference pads (w - w//2, w//2) by edge REPLICATION. Collected
# per-key arrays + clamped indexing reproduce that bit-for-bit — and the
# DuckDB oracle does the identical clamped fold.
# ---------------------------------------------------------------------------

_N23_W = 16


@register(
    "n23_window_mean_edgepad",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             list(value ORDER BY event_id) AS arr,
             list(event_id ORDER BY event_id) AS ids
      FROM events
      GROUP BY user_id
    ),
    idx AS (
      SELECT user_id, arr, ids, CAST(unnest(range(0, len(arr))) AS BIGINT) AS i
      FROM per_user
    )
    SELECT user_id,
           ids[CAST(i AS INT) + 1] AS event_id,
           round(list_sum(list_transform(range({-(_N23_W - _N23_W // 2)}, {_N23_W // 2}),
                 k -> arr[CAST(least(greatest(i + k, 0), len(arr) - 1) AS INT) + 1]))
                 / {_N23_W}.0, 6) AS win_mean
    FROM idx
    """,
    tags=("window", "S6", "N23", "edgepad"),
)
def n23_window_mean_edgepad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT reference sliding mean, edge-replicated: window i averages
    original indices [i-(w-w//2), i+w//2) with indices clamped into range
    (np.pad mode='edge'), w=16 — N23's feature averaging. Implementation:
    per-key collected array (one shuffle) + clamped element_at fold per
    position. Spark Window frames shrink at partition edges and cannot
    express replication; the array form can, and stays O(n·w) per key."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("event_id", "value"))).alias("_pairs")
    )
    lo, hi = -(_N23_W - _N23_W // 2), _N23_W // 2 - 1
    arrs = per_user.select(
        "user_id",
        F.transform("_pairs", lambda p: p["value"]).alias("arr"),
        F.transform("_pairs", lambda p: p["event_id"]).alias("ids"),
    )
    exploded = arrs.select(
        "user_id", "arr", F.posexplode("ids").alias("i", "event_id")
    )
    n = F.size("arr")
    win_sum = F.aggregate(
        F.sequence(F.lit(lo), F.lit(hi)),
        F.lit(0.0),
        lambda acc, k: acc
        + F.element_at(
            F.col("arr"),
            (F.least(F.greatest(F.col("i") + k, F.lit(0)), n - 1) + 1).cast("int"),
        ),
    )
    return exploded.select(
        "user_id",
        "event_id",
        F.round(win_sum / _N23_W, 6).alias("win_mean"),
    )


# ---------------------------------------------------------------------------
# S8 EXACT savgol (w=7, o=3) WITH edge refit — oracle-matched.
# The 'interp' edge handling is a fixed linear map: smoothed[i] is a dot
# product of hat-matrix row coefficients with the first/last w samples
# (polyfit+polyval == applying the least-squares projector). Both engines
# evaluate the SAME literal coefficients in the same order, so the edge
# polynomial refit — "non-SQL-expressible" as a window frame — becomes an
# exact SQL expression over per-key collected arrays.
# ---------------------------------------------------------------------------

_SG_W, _SG_O = 7, 3


def _sg_hat() -> list[list[float]]:
    import numpy as np

    V = np.vander(np.arange(_SG_W, dtype=np.float64), _SG_O + 1, increasing=True)
    return (V @ np.linalg.pinv(V)).tolist()


_SG_H = _sg_hat()
_SG_HALF = _SG_W // 2


def _sg_dot_sql(row: int, base: str) -> str:
    """Σ_j H[row][j] * arr[base + j] — ``base`` is a 1-based SQL index expr."""
    return " + ".join(
        f"({_SG_H[row][j]!r} * arr[CAST({base} + {j} AS INT)])" for j in range(_SG_W)
    )


def _sg_case_sql() -> str:
    head = " ".join(
        f"WHEN i = {r} THEN {_sg_dot_sql(r, '1')}" for r in range(_SG_HALF)
    )
    tail = " ".join(
        f"WHEN n - i = {n_i} THEN {_sg_dot_sql(_SG_W - n_i, 'n - ' + str(_SG_W) + ' + 1')}"
        for n_i in range(1, _SG_HALF + 1)
    )
    interior = _sg_dot_sql(_SG_HALF, f"i - {_SG_HALF} + 1")
    return f"CASE WHEN n < {_SG_W} THEN arr[CAST(i + 1 AS INT)] {head} {tail} ELSE {interior} END"


@register(
    "s8_savgol_exact_w7",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             list(value ORDER BY event_id) AS arr,
             list(event_id ORDER BY event_id) AS ids
      FROM events GROUP BY user_id
    ),
    idx AS (
      SELECT user_id, arr, ids, len(arr) AS n,
             CAST(unnest(range(0, len(arr))) AS BIGINT) AS i
      FROM per_user
    )
    SELECT user_id, ids[CAST(i AS INT) + 1] AS event_id,
           round({_sg_case_sql()}, 6) AS smoothed
    FROM idx
    """,
    tags=("window", "S8", "savgol", "exact"),
)
def s8_savgol_exact_w7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact savgol(7,3) INCLUDING the polynomial edge refit, as pure SQL:
    per-key collected series + per-position hat-matrix dot products
    (utils S8; emoca.py:91-97 pose smoothing uses w=7). One shuffle
    (the groupBy), then codegen-resident arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("event_id", "value"))).alias("_p")
    )
    arrs = per_user.select(
        "user_id",
        F.transform("_p", lambda p: p["value"]).alias("arr"),
        F.transform("_p", lambda p: p["event_id"]).alias("ids"),
    )
    ex = arrs.select("user_id", "arr", F.posexplode("ids").alias("i", "event_id"))
    n = F.size("arr")
    i = F.col("i")

    def dot(row: int, base):
        # base: 1-based Column index of the window start
        acc = None
        for j in range(_SG_W):
            term = F.lit(_SG_H[row][j]) * F.element_at(
                F.col("arr"), (base + j).cast("int")
            )
            acc = term if acc is None else acc + term
        return acc

    expr = F.when(n < _SG_W, F.element_at(F.col("arr"), (i + 1).cast("int")))
    for r in range(_SG_HALF):
        expr = expr.when(i == r, dot(r, F.lit(1)))
    for n_i in range(1, _SG_HALF + 1):
        expr = expr.when(n - i == n_i, dot(_SG_W - n_i, n - _SG_W + 1))
    expr = expr.otherwise(dot(_SG_HALF, i - _SG_HALF + 1))
    return ex.select("user_id", "event_id", F.round(expr, 6).alias("smoothed"))
