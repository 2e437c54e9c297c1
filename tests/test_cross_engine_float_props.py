"""Property fuzz for the cross-engine FLOAT conventions (hypothesis).

The registry's hash rules (queries/__init__.py docstring) were derived
from divergences found empirically at sf0.01: IEEE -0.0 surviving
round(), DuckDB's half-even double→int CAST vs Spark's truncation, and
byte-vs-codepoint Levenshtein. The fixed-case pins live in
test_cross_engine_primitives.py; this harness FUZZES the numeric classes
so a new divergence surfaces here before it costs a driver red row.

Each example pushes a BATCH of values through both engines in one round
trip (per-value jobs would be 100x slower than the property is worth)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

# Portability domain for round(x, 6): |x|*1e6 must stay inside the 2^53
# double mantissa. DuckDB rounds by scaling IN FLOAT (x*1e6 → rint →
# /1e6), so beyond the mantissa the scaled value loses its low digits —
# the fuzzer's own discovery, pinned in
# test_round6_divergence_beyond_mantissa_pinned below. Spark rounds via
# BigDecimal of the exact binary value and has no such cliff. Every
# registered oracle's rounded columns are ratios/averages (|x| ~ 1) or
# money sums (≤ ~1e7 at certified SFs), far inside the domain.
_ROUND6_SAFE = 1e9

_floats = st.one_of(
    st.floats(min_value=-_ROUND6_SAFE, max_value=_ROUND6_SAFE, allow_nan=False),
    # the classes that caused real driver mismatches: tiny near-zero
    # values of both signs, and values near .5 decimal boundaries
    st.floats(min_value=-1e-6, max_value=1e-6, allow_nan=False),
    st.sampled_from(
        [-0.0, 0.0, -1e-9, 1e-9, 0.0000005, -0.0000005, 89999.6, 2.5, -2.5]
    ),
)


def _spark_series(spark, vals, expr):
    pdf = pd.DataFrame({"x": pd.array(vals, dtype="float64")})
    return (
        spark.createDataFrame(pdf)
        .select(expr.alias("y"))
        .toPandas()["y"]
        .tolist()
    )


def _duck_series(vals, sql_expr):
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame({"x": pd.array(vals, dtype="float64")}))
        return [r[0] for r in con.sql(f"SELECT {sql_expr} FROM t").fetchall()]
    finally:
        con.close()


@settings(max_examples=8, deadline=None, derandomize=True)
@given(st.lists(_floats, min_size=1, max_size=64))
def test_round6_plus_zero_is_engine_portable(spark, vals):
    """The house output convention — round(x, 6) + 0.0 — must agree
    BITWISE (repr-level, the driver sorts on repr) between engines."""
    got_s = _spark_series(spark, vals, F.round(F.col("x"), 6) + 0.0)
    got_d = _duck_series(vals, "round(x, 6) + 0.0")
    assert [repr(a) for a in got_s] == [repr(b) for b in got_d], (
        [(v, a, b) for v, a, b in zip(vals, got_s, got_d) if repr(a) != repr(b)]
    )


def test_round6_divergence_beyond_mantissa_pinned(spark):
    """The fuzzer's catch, pinned (like the non-ASCII Levenshtein pin):
    at 288230376152.5, DuckDB's float-scaled round(x, 6) returns
    ...152.49994 while Spark's BigDecimal round is the exact identity.
    If either engine changes behavior, the _ROUND6_SAFE domain above
    must be re-derived."""
    x = 288230376152.5
    assert _spark_series(spark, [x], F.round(F.col("x"), 6))[0] == x
    assert _duck_series([x], "round(x, 6)")[0] != x


@settings(max_examples=8, deadline=None, derandomize=True)
@given(st.lists(_floats, min_size=1, max_size=64))
def test_explicit_floor_to_bigint_is_engine_portable(spark, vals):
    """The convention fixing the CAST divergence: an explicit floor()
    BEFORE the integer cast must agree everywhere (bare CAST would not:
    DuckDB rounds half-even, Spark truncates)."""
    got_s = _spark_series(
        spark, vals, F.floor(F.col("x")).cast("bigint")
    )
    got_d = _duck_series(vals, "CAST(floor(x) AS BIGINT)")
    assert got_s == got_d, (
        [(v, a, b) for v, a, b in zip(vals, got_s, got_d) if a != b]
    )


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    st.lists(
        st.integers(min_value=0, max_value=4102444800_000_000),  # ≤ 2100-01-01
        min_size=1,
        max_size=64,
    )
)
def test_epoch_micros_roundtrip_is_engine_portable(spark, micros):
    """events.ts convention: Spark unix_micros(timestamp_micros(u)) and
    DuckDB epoch_us(make_timestamp(u)) must both return u exactly — the
    identity both sides of every events oracle lean on."""
    pdf = pd.DataFrame({"u": pd.array(micros, dtype="int64")})
    got_s = (
        spark.createDataFrame(pdf)
        .select(F.unix_micros(F.timestamp_micros(F.col("u"))).alias("y"))
        .toPandas()["y"]
        .tolist()
    )
    con = duckdb.connect()
    try:
        con.register("t", pdf)
        got_d = [
            r[0] for r in con.sql("SELECT epoch_us(make_timestamp(u)) FROM t").fetchall()
        ]
    finally:
        con.close()
    assert got_s == got_d == micros


def test_nan_and_inf_stay_out_of_oracle_surfaces():
    """The fuzz above excludes NaN/Inf deliberately: the engine's own
    convention (S11 NaN guards) keeps non-finite values out of hashed
    output columns — document the exclusion so nobody 'fixes' the
    strategy into asserting cross-engine NaN ordering, which the two
    engines genuinely disagree on (DuckDB sorts NULLs/NaN differently
    than pandas repr-sort)."""
    assert math.isnan(float("nan"))  # intentional no-op anchor
