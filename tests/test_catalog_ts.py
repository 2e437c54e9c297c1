"""Regression pins for the events-timestamp catalog seam (VERDICT r4 #9).

The driver's ``events.parquet`` fixture has already changed physical type
once (TIMESTAMP(NANOS) → timestamp[us] NTZ), costing a round of red
CORRECTNESS rows. These tests write each physical variant the fixture
could plausibly arrive as and assert ``unix_micros`` parity with DuckDB's
``epoch_us`` on the same file — under a NON-UTC session timezone, so the
normalization provably does not lean on ``spark.sql.session.timeZone``
(ADVICE r4: the loader must not mutate session state either).
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.catalog import load_table

_TS = [
    datetime.datetime(2021, 3, 4, 5, 6, 7, 123456),
    datetime.datetime(2021, 3, 14, 7, 30, 0),  # inside a US DST transition
    datetime.datetime(2021, 11, 7, 6, 30, 0),  # fall-back ambiguous wall hour
    datetime.datetime(1999, 12, 31, 23, 59, 59, 999999),
]


def _write_variant(tmp_path, variant: str) -> str:
    if variant == "nanos_long":
        arr = pa.array(_TS, type=pa.timestamp("ns"))
    elif variant == "micros_ntz":
        arr = pa.array(_TS, type=pa.timestamp("us"))
    elif variant == "micros_utc":
        arr = pa.array(
            [t.replace(tzinfo=datetime.timezone.utc) for t in _TS],
            type=pa.timestamp("us", tz="UTC"),
        )
    else:  # pragma: no cover
        raise AssertionError(variant)
    table = pa.table({"user_id": list(range(len(_TS))), "ts": arr})
    path = str(tmp_path / "events.parquet")
    pq.write_table(table, path)
    return path


@pytest.mark.parametrize("variant", ["nanos_long", "micros_ntz", "micros_utc"])
@pytest.mark.parametrize("session_tz", ["UTC", "America/New_York"])
def test_events_ts_micros_match_duckdb(spark, tmp_path, variant, session_tz):
    path = _write_variant(tmp_path, variant)
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT epoch_us(ts) FROM read_parquet('{path}') ORDER BY user_id"
        ).fetchall()
    ]
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", session_tz)
        df = load_table(spark, str(tmp_path), "events")
        assert df.schema["ts"].dataType.typeName() == "timestamp"
        got = [
            r["um"]
            for r in df.select("user_id", F.unix_micros("ts").alias("um"))
            .orderBy("user_id")
            .collect()
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    assert got == want, f"{variant} under {session_tz}"


def test_loader_does_not_mutate_session_timezone(spark, tmp_path):
    """ADVICE r4 (low): normalize_events_ts must not set
    spark.sql.session.timeZone as a side effect of reading a table."""
    path = _write_variant(tmp_path, "micros_ntz")
    assert path
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        load_table(spark, str(tmp_path), "events").collect()
        assert spark.conf.get("spark.sql.session.timeZone") == "Asia/Tokyo"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_normalize_events_ts_ntz_arithmetic_fallback(spark, tmp_path):
    """The loader's forced-schema fast path bypasses normalize_events_ts
    for NTZ scans; direct callers still hit its arithmetic branch — pin it
    against DuckDB epoch_us under a non-UTC session timezone too."""
    from pyspark.sql import functions as F

    from talkinghead_datapipeline_spark.catalog import normalize_events_ts

    path = _write_variant(tmp_path, "micros_ntz")
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT epoch_us(ts) FROM read_parquet('{path}') ORDER BY user_id"
        ).fetchall()
    ]
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ntz = spark.read.parquet(path)
        assert ntz.schema["ts"].dataType.typeName() == "timestamp_ntz"
        out = normalize_events_ts(ntz)
        assert out.schema["ts"].dataType.typeName() == "timestamp"
        got = [
            r["um"]
            for r in out.select("user_id", F.unix_micros("ts").alias("um"))
            .orderBy("user_id")
            .collect()
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    assert got == want
