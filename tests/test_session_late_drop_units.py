"""Pin the session-window dropped-by-watermark counting unit (r12 finding).

The r12 full-registry x4 differential showed streaming_session_late_metrics'
raw-row oracle diverging on duplicate-heavy data (engine 324 vs raw 1296).
Direct probes show the engine's ``numRowsDroppedByWatermark`` for session
aggregations is neither raw rows nor any simple merged-session unit when a
user's late rows collide inside one micro-batch:

- 4 exact-duplicate late rows            -> 1 drop
- 4 distinct-ts same-session late rows   -> 1 drop
- 4 distinct-user late rows              -> 4 drops
- two separate late sessions, one user   -> 1 drop
- a fully-late two-row merged session    -> 0 drops

These pins do two jobs: (1) they delimit the oracle's modeled domain —
raw-row counting is exact when each late row is a session-isolated
singleton, which the certified fixtures satisfy (asserted below); (2) an
engine upgrade that changes the counting unit fails here first, the same
early-warning contract the other streaming pins carry.
"""

from __future__ import annotations

import pytest

import os
import shutil
import tempfile

from pyspark.sql import functions as F

# Heavy tier: skipped unless SPARK_GRAFT_SLOW=1 (see conftest; VERDICT r14 #3)
pytestmark = pytest.mark.slow


def _probe(spark, late_rows):
    from talkinghead_datapipeline_spark.streaming.incremental import (
        run_available_now_with_metrics,
    )

    work = tempfile.mkdtemp(prefix="thdp_latedrop_probe_")
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)
        batches = [
            [("2024-01-01 10:00:00", 1)],
            [("2024-01-01 12:00:00", 1)],  # watermark after this = 11:30
            late_rows,
        ]
        for k, rows in enumerate(batches):
            d = os.path.join(work, f"b{k}")
            spark.createDataFrame(rows, "ts string, user_id bigint").selectExpr(
                "CAST(ts AS TIMESTAMP) AS ts", "user_id"
            ).coalesce(1).write.mode("overwrite").parquet(d)
            part = next(
                f for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
            dst = os.path.join(src, f"batch-{k:05d}.parquet")
            shutil.copy(os.path.join(d, part), dst)
            os.utime(dst, (1_000_000 + k,) * 2)

        def transform(stream):
            return (
                stream.withWatermark("ts", "30 minutes")
                .groupBy(
                    F.session_window("ts", "30 minutes").alias("win"), "user_id"
                )
                .agg(F.count(F.lit(1)).alias("n"))
            )

        metrics = run_available_now_with_metrics(
            spark,
            source_dir=src,
            schema="ts timestamp, user_id bigint",
            transform=transform,
            sink_path=os.path.join(work, "sink"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            max_files_per_trigger=1,
        )
        by_batch = {b: (n, d) for b, n, d in metrics}
        return by_batch[2]
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_engine_drop_units_under_collisions(spark):
    # session-isolated singleton (the oracle's modeled domain): raw == unit
    assert _probe(spark, [("2024-01-01 09:00:00", 7)]) == (1, 1)
    # 4 exact duplicates collapse to one dropped unit
    assert _probe(spark, [("2024-01-01 09:00:00", 7)] * 4) == (4, 1)
    # 4 gap-connected late rows collapse to one dropped unit
    assert _probe(
        spark,
        [("2024-01-01 09:00:00", 7), ("2024-01-01 09:01:00", 7),
         ("2024-01-01 09:02:00", 7), ("2024-01-01 09:03:00", 7)],
    ) == (4, 1)
    # distinct users do NOT collapse
    assert _probe(
        spark,
        [("2024-01-01 09:00:00", 7), ("2024-01-01 09:00:00", 8),
         ("2024-01-01 09:00:00", 9), ("2024-01-01 09:00:00", 10)],
    ) == (4, 4)
    # two separate late sessions of one user count ONE (not two)
    assert _probe(
        spark,
        [("2024-01-01 09:00:00", 7), ("2024-01-01 10:30:00", 7)],
    ) == (2, 1)
    # a fully-late merged session (both rows' ts+gap <= watermark) counts
    # ZERO — the engine keeps it despite both rows being individually late
    assert _probe(
        spark,
        [("2024-01-01 10:30:00", 7), ("2024-01-01 10:59:00", 7)],
    ) == (2, 0)


def test_certified_fixture_stays_inside_modeled_domain(spark, sf_dir):
    """On the certified fixture the raw-row model and the engine agree —
    the oracle match IS the modeled-domain proof (the engine-side counter
    only deviates from raw rows under the collision patterns pinned above,
    which the fixture's straggler batch avoids in the way the engine
    counts them)."""
    from talkinghead_datapipeline_spark.queries.streaming_queries import (
        STREAMING_SESSION_LATE_METRICS_ORACLE,
        streaming_session_late_metrics,
    )
    from tests.oracle_harness import run_compare

    res = run_compare(
        spark, sf_dir, "streaming_session_late_metrics",
        streaming_session_late_metrics, STREAMING_SESSION_LATE_METRICS_ORACLE,
    )
    assert res.ok, res.mismatches
