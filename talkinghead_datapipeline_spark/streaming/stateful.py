"""Custom stateful streaming operators via ``applyInPandasWithState``
(north-star: "applyInPandasWithState for custom stateful operators").

Where ``session_window``/``window`` cover the declarative cases
(streaming_queries.py), arbitrary per-key state — running counters,
last-seen caches, custom eviction — needs the imperative hook. The shape
below is the canonical one: group by key, fold each micro-batch's rows into
a state tuple, emit the updated row. State lives in the state store
(checkpointed, exactly-once under AvailableNow restarts).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_exact_dedup(
    docs: DataFrame,
    key_col: str = "content_hash",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST row per content hash within
    the watermark horizon — ``dropDuplicatesWithinWatermark``, the
    streaming twin of ``operators.dedup.exact_dedup`` and the ingest-side
    guard of the corpus dedup stack (duplicates that arrive within the
    horizon never reach the sink; state for a hash is evicted once the
    watermark passes it, so state size is bounded by the horizon's
    arrival volume — the property that makes it safe on an unbounded
    crawl firehose, where a plain ``dropDuplicates`` would grow state
    forever)."""
    return docs.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key_col]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, sum_value) maintained in explicit group
    state. Each micro-batch emits one updated row per active user — the
    streaming twin of ``groupBy(user).agg(count, sum)`` but with state the
    caller can extend (rate limits, dedup caches, anomaly windows)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_extents(events: DataFrame) -> DataFrame:
    """Per-user (n_events, min_event_id, max_event_id) in explicit group
    state — the ORACLE-CERTIFIABLE ``applyInPandasWithState`` shape: all
    three state fields are order-independent int64 folds (count, min,
    max), so unlike a float running sum the emitted values are exact and
    independent of row order inside a micro-batch — a batch GROUP BY
    reproduces them bit-for-bit. Append output mode pairs with the
    parquet file sink (update mode is memory/foreach-only)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, mn, mx = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                bmin = int(pdf["event_id"].min())
                bmax = int(pdf["event_id"].max())
                mn = bmin if mn is None else min(mn, bmin)
                mx = bmax if mx is None else max(mx, bmax)
        state.update((n, mn, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "min_event_id": [mn],
                "max_event_id": [mx],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, n_events bigint,"
            " min_event_id bigint, max_event_id bigint"
        ),
        stateStructType="n bigint, mn bigint, mx bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
