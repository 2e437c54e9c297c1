"""Batched-inference scaffolding (SURVEY §2.b N6-N8, N14-N17; §3.2).

The reference wraps every model node in the same shape: a lazily-loaded
expensive resource (``BaseResource``, dpl/processor/nodes/base.py:30-54),
batched array input via a DataLoader, device transfer, whole-batch error
quarantine (dpl/processor/nodes/audio.py:65-70). Spark-first, that shape is:

- ``mapInPandas`` over Arrow record batches (the DataLoader analog — batch
  size via ``spark.sql.execution.arrow.maxRecordsPerBatch``);
- a **per-executor-process lazy singleton** for the model (loaded once per
  python worker, not per batch — the BaseResource analog);
- an **error-channel column** instead of a driver-side report accumulator
  (E8: accumulators are not exactly-once; a status column is).

Models are pluggable callables; the correctness tier ships deterministic
stand-ins (models.py) because GPU weights are out of scope for the oracle
harness — the Spark-side plumbing (schema, partitioning, batching, lazy
cache) is the real, tested artifact.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

# Per-python-worker resource cache (one model instance per executor process,
# exactly the BaseResource lifetime re-expressed for Spark workers).
_RESOURCE_CACHE: dict[str, Any] = {}


def get_executor_resource(key: str, factory: Callable[[], Any]) -> Any:
    """Lazily build and cache an expensive resource in this worker process."""
    if key not in _RESOURCE_CACHE:
        _RESOURCE_CACHE[key] = factory()
    return _RESOURCE_CACHE[key]


def clear_executor_resources() -> None:
    """Free cached resources (the reference's context-manager unload,
    base.py:130) — call from a barrier/cleanup stage when switching models."""
    _RESOURCE_CACHE.clear()


def broadcast_weights_factory(df: DataFrame, weights: Any, build: Callable[[Any], Any]):
    """Torrent-broadcast big model weights once per EXECUTOR (not per task,
    not via task-closure serialization): ship ``weights`` with
    ``sc.broadcast`` and return a factory that builds the model from the
    broadcast value inside the worker. The FLAME basis / checkpoint tensors
    pattern (dpl/processor/nodes/flame.py:47-58's weights loading) at
    cluster scale — closure pickling would re-send weights with every task.
    """
    bc = df.sparkSession.sparkContext.broadcast(weights)
    return lambda: build(bc.value)


def batched_inference(
    df: DataFrame,
    output_schema: str,
    model_key: str,
    model_factory: Callable[[], Any],
    batch_fn: Callable[[Any, pd.DataFrame], pd.DataFrame],
    error_col: str = "error",
) -> DataFrame:
    """Run ``batch_fn(model, batch)`` over Arrow batches with a lazy
    per-executor model and whole-batch error quarantine.

    ``output_schema`` must include ``error_col`` (string, null on success).
    On a batch failure every row of that batch is emitted with nulls for the
    model outputs and the exception text in ``error_col`` — the pipeline
    continues, mirroring run_sequence's RuntimeError containment
    (dpl/processor/nodes/base.py:137-142) at batch grain (audio.py:65-70).
    """
    from pyspark.sql.types import StructType

    from talkinghead_datapipeline_spark.shipping import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    # Parse the DDL properly (driver-side, once): naive comma-splitting
    # breaks on struct<...>/map<k,v>/decimal(p,s) field types.
    out_cols = StructType.fromDDL(output_schema).fieldNames()

    def _infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = get_executor_resource(model_key, model_factory)
        for pdf in batches:
            try:
                out = batch_fn(model, pdf)
                if error_col not in out.columns:
                    out[error_col] = None
                yield out
            except Exception as exc:  # noqa: BLE001 — quarantine, don't abort
                # missing model-output columns become object-dtype None
                # (NOT float NaN — Arrow nulls them cleanly for any type).
                none_col = pd.Series([None] * len(pdf), dtype=object, index=pdf.index)
                quarantined = pd.DataFrame(
                    {c: pdf[c] if c in pdf.columns else none_col for c in out_cols}
                )
                quarantined[error_col] = f"{type(exc).__name__}: {exc}"
                yield quarantined

    return df.mapInPandas(_infer, schema=output_schema)


def split_error_channel(df: DataFrame, error_col: str = "error") -> tuple[DataFrame, DataFrame]:
    """(ok_rows, quarantined_rows) — the E8 report.json analog as data."""
    return df.filter(df[error_col].isNull()).drop(error_col), df.filter(
        df[error_col].isNotNull()
    )
