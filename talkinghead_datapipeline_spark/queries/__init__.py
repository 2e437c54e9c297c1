"""Named query registry — the engine's operator-coverage surface.

Every operator from SURVEY.md §2 lands here as a named query: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an
equivalent DuckDB oracle SQL string. The driver runs both sides at sf0.01
and compares row-count + schema + order-insensitive value hash.

Conventions (hash-stability across Spark/DuckDB):
- Alias every computed column identically on both sides.
- Round floating aggregates (``round(x, 2)`` for money sums, ``round(x, 6)``
  for ratios/averages) on BOTH sides so accumulation-order ULP noise cannot
  flip the hash.
- Cast computed integers to BIGINT on both sides (DuckDB widens to int64
  where Spark keeps int32).
- Every top-k / limit query orders by a deterministic full tiebreak.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    "relational",
    "tpch_extra",
    "tpch_full",
    "windows",
    "kernels",
    "textops",
    "similarity",
    "timeseries",
    "dedup",
    "dataprep",
    "streaming_queries",
    "multimodal",
    "inference_nodes",
    "assembly",
    "functions_suite",
)


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a Spark query with its oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, spark=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _MODULES:
            importlib.import_module(f"{__name__}.{mod}")
        _LOADED = True


def all_queries() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def spark_queries() -> dict[str, SparkQuery]:
    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
