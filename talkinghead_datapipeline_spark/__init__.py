"""talkinghead_datapipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference dataset-preparation tool (``ploshkin/talkinghead-datapipeline``),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
column expressions for scalar kernels, window specs for rolling/smoothing
operators, and Arrow-batched pandas UDFs only where built-ins cannot express
the semantics (model inference, exact scipy-parity smoothing).

Layout
------
- ``session``    : tuned SparkSession builder (local + cluster profiles)
- ``catalog``    : table registry over the parquet test fixtures
- ``functions``  : scalar/array/window kernel library (SURVEY §2.c)
- ``operators``  : relational + time-series + dedup/similarity operators
                   (SURVEY §2.a/§2.b + LLM-data-pipeline extensions)
- ``sources``    : media/binary + parquet ingest (E1/E2 scan + key derivation)
- ``plans``      : JSON graph-config → DataFrame plan builder (E5/E10)
- ``streaming``  : incremental execution (E7 memoization, AvailableNow)
"""

from talkinghead_datapipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
