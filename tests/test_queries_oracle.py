"""Differential tests: every registered query vs its DuckDB oracle.

This is the local replica of the driver's t2 correctness gate
(sf0.001 by default; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for
the driver-scale run).
"""

from __future__ import annotations

import pytest

from talkinghead_datapipeline_spark.queries import all_queries
from tests.oracle_harness import run_compare

_SPECS = all_queries()
_WITH_ORACLE = sorted(name for name, s in _SPECS.items() if s.oracle is not None)
_ROWS_ONLY = sorted(name for name, s in _SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = _SPECS[name]
    result = run_compare(spark, sf_dir, name, spec.spark, spec.oracle)
    assert result.ok, str(result)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = _SPECS[name]
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
