"""The minhash SQL twins are build-cost twins of the Column operators,
nothing more: each string must RESOLVE to the identical expression tree
(so the registered dedup queries kept their exact semantics when they
switched — the simhash32_sql precedent and contract), and the arrays must
be value-equal on the fixture corpus. The Column forms stay as the
executable spec."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.operators import dedup as D
from tests.conftest import TEST_SF_DIR


def _normalized_analyzed(df) -> str:
    p = df._jdf.queryExecution().analyzed().toString()
    p = re.sub(r"lambda '?[A-Za-z_]+\d*", "lambda V", p)
    p = re.sub(r"#\d+", "#N", p)
    return p


def _docs(spark):
    return spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.mark.parametrize("n", [3, 8])
def test_hashed_shingles_twin_tree_identical(spark, n):
    docs = _docs(spark)
    col_form = docs.select(D.hashed_shingles(F.col("text"), n=n).alias("g"))
    sql_form = docs.select(F.expr(D.hashed_shingles_sql("text", n=n)).alias("g"))
    assert _normalized_analyzed(col_form) == _normalized_analyzed(sql_form)


def test_minhash_sig_twin_tree_identical(spark):
    docs = _docs(spark)
    col_form = docs.select(
        D.minhash_sig_from_hashes(D.hashed_shingles(F.col("text"))).alias("s")
    )
    sql_form = docs.select(
        F.expr(
            D.minhash_sig_from_hashes_sql(D.hashed_shingles_sql("text"))
        ).alias("s")
    )
    assert _normalized_analyzed(col_form) == _normalized_analyzed(sql_form)


def test_twin_results_value_equal(spark):
    docs = _docs(spark)
    col_rows = {
        r.doc_id: (r.g, r.s)
        for r in docs.select(
            "doc_id",
            D.hashed_shingles(F.col("text")).alias("g"),
            D.minhash_sig_from_hashes(D.hashed_shingles(F.col("text"))).alias("s"),
        ).collect()
    }
    sql_rows = {
        r.doc_id: (r.g, r.s)
        for r in docs.select(
            "doc_id",
            F.expr(D.hashed_shingles_sql("text")).alias("g"),
            F.expr(
                D.minhash_sig_from_hashes_sql(D.hashed_shingles_sql("text"))
            ).alias("s"),
        ).collect()
    }
    assert col_rows == sql_rows
    assert len(col_rows) == docs.count()
