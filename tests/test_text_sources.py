"""JSONL/CSV ingestion: explicit-schema readers with the corrupt-record
error channel (sources/text.py), round-tripped through the writers."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from talkinghead_datapipeline_spark.sources.text import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)

_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def test_jsonl_reader_splits_good_from_corrupt(spark):
    with tempfile.TemporaryDirectory(prefix="thdp_jsonl_") as d:
        p = os.path.join(d, "shard.jsonl")
        with open(p, "w") as f:
            f.write('{"doc_id": 1, "text": "hello", "lang": "en"}\n')
            f.write('{"doc_id": 2, "text": "welt", "lang": "de"}\n')
            f.write("{this is not json at all\n")
            f.write('{"doc_id": "NOT_A_NUMBER", "text": "x", "lang": "en"}\n')
        good, errors = read_jsonl(spark, p, _SCHEMA)
        rows = sorted(good.collect(), key=lambda r: r.doc_id)
        assert [r.doc_id for r in rows] == [1, 2]
        assert rows[0].text == "hello" and rows[1].lang == "de"
        errs = [r.raw_line for r in errors.collect()]
        assert len(errs) == 2
        assert any("not json" in e for e in errs)
        # the good branch must not carry the corrupt column
        assert "_corrupt_record" not in good.columns


def test_jsonl_round_trip(spark):
    with tempfile.TemporaryDirectory(prefix="thdp_jsonl_rt_") as d:
        src = spark.createDataFrame(
            [(1, "a", "en"), (2, "b", "de")], schema=_SCHEMA
        )
        out = os.path.join(d, "out")
        write_jsonl(src, out)
        good, errors = read_jsonl(spark, out, _SCHEMA)
        assert errors.count() == 0
        assert sorted((r.doc_id, r.text, r.lang) for r in good.collect()) == [
            (1, "a", "en"),
            (2, "b", "de"),
        ]


def test_csv_reader_error_channel_and_round_trip(spark):
    with tempfile.TemporaryDirectory(prefix="thdp_csv_") as d:
        p = os.path.join(d, "shard.csv")
        with open(p, "w") as f:
            f.write("doc_id,text,lang\n")
            f.write("1,hello,en\n")
            f.write("oops,not_a_long,de\n")
            f.write("3,welt,de\n")
        good, errors = read_csv(spark, p, _SCHEMA)
        assert sorted(r.doc_id for r in good.collect()) == [1, 3]
        assert errors.count() == 1
        out = os.path.join(d, "out")
        write_csv(good, out)
        good2, errors2 = read_csv(spark, out, _SCHEMA)
        assert errors2.count() == 0
        assert sorted(r.doc_id for r in good2.collect()) == [1, 3]


def test_jsonl_good_branch_prunes_corrupt_column(spark):
    """Plan check: the good branch's scan must not read _corrupt_record —
    the error channel is free for clean rows."""
    with tempfile.TemporaryDirectory(prefix="thdp_jsonl_plan_") as d:
        p = os.path.join(d, "shard.jsonl")
        with open(p, "w") as f:
            f.write('{"doc_id": 1, "text": "a", "lang": "en"}\n')
        good, _ = read_jsonl(spark, p, _SCHEMA)
        projected = good.select("doc_id")
        plan = projected._jdf.queryExecution().executedPlan().toString()
        assert "ReadSchema" in plan


def test_counts_work_on_both_branches(spark):
    """The native corrupt-record column forbids exactly this (`count()`
    collapses the referenced set to the corrupt column); the text-scan
    re-parse design must support it on both branches."""
    with tempfile.TemporaryDirectory(prefix="thdp_jsonl_cnt_") as d:
        p = os.path.join(d, "s.jsonl")
        with open(p, "w") as f:
            f.write('{"doc_id": 1, "text": "ok", "lang": "en"}\n')
            f.write("not json\n")
        good, errors = read_jsonl(spark, p, _SCHEMA)
        assert good.count() == 1
        assert errors.count() == 1
