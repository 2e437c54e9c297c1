"""Degenerate-corpus tests (SURVEY §5.3): the edge inputs the reference
guards with runtime errors, exercised against every kernel — empty text,
sub-shingle-length text, NaN cells, empty key intersections, jaccard on
empty sets. One DataFrame per family (Spark job overhead amortized);
hypothesis generates the adversarial text corpus.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.operators import dedup as D

_EDGE_TEXTS = [
    "",
    " ",
    "a",
    "a b",
    "a b c",
    "a  b   c",
    "\t\n",
    "x" * 5000,
    "the the the",
    "ü ñ 漢 字 emoji 🙂 end",
    "a b c d e f g",
]


def test_shingles_and_ngrams_edge_corpus(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_EDGE_TEXTS)], "id int, text string"
    )
    rows = df.select(
        "id",
        "text",
        F.size(D.word_shingles(F.col("text"))).alias("n_sh"),
        F.size(D.char_ngrams(F.col("text"))).alias("n_ng"),
        D.simhash32(F.col("text")).alias("sim"),
        D.minhash_sig_array(D.word_shingles(F.col("text"))).alias("sig"),
    ).collect()
    for r in rows:
        n_tokens = len([t for t in r.text.lower().split() if t])
        # shingle count: ≤ max(0, tokens-2); equality when shingles distinct
        assert 0 <= r.n_sh <= max(0, n_tokens - 2) or r.text.strip() == ""
        assert r.n_ng >= 0
        assert 0 <= r.sim < 2**32  # simhash never errors, stays 32-bit
        assert len(r.sig) == D.N_PERM
        if r.n_sh == 0:
            assert all(v == D.MINHASH_P for v in r.sig)  # fold init survives


def test_jaccard_empty_and_identity(spark):
    df = spark.createDataFrame(
        [
            (1, ["a", "b"], ["a", "b"]),
            (2, ["a", "b"], []),
            (3, [], []),
            (4, ["a"], ["b"]),
        ],
        "id int, a array<string>, b array<string>",
    )
    rows = {r.id: r.j for r in df.select("id", D.jaccard("a", "b").alias("j")).collect()}
    assert rows[1] == 1.0
    assert rows[2] == 0.0
    assert rows[3] is None  # 0/0 → NULL via try_divide; caller filters
    assert rows[4] == 0.0


def test_key_intersection_empty_yields_empty(spark):
    """E3: disjoint inputs → empty result (the reference raises
    engine.py:32-33; declarative form yields an empty plan instead and the
    caller's row-count check is the guard)."""
    a = spark.createDataFrame([(1,), (2,)], "k bigint")
    b = spark.createDataFrame([(3,), (4,)], "k bigint")
    assert a.join(b, "k", "left_semi").count() == 0


def test_nan_guard_routes_rows(spark):
    """S11: NaN landmarks reject the clip (bboxes.py:26-29) — as a filter
    routing rows to an error channel instead of a RuntimeError."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [float("nan"), 2.0]), (3, [3.0, float("nan")])],
        "id int, lmk array<double>",
    )
    bad = df.filter(F.exists("lmk", lambda x: F.isnan(x)))
    ok = df.filter(~F.exists("lmk", lambda x: F.isnan(x)))
    assert {r.id for r in bad.collect()} == {2, 3}
    assert {r.id for r in ok.collect()} == {1}
    assert bad.count() + ok.count() == df.count()


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80),
        min_size=1,
        max_size=20,
    )
)
def test_simhash_shingle_properties_random_corpus(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    rows = df.select(
        "id",
        D.simhash32(F.col("text")).alias("sim"),
        F.size(D.word_shingles(F.col("text"))).alias("n_sh"),
    ).collect()
    for r in rows:
        assert 0 <= r.sim < 2**32
        assert r.n_sh >= 0


def test_range_join_reversed_interval_is_dropped(spark):
    """A corrupt interval with end <= start must not explode (F.sequence on a
    reversed range is DESCENDING — one bad row could produce arbitrarily many
    bin rows) and can match no point under start <= ts < end."""
    import datetime as dt

    from talkinghead_datapipeline_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    t = lambda s: dt.datetime(2024, 1, 1, 0, s)  # noqa: E731
    points = spark.createDataFrame(
        [(1, t(5)), (2, t(15))], "pid int, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (10, t(0), t(10)),       # normal: matches pid 1
            (11, t(59), t(1)),       # reversed: must vanish, not explode
            (12, t(20), t(20)),      # zero-length: matches nothing
        ],
        "iid int, start_ts timestamp, end_ts timestamp",
    )
    out = point_in_interval_join(
        points, intervals, "ts", "start_ts", "end_ts", bin_width_sec=60
    )
    got = {(r.pid, r.iid) for r in out.collect()}
    assert got == {(1, 10)}
