"""Cross-engine differential tests for scalar/window primitives that new
queries assume behave identically in Spark and DuckDB — fuzzed beyond the
fixture data so the assumption is tested where the fixtures never go.

- levenshtein: IDENTICAL on ASCII (what fuzzy_part_match_pairs relies on),
  but DIVERGENT on non-ASCII — DuckDB measures UTF-8 BYTES while Spark
  measures code points. Both facts are pinned here so a future non-ASCII
  entity corpus can't silently inherit the ASCII-only assumption.
- ntile: rfm_segments assumes identical bucket-boundary placement under a
  total order for every (n_rows % n_tiles) remainder class.
"""

from __future__ import annotations

import random
import string

import duckdb
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _lev(a, b) -> int:
    """Reference code-point/element Levenshtein (works on str or bytes)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _duck_lev(pdf: pd.DataFrame) -> list[int]:
    con = duckdb.connect()
    con.register("pairs", pdf)
    return [r[0] for r in con.execute("SELECT levenshtein(a, b) FROM pairs").fetchall()]


def test_levenshtein_matches_duckdb_ascii(spark):
    """On ASCII inputs — the fuzzy_part_match_pairs domain — Spark and
    DuckDB agree exactly (both equal the reference DP)."""
    rng = random.Random(17)
    alphabet = string.ascii_lowercase + " "
    pairs = [
        (
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12))),
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12))),
        )
        for _ in range(300)
    ] + [("", ""), ("", "abc"), ("abc", ""), ("same", "same")]
    pdf = pd.DataFrame(pairs, columns=["a", "b"])
    got = (
        spark.createDataFrame(pdf)
        .select(F.levenshtein("a", "b").alias("lev"))
        .toPandas()["lev"]
        .tolist()
    )
    want = [_lev(a, b) for a, b in pairs]
    assert got == want
    assert _duck_lev(pdf) == want


def test_levenshtein_divergence_pinned_non_ascii(spark):
    """KNOWN CROSS-ENGINE DIVERGENCE (discovered by this fuzz): DuckDB's
    levenshtein runs over UTF-8 BYTES, Spark's over code points. On
    non-ASCII input the two engines disagree, so any future fuzzy-match
    query over non-ASCII entities must normalize (e.g. hash to codepoint
    arrays) or keep an ASCII guard. Pin both behaviors so the divergence
    is a documented fact, not a surprise."""
    pairs = [("", "漢字"), ("é", "e"), ("naïve", "naive"), ("漢字", "漢")]
    pdf = pd.DataFrame(pairs, columns=["a", "b"])
    spark_got = (
        spark.createDataFrame(pdf)
        .select(F.levenshtein("a", "b").alias("lev"))
        .toPandas()["lev"]
        .tolist()
    )
    assert spark_got == [_lev(a, b) for a, b in pairs]  # code points
    assert _duck_lev(pdf) == [
        _lev(a.encode(), b.encode()) for a, b in pairs
    ]  # bytes
    assert spark_got != _duck_lev(pdf)  # the divergence itself


def test_ntile_matches_duckdb_all_remainders(spark):
    """ntile(5) for every row-count remainder 0..4 (bucket-size placement
    of the extra rows is the part engines could plausibly differ on)."""
    con = duckdb.connect()
    for n in (5, 6, 7, 8, 9, 23, 100):
        pdf = pd.DataFrame({"k": list(range(n))})
        got = (
            spark.createDataFrame(pdf)
            .select("k", F.ntile(5).over(W.orderBy("k")).alias("t"))
            .toPandas()
            .sort_values("k")["t"]
            .tolist()
        )
        con.register("t", pdf)
        want = [
            r[0]
            for r in con.execute(
                "SELECT ntile(5) OVER (ORDER BY k) FROM t ORDER BY k"
            ).fetchall()
        ]
        assert got == want, f"n={n}"
