"""Property-based (hypothesis + DuckDB-only) fuzz of the r11-staged
statistics whose correctness rests on a nontrivial identity — the same
pattern as test_staged_oracle_props.py: the Spark side equals the oracle
SQL by the staged parity tests, so fuzzing the ORACLE pins the identity
for both engines at hypothesis scale without a Spark job per example.

- the KS sup-distance prefix formula max |F1·n2 − F2·n1| vs the O(n²)
  brute force on random tied multisets, including the smallest-witness
  tiebreak;
- the isotonic minimax identity max_{j<=i} min_{k>=i} avg(j..k) vs an
  exact Fraction-arithmetic pool-adjacent-violators on random (n, pos)
  score patterns.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


def _docs_con(pdf: pd.DataFrame) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


# --- KS two-sample ---------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 1)),
        min_size=2,
        max_size=60,
    ).filter(lambda xs: any(y == 1 for _, y in xs) and any(y == 0 for _, y in xs))
)
def test_ks_prefix_formula_matches_bruteforce(scores_labels):
    from talkinghead_datapipeline_spark.queries.stats_tests import (
        KS_TWO_SAMPLE_ORACLE,
    )

    pdf = pd.DataFrame(scores_labels, columns=["n_chars", "y"])
    pdf["lang"] = pdf["y"].map({1: "en", 0: "de"})
    pdf["doc_id"] = range(len(pdf))
    con = _docs_con(pdf)
    n1, n2, d_num, d_ppm, at_score = con.execute(KS_TWO_SAMPLE_ORACLE).fetchone()
    con.close()

    a = sorted(s for s, y in scores_labels if y == 1)
    b = sorted(s for s, y in scores_labels if y == 0)
    assert (n1, n2) == (len(a), len(b))
    best, witness = -1, None
    for x in sorted(set(a) | set(b)):
        f1 = sum(1 for v in a if v <= x)
        f2 = sum(1 for v in b if v <= x)
        d = abs(f1 * len(b) - f2 * len(a))
        if d > best:  # strict: first maximizer = smallest witness score
            best, witness = d, x
    assert d_num == best
    assert at_score == witness
    assert d_ppm == best * 1_000_000 // (len(a) * len(b))


# --- Isotonic minimax == PAV -----------------------------------------------


def _pav(ns: list[int], ps: list[int]) -> list[Fraction]:
    blocks: list[list[int]] = []
    for n, p in zip(ns, ps):
        blocks.append([n, p])
        while len(blocks) > 1 and (
            Fraction(blocks[-2][1], blocks[-2][0])
            > Fraction(blocks[-1][1], blocks[-1][0])
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
    out: list[Fraction] = []
    i = 0
    for n, p in blocks:
        taken = 0
        while taken < n:
            taken += ns[i]
            out.append(Fraction(p, n))
            i += 1
    return out


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.integers(0, 6)),
        min_size=1,
        max_size=12,
    ).map(lambda xs: [(n, min(p, n)) for n, p in xs])
)
def test_isotonic_minimax_matches_exact_pav(pattern):
    from talkinghead_datapipeline_spark.queries.mlstats import (
        ISOTONIC_CALIBRATION_ORACLE,
    )

    rows = []
    doc = 0
    for score, (n, p) in enumerate(pattern):
        for i in range(n):
            rows.append(
                {
                    "doc_id": doc,
                    "text": "x",
                    "lang": "en" if i < p else "de",
                    "source": "s",
                    "n_chars": 100 + score,  # n_chars % 100 == score
                }
            )
            doc += 1
    con = _docs_con(pd.DataFrame(rows))
    out = con.execute(ISOTONIC_CALIBRATION_ORACLE).fetchall()
    con.close()

    ns = [n for n, _ in pattern]
    ps = [p for _, p in pattern]
    fits = _pav(ns, ps)
    assert len(out) == len(pattern)
    for (score, n, pos, emp_ppm, iso_ppm), f, want_n, want_p in zip(
        out, fits, ns, ps
    ):
        assert (n, pos) == (want_n, want_p)
        assert emp_ppm == pos * 1_000_000 // n
        # the minimax double sits within ulps of the exact PAV rational
        assert abs(iso_ppm / 1e6 - float(f)) < 2e-6
    # monotone and conserving
    isos = [r[4] for r in out]
    assert all(a <= b for a, b in zip(isos, isos[1:]))
    assert sum(Fraction(n) * f for n, f in zip(ns, fits)) == sum(ps)
