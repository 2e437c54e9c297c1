"""Property-based (hypothesis + DuckDB-only) fuzz of the two staged
statistics whose correctness rests on a nontrivial identity, not just on
cross-engine agreement:

- the AUC rank identity 2*Σ(pos ranks with average-rank ties) − P(P+1)
  == 2*#{pos > neg} + #{pos == neg}, fuzzed against the O(P*N)
  pairwise definition on random tied multisets;
- the Nelson-Aalen risk-set algebra (total-minus-prefix n_at_risk,
  per-step floor-ppm hazard, exact cumulative), fuzzed against a direct
  per-time recomputation on random censored observation sets.

The Spark side equals the oracle SQL by the staged parity tests, so
fuzzing the ORACLE pins the identity for both engines at hypothesis
scale (hundreds of adversarial multisets) without paying a Spark job
per example.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


def _auc_oracle(scores_labels: list[tuple[int, int]]) -> tuple:
    con = duckdb.connect()
    pdf = pd.DataFrame(scores_labels, columns=["n_chars", "y"])
    pdf["lang"] = pdf["y"].map({1: "en", 0: "de"})
    pdf["doc_id"] = range(len(pdf))
    con.register("documents", pdf)
    from talkinghead_datapipeline_spark.queries.mlstats import (
        AUC_MANN_WHITNEY_ORACLE,
    )

    row = con.execute(AUC_MANN_WHITNEY_ORACLE).fetchone()
    con.close()
    return row  # (n_pos, n_neg, two_u, auc_ppm)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 1)),
        min_size=1,
        max_size=60,
    )
)
def test_auc_rank_identity_matches_pairwise(scores_labels):
    n_pos, n_neg, two_u, auc_ppm = _auc_oracle(scores_labels)
    pos = [s for s, y in scores_labels if y == 1]
    neg = [s for s, y in scores_labels if y == 0]
    assert n_pos == len(pos) and n_neg == len(neg)
    gt = sum(1 for p in pos for n in neg if p > n)
    eq = sum(1 for p in pos for n in neg if p == n)
    assert two_u == 2 * gt + eq
    if pos and neg:
        assert auc_ppm == (two_u * 1_000_000) // (2 * len(pos) * len(neg))
    else:
        assert auc_ppm is None


def _survival_oracle(users: list[tuple[int, bool]]) -> list[tuple]:
    """users: (t_hours, converted). Build a synthetic events frame where
    each user starts at µs 0 and either purchases at t_hours (event) or
    has a last view at t_hours (censored)."""
    H = 3_600_000_000
    rows = []
    eid = 0
    for uid, (t, conv) in enumerate(users):
        eid += 1
        rows.append((eid, uid, "view", 0))
        eid += 1
        rows.append((eid, uid, "purchase" if conv else "view", t * H))
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "us"])
    con = duckdb.connect()
    con.register("raw", pdf)
    con.execute(
        "CREATE VIEW events AS SELECT event_id, user_id, event_type, "
        "make_timestamp(us) AS ts, 1.0 AS value FROM raw"
    )
    from talkinghead_datapipeline_spark.queries.behavior import (
        NELSON_AALEN_ORACLE,
    )

    out = con.execute(NELSON_AALEN_ORACLE).fetchall()
    con.close()
    return out


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.booleans()),
        min_size=1,
        max_size=40,
    )
)
def test_survival_risk_sets_match_direct_recomputation(users):
    out = _survival_oracle(users)
    # direct recomputation: observed time = t for everyone (event or
    # censor); events only where converted
    cum = 0
    expect = []
    for t in sorted({t for t, conv in users if conv}):
        d = sum(1 for tt, conv in users if conv and tt == t)
        n = sum(1 for tt, _ in users if tt >= t)
        h = (d * 1_000_000) // n
        cum += h
        expect.append((t, d, n, h, cum))
    assert [tuple(r) for r in out] == expect
