"""Property-based (hypothesis + DuckDB-only) fuzz of the r13-staged
statistics whose correctness rests on a nontrivial identity — the same
pattern as test_staged_oracle_props{,_r11}.py: the Spark side equals the
oracle SQL by the staged parity tests, so fuzzing the ORACLE pins the
identity for both engines at hypothesis scale without a Spark job per
example.

- the Kaplan-Meier integer product-limit recurrence vs an exact-Fraction
  product (floor-quantization bound: 0 ≤ Π·1e9 − S_ppb < n_steps) AND vs
  an independent Python integer fold (exact equality), on random
  censored observation sets pushed through the WHOLE oracle (synthetic
  events tables);
- the BH step-up contract on random document corpora: ranks are the
  (p_ppb, lang, source) order, thresholds are (rank·5e7)//m, and the
  rejected set is exactly ranks 1..k*;
- triangle/wedge/coefficient vs an O(n³) brute force on random
  order-brand co-purchase tables;
- DBSCAN grid roles vs an O(n²) brute force on random embedding tables
  (adjacency completeness incl. cell-boundary points).
"""

from __future__ import annotations

import math
from fractions import Fraction
from itertools import combinations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from talkinghead_datapipeline_spark.queries.behavior import KAPLAN_MEIER_ORACLE
from talkinghead_datapipeline_spark.queries.graph import TRIANGLE_ORACLE
from talkinghead_datapipeline_spark.queries.similarity import (
    _DBSCAN_EPS_Q,
    _DBSCAN_MINPTS,
    _DBSCAN_Q,
    DBSCAN_GRID_ORACLE,
    _dbscan_proj_weights,
)
from talkinghead_datapipeline_spark.queries.stats_tests import BH_FDR_ORACLE


# --- Kaplan-Meier ----------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.booleans()),  # (t_hours, converted)
        min_size=1,
        max_size=40,
    )
)
def test_km_recurrence_vs_exact_fraction(obs):
    base = 1_700_000_000_000_000  # epoch micros
    rows = []
    for uid, (t, ev) in enumerate(obs):
        rows.append((2 * uid, uid, "view", pd.Timestamp(base, unit="us")))
        rows.append(
            (
                2 * uid + 1,
                uid,
                "purchase" if ev else "view",
                pd.Timestamp(base + t * 3_600_000_000, unit="us"),
            )
        )
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    con = duckdb.connect()
    con.register("events", pdf)
    got = con.execute(KAPLAN_MEIER_ORACLE).fetchall()
    con.close()

    # independent fold + exact product
    from collections import Counter

    t_of = {u: t for u, (t, _) in enumerate(obs)}
    ev_of = {u: e for u, (_, e) in enumerate(obs)}
    n_here = Counter(t_of.values())
    d_ev = Counter(t for u, t in t_of.items() if ev_of[u])
    total, seen = len(obs), 0
    s_int, s_frac = 1_000_000_000, Fraction(1)
    expect = []
    for t in sorted(n_here):
        n_at_risk = total - seen
        seen += n_here[t]
        d = d_ev.get(t, 0)
        if d:
            s_int = (s_int * (n_at_risk - d)) // n_at_risk
            s_frac *= Fraction(n_at_risk - d, n_at_risk)
            expect.append((t, d, n_at_risk, s_int))
    assert got == expect
    # floor-quantization bound: each step floors once and factors are <= 1
    for i, (_, _, _, s) in enumerate(expect, start=1):
        exact = s_frac  # final only checked below; per-row via refold
    if expect:
        final = expect[-1][3]
        assert 0 <= s_frac * 1_000_000_000 - final < len(expect)


# --- Benjamini-Hochberg ----------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "fr", "de"]),
            st.sampled_from(["s1", "s2", "s3", "s4"]),
            st.integers(1, 1000),  # text length
        ),
        min_size=8,
        max_size=120,
    ).filter(
        lambda xs: len({(a, b) for a, b, _ in xs}) >= 2
        and any(n > 500 for _, _, n in xs)
    )
)
def test_bh_step_up_contract(docs):
    pdf = pd.DataFrame(
        [(i, lang, src, "x" * n) for i, (lang, src, n) in enumerate(docs)],
        columns=["doc_id", "lang", "source", "text"],
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    out = con.execute(BH_FDR_ORACLE).fetchdf()
    con.close()
    m = len(out)
    srt = out.sort_values("p_rank")
    # ranks are the (p_ppb, lang, source) total order
    keys = list(zip(srt.p_ppb, srt.lang, srt.source))
    assert keys == sorted(keys)
    assert list(srt.p_rank) == list(range(1, m + 1))
    # integer thresholds
    for r in srt.itertuples():
        assert r.bh_threshold_ppb == (r.p_rank * 50_000_000) // m
    passing = [r.p_rank for r in srt.itertuples()
               if r.p_ppb <= r.bh_threshold_ppb]
    kstar = max(passing) if passing else 0
    for r in srt.itertuples():
        assert bool(r.rejected) == (r.p_rank <= kstar)


# --- Triangles -------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 6)),  # (order, brand#)
        min_size=2,
        max_size=80,
    )
)
def test_triangle_vs_brute_force(items):
    brands = sorted({b for _, b in items})
    pdf_li = pd.DataFrame(
        [(o, b) for o, b in items], columns=["l_orderkey", "l_partkey"]
    )
    pdf_pt = pd.DataFrame(
        [(b, f"B{b:02d}") for b in brands], columns=["p_partkey", "p_brand"]
    )
    con = duckdb.connect()
    con.register("lineitem", pdf_li)
    con.register("part", pdf_pt)
    row = con.execute(TRIANGLE_ORACLE).fetchone()
    con.close()

    orders = {}
    for o, b in items:
        orders.setdefault(o, set()).add(f"B{b:02d}")
    n_orders = len(orders)
    from collections import Counter

    pair_n = Counter()
    for bs in orders.values():
        for a, b in combinations(sorted(bs), 2):
            pair_n[(a, b)] += 1
    edges = {p for p, n in pair_n.items() if n * 1000 >= 22 * n_orders}
    nodes = {v for e in edges for v in e}
    deg = Counter(v for e in edges for v in e)
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tris = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    coeff = (3 * tris * 1_000_000) // wedges if wedges else None
    assert row[:4] == (len(nodes), len(edges), tris, wedges)
    assert row[4] == coeff


# --- DBSCAN ----------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-0.25, 0.25, allow_nan=False, width=32),
            min_size=64,
            max_size=64,
        ),
        min_size=3,
        max_size=50,
    )
)
def test_dbscan_vs_brute_force(vecs):
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": 0,
        }
    )
    con = duckdb.connect()
    con.register("embeddings", pdf)
    out = con.execute(DBSCAN_GRID_ORACLE).fetchdf()
    con.close()

    w = _dbscan_proj_weights()
    emb = np.stack([np.asarray(v, dtype=np.float32).astype(np.float64)
                    for v in vecs])
    q = np.empty((len(vecs), 2), dtype=np.int64)
    for axis in range(2):
        acc = emb[:, 0] * w[axis][0]
        for k in range(1, 64):
            acc = acc + emb[:, k] * w[axis][k]
        q[:, axis] = np.floor(acc * float(_DBSCAN_Q)).astype(np.int64)
    d2 = ((q[:, None, :] - q[None, :, :]) ** 2).sum(axis=2)
    within = d2 <= _DBSCAN_EPS_Q**2
    neigh = within.sum(axis=1)
    core = neigh >= _DBSCAN_MINPTS
    border = (~core) & (within & core[None, :]).any(axis=1)
    roles = np.where(core, "core", np.where(border, "border", "noise"))
    got = {int(r.vec_id): (int(r.n_neighbors), r.role)
           for r in out.itertuples()}
    expect = {i: (int(neigh[i]), str(roles[i])) for i in range(len(vecs))}
    assert got == expect
