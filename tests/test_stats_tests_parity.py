"""Independent-reference parity tests for the stats/forensics batch
(scipy-free pure Python / numpy; see test_curation_parity.py)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np
import pandas as pd

from talkinghead_datapipeline_spark.queries import all_queries

_SPECS = all_queries()


def test_chi2_cells_vs_python(spark, sf_dir):
    docs = (
        duckdb.connect()
        .execute(
            f"SELECT lang, source FROM '{sf_dir}/documents.parquet'"
            " WHERE len(text) > 0"
        )
        .fetchdf()
    )
    obs = Counter(zip(docs.lang, docs.source))
    rowt = Counter(docs.lang)
    colt = Counter(docs.source)
    t = len(docs)
    got = _SPECS["chi2_lang_source_cells"].spark(spark, sf_dir).toPandas()
    # DENSE grid: every (lang, source) cell, including zero-observed ones
    assert len(got) == len(rowt) * len(colt)
    chi2_spark = 0.0
    for _, r in got.iterrows():
        o = obs.get((r.lang, r.source), 0)
        e = rowt[r.lang] * colt[r.source] / t
        assert int(r.observed) == o
        assert abs(r.expected - e) < 1e-5
        assert abs(r.chi2_term - (o - e) ** 2 / e) < 1e-5
        chi2_spark += r.chi2_term
    # Pearson statistic over the FULL grid (zero cells contribute E)
    want = sum(
        (obs.get((l, c), 0) - rowt[l] * colt[c] / t) ** 2 / (rowt[l] * colt[c] / t)
        for l in rowt
        for c in colt
    )
    assert abs(chi2_spark - want) < 1e-3


def test_benford_vs_python(spark, sf_dir):
    orders = (
        duckdb.connect()
        .execute(
            f"SELECT o_totalprice FROM '{sf_dir}/orders.parquet'"
            " WHERE o_totalprice >= 1"
        )
        .fetchdf()
    )
    digits = Counter(str(int(math.floor(v)))[0] for v in orders.o_totalprice)
    t = sum(digits.values())
    got = (
        _SPECS["benford_first_digit"]
        .spark(spark, sf_dir)
        .toPandas()
        .set_index("digit")
    )
    assert len(got) == len(digits)
    for dstr, n in digits.items():
        row = got.loc[int(dstr)]
        assert int(row.n) == n
        assert abs(row.observed_p - n / t) < 1e-6
        assert abs(row.benford_p - math.log10(1 + 1 / int(dstr))) < 1e-6


def test_histogram_vs_numpy(spark, sf_dir):
    v = (
        duckdb.connect()
        .execute(f"SELECT o_totalprice FROM '{sf_dir}/orders.parquet'")
        .fetchdf()
        .o_totalprice.to_numpy(dtype=np.float64)
    )
    lo, hi = v.min(), v.max()
    width = (hi - lo) / 20
    bins = np.minimum(np.floor((v - lo) / width).astype(int), 19)
    counts = Counter(bins)
    got = (
        _SPECS["histogram_fixed_width"]
        .spark(spark, sf_dir)
        .toPandas()
        .sort_values("bin")
    )
    assert len(got) == 20  # DENSE spine: every bin present
    for _, r in got.iterrows():
        assert int(r.n_rows) == counts.get(int(r.bin), 0)
        assert abs(r.bin_lo - (lo + int(r.bin) * width)) < 1e-4
        assert abs(r.bin_hi - (lo + (int(r.bin) + 1) * width)) < 1e-4
    assert int(got.n_rows.sum()) == len(v)


def test_frequent_trigrams_vs_python(spark, sf_dir):
    ev = (
        duckdb.connect()
        .execute(
            "SELECT event_id, user_id, event_type"
            f" FROM '{sf_dir}/events.parquet' ORDER BY user_id, event_id"
        )
        .fetchdf()
    )
    cnt: Counter = Counter()
    for _, grp in ev.groupby("user_id"):
        t = grp.event_type.tolist()
        for a, b, c in zip(t, t[1:], t[2:]):
            cnt[(a, b, c)] += 1
    tot = sum(cnt.values())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = _SPECS["frequent_event_trigrams"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(top)
    for row, ((a, b, c), n) in zip(got.itertuples(), top):
        assert (row.e1, row.e2, row.e3, int(row.n)) == (a, b, c, n)
        assert abs(row.support - n / tot) < 1e-6


def test_mode_per_segment_vs_python(spark, sf_dir):
    cust = (
        duckdb.connect()
        .execute(
            f"SELECT c_mktsegment, c_nationkey FROM '{sf_dir}/customer.parquet'"
        )
        .fetchdf()
    )
    got = (
        _SPECS["mode_nation_per_segment"]
        .spark(spark, sf_dir)
        .toPandas()
        .set_index("c_mktsegment")
    )
    for seg, grp in cust.groupby("c_mktsegment"):
        c = Counter(grp.c_nationkey)
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        row = got.loc[seg]
        assert (int(row.mode_nationkey), int(row.mode_count)) == (
            int(best[0]),
            best[1],
        )


def test_interarrival_vs_python(spark, sf_dir):
    rows = (
        duckdb.connect()
        .execute(
            "SELECT o.o_custkey, o.o_orderkey, o.o_orderdate, c.c_mktsegment"
            f" FROM '{sf_dir}/orders.parquet' o"
            f" JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = o.o_custkey"
            " ORDER BY o.o_custkey, o.o_orderdate, o.o_orderkey"
        )
        .fetchdf()
    )
    gaps: dict[str, list] = {}
    for _, grp in rows.groupby("o_custkey"):
        seg = grp.c_mktsegment.iloc[0]
        dates = grp.o_orderdate.tolist()
        for a, b in zip(dates, dates[1:]):
            gaps.setdefault(seg, []).append((b - a).days)
    got = (
        _SPECS["order_interarrival_by_segment"]
        .spark(spark, sf_dir)
        .toPandas()
        .set_index("c_mktsegment")
    )
    for seg, g in gaps.items():
        arr = np.asarray(sorted(g), dtype=np.float64)
        row = got.loc[seg]
        assert int(row.n_gaps) == len(arr)
        assert abs(row.mean_gap_days - arr.mean()) < 1e-6
        assert abs(row.median_gap_days - np.quantile(arr, 0.5, method="linear")) < 1e-6
        assert abs(row.p95_gap_days - np.quantile(arr, 0.95, method="linear")) < 1e-6


def test_bayes_smoothed_vs_python(spark, sf_dir):
    li = (
        duckdb.connect()
        .execute(
            f"SELECT l_partkey, l_quantity FROM '{sf_dir}/lineitem.parquet'"
        )
        .fetchdf()
    )
    g = li.groupby("l_partkey").l_quantity.agg(["count", "sum"])
    gm = li.l_quantity.sum() / len(li)
    g["smoothed"] = (g["sum"] + 20 * gm) / (g["count"] + 20)
    top = g.sort_values(
        ["smoothed", "l_partkey"],
        ascending=[False, True],
        key=lambda s: s.round(6) if s.name == "smoothed" else s,
    ).head(25)
    got = _SPECS["bayes_smoothed_part_scores"].spark(spark, sf_dir).toPandas()
    assert len(got) == 25
    for row, (pk, want) in zip(got.itertuples(), top.iterrows()):
        assert row.l_partkey == pk
        assert int(row.n) == want["count"]
        assert abs(row.raw_mean - want["sum"] / want["count"]) < 1e-5
        assert abs(row.smoothed_mean - want["smoothed"]) < 1e-5


def test_revenue_mom_vs_python(spark, sf_dir):
    orders = (
        duckdb.connect()
        .execute(
            "SELECT strftime(o_orderdate, '%Y-%m') AS m, o_totalprice"
            f" FROM '{sf_dir}/orders.parquet'"
        )
        .fetchdf()
    )
    monthly = orders.groupby("m").o_totalprice.sum().round(2).sort_index()
    got = (
        _SPECS["revenue_mom_growth"].spark(spark, sf_dir).toPandas().sort_values("month")
    )
    assert got.month.tolist() == monthly.index.tolist()
    prev = None
    for row, (_, rev) in zip(got.itertuples(), monthly.items()):
        assert abs(row.revenue - rev) < 1e-6
        if prev is None:
            assert pd.isna(row.mom_growth_ppm)
        else:
            # floor-to-ppm of the cent-exact ratio (round-9 migration)
            assert abs(row.mom_growth_ppm / 1e6 - (rev - prev) / prev) < 1e-5
        prev = rev
