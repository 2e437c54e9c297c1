"""Independent-reference parity tests for the stats/forensics batch
(scipy-free pure Python / numpy; see test_curation_parity.py)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np

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
