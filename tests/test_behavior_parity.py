"""Independent-reference parity tests for the behavior-analytics batch
(pure Python / numpy third implementations; see test_curation_parity.py
for the rationale)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from talkinghead_datapipeline_spark.queries import all_queries

_SPECS = all_queries()


def _events(sf_dir: str) -> pd.DataFrame:
    return (
        duckdb.connect()
        .execute(
            "SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,"
            f" value FROM '{sf_dir}/events.parquet'"
        )
        .fetchdf()
    )


def _ntile(keys: list, n: int) -> dict:
    """SQL ntile semantics: first (len % n) buckets get the extra row."""
    total = len(keys)
    base, extra = divmod(total, n)
    out, i = {}, 0
    for tile in range(1, n + 1):
        size = base + (1 if tile <= extra else 0)
        for k in keys[i : i + size]:
            out[k] = tile
        i += size
    return out


def test_rfm_segments_vs_python(spark, sf_dir):
    ev = _events(sf_dir)
    p = ev[ev.event_type == "purchase"]
    per = p.groupby("user_id").agg(
        last_us=("ts_us", "max"),
        freq=("event_id", "count"),
        monetary=("value", lambda s: round(s.sum(), 2)),
    )
    users = per.index.tolist()
    r = _ntile(sorted(users, key=lambda u: (-per.last_us[u], u)), 5)
    f = _ntile(sorted(users, key=lambda u: (-per.freq[u], u)), 5)
    m = _ntile(sorted(users, key=lambda u: (-per.monetary[u], u)), 5)
    want: dict[tuple, list] = {}
    for u in users:
        want.setdefault((r[u], f[u], m[u]), []).append(per.monetary[u])
    got = _SPECS["rfm_segments"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(want)
    for _, row in got.iterrows():
        seg = (row.r_tile, row.f_tile, row.m_tile)
        vals = want[seg]
        assert int(row.n_users) == len(vals)
        assert abs(row.segment_value - round(sum(vals), 2)) < 1e-6


def test_trailing_zscore_vs_pandas(spark, sf_dir):
    ev = _events(sf_dir).sort_values(["user_id", "event_id"])
    want = {}
    for uid, grp in ev.groupby("user_id"):
        v = grp.value.to_numpy()
        ids = grp.event_id.to_numpy()
        for i in range(10, len(v)):
            prev = v[i - 10 : i]
            mean, std = prev.mean(), prev.std(ddof=1)
            if std > 0.01:
                z = round((v[i] - mean) / std, 6)
                if abs(z) >= 2.0:
                    want[ids[i]] = z
    got = _SPECS["trailing_zscore_anomalies"].spark(spark, sf_dir).toPandas()
    got_map = {int(r.event_id): r.zscore for _, r in got.iterrows()}
    assert set(got_map) == set(want)
    for eid, z in want.items():
        assert abs(got_map[eid] - z) < 1e-5, eid


def test_ab_test_lift_vs_python(spark, sf_dir):
    ev = _events(sf_dir)
    per = ev.groupby("user_id").apply(
        lambda g: (g.event_type == "purchase").sum(), include_groups=False
    )
    stats = {}
    for cohort in (0, 1):
        cnts = per[per.index % 2 == cohort]
        stats[cohort] = (len(cnts), int((cnts >= 14).sum()))
    (n0, c0), (n1, c1) = stats[0], stats[1]
    pool = (c0 + c1) / (n0 + n1)
    z = (c1 / n1 - c0 / n0) / math.sqrt(
        pool * (1 - pool) * (1 / n0 + 1 / n1)
    )
    got = _SPECS["ab_test_lift"].spark(spark, sf_dir).toPandas().iloc[0]
    assert (got.n_control, got.conv_control) == (n0, c0)
    assert (got.n_treatment, got.conv_treatment) == (n1, c1)
    assert abs(got.z_stat - z) < 1e-5


def test_knn_mutual_edges_vs_numpy(spark, sf_dir):
    pdf = (
        duckdb.connect()
        .execute(
            f"SELECT vec_id, embedding, label FROM '{sf_dir}/embeddings.parquet'"
            " ORDER BY vec_id"
        )
        .fetchdf()
    )
    ids = pdf.vec_id.to_numpy()
    vecs = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    labels = pdf.label.to_numpy()
    knn: dict[int, set] = {}
    for lab in np.unique(labels):
        m = labels == lab
        lid, lv = ids[m], vecs[m]
        nrm = np.sqrt((lv * lv).sum(axis=1))
        cos = np.round((lv @ lv.T) / np.outer(nrm, nrm), 6)
        for i in range(len(lid)):
            order = sorted(
                (j for j in range(len(lid)) if j != i),
                key=lambda j: (-cos[i, j], lid[j]),
            )[:5]
            knn[int(lid[i])] = {int(lid[j]) for j in order}
    want = {
        (a, b)
        for a, nb in knn.items()
        for b in nb
        if a < b and a in knn[b]
    }
    got = _SPECS["knn_mutual_edges"].spark(spark, sf_dir).toPandas()
    got_pairs = {(int(r.key_a), int(r.key_b)) for _, r in got.iterrows()}
    assert got_pairs == want


def test_rolling_mad_vs_python(spark, sf_dir):
    ev = _events(sf_dir).sort_values(["user_id", "event_id"])
    want = {}
    for uid, grp in ev.groupby("user_id"):
        v = grp.value.to_numpy()
        ids = grp.event_id.to_numpy()
        for i in range(10, len(v)):
            prev = np.sort(v[i - 10 : i])
            med = (prev[4] + prev[5]) / 2
            devs = np.sort(np.abs(prev - med))
            mad = (devs[4] + devs[5]) / 2
            if mad > 0.01:
                rz = round((v[i] - med) / (1.4826 * mad), 6)
                if abs(rz) >= 3.0:
                    want[ids[i]] = rz
    got = _SPECS["rolling_mad_anomalies"].spark(spark, sf_dir).toPandas()
    got_map = {int(r.event_id): r.robust_z for _, r in got.iterrows()}
    assert set(got_map) == set(want)
    for eid, z in want.items():
        assert abs(got_map[eid] - z) < 1e-5, eid


def test_cumulative_unique_users_vs_python(spark, sf_dir):
    ev = _events(sf_dir)
    ev["day"] = pd.to_datetime(ev.ts_us, unit="us").dt.strftime("%Y-%m-%d")
    first = ev.groupby("user_id").day.min()
    daily = first.value_counts().sort_index()
    got = (
        _SPECS["cumulative_unique_users"]
        .spark(spark, sf_dir)
        .toPandas()
        .sort_values("day")
    )
    assert got.day.tolist() == daily.index.tolist()
    assert got.n_new.tolist() == daily.tolist()
    assert got.cum_users.tolist() == daily.cumsum().tolist()
    assert int(got.cum_users.iloc[-1]) == ev.user_id.nunique()


def test_churn_flags_vs_python(spark, sf_dir):
    ev = _events(sf_dir)
    max_us = ev.ts_us.max()
    cutoff = max_us - 7 * 24 * 3600 * 1_000_000
    last = ev.groupby("user_id").ts_us.max()
    got = (
        _SPECS["churn_flags_by_cohort"]
        .spark(spark, sf_dir)
        .toPandas()
        .set_index("cohort")
    )
    for cohort in (0, 1):
        sel = last[last.index % 2 == cohort]
        churned = int((sel < cutoff).sum())
        row = got.loc[cohort]
        assert int(row.n_users) == len(sel)
        assert int(row.n_churned) == churned
        assert abs(row.churn_rate - churned / len(sel)) < 1e-6


def test_diurnal_profile_vs_python(spark, sf_dir):
    ev = _events(sf_dir)
    hours = pd.to_datetime(ev.ts_us, unit="us").dt.hour
    counts = hours.value_counts().sort_index()
    got = (
        _SPECS["diurnal_activity_profile"]
        .spark(spark, sf_dir)
        .toPandas()
        .set_index("hour_of_day")
        .sort_index()
    )
    assert got.index.tolist() == counts.index.tolist()
    assert got.n_events.tolist() == counts.tolist()
    assert abs(got.share.sum() - 1.0) < 1e-4
    # busy_rank is a permutation of 1..n_hours
    assert sorted(got.busy_rank) == list(range(1, len(got) + 1))
