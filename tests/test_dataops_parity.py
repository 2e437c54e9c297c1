"""Independent-reference parity tests for the data-ops batch (pure Python
third implementations; see test_curation_parity.py)."""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
import pandas as pd

from talkinghead_datapipeline_spark.queries import all_queries

_SPECS = all_queries()


def _snap_h(key: int) -> int:
    return int(hashlib.md5(f"snap|{key}".encode()).hexdigest()[:8], 16) % 20


def test_psi_vs_numpy(spark, sf_dir):
    orders = (
        duckdb.connect()
        .execute(f"SELECT o_orderkey, o_totalprice FROM '{sf_dir}/orders.parquet'")
        .fetchdf()
    )
    v1 = orders.o_totalprice.to_numpy()
    h = orders.o_orderkey.map(_snap_h)
    v2 = np.concatenate(
        [
            np.where(h[h != 0] == 1, orders.o_totalprice[h != 0] + 1.5,
                     orders.o_totalprice[h != 0]),
            orders.o_totalprice[h == 2].to_numpy(),
        ]
    )
    # numpy linear-interpolation quantiles == SQL quantile_cont
    cuts = np.quantile(v1, [i / 10 for i in range(1, 10)], method="linear")

    def bins(v):
        b = 1 + (v[:, None] > cuts[None, :]).sum(axis=1)
        return {i: int((b == i).sum()) for i in range(1, 11)}

    b1, b2 = bins(v1), bins(np.asarray(v2))
    got = _SPECS["psi_snapshot_drift"].spark(spark, sf_dir).toPandas()
    assert len(got) == sum(1 for i in b1 if b1[i] and b2.get(i))
    for _, r in got.iterrows():
        i = int(r.bin)
        p1, p2 = b1[i] / len(v1), b2[i] / len(v2)
        assert int(r.n_ref) == b1[i] and int(r.n_cur) == b2[i]
        assert abs(r.psi_term - (p2 - p1) * math.log(p2 / p1)) < 1e-6


def test_fk_audit_vs_python(spark, sf_dir):
    con = duckdb.connect()
    li = con.execute(f"SELECT l_orderkey FROM '{sf_dir}/lineitem.parquet'").fetchdf()
    orders = con.execute(
        f"SELECT o_orderkey, o_custkey FROM '{sf_dir}/orders.parquet'"
    ).fetchdf()
    cust = set(
        con.execute(f"SELECT c_custkey FROM '{sf_dir}/customer.parquet'")
        .fetchdf()
        .c_custkey
    )
    v2_keys = {k for k in orders.o_orderkey if _snap_h(k) != 0}
    got = (
        _SPECS["fk_integrity_audit"]
        .spark(spark, sf_dir)
        .toPandas()
        .set_index("relation")
    )
    r = got.loc["lineitem->orders_v2"]
    orphans = int((~li.l_orderkey.isin(v2_keys)).sum())
    assert int(r.n_children) == len(li) and int(r.n_orphans) == orphans
    r = got.loc["orders->customer"]
    assert int(r.n_children) == len(orders)
    assert int(r.n_orphans) == int((~orders.o_custkey.isin(cust)).sum())


def test_asof_forward_vs_pandas(spark, sf_dir):
    ev = (
        duckdb.connect()
        .execute(
            "SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us"
            f" FROM '{sf_dir}/events.parquet' ORDER BY user_id, event_id"
        )
        .fetchdf()
    )
    want = {}
    for _, grp in ev.groupby("user_id"):
        rows = grp.to_dict("records")
        for i, r in enumerate(rows):
            if r["event_type"] != "purchase":
                continue
            nxt = next(
                (x for x in rows[i + 1 :] if x["event_type"] == "view"), None
            )
            ok = nxt is not None and nxt["us"] - r["us"] <= 1_800_000_000
            want[r["event_id"]] = (
                round(nxt["value"], 2) if ok else None,
                int(ok),
            )
    got = _SPECS["asof_next_view_tolerance"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        nv, flag = want[int(r.event_id)]
        assert int(r.within_tolerance) == flag, r.event_id
        if flag:
            assert abs(r.next_view_value - nv) < 1e-9
        else:
            assert pd.isna(r.next_view_value)


def test_transition_matrix_vs_python(spark, sf_dir):
    ev = (
        duckdb.connect()
        .execute(
            "SELECT event_id, user_id, event_type"
            f" FROM '{sf_dir}/events.parquet' ORDER BY user_id, event_id"
        )
        .fetchdf()
    )
    from collections import Counter

    cnt: Counter = Counter()
    for _, grp in ev.groupby("user_id"):
        types = grp.event_type.tolist()
        for a, b in zip(types, types[1:]):
            cnt[(a, b)] += 1
    tot: Counter = Counter()
    for (a, _), n in cnt.items():
        tot[a] += n
    got = _SPECS["event_transition_matrix"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(cnt)
    for _, r in got.iterrows():
        n = cnt[(r.cur, r.nxt)]
        assert int(r.n) == n
        assert abs(r.p_next - n / tot[r.cur]) < 1e-6
