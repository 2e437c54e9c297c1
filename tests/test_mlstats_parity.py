"""Independent-reference parity tests for the ML-sufficient-statistics
batch (numpy third implementations; see test_curation_parity.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from talkinghead_datapipeline_spark.queries import all_queries

_SPECS = all_queries()


def test_ols_vs_numpy_lstsq(spark, sf_dir):
    """Cramer's-rule coefficients must match numpy's least-squares solve
    of the same design matrix."""
    li = (
        duckdb.connect()
        .execute(
            "SELECT l_quantity, l_discount, l_extendedprice"
            f" FROM '{sf_dir}/lineitem.parquet'"
        )
        .fetchdf()
    )
    X = np.column_stack(
        [
            np.ones(len(li)),
            li.l_quantity.to_numpy(dtype=np.float64),
            li.l_discount.to_numpy(dtype=np.float64),
        ]
    )
    y = li.l_extendedprice.to_numpy(dtype=np.float64)
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    got = _SPECS["ols_normal_equations"].spark(spark, sf_dir).toPandas().iloc[0]
    assert int(got.n_rows) == len(li)
    for g, w in zip((got.beta0, got.beta1, got.beta2), beta):
        assert abs(g - w) < 1e-4, (g, w)


def test_covariance_vs_numpy(spark, sf_dir):
    pdf = (
        duckdb.connect()
        .execute(f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id")
        .fetchdf()
    )
    X = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    C = np.cov(X, rowvar=False, ddof=1)
    got = _SPECS["emb_covariance_upper"].spark(spark, sf_dir).toPandas()
    assert len(got) == 64 * 65 // 2
    for _, r in got.iterrows():
        want = round(C[int(r["i"]) - 1, int(r["j"]) - 1], 6)
        # r["cov"]: attribute access collides with Series.cov
        assert abs(r["cov"] - want) < 1e-6, (r["i"], r["j"])
    # the matrix this feeds must be symmetric PSD (the PCA precondition)
    assert np.all(np.linalg.eigvalsh((C + C.T) / 2) > -1e-9)


def test_covariance_cells_sit_clear_of_round6_boundary(sf_dir):
    """Boundary-distance check (ADVICE r7): emb_covariance_upper's hash
    stability under layout-dependent double partial sums rests on every
    cell sitting FAR from a round(,6) boundary relative to accumulation-
    order ULP noise. Pin the margin: the fractional part of |cov|*1e6
    must be > 1e-4 away from the 0.5 rounding boundary for every cell —
    ~1e6x the worst observed partial-sum perturbation (~1e-10 relative),
    so no re-partitioning can move a cell across. If a larger SF is ever
    certified, this test re-derives the margin there automatically."""
    pdf = (
        duckdb.connect()
        .execute(f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id")
        .fetchdf()
    )
    X = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    C = np.cov(X, rowvar=False, ddof=1)
    cells = C[np.triu_indices(C.shape[0])]
    frac = np.abs(cells) * 1e6 % 1.0
    dist = np.abs(frac - 0.5)
    assert dist.min() > 1e-4, (
        f"a covariance cell sits {dist.min():.2e} from the round(,6) "
        "boundary — layout ULP noise could flip it; migrate to an exact "
        "accumulation before certifying this SF"
    )


def test_time_to_convert_vs_python(spark, sf_dir):
    ev = (
        duckdb.connect()
        .execute(
            "SELECT event_id, user_id, event_type, epoch_us(ts) AS us"
            f" FROM '{sf_dir}/events.parquet' ORDER BY user_id, event_id"
        )
        .fetchdf()
    )
    deltas = []
    for _, grp in ev.groupby("user_id"):
        last_view = None
        for r in grp.itertuples():
            if r.event_type == "purchase" and last_view is not None:
                deltas.append(r.us - last_view)
            if r.event_type == "view":
                last_view = r.us
    d = np.asarray(sorted(deltas), dtype=np.float64)
    got = _SPECS["time_to_convert_stats"].spark(spark, sf_dir).toPandas().iloc[0]
    assert int(got.n_conversions) == len(d)
    assert abs(got.mean_sec - d.sum() / len(d) / 1e6) < 1e-5
    assert abs(got.median_sec - np.quantile(d, 0.5, method="linear") / 1e6) < 1e-5
    assert abs(got.p90_sec - np.quantile(d, 0.9, method="linear") / 1e6) < 1e-5
