"""NDCG@10 + MRR retrieval evaluation (STAGED for r15).

Oracle differential (composed registered-query CTEs), an independent
numpy recompute of BOTH rankings from the raw embeddings (brute cosine
ground truth AND the LSH bucket replay — neither engine's SQL is
involved), the metric contract (dcg <= idcg, ndcg/rr ranges, rr/first-hit
consistency), and pins of the build-time discount literals against a
fresh math.log2 evaluation.
"""

from __future__ import annotations

import math

import numpy as np

from talkinghead_datapipeline_spark.queries.similarity import (
    _CUM_DISC_PPM,
    _DISC_PPM,
    _LSH_SEEDS,
    NDCG_MRR_ORACLE,
    ndcg_mrr_retrieval_eval,
)
from tests.oracle_harness import run_compare


def test_staged_oracle_matches(spark, sf_dir):
    res = run_compare(
        spark, sf_dir, "ndcg_mrr_retrieval_eval", ndcg_mrr_retrieval_eval,
        NDCG_MRR_ORACLE,
    )
    assert res.ok, res.mismatches


def test_discount_literals():
    """The pinned ppm discounts ARE floor(1e6 / log2(i+1)) and the cumsum
    literal is their prefix sum — recomputed fresh here."""
    for i, d in enumerate(_DISC_PPM, start=1):
        assert d == math.floor(1_000_000 / math.log2(i + 1))
    assert list(_CUM_DISC_PPM) == [
        sum(_DISC_PPM[: i + 1]) for i in range(len(_DISC_PPM))
    ]
    assert _DISC_PPM[0] == 1_000_000  # rank 1 undiscounted


def _rankings_from_numpy(spark, sf_dir):
    """Replay brute-force ground truth and the LSH bucket ranking in
    numpy, with the engines' rounding and tiebreaks."""
    from talkinghead_datapipeline_spark.catalog import load_table

    pdf = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64)
            for r in pdf.itertuples()}
    q = vecs[0]

    def cos(v):
        return round(
            float(np.dot(v, q))
            / (math.sqrt(float(np.dot(v, v))) * math.sqrt(float(np.dot(q, q)))),
            6,
        )

    scored = sorted(
        ((cos(v), -k) for k, v in vecs.items() if k != 0), reverse=True
    )
    exact = [-k for _, k in scored[:10]]
    anchors = [vecs[s] for s in sorted(_LSH_SEEDS)]

    def bucket(v):
        return tuple(float(np.dot(v, a)) >= 0 for a in anchors)

    qb = bucket(q)
    in_bucket = sorted(
        ((cos(v), -k) for k, v in vecs.items()
         if k != 0 and bucket(v) == qb),
        reverse=True,
    )
    ann = [-k for _, k in in_bucket[:10]]
    return exact, ann


def test_matches_independent_numpy_replay(spark, sf_dir):
    exact, ann = _rankings_from_numpy(spark, sf_dir)
    gt = set(exact)
    hits = [(i + 1) for i, v in enumerate(ann) if v in gt]
    dcg = sum(_DISC_PPM[r - 1] for r in hits)
    idcg = _CUM_DISC_PPM[len(exact) - 1]
    row = ndcg_mrr_retrieval_eval(spark, sf_dir).collect()[0]
    assert row["n_exact"] == len(exact)
    assert row["n_ann"] == len(ann)
    assert row["n_hits"] == len(hits)
    assert row["dcg_ppm"] == dcg
    assert row["idcg_ppm"] == idcg
    assert row["ndcg_ppm"] == (dcg * 1_000_000) // idcg
    if hits:
        assert row["first_hit_rank"] == hits[0]
        assert row["rr_ppm"] == 1_000_000 // hits[0]
    else:
        assert row["first_hit_rank"] is None and row["rr_ppm"] is None


def test_metric_contract(spark, sf_dir):
    row = ndcg_mrr_retrieval_eval(spark, sf_dir).collect()[0]
    assert 0 < row["n_exact"] <= 10 and 0 <= row["n_ann"] <= 10
    assert row["n_hits"] <= min(row["n_exact"], row["n_ann"])
    assert 0 <= row["dcg_ppm"] <= row["idcg_ppm"]
    assert row["ndcg_ppm"] is not None and 0 <= row["ndcg_ppm"] <= 1_000_000
    if row["n_hits"] > 0:
        assert 1 <= row["first_hit_rank"] <= 10
        assert row["rr_ppm"] == 1_000_000 // row["first_hit_rank"]
        # a hit implies positive dcg; perfect prefix implies ndcg = 1e6
        assert row["dcg_ppm"] >= _DISC_PPM[row["first_hit_rank"] - 1]
