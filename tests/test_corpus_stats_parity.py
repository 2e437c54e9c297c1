"""Independent-reference parity tests for the corpus-stats batch (pure
Python third implementations; see test_curation_parity.py)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import duckdb
import pandas as pd

from talkinghead_datapipeline_spark.queries import all_queries

_SPECS = all_queries()


def _docs(sf_dir: str) -> pd.DataFrame:
    return (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, text, lang, source FROM '{sf_dir}/documents.parquet'"
        )
        .fetchdf()
    )


def test_temperature_weights_vs_python(spark, sf_dir):
    docs = _docs(sf_dir)
    docs = docs[docs.text.str.len() > 0]
    ntok = {
        lang: sum(len(re.split(r"\s+", t.lower())) for t in grp.text)
        for lang, grp in docs.groupby("lang")
    }
    t = sum(ntok.values())
    tp = sum(n**0.7 for n in ntok.values())
    got = _SPECS["temperature_mixture_weights"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(ntok)
    for _, r in got.iterrows():
        n = ntok[r.lang]
        assert int(r.n_tokens) == n
        assert abs(r.raw_share - n / t) < 1e-6
        assert abs(r.temp_share - n**0.7 / tp) < 1e-6
        assert abs(r.upsample_factor - (n**0.7 / tp) / (n / t)) < 1e-5


def test_dataset_cards_vs_python(spark, sf_dir):
    docs = _docs(sf_dir)
    docs = docs[docs.text.str.len() > 0]
    got = (
        _SPECS["dataset_card_stats"]
        .spark(spark, sf_dir)
        .toPandas()
        .set_index("source")
    )
    for src, grp in docs.groupby("source"):
        row = got.loc[src]
        toks = [len(re.split(r"\s+", t.lower())) for t in grp.text]
        digs = {hashlib.md5(t.encode()).hexdigest() for t in grp.text}
        assert int(row.n_docs) == len(grp)
        assert int(row.n_langs) == grp.lang.nunique()
        assert int(row.n_tokens) == sum(toks)
        assert abs(row.avg_tokens - sum(toks) / len(toks)) < 1e-6
        assert int(row.n_unique_texts) == len(digs)
        assert abs(row.exact_dup_rate - (1 - len(digs) / len(grp))) < 1e-6


def test_source_overlap_vs_python(spark, sf_dir):
    docs = _docs(sf_dir)
    grams: dict[str, set] = {}
    for r in docs.itertuples():
        t = re.split(r"\s+", r.text.lower())
        if len(t) < 3:
            continue
        g = {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
        grams.setdefault(r.source, set()).update(g)
    srcs = sorted(grams)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            sh = len(grams[a] & grams[b])
            if sh:
                want[(a, b)] = (sh, sh / len(grams[a] | grams[b]))
    got = _SPECS["source_overlap_matrix"].spark(spark, sf_dir).toPandas()
    gmap = {
        (r.source_a, r.source_b): (int(r.n_shared), int(r.jaccard_ppm))
        for _, r in got.iterrows()
    }
    assert set(gmap) == set(want)
    for k, (sh, j) in want.items():
        assert gmap[k][0] == sh
        # floor-ppm output (round-9 tie audit migration)
        assert abs(gmap[k][1] / 1e6 - j) < 2e-6


def test_nb_margin_vs_python(spark, sf_dir):
    """Margin = top1 − top2 of the (independently recomputed) NB scores;
    predicted class ranks by (rounded score desc, lang)."""
    docs = _docs(sf_dir)
    docs = docs[docs.text.str.len() > 0]
    toks = {r.doc_id: re.split(r"\s+", r.text.lower()) for r in docs.itertuples()}
    langs = sorted(docs.lang.unique())
    cls_word: Counter = Counter()
    cls_tot: Counter = Counter()
    for r in docs.itertuples():
        for w in toks[r.doc_id]:
            cls_word[(r.lang, w)] += 1
            cls_tot[r.lang] += 1
    vocab = len({w for ws in toks.values() for w in ws})
    n_docs = len(docs)
    n_per = docs.lang.value_counts()
    got = (
        _SPECS["nb_lang_margin"].spark(spark, sf_dir).toPandas().set_index("doc_id")
    )
    assert len(got) == n_docs
    for r in docs.itertuples():
        tf = Counter(toks[r.doc_id])
        scores = {}
        for lang in langs:
            ll = math.log(n_per[lang] / n_docs) + sum(
                c * math.log((cls_word[(lang, w)] + 1) / (cls_tot[lang] + vocab))
                for w, c in tf.items()
            )
            scores[lang] = round(ll, 6)
        order = sorted(langs, key=lambda l: (-scores[l], l))
        row = got.loc[r.doc_id]
        assert row.predicted_lang == order[0], r.doc_id
        assert abs(row.margin - (scores[order[0]] - scores[order[1]])) < 1e-4
        assert int(row.is_correct) == int(order[0] == r.lang)


def test_unigram_kl_vs_python(spark, sf_dir):
    docs = _docs(sf_dir)
    docs = docs[docs.text.str.len() > 0]
    src_w: Counter = Counter()
    src_t: Counter = Counter()
    corp_w: Counter = Counter()
    for r in docs.itertuples():
        for w in re.split(r"\s+", r.text.lower()):
            src_w[(r.source, w)] += 1
            src_t[r.source] += 1
            corp_w[w] += 1
    tq = sum(corp_w.values())
    got = (
        _SPECS["unigram_kl_per_source"]
        .spark(spark, sf_dir)
        .toPandas()
        .set_index("source")
    )
    assert len(got) == len(src_t)
    for src, t in src_t.items():
        kl = sum(
            (c / t) * math.log((c / t) / (corp_w[w] / tq))
            for (s, w), c in src_w.items()
            if s == src
        )
        row = got.loc[src]
        assert int(row.n_tokens) == t
        assert abs(row.kl_unigram - kl) < 1e-5


def test_kcenter_vs_python(spark, sf_dir):
    """Greedy farthest-first recomputed in numpy with the same rounded-
    distance argmax rule; selected ids and radii must match exactly."""
    import numpy as np

    pdf = (
        duckdb.connect()
        .execute(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
            " ORDER BY vec_id"
        )
        .fetchdf()
    )
    ids = pdf.vec_id.to_numpy()
    vecs = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    nrm = np.sqrt((vecs * vecs).sum(axis=1))
    sel = [0]  # seed = lowest vec_id (frame is id-ordered)
    radii = [0.0]
    d = np.full(len(ids), np.inf)
    for _ in range(1, 6):
        c = sel[-1]
        dc = np.round(1 - (vecs @ vecs[c]) / (nrm * nrm[c]), 6)
        d = np.minimum(d, dc)
        # argmax with vec_id tiebreak
        best = max(range(len(ids)), key=lambda i: (d[i], -ids[i]))
        sel.append(best)
        radii.append(float(d[best]))
    got = (
        _SPECS["kcenter_coreset_selection"]
        .spark(spark, sf_dir)
        .toPandas()
        .sort_values("sel_idx")
    )
    assert [int(v) for v in got.vec_id] == [int(ids[i]) for i in sel]
    for r, want in zip(got.radius, radii):
        assert abs(r - want) < 1e-9
