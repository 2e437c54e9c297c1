"""Independent-reference parity tests for the linkage/classification batch.

The DuckDB oracles prove cross-engine agreement; these prove agreement
with a THIRD, definition-level implementation (pure Python), so a shared
misreading in both SQL dialects cannot certify itself.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import duckdb
import pandas as pd

from talkinghead_datapipeline_spark.queries import all_queries

_SPECS = all_queries()


def _docs_pdf(sf_dir: str) -> pd.DataFrame:
    return (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, text, lang, n_chars FROM '{sf_dir}/documents.parquet'"
        )
        .fetchdf()
    )


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_match_vs_python_unblocked(spark, sf_dir):
    """The blocked Spark linkage must reproduce the UNBLOCKED Python
    all-pairs join on this corpus (two-token names: measured-total recall),
    including the row-pair multiplicities."""
    parts = (
        duckdb.connect()
        .execute(f"SELECT p_name FROM '{sf_dir}/part.parquet'")
        .fetchdf()
    )
    cnt = Counter(parts["p_name"])
    names = sorted(cnt)
    want = {}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            d = _lev(a, b)
            if d <= 3:
                want[(a, b)] = (d, cnt[a] * cnt[b])
    got = _SPECS["fuzzy_part_match_pairs"].spark(spark, sf_dir).toPandas()
    got_map = {
        (r["name_a"], r["name_b"]): (int(r["lev"]), int(r["n_row_pairs"]))
        for _, r in got.iterrows()
    }
    assert got_map == want


def test_keyword_tags_vs_python(spark, sf_dir):
    from talkinghead_datapipeline_spark.queries.linkage import _TAXONOMY

    docs = _docs_pdf(sf_dir)
    got = (
        _SPECS["keyword_domain_tags"]
        .spark(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    assert len(got) == len(docs)
    for r in docs.itertuples():
        toks = re.split(r"\s+", r.text.lower())
        h = {
            dom: sum(1 for w in toks if w in set(ws))
            for dom, ws in _TAXONOMY.items()
        }
        best = max(h.values())
        # argmax with alphabetical tie-break; all-zero → untagged
        top = (
            "untagged"
            if best == 0
            else min(d for d, v in h.items() if v == best)
        )
        row = got.loc[r.doc_id]
        assert row["top_domain"] == top, (r.doc_id, h)
        assert int(row["n_hits"]) == best
        assert int(row["total_hits"]) == sum(h.values())


def test_nb_scores_vs_python(spark, sf_dir):
    """Laplace-smoothed multinomial NB recomputed from scratch in Python:
    every (doc, class) score matches to the rounding tolerance."""
    docs = _docs_pdf(sf_dir)
    docs = docs[docs["text"].str.len() > 0]
    toks = {r.doc_id: re.split(r"\s+", r.text.lower()) for r in docs.itertuples()}
    langs = sorted(docs["lang"].unique())
    cls_word: dict[tuple[str, str], int] = Counter()
    cls_tot: Counter = Counter()
    for r in docs.itertuples():
        for w in toks[r.doc_id]:
            cls_word[(r.lang, w)] += 1
            cls_tot[r.lang] += 1
    vocab = len({w for ws in toks.values() for w in ws})
    n_docs = len(docs)
    prior = {
        l: math.log(sum(1 for _, g in docs.iterrows() if g["lang"] == l) / n_docs)
        for l in langs
    }
    got = _SPECS["nb_lang_classifier_scores"].spark(spark, sf_dir).toPandas()
    assert len(got) == n_docs * len(langs)
    gmap = {
        (int(r["doc_id"]), r["lang"]): (int(r["n_tokens"]), r["nb_score"])
        for _, r in got.iterrows()
    }
    for r in docs.itertuples():
        tf = Counter(toks[r.doc_id])
        for lang in langs:
            ll = prior[lang] + sum(
                c * math.log((cls_word[(lang, w)] + 1) / (cls_tot[lang] + vocab))
                for w, c in tf.items()
            )
            n_tok, score = gmap[(r.doc_id, lang)]
            assert n_tok == len(toks[r.doc_id])
            assert abs(score - ll) < 1e-5, (r.doc_id, lang)


def test_keep_best_quality_vs_python_closure(spark, sf_dir):
    """Transitive closure + keep-best recomputed in Python over the
    SPARK-side edge list (the edge list itself is oracle-certified by
    dedup_cluster_assignments); representative = argmax quality then min
    id; singletons pass through."""
    from talkinghead_datapipeline_spark.operators import dedup as D

    docs = _docs_pdf(sf_dir)

    def quality(row) -> float:
        t = re.split(r"\s+", row.text.lower())
        return min(row.n_chars / 400, 1.0) * (len(set(t)) / len(t))

    q = {r.doc_id: quality(r) for r in docs.itertuples()}

    from talkinghead_datapipeline_spark.catalog import load_table

    sdocs = load_table(spark, sf_dir, "documents")
    edges = D.dedup_edge_graph(sdocs, "doc_id", "text", jaccard_min=0.2).toPandas()
    parent = {d: d for d in q}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, e in edges.iterrows():
        ra, rb = find(int(e["key_a"])), find(int(e["key_b"]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for d in q:
        comps.setdefault(find(d), []).append(d)
    got = _SPECS["dedup_keep_best_quality"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(comps)
    for _, r in got.iterrows():
        members = comps[int(r["component"])]
        rep = min(members, key=lambda d: (-q[d], d))
        assert int(r["rep_doc_id"]) == rep
        assert int(r["n_members"]) == len(members)
        # floor-ppm output (round-9 tie audit migration); tolerant compare
        # because the Python-recomputed q may differ by an ulp, which can
        # cross the floor boundary
        assert abs(int(r["best_quality_ppm"]) / 1e6 - q[rep]) < 2e-6


def test_fuzzy_clusters_vs_python(spark, sf_dir):
    """Union-find over the Python unblocked pair set; entity = min name."""
    parts = (
        duckdb.connect()
        .execute(f"SELECT p_name FROM '{sf_dir}/part.parquet'")
        .fetchdf()
    )
    cnt = Counter(parts["p_name"])
    names = sorted(cnt)
    parent = {n: n for n in names}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if _lev(a, b) <= 3:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want: dict[str, list] = {}
    for n in names:
        want.setdefault(find(n), []).append(n)
    got = _SPECS["fuzzy_name_clusters"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        members = want[r.entity]
        assert int(r.n_names) == len(members)
        assert int(r.n_rows) == sum(cnt[m] for m in members)


def test_fuzzy_recall_certified_is_total(spark, sf_dir):
    got = (
        _SPECS["fuzzy_blocking_recall_certified"]
        .spark(spark, sf_dir)
        .toPandas()
        .iloc[0]
    )
    assert got.n_blocked == got.n_exact
    assert got.recall == 1.0


def test_cluster_size_histogram_vs_python(spark, sf_dir):
    """Histogram recomputed from the Spark edge list via union-find; the
    mass identities must hold: Σ n_docs = corpus size, Σ n_removable =
    corpus − n_clusters_total."""
    from talkinghead_datapipeline_spark.catalog import load_table
    from talkinghead_datapipeline_spark.operators import dedup as D

    sdocs = load_table(spark, sf_dir, "documents")
    doc_ids = [r.doc_id for r in sdocs.select("doc_id").collect()]
    edges = D.dedup_edge_graph(sdocs, "doc_id", "text", jaccard_min=0.2).toPandas()
    parent = {d: d for d in doc_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, e in edges.iterrows():
        ra, rb = find(int(e.key_a)), find(int(e.key_b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes = Counter(Counter(find(d) for d in doc_ids).values())
    got = _SPECS["dedup_cluster_size_histogram"].spark(spark, sf_dir).toPandas()
    gmap = {int(r.cluster_size): int(r.n_clusters) for _, r in got.iterrows()}
    assert gmap == dict(sizes)
    assert int(got.n_docs.sum()) == len(doc_ids)
    assert int(got.n_removable.sum()) == len(doc_ids) - int(got.n_clusters.sum())
