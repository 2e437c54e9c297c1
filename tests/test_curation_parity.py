"""Independent-reference parity tests for the curation batch.

The DuckDB oracles prove cross-engine agreement; these prove agreement
with a THIRD, definition-level implementation (numpy / pure Python), so a
shared misreading of a recipe's semantics in both SQL dialects cannot
certify itself. One synthetic-corpus differential additionally exercises
the Gopher rules the fixture never trips (mean-word-length bounds,
stopword floor).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb
import numpy as np
import pandas as pd

from talkinghead_datapipeline_spark.queries import all_queries

_SPECS = all_queries()


def _docs_pdf(sf_dir: str) -> pd.DataFrame:
    return duckdb.connect().execute(
        f"SELECT doc_id, text, lang FROM '{sf_dir}/documents.parquet'"
    ).fetchdf()


def _emb(sf_dir: str):
    pdf = duckdb.connect().execute(
        f"SELECT vec_id, embedding, label FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchdf()
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return pdf["vec_id"].to_numpy(), vecs, pdf["label"].to_numpy()


def _cos_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    na = np.sqrt((a * a).sum(axis=1))
    nb = np.sqrt((b * b).sum(axis=1))
    return (a @ b.T) / np.outer(na, nb)


def test_semdedup_matches_numpy_bruteforce(spark, sf_dir):
    """Per cluster: pruned(b) <=> exists a < b with cos(a, b) >= 0.2 —
    recomputed as a dense numpy cosine matrix per label."""
    ids, vecs, labels = _emb(sf_dir)
    want = {}
    for lab in np.unique(labels):
        m = labels == lab
        lid, lv = ids[m], vecs[m]
        order = np.argsort(lid)
        lid, lv = lid[order], lv[order]
        cos = _cos_matrix(lv, lv)
        pruned = 0
        for j in range(len(lid)):
            if (cos[:j, j] >= 0.2).any():
                pruned += 1
        want[int(lab)] = (len(lid), pruned)
    got = _SPECS["semdedup_prune_stats"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        n, p = want[int(r["label"])]
        assert (r["n_vecs"], r["n_pruned"]) == (n, p), r["label"]
        assert abs(r["prune_rate"] - round(p / n, 6)) < 1e-9


def _bm25_py(docs: pd.DataFrame):
    terms = ("spark", "join", "window", "hash")
    k1, b = 1.2, 0.75
    toks = {r.doc_id: r.text.lower().split() for r in docs.itertuples()}
    dl = {d: float(len(t)) for d, t in toks.items()}
    n_docs = float(len(toks))
    avgdl = sum(dl.values()) / n_docs
    tf = {d: {t: float(tk.count(t)) for t in terms} for d, tk in toks.items()}
    df = {t: sum(1.0 for d in toks if tf[d][t] > 0) for t in terms}
    bm25, dens = {}, {}
    for d in toks:
        s = 0.0
        for t in terms:
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s += (
                idf
                * (tf[d][t] * (k1 + 1.0))
                / (tf[d][t] + k1 * (1.0 - b + b * dl[d] / avgdl))
            )
        bm25[d] = s
        dens[d] = sum(tf[d][t] for t in terms) / dl[d]
    return bm25, dens


def test_rrf_matches_python_bruteforce(spark, sf_dir):
    """Full pure-Python re-derivation: BM25 + density scores, rounded-then-
    ranked cutoff-20 lists, 1/(60+rank) fusion, top-10."""
    docs = _docs_pdf(sf_dir)
    bm25, dens = _bm25_py(docs)

    def ranks(scores):
        orderd = sorted(scores, key=lambda d: (-round(scores[d], 6), d))[:20]
        return {d: i + 1 for i, d in enumerate(orderd)}

    r1, r2 = ranks(bm25), ranks(dens)
    fused = {
        d: (1.0 / (60 + r1[d]) if d in r1 else 0.0)
        + (1.0 / (60 + r2[d]) if d in r2 else 0.0)
        for d in set(r1) | set(r2)
    }
    want = sorted(fused, key=lambda d: (-round(fused[d], 6), d))[:10]
    got = _SPECS["rrf_hybrid_topk"].spark(spark, sf_dir).toPandas()
    assert list(got["doc_id"]) == want
    for _, r in got.iterrows():
        d = r["doc_id"]
        assert r["bm25_rank"] == r1.get(d, 0) and r["density_rank"] == r2.get(d, 0)
        assert abs(r["rrf_score"] - round(fused[d], 6)) < 1e-9


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64


def test_dsir_matches_python_bruteforce(spark, sf_dir):
    """Hashed-unigram importance weights recomputed with hashlib + Counters:
    log((c_tgt+1)/(T_tgt+64)) - log((c_raw+1)/(T_raw+64)) summed per doc."""
    docs = _docs_pdf(sf_dir)
    feats = [
        (r.doc_id, r.lang, _bucket(t))
        for r in docs.itertuples()
        if len(r.text) > 0
        for t in r.text.lower().split()
    ]
    raw = Counter(b for _, _, b in feats)
    tgt = Counter(b for _, lg, b in feats if lg == "en")
    t_raw, t_tgt = float(len(feats)), float(sum(1 for _, lg, _ in feats if lg == "en"))
    lr = {
        b: math.log((tgt.get(b, 0) + 1.0) / (t_tgt + 64.0))
        - math.log((c + 1.0) / (t_raw + 64.0))
        for b, c in raw.items()
    }
    want_w: dict[int, float] = Counter()
    want_n: Counter = Counter()
    for d, _, b in feats:
        want_w[d] += lr[b]
        want_n[d] += 1
    got = _SPECS["dsir_importance_weights"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(want_n)
    for _, r in got.iterrows():
        d = r["doc_id"]
        assert r["n_toks"] == want_n[d]
        assert abs(r["dsir_logweight"] - round(want_w[d], 6)) < 2e-6


def test_gopher_filter_matches_python_rules(spark, sf_dir):
    """Rule battery re-derived in pure Python for every fixture doc."""
    stops = {"the", "a", "and", "of", "to", "in", "is", "data"}
    got = _SPECS["gopher_quality_filter"].spark(spark, sf_dir).toPandas()
    docs = _docs_pdf(sf_dir)
    assert len(got) == len(docs)
    by_id = {r.doc_id: r.text for r in docs.itertuples()}
    for _, r in got.iterrows():
        toks = by_id[r["doc_id"]].lower().split()
        wc = len(toks)
        mwl = sum(len(w) for w in toks) / wc
        ns = len(stops & set(toks))
        assert r["word_count"] == wc
        assert abs(r["mean_word_len"] - round(mwl, 6)) < 1e-9
        assert r["n_stop_distinct"] == ns
        keep = 50 <= wc <= 100_000 and 3.0 <= mwl <= 10.0 and ns >= 2
        assert bool(r["keep"]) == keep
        if wc < 50 or wc > 100_000:
            assert r["first_fail_rule"] == "word_count"
        elif not (3.0 <= mwl <= 10.0):
            assert r["first_fail_rule"] == "mean_word_len"
        elif ns < 2:
            assert r["first_fail_rule"] == "stopwords"
        else:
            assert r["first_fail_rule"] == ""


def test_gopher_filter_rule_attribution_on_crafted_corpus(spark, tmp_path):
    """The fixture only trips the word-count rule; this corpus trips each
    rule in battery order and runs the same Spark-vs-DuckDB differential
    the driver runs (via the synthetic-corpus harness)."""
    from tests.test_textops_extra import _diff_on

    # 70 words, mean word length 4.5, 5 distinct stopwords -> passes
    base = ("the data pipeline processes a table of tokens in order " * 7).strip()
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                base,  # keep
                "short words only here now",  # word_count fail (5 words)
                ("supercalifragilistic " * 60).strip(),  # mean_word_len fail
                ("zebra yak xylophone walrus vulture " * 12).strip(),  # stopwords
            ],
            "lang": ["en"] * 4,
        }
    )
    pdf = _diff_on(spark, tmp_path, "gopher_quality_filter", docs)
    rules = dict(zip(pdf["doc_id"], pdf["first_fail_rule"]))
    keeps = dict(zip(pdf["doc_id"], pdf["keep"]))
    assert rules == {0: "", 1: "word_count", 2: "mean_word_len", 3: "stopwords"}
    assert keeps == {0: True, 1: False, 2: False, 3: False}


def test_zipf_matches_numpy_polyfit(spark, sf_dir):
    """Per-lang OLS re-fit with numpy.polyfit / corrcoef over the same
    rounded-then-ranked top-100 token counts."""
    docs = _docs_pdf(sf_dir)
    got = _SPECS["zipf_slope_per_lang"].spark(spark, sf_dir).toPandas()
    for lang, g in docs.groupby("lang"):
        counts = Counter(t for tx in g["text"] for t in tx.lower().split())
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
        x = np.log(np.arange(1, len(ranked) + 1, dtype=np.float64))
        y = np.log(np.array([c for _, c in ranked], dtype=np.float64))
        slope, intercept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        row = got[got.lang == lang].iloc[0]
        assert row["n_terms"] == len(ranked)
        assert abs(row["zipf_slope"] - slope) < 1e-5
        assert abs(row["intercept"] - intercept) < 1e-5
        assert abs(row["r2"] - r2) < 1e-5


def test_hard_negatives_match_numpy(spark, sf_dir):
    """Anchor = min vec_id per label; top-5 wrong-label by rounded cosine,
    vec_id tiebreak — recomputed densely in numpy."""
    ids, vecs, labels = _emb(sf_dir)
    got = _SPECS["hard_negative_mining"].spark(spark, sf_dir).toPandas()
    for lab in np.unique(labels):
        m = labels == lab
        aidx = np.argmin(ids[m])
        avec = vecs[m][aidx]
        cand = labels != lab
        cos = np.round(
            (vecs[cand] @ avec)
            / (np.sqrt((vecs[cand] ** 2).sum(axis=1)) * np.sqrt((avec**2).sum())),
            6,
        )
        order = sorted(
            zip(-cos, ids[cand], labels[cand], cos), key=lambda t: (t[0], t[1])
        )[:5]
        rows = got[got.anchor_label == lab].sort_values("rnk")
        assert list(rows["vec_id"]) == [int(t[1]) for t in order]
        assert np.allclose(rows["cos_sim"].to_numpy(), [t[3] for t in order], atol=2e-6)
        assert rows["anchor_id"].nunique() == 1
        assert rows["anchor_id"].iloc[0] == ids[m][aidx]


def _ntile3(n: int) -> list[int]:
    base, rem = divmod(n, 3)
    out = []
    for b in (1, 2, 3):
        out.extend([b] * (base + (1 if b <= rem else 0)))
    return out


def test_ccnet_buckets_match_python(spark, sf_dir):
    """Bigram-LM cross-entropy + ntile(3) terciles re-derived with Counters
    and the SQL ntile size formula (first n%3 buckets get one extra row)."""
    docs = _docs_pdf(sf_dir)
    doc_bg = {
        r.doc_id: list(zip(r.text.lower().split(), r.text.lower().split()[1:]))
        for r in docs.itertuples()
        if len(r.text) > 0 and len(r.text.split()) >= 2
    }
    bg = Counter(p for ps in doc_bg.values() for p in ps)
    uni = Counter(p[0] for ps in doc_bg.values() for p in ps)
    ce = {
        d: round(
            sum(-math.log2(bg[p] / uni[p[0]]) for p in ps) / len(ps), 6
        )
        for d, ps in doc_bg.items()
    }
    lang_of = dict(zip(docs["doc_id"], docs["lang"]))
    got = _SPECS["ccnet_perplexity_buckets"].spark(spark, sf_dir).toPandas()
    langs = sorted({lang_of[d] for d in ce})
    for lang in langs:
        members = sorted(
            (d for d in ce if lang_of[d] == lang), key=lambda d: (ce[d], d)
        )
        tiles = _ntile3(len(members))
        for b in (1, 2, 3):
            vals = [ce[d] for d, t in zip(members, tiles) if t == b]
            row = got[(got.lang == lang) & (got.bucket == b)].iloc[0]
            assert row["n_docs"] == len(vals)
            assert abs(row["avg_ce"] - round(sum(vals) / len(vals), 6)) < 2e-6
            assert abs(row["min_ce"] - round(min(vals), 6)) < 1e-9
            assert abs(row["max_ce"] - round(max(vals), 6)) < 1e-9


def test_minhash_estimate_error_matches_python(spark, sf_dir):
    """Signatures, band candidates, estimates, exact Jaccard, and the
    two-sigma verdict re-derived with hashlib + sets."""
    P = 4294967311
    A = (89251, 773955, 654571, 438878, 433015, 858597, 85946, 697367)
    from talkinghead_datapipeline_spark.operators import dedup as D

    assert tuple(D.MINHASH_A) == A and D.MINHASH_P == P  # pin the perms
    B_ = tuple(D.MINHASH_B)
    docs = _docs_pdf(sf_dir)
    grams: dict[int, set] = {}
    sigs: dict[int, tuple] = {}
    for r in docs.itertuples():
        toks = r.text.lower().split()
        if len(toks) < 3:
            continue
        g = {
            int(
                hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()[:8], 16
            )
            for i in range(len(toks) - 2)
        }
        if not g:
            continue
        grams[r.doc_id] = g
        sigs[r.doc_id] = tuple(
            min((a * h + b) % P for h in g) for a, b in zip(A, B_)
        )
    bands: dict[str, set] = {}
    for d, s in sigs.items():
        for lo in (0, 4):
            bands.setdefault("|".join(map(str, s[lo : lo + 4])), set()).add(d)
    want = {}
    for members in bands.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / 8.0
                inter = len(grams[a] & grams[b])
                exact = inter / (len(grams[a]) + len(grams[b]) - inter)
                want[(a, b)] = (
                    round(est, 6),
                    round(exact, 6),
                    round(abs(est - exact), 6),
                    abs(est - exact) <= 2 * math.sqrt(exact * (1 - exact) / 8),
                )
    got = _SPECS["minhash_estimate_error"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        e, x, err, ok = want[(r["key_a"], r["key_b"])]
        assert (r["est_jaccard"], r["exact_jaccard"]) == (e, x)
        assert r["abs_err"] == err and bool(r["within_2sigma"]) == ok


def test_retention_cohorts_match_python(spark, sf_dir):
    """Purchase-week cohort matrix re-derived with dict/set arithmetic;
    the week_idx=0 diagonal must be exactly 1.0."""
    ev = duckdb.connect().execute(
        f"SELECT user_id, epoch_us(ts) // 604800000000 AS week"
        f" FROM '{sf_dir}/events.parquet' WHERE event_type = 'purchase'"
    ).fetchdf()
    cohort = ev.groupby("user_id")["week"].min().to_dict()
    cells = {
        (cohort[u], w - cohort[u])
        for u, w in set(zip(ev["user_id"], ev["week"]))
    }
    active = Counter(
        (cohort[u], w - cohort[u]) for u, w in set(zip(ev["user_id"], ev["week"]))
    )
    sizes = Counter(cohort.values())
    got = _SPECS["retention_cohorts"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(cells)
    for _, r in got.iterrows():
        key = (r["cohort_week"], r["week_idx"])
        assert r["n_active"] == active[key]
        assert r["cohort_size"] == sizes[r["cohort_week"]]
        assert abs(r["retention"] - round(active[key] / sizes[r["cohort_week"]], 6)) < 1e-9
        if r["week_idx"] == 0:
            assert r["retention"] == 1.0


def test_tokenizer_fertility_matches_python(spark, sf_dir):
    """ceil(len/4) subword costs and corpus-level ratios re-derived in
    pure Python per language."""
    docs = _docs_pdf(sf_dir)
    got = _SPECS["tokenizer_fertility_per_lang"].spark(spark, sf_dir).toPandas()
    for lang, g in docs.groupby("lang"):
        n_sub = n_ws = n_chars = 0
        for tx in g["text"]:
            toks = tx.lower().split()
            n_sub += sum((len(w) + 3) // 4 for w in toks)
            n_ws += len(tx.split())
            n_chars += len(tx)
        row = got[got.lang == lang].iloc[0]
        assert row["n_docs"] == len(g)
        assert row["total_subword_tokens"] == n_sub
        assert abs(row["fertility"] - round(n_sub / n_ws, 6)) < 1e-9
        assert abs(row["chars_per_token"] - round(n_chars / n_sub, 6)) < 1e-9


def test_group_split_matches_python(spark, sf_dir):
    """Hash-assignment and per-split rollups re-derived with hashlib; the
    no-leakage column must be 0 in every row (and is 0 by construction in
    the reference too — the assert double-checks the Spark wiring)."""
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text, source FROM '{sf_dir}/documents.parquet'"
    ).fetchdf()

    def split_of(src: str) -> str:
        b = int(hashlib.md5(f"gsplit|{src}".encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    want: dict[str, list] = {}
    for r in docs.itertuples():
        s = split_of(r.source)
        want.setdefault(s, [set(), 0, 0])
        want[s][0].add(r.source)
        want[s][1] += 1
        want[s][2] += len(r.text.split())
    got = _SPECS["group_split_no_leakage"].spark(spark, sf_dir).toPandas()
    assert set(got["split"]) == set(want)
    for _, r in got.iterrows():
        srcs, n_docs, n_tok = want[r["split"]]
        assert r["n_sources"] == len(srcs)
        assert r["n_docs"] == n_docs and r["n_tokens"] == n_tok
        assert r["n_leaked_sources"] == 0
        assert abs(r["frac_docs"] - round(n_docs / len(docs), 6)) < 1e-9


def test_lsh_recall_is_intersection_of_registered_queries(spark, sf_dir):
    """The certified recall row must equal the literal intersection of the
    two registered queries' outputs — no independent re-derivation exists
    or should (the composition IS the definition)."""
    exact = {
        r["vec_id"]
        for r in _SPECS["sim_brute_cosine_topk"].spark(spark, sf_dir).collect()
    }
    ann = {
        r["vec_id"]
        for r in _SPECS["sim_lsh_bucket_topk"].spark(spark, sf_dir).collect()
    }
    row = _SPECS["sim_lsh_recall_certified"].spark(spark, sf_dir).collect()[0]
    assert row["n_exact"] == len(exact) and row["n_ann"] == len(ann)
    assert row["n_hits"] == len(exact & ann)
    assert abs(row["recall_at_10"] - round(len(exact & ann) / len(exact), 6)) < 1e-9


def test_zipf_degenerate_languages_guarded(spark, tmp_path):
    """A language with < 3 ranked terms must be DROPPED (degenerate design
    matrix), and a uniform-count language must emit NULL r2 (not NaN) —
    differentially, on a corpus crafted to hit both edges."""
    from tests.test_textops_extra import _diff_on

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "solo",  # 1 distinct term -> dropped by HAVING n >= 3
                "alpha beta gamma delta",  # uniform counts -> r2 NULL
                "the the the data data is",  # healthy varying counts
            ],
            "lang": ["xx", "uu", "en"],
        }
    )
    pdf = _diff_on(spark, tmp_path, "zipf_slope_per_lang", docs)
    assert set(pdf["lang"]) == {"uu", "en"}  # 'xx' dropped
    uu = pdf[pdf.lang == "uu"].iloc[0]
    assert pd.isna(uu["r2"]) and uu["zipf_slope"] == 0.0
    en = pdf[pdf.lang == "en"].iloc[0]
    assert en["zipf_slope"] < 0 and not pd.isna(en["r2"])


def test_llm_curation_pipeline_matches_python(spark, sf_dir):
    """The full 4-stage composition re-derived in pure Python: Gopher gate,
    re-based PII redaction, md5 keep-first dedup on redacted text, DSIR
    weights trained on the survivors."""
    import re

    stops = {"the", "a", "and", "of", "to", "in", "is", "data"}
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text, lang FROM '{sf_dir}/documents.parquet'"
        " ORDER BY doc_id"
    ).fetchdf()
    pats = [
        (re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), "|||EMAIL|||"),
        (re.compile(r"\+[0-9]{7,15}|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"), "|||PHONE|||"),
        (re.compile(r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"), "|||IP|||"),
    ]
    surv = []
    seen_digests = set()
    for r in docs.itertuples():  # doc_id order = keep-first order
        if len(r.text) == 0:
            continue
        toks = r.text.lower().split()
        wc = len(toks)
        mwl = sum(len(w) for w in toks) / wc
        if not (50 <= wc <= 100_000 and 3.0 <= mwl <= 10.0
                and len(stops & set(toks)) >= 2):
            continue
        rtext = r.text
        for pat, repl in pats:
            rtext = pat.sub(repl, rtext)
        dg = hashlib.md5(rtext.encode()).hexdigest()
        if dg in seen_digests:
            continue
        seen_digests.add(dg)
        surv.append((r.doc_id, r.lang, rtext))
    feats = [
        (d, lg, _bucket(t)) for d, lg, rt in surv for t in rt.lower().split()
    ]
    raw = Counter(b for _, _, b in feats)
    tgt = Counter(b for _, lg, b in feats if lg == "en")
    t_raw = float(len(feats))
    t_tgt = float(sum(1 for _, lg, _ in feats if lg == "en"))
    lr = {
        b: math.log((tgt.get(b, 0) + 1.0) / (t_tgt + 64.0))
        - math.log((c + 1.0) / (t_raw + 64.0))
        for b, c in raw.items()
    }
    want_w, want_n = Counter(), Counter()
    for d, _, b in feats:
        want_w[d] += lr[b]
        want_n[d] += 1
    got = _SPECS["llm_curation_pipeline"].spark(spark, sf_dir).toPandas()
    assert set(got["doc_id"]) == {d for d, _, _ in surv}
    for _, r in got.iterrows():
        d = r["doc_id"]
        assert r["n_toks"] == want_n[d]
        assert abs(r["dsir_logweight"] - round(want_w[d], 6)) < 2e-6
