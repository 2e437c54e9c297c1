"""Compare two BENCH_LOCAL_r{N}.json records per-query.

First-line triage for cross-round perf disputes: prints queries whose
timing moved more than a threshold ratio, plus the whole-suite total and
the fixed-key r1 subtotal. A uniform shift across heterogeneous plan
shapes is the machine-state signature (SCALING.md, round 7) — anything
uniform here is NOT a code regression; a single outlying query is where
to look. Definitive adjudication remains the interleaved two-worktree
A/B documented in SCALING.md; this tool only says where to point it.

Usage: python tools/bench_compare.py BENCH_LOCAL_r07.json BENCH_LOCAL_r08.json [--threshold 1.5]
"""

from __future__ import annotations

import json
import sys

# Queries whose sf0.1 cost is dominated by string/hash CPU (portable md5,
# shingle hashing, regex tokenization) rather than the parquet scan — the
# class the r12 adjudication found moving 1.3-1.5x on untouched code while
# scan-bound plans held ~1.04x. Movers in this set are priced against the
# hash anchor; everything else against the scan anchor. Curated from the
# per-query decompositions in SCALING.md rounds 10-12.
HASH_BOUND = frozenset(
    {
        "bootstrap_ci_order_value",
        "ngram_jaccard_exact_pairs",
        "shingle_containment_pairs",
        "minhash_lsh_near_dups",
        "minhash_signatures",
        "minhash_estimate_error",
        "simhash_hamming_near_dups",
        "simhash_fingerprint",
        "text_bpe_token_count",
        "text_quality_score",
        "gopher_quality_filter",
        "gopher_repetition_signals",
        "gopher_dup_trigram_coverage",
        "gopher_dup_line_signals",
        "nb_lang_classifier_scores",
        "nb_lang_margin",
        "bigram_lm_doc_scores",
        "ols_normal_equations",
        "asof_next_view_tolerance",
        "substring_dup_coverage",
        "doc_fingerprint",
        "paragraph_dedup_stats",
        "dsir_importance_weights",
        "ccnet_perplexity_buckets",
    }
)


def _anchor_ratios(old: dict, new: dict) -> dict | None:
    """Per-class machine-drift ratios from the anchor pair both records
    carry (bench.py _measure_anchors, VERDICT r12 #3); None if either
    record predates the anchors."""
    oa, na = old.get("anchors"), new.get("anchors")
    if not (oa and na):
        return None
    out = {}
    for key, label in (
        ("hash_md5_1m_sec", "hash"),
        ("scan_lineitem_sec", "scan"),
    ):
        if oa.get(key) and na.get(key):
            out[label] = na[key] / oa[key]
    return out or None


def compare(old: dict, new: dict, threshold: float = 1.5) -> dict:
    """Return {added, removed, regressed, improved, ratio_median} between
    two bench records. regressed/improved are (name, old_s, new_s, ratio)
    with ratio = new/old, filtered by the threshold."""
    oq, nq = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(oq) & set(nq))
    ratios = {n: (nq[n] / oq[n] if oq[n] > 0 else float("inf")) for n in common}
    anchors = _anchor_ratios(old, new)
    # Normalized ratio: raw ratio divided by the query's CLASS anchor ratio
    # — a mover that vanishes here tracked the machine, one that survives
    # is a plan change. Falls back to raw when anchors are absent.
    norm = {}
    for n in common:
        cls = "hash" if n in HASH_BOUND else "scan"
        a = anchors.get(cls) if anchors else None
        norm[n] = ratios[n] / a if a else ratios[n]
    srt = sorted(ratios.values())
    med = srt[len(srt) // 2] if srt else None
    return {
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
        "regressed": [
            (n, oq[n], nq[n], round(ratios[n], 2), round(norm[n], 2))
            for n in common
            if ratios[n] >= threshold
        ],
        "improved": [
            (n, oq[n], nq[n], round(ratios[n], 2), round(norm[n], 2))
            for n in common
            if ratios[n] <= 1 / threshold
        ],
        "still_regressed_normalized": sorted(
            n for n in common if norm[n] >= threshold
        ),
        "anchors": anchors,
        "ratio_median": round(med, 3) if med is not None else None,
        "n_common": len(common),
    }


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    threshold = 1.5
    for a in argv:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
    if len(args) < 2:
        print(__doc__)
        return 2
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    d = compare(old, new, threshold)
    print(f"common queries: {d['n_common']}  median ratio new/old: {d['ratio_median']}")
    if d["anchors"]:
        print(
            "machine anchors (new/old): "
            + "  ".join(f"{k}={v:.2f}x" for k, v in d["anchors"].items())
        )
    else:
        print("no anchor pair in both records — ratios below are RAW only")
    if d["ratio_median"] and not (0.8 <= d["ratio_median"] <= 1.25):
        print(
            "NOTE: median ratio far from 1.0 — uniform shift = machine-state "
            "signature, not a code regression (see SCALING.md protocol)."
        )
    for label in ("regressed", "improved"):
        for n, o, v, r, nr in sorted(
            d[label], key=lambda t: -t[3] if label == "regressed" else t[3]
        ):
            cls = "hash" if n in HASH_BOUND else "scan"
            print(
                f"{label[:-1]:>9}: {n}  {o:.3f}s -> {v:.3f}s  ({r}x raw, "
                f"{nr}x vs {cls} anchor)"
            )
    if d["still_regressed_normalized"]:
        print(
            "anchor-surviving regressions (code-attributable candidates): "
            + ", ".join(d["still_regressed_normalized"])
        )
    elif d["anchors"]:
        print("no regression survives its class anchor — drift is machine state")
    if d["added"]:
        print("added:", ", ".join(d["added"]))
    if d["removed"]:
        print("removed:", ", ".join(d["removed"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
