#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print the
result JSON line {"queries": {name: sec}, "metric": ..., "value":
total_sec, ...} followed by a compact summary-only JSON line — totals
last in key order AND repeated on the short final line, so a bounded
tail capture of stdout always retains a parseable headline (VERDICT r6
#1: the r6 artifact lost its total when the per-query map outgrew the
driver's 2000-char tail).

Each query is materialized through the `noop` sink (full execution, no
driver-side collect) so the measured time is plan execution, not transfer.

``--reps N`` (or $SPARK_GRAFT_BENCH_REPS) times each query N times after
the warm-up and reports the per-query MEDIAN — the controlled-conditions
mode VERDICT r4 #4 prescribes for separating plan regressions from
environment noise. When any query fails, ``value`` is null and
``n_failed`` is set: a partial total is NOT comparable across rounds and
must never read as a speed-up (ADVICE r4).

Besides HEADLINE, each run times a deterministic rotating slice of the
HEADLINE *absentees* (``bench_sample`` map, 1 warm-up + 1 rep) sized so
every registered query gets a timing row at least every SAMPLE_ROUNDS
rounds — VERDICT r13 #4's coverage gap. Sample timings never enter the
headline total or the r1-29 subtotal.
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from talkinghead_datapipeline_spark.queries import all_queries  # noqa: E402
from talkinghead_datapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one representative per operator family (join chain, hash agg,
# window, rolling, dedup, similarity, kernel projection, top-k).
HEADLINE = (
    "q1_pricing_summary",
    "flagship_segment_leaders",
    "q5_join_chain_revenue",
    "q3_top_revenue_orders",
    "rollup_nation_revenue",
    "n7_argmax_per_group",
    "n12_rolling_extent",
    "s6_sliding_mean",
    "s8_savgol_fir",
    "s9_tumbling_volume",
    "n10_bbox_transform_chain",
    "dedup_exact_keep_first",
    "minhash_lsh_near_dups",
    "text_quality_score",
    "text_bpe_token_count",
    "sim_brute_cosine_topk",
    "sim_lsh_bucket_topk",
    "q6_forecast_revenue",
    "wide_source_assembly",
    "a2en_feature_assembly",
    "asof_prior_view_value",
    "sessionize_users",
    "multimodal_frame_sample",
    "grouping_sets_order_stats",
    "simhash_hamming_near_dups",
    "q8_market_share",
    "q21_lone_blamed_supplier",
    "pack_token_budget",
    "stratified_sample_by_lang",
    # round-2 additions (r1 keys above are unchanged for comparability);
    # the iterative composites (dedup_cluster_assignments,
    # corpus_clean_pipeline) stay out: their local-mode time is dominated
    # by fixed per-round scheduling, not data volume.
    "range_interval_join",
    "emb_label_centroids",
    "variant_props_extract",
    "skew_salted_join_revenue",
    # round-5 additions (earlier keys unchanged for comparability)
    "ngram_jaccard_exact_pairs",
    "sim_ivf_trained_topk",
    "flame_render_pipeline",
    "paragraph_dedup_stats",
    "gopher_repetition_signals",
    # round-6 additions (earlier keys unchanged for comparability)
    "gopher_dup_trigram_coverage",
    "sim_pq_adc_topk",
    "sim_ivfpq_topk",
    "bpe_top_merge_pairs",
    "gopher_dup_line_signals",
    "cms_heavy_hitters",
    "pagerank_trade_network",
    "hll_distinct_users",
    "zorder_data_skipping",
    "scd2_user_value_intervals",
    "text_unigram_entropy",
    "sim_sq8_quant_topk",
    "lineitem_measure_correlations",
    "robust_outlier_flags",
    "bpe_apply_merges",
    "bigram_lm_doc_scores",
    "tfidf_top_terms",
    "table_integrity_checksums",
    "merge_upsert_latest",
    "snapshot_diff_summary",
    "bloom_filter_semi_join",
    "equi_depth_deciles",
    "recursive_cte_key_depths",
    "range_frame_trailing_30min",
    "session_funnel_conversion",
    "weighted_topk_sample_es",
    "pmi_top_collocations",
    "source_mixture_manifest",
    "incremental_dedup_against_index",
    "bm25_topk_docs",
    "substring_dup_coverage",
    "ewma_user_values",
    "gap_fill_hourly",
    "triangle_count_copart",
    "winsorized_price_stats",
    "approx_quantiles_certified",
    "item_cf_top_recs",
    "ohlc_6h_bars",
    "random_projection_jl",
    "shingle_containment_pairs",
    "semdedup_prune_stats",
    "rrf_hybrid_topk",
    "dsir_importance_weights",
    "gopher_quality_filter",
    "zipf_slope_per_lang",
    "hard_negative_mining",
    "ccnet_perplexity_buckets",
    "minhash_estimate_error",
    "retention_cohorts",
    "tokenizer_fertility_per_lang",
    "group_split_no_leakage",
    "sim_lsh_recall_certified",
    "fuzzy_part_match_pairs",
    "keyword_domain_tags",
    "nb_lang_classifier_scores",
    "rfm_segments",
    "trailing_zscore_anomalies",
    "ab_test_lift",
    "knn_mutual_edges",
    "temperature_mixture_weights",
    "dataset_card_stats",
    "source_overlap_matrix",
    "nb_lang_margin",
    "unigram_kl_per_source",
    "psi_snapshot_drift",
    "fk_integrity_audit",
    "asof_next_view_tolerance",
    "event_transition_matrix",
    "fuzzy_blocking_recall_certified",
    "ols_normal_equations",
    "emb_covariance_upper",
    "time_to_convert_stats",
    "chi2_lang_source_cells",
    "benford_first_digit",
    "histogram_fixed_width",
    "frequent_event_trigrams",
    "mode_nation_per_segment",
    "order_interarrival_by_segment",
    "rolling_mad_anomalies",
    "cumulative_unique_users",
    "bayes_smoothed_part_scores",
    "revenue_mom_growth",
    "churn_flags_by_cohort",
    "diurnal_activity_profile",
    # dedup_cluster_size_histogram stays out with the components consumers
    # fuzzy_name_clusters stays out with the components consumers
    # kcenter_coreset_selection stays out with the iterative operators
    # llm_curation_pipeline stays out with the other composites
    # (corpus_clean_pipeline, dedup_cluster_assignments): local-mode time
    # for multi-stage compositions is fixed per-stage scheduling, not
    # data volume — their scale signal lives in SCALING.md instead.
    #
    # Round-9 HEADLINE decisions (VERDICT r8 #5, costs from SCALING.md's
    # staged-cost note): doc_chunk_overlap (<1s steady-state) and
    # logreg_newton_lang (3.4s) are listed now but their registrations
    # were deferred to r10 (tie-audit migrations took the seats), so the
    # `n in specs` filter below skips them until then — they join the
    # bench automatically with their r10 registration. The streaming-late
    # pair (8.2s + 5.8s real AvailableNow runs) is deliberately NOT added:
    # +20% headline total for scheduling-floor-dominated costs that carry
    # no scale signal — their cost record lives in SCALING.md.
    "doc_chunk_overlap",
    "logreg_newton_lang",
    # Round-10 additions with their registrations (costs measured at
    # sf0.1, steady-state): bootstrap_ci_order_value 7.8s — large but a
    # genuine scale signal (cost = data x 200 Poisson replicates, the
    # resampling workhorse); winsorized_bounds_sketch_certified 2.4s (GK
    # sketch + rank-verify second pass). The session-late streaming pair
    # stays out with the tumbling pair (same scheduling-floor reasoning).
    "bootstrap_ci_order_value",
    "winsorized_bounds_sketch_certified",
    # Round-11 exclusion: incremental_recompute_equivalence (three
    # AvailableNow runs + three sink swaps, ~11s at every SF) stays out
    # with the streaming pairs — its cost is per-run scheduling floor,
    # not data volume; its scale record lives in SCALING.md.
    #
    # Round-11 additions with their registrations (the five r10-staged
    # operator classes; per test_session_config they join HEADLINE in the
    # same change as their registration). All five are one-data-pass
    # plans whose post-scan work is bounded (5-row fold frame, 1-row
    # sufficient stats, distinct-score/hour/day frames), so their bench
    # line is a genuine scan-cost signal, not scheduling floor.
    "kfold_linreg_cv",
    "pca_power_doc_features",
    "auc_mann_whitney_lang",
    "nelson_aalen_conversion_hazard",
    "changepoint_daily_revenue",
    # Round-12 additions with their registrations (the five r11-staged
    # operator classes; per test_session_config they join HEADLINE in the
    # same change as their registration). All five are one-data-pass
    # plans whose post-scan work is bounded (10-row calibration frame,
    # distinct-score frames for KS/PAV, a quasi-identifier class frame,
    # one session-window pass), so their bench line is a genuine
    # scan-cost signal, not scheduling floor.
    "reliability_bins_lang",
    "isotonic_calibration_lang",
    "ks_two_sample_chars",
    "k_anonymity_audit",
    "attribution_first_last_touch",
    # Round-13 additions with their registrations (the eight r12-staged
    # operator classes plus the bootstrap production twin; per
    # test_session_config they join HEADLINE in the same change as their
    # registration). The trend pair and the render query carry real data
    # signals (calendar-bounded pair frames; the batched rasterize sweep);
    # the rest are one-data-pass plans with bounded post-scan frames.
    # bootstrap_ci_order_value_prod exists precisely to be benched
    # (VERDICT r12 #5a): the xxhash64 production cost printed next to the
    # deliberately-slow md5 certification cost, so the headline total's
    # biggest line item is readable as a certification artifact, not a
    # plan cost.
    "cuped_adjusted_lift",
    "conformal_coverage_lang",
    "seasonal_dow_backtest",
    "n17_render_mask_zbuffer",
    "mann_kendall_daily_trend",
    "theil_sen_daily_slope",
    "basket_association_rules",
    "gini_revenue_concentration",
    "bootstrap_ci_order_value_prod",
    # Round-14 additions with their registrations (the eight r13-staged
    # operator classes; per test_session_config they join HEADLINE in the
    # same change as their registration). The two N17 checksums carry real
    # data signals (the batched rasterize sweep + per-pixel shade/texture
    # math over ~500 meshes at sf0.1); the survival pair, FDR, triangle
    # and ACF queries are one-data-pass plans with bounded post-scan
    # frames (calendar-bounded event steps, |langs|x|sources| cells, the
    # support-gated brand graph, the day grid); dbscan's candidate join is
    # bounded by Σcell² over the eps-grid.
    "n17_render_shaded_checksum",
    "n17_render_texture_checksum",
    "kaplan_meier_survival",
    "logrank_segment_survival",
    "bh_fdr_lang_source",
    "dbscan_grid_roles",
    "triangle_count_brand_graph",
    "acf_ljung_box_daily",
)


# The original round-1 headline set (the first 29 HEADLINE keys, unchanged
# since r1): its subtotal is the stable cross-round comparison basis — the
# full total grows every round as new operators join the suite, so only
# this fixed-key subtotal can be read across BENCH_r{N} artifacts.
R1_KEYS = HEADLINE[:29]

# Rotating coverage sample (VERDICT r13 #4, option b): registered queries
# absent from HEADLINE had no recurring timing signal — a perf regression
# there would be invisible between rounds. Each bench run additionally
# times a deterministic rotating slice of the absentees (1 warm-up + 1
# timed rep, the cheap tier) sized so EVERY absentee gets a timing row at
# least once every SAMPLE_ROUNDS rounds. Sample timings ride in a separate
# "bench_sample" map and are EXCLUDED from the headline total and the
# r1-29 subtotal, which stay cross-round comparable; sample failures are
# recorded but do not null the headline value (the sample is a coverage
# signal, not the comparable total). The slice is a pure function of the
# round number, so a round's artifact names exactly which absentees it
# covered.
SAMPLE_ROUNDS = 3


def _rotating_sample(all_names, headline, round_n: int) -> list[str]:
    """Deterministic slice of the HEADLINE absentees for this round."""
    absent = [n for n in all_names if n not in set(headline)]
    if not absent:
        return []
    k = -(-len(absent) // SAMPLE_ROUNDS)  # ceil: full coverage per cycle
    start = (round_n * k) % len(absent)
    return (absent + absent)[start : start + k]


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _reps_from_args() -> int:
    # Default median-of-3 (VERDICT r5 #3): the driver invokes bench with no
    # flags, so the default is what decides whether the round artifact
    # carries medians; 1-rep totals proved unattributable to noise vs plan.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--reps" and i + 1 < len(argv):
            reps = int(argv[i + 1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    return max(1, reps)


def _measure_anchors(spark, reps: int) -> dict:
    """Machine-state anchor pair (VERDICT r12 #3): two fixed microbenchmarks
    recorded with every bench run so cross-round drift can be priced per
    WORKLOAD CLASS instead of against the single scan-weighted subtotal —
    r12's residual concentrated entirely in hash/string-CPU-bound queries
    on untouched code, which the scan anchor cannot price.

    - ``hash_md5_1m_sec``: 1M JVM md5s over generated strings, no I/O —
      the same portable-md5 primitive that dominates the bootstrap /
      ngram-jaccard / text-quality class.
    - ``scan_lineitem_sec``: one-column parquet scan + aggregate over
      lineitem at SF_DIR — the scan-bound class (compare only at equal sf).

    tools/bench_compare.py divides each query's cross-round ratio by its
    class anchor's ratio; a mover that disappears under its anchor is
    machine state, one that survives is code."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from talkinghead_datapipeline_spark.catalog import load_table  # noqa: PLC0415

    def hash_job() -> None:
        spark.range(0, 1_000_000, 1, 8).select(
            F.md5(
                F.concat(F.lit("anchor|"), F.col("id").cast("string"))
            ).alias("h")
        ).write.format("noop").mode("overwrite").save()

    def scan_job() -> None:
        load_table(spark, SF_DIR, "lineitem").agg(
            F.sum("l_extendedprice").alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).write.format("noop").mode("overwrite").save()

    out = {}
    # Anchors estimate machine CAPABILITY, not workload latency: noise
    # (GC, scheduling) only ever contaminates samples UPWARD, so the MIN
    # over a slightly larger sample is the stable estimator — the first
    # two r13 local runs put the median-of-3 hash anchor at 0.140 vs
    # 0.0747 (1.9x swing on one machine), which would mis-price every
    # hash-bound mover it exists to adjudicate.
    for name, job in (("hash_md5_1m_sec", hash_job), ("scan_lineitem_sec", scan_job)):
        job()  # warm-up, same steady-state protocol as the queries
        samples = []
        for _ in range(max(reps, 5)):
            t0 = time.perf_counter()
            job()
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples), 4)
    return out


def main() -> None:
    reps = _reps_from_args()
    spark = get_spark(app_name="bench")
    # Quiet the artifact tail: recursive-CTE plans emit a benign LogicalRDD
    # name-remap WARN per fixpoint round, and stage-progress lines are
    # already stripped by the driver. Failures still surface as exceptions
    # and null the total (see below); nothing load-bearing is suppressed.
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    names = [n for n in HEADLINE if n in specs]

    def run(name: str) -> None:
        specs[name].spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        # Per-query error containment: one broken query must cost only its
        # own row, never the round's whole performance artifact.
        try:
            # Steady-state measurement: one untimed warm-up run absorbs
            # whole-stage-codegen compilation and parquet footer/file-index
            # caching (one-time costs amortized to ~0 over a real workload),
            # then the timed run(s) measure plan execution (median of
            # ``reps`` to shed scheduler/GC noise).
            #
            # The warm-up is additionally CLOCKED (never summed into any
            # total): for persist_once queries the warm-up also populates
            # the cache the timed reps reuse, so its duration is the COLD
            # time — recording it next to the median makes cache-assisted
            # medians identifiable (VERDICT r14 #4/#8). Timed regions,
            # reps and the median are unchanged.
            tc0 = time.perf_counter()
            run(name)
            cold[name] = round(time.perf_counter() - tc0, 4)
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                run(name)
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 4)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
        finally:
            # Each query's own warm-up repopulates whatever it persists;
            # letting 77 queries' persist_once frames accumulate instead
            # inflates LATER queries' medians (measured: same query 0.9s
            # isolated vs 2.8s late in the shared session) — cache
            # eviction + GC pressure, not plan cost. Clearing between
            # queries makes each row self-contained and cross-round
            # comparable regardless of its position in HEADLINE.
            spark.catalog.clearCache()
            # Harness hygiene in the UNTIMED gap (r14; measurement-bug fix
            # per guide §1.4, disclosed in OPTIMIZATION_r14.md): CPython's
            # cycle collector runs lazily, so the thousands of Column /
            # DataFrame objects a query build creates keep their py4j JVM
            # references alive long after the query retires — the JVM heap
            # then carries every PRIOR query's plan objects while timing
            # the next one. An explicit collect here releases them between
            # queries: A-B-A bracket over the first 60 HEADLINE keys,
            # identical code, 53.4s -> 36.4s -> 55.9s (without / with /
            # without). Timed regions are untouched — same queries, same
            # reps, same median — this only stops query N's garbage from
            # being billed to query N+1.
            gc.collect()

    # Rotating absentee sample (see _rotating_sample): cheap 1-rep tier,
    # separate map, never part of the comparable totals.
    sample_timings: dict[str, float] = {}
    sample_errors: dict[str, str] = {}
    for name in _rotating_sample(list(specs), HEADLINE, _infer_round()):
        try:
            run(name)  # warm-up, same steady-state protocol
            t0 = time.perf_counter()
            run(name)
            sample_timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001
            sample_errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(
                f"bench: sample {name} FAILED: {sample_errors[name]}",
                file=sys.stderr,
            )
        finally:
            spark.catalog.clearCache()
            gc.collect()  # same untimed-gap hygiene as the HEADLINE loop

    # Truncation-proof serialization (VERDICT r6 #1): the driver keeps only
    # the LAST ~2000 chars of stdout, and the per-query map now outgrows
    # that, so BENCH_r06's headline total (serialized before "queries") was
    # unrecoverable. Two defenses: (a) key order puts the big "queries" map
    # FIRST and every summary scalar LAST, so tail capture always retains
    # the totals; (b) a second, compact summary-only JSON line is printed
    # after the full one — whatever the capture window, the last line parses.
    anchors = _measure_anchors(spark, reps)
    summary = {
        "anchors": anchors,
        "metric": "headline_queries_total_sec",
        # A total over a PARTIAL query set is not comparable across rounds
        # (a missing query reads as a speed-up): null it when anything
        # failed — per-query rows still carry the usable signal.
        "value": round(sum(timings.values()), 4) if not errors else None,
        "unit": "sec",
        # Fixed-key subtotal comparable across rounds (see R1_KEYS); null
        # if any of its 29 queries failed, same partial-total rule.
        "subtotal_r1_29": (
            round(sum(timings[k] for k in R1_KEYS), 4)
            if all(k in timings for k in R1_KEYS)
            else None
        ),
        "sf": _sf_from_dir(SF_DIR),
        "reps": reps,
        "n_queries": len(timings),
        "n_sampled": len(sample_timings),
    }
    if errors:
        summary["n_failed"] = len(errors)
        summary["failed_sample"] = sorted(errors)[:3]
    if sample_errors:
        summary["n_sample_failed"] = len(sample_errors)
    # Full error detail rides the big line only (a 122-error dict would
    # outgrow the driver's tail capture and defeat the second line's
    # purpose) — and it is serialized BEFORE the summary scalars so defense
    # (a), totals-last, holds in exactly the failure case it was built for.
    result = {
        "queries": timings,
        "queries_cold": cold,
        "bench_sample": sample_timings,
        **({"errors": errors} if errors else {}),
        **({"sample_errors": sample_errors} if sample_errors else {}),
        **summary,
    }
    # Bounded per-query digest on the FINAL line only (VERDICT r14 #2): the
    # driver's tail capture only ever sees the last ~2000 chars of stdout,
    # so two rounds of PERF artifacts carried per_query: {} and a null
    # geomean while the full maps lived in the first line and the committed
    # BENCH_LOCAL files the driver does not read. This map restores a
    # driver-parseable per-query signal: 2-decimal medians, biggest line
    # items first (those are what a cross-round or cross-core comparison
    # can resolve; the excluded tail is sub-floor scheduling noise), under
    # a hard character budget so the final line always fits the capture
    # with the totals intact. The big first line keeps the FULL 4-decimal
    # map exactly as before; summary scalars still serialize after the
    # digest so defense (a) — totals last — holds (VERDICT r6 #1).
    final_line = {"queries": _digest(timings), **summary}
    print(json.dumps(result))
    print(json.dumps(final_line))
    # Permanent in-repo record (VERDICT r7 #6): the driver's artifact keeps
    # only the last ~2000 chars of stdout, which loses the first ~70
    # queries' timings each round. Persist the full JSON to a round-stamped
    # file so every round's complete per-query history survives in git.
    _write_local_record(result)
    spark.stop()


_DIGEST_BUDGET = 1300  # chars of serialized map the final line may spend


def _digest(timings: dict[str, float], budget: int = _DIGEST_BUDGET) -> dict:
    """2-decimal per-query map bounded to ``budget`` serialized chars.

    Deterministic selection: slowest queries first (name as tiebreak), so
    the digest always carries the line items a performance comparison can
    actually resolve — everything excluded is at or below the local-mode
    scheduling floor, where cross-run spread exceeds any code signal."""
    out: dict[str, float] = {}
    used = 0
    for name, sec in sorted(timings.items(), key=lambda kv: (-kv[1], kv[0])):
        cost = len(name) + 12  # '"<name>": 12.34, ' serialized footprint
        if used + cost > budget:
            break
        out[name] = round(sec, 2)
        used += cost
    return out


def _infer_round() -> int:
    """Current round = latest driver-written BENCH_r{N}.json + 1 (the driver
    stamps N only after the round ends); SPARK_GRAFT_ROUND overrides."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for f in os.listdir(here)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
    ]
    return (max(rounds) + 1) if rounds else 0


def _write_local_record(result: dict) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, f"BENCH_LOCAL_r{_infer_round():02d}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=False)
        f.write("\n")
    return path


if __name__ == "__main__":
    main()
