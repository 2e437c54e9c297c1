"""Differential tests: every registered query vs its DuckDB oracle.

This is the local replica of the driver's t2 correctness gate
(sf0.001 by default; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for
the driver-scale run).
"""

from __future__ import annotations

import pytest

from talkinghead_datapipeline_spark.queries import all_queries
from tests.oracle_harness import run_compare

_SPECS = all_queries()
_WITH_ORACLE = sorted(name for name, s in _SPECS.items() if s.oracle is not None)
_ROWS_ONLY = sorted(name for name, s in _SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = _SPECS[name]
    result = run_compare(spark, sf_dir, name, spec.spark, spec.oracle)
    assert result.ok, str(result)


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle (currently none — all registered queries
    are oracled; see test_all_queries_oracled) still get a rows-and-schema
    smoke; a plain loop so an empty list is a trivial pass, not a
    parametrize skip."""
    for name in _ROWS_ONLY:
        df = _SPECS[name].spark(spark, sf_dir)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0


def test_all_queries_oracled():
    """Every registered query carries a DuckDB oracle — the strong driver
    check. A rows-only registration would silently downgrade the driver's
    verdict for that key; keep the set empty on purpose."""
    assert _ROWS_ONLY == [], f"queries without an oracle: {_ROWS_ONLY}"


def test_output_schemas_are_scalar_only(spark, sf_dir):
    """Driver-canonicalizer guard (VERDICT r5 #2): the external comparison
    harness canonicalizes results with pandas ``sort_values`` over ALL
    output columns, which raises ``TypeError: unhashable type`` on list or
    dict cells — so an array/map/struct-typed TOP-LEVEL output column can
    never be driver-certified (r5's `emb_label_centroids` red row). Complex
    types are fine as intermediates; final projections must be scalar.
    Schema comes from the analyzed (lazy) plan — nothing executes here."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders: dict[str, list[str]] = {}
    for name, spec in _SPECS.items():
        df = spec.spark(spark, sf_dir)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "array/map/struct top-level output columns break the driver's "
        f"pandas-sort canonicalizer: {offenders}"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))


def test_driver_priority_rotation_policy():
    """The driver checks a ~50-entry prefix of the registry each round, and
    the prefix is ROTATED (VERDICT r4 #2): staleness beats family balance.
    Policy pins: (1) every query the driver has never certified leads the
    window, so cumulative driver coverage reaches every registered query
    (len(_SPECS), all oracled); (2) every family
    keeps evidence — either a past driver-green row or a seat in the current
    prefix; (3) every query whose code changed in the current round holds a
    canary seat."""
    import json
    from pathlib import Path

    names = list(_SPECS)
    prefix = set(names[:50])
    repo = Path(__file__).resolve().parent.parent

    certified: set[str] = set()
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        rows = json.loads(f.read_text())
        certified |= {
            k
            for k, v in rows.items()
            if v.get("err") is None and v.get("rows_match") is not False
        }
    never = set(names) - certified
    # REGISTRY-GROWTH GOVERNOR (VERDICT r6 #2): a registration batch that
    # would leave more never-certified queries than one 50-seat driver
    # window can absorb fails CI — round 6 registered 96 against 50 seats
    # and dropped cumulative certification 100%→76%. Growth must wait for
    # the backlog to drain: register at most (50 - len(never)) new queries
    # per round.
    assert len(never) <= 50, (
        f"{len(never)} never-driver-certified queries exceed one 50-seat "
        f"window; freeze registrations until the backlog drains. "
        f"Backlog: {sorted(never)}"
    )
    # The window holds 50 seats; once more than 50 never-certified queries
    # exist, the overflow is tracked explicitly in _NEXT_ROUND_QUEUE (it
    # leads the next rotation) rather than silently dropped from coverage.
    from talkinghead_datapipeline_spark.queries import _NEXT_ROUND_QUEUE

    outside = never - prefix
    assert outside == set(_NEXT_ROUND_QUEUE), (
        "never-driver-checked queries outside the window must be exactly "
        f"the declared overflow queue; unexpected: {sorted(outside - set(_NEXT_ROUND_QUEUE))}, "
        f"stale queue entries: {sorted(set(_NEXT_ROUND_QUEUE) - outside)}"
    )

    families = {
        "dedup": "minhash_lsh_near_dups",
        "similarity": "sim_lsh_bucket_topk",
        "textops": "text_bpe_token_count",
        "dataprep": "pack_token_budget",
        "streaming": "streaming_user_sessions",
        "multimodal": "multimodal_image_channel_means",
        "inference": "flame_decode_landmarks",
        "assembly": "a2en_feature_assembly",
        "timeseries": "s7_resample_linear",
        "kernels": "n10_bbox_transform_chain",
        "relational": "flagship_segment_leaders",
        "functions": "array_hof_suite",
    }
    uncovered = {
        fam: q
        for fam, q in families.items()
        if q not in prefix and q not in certified
    }
    assert not uncovered, f"families with no driver evidence at all: {uncovered}"

    # round-12 canaries: every query whose implementation (or output
    # contract) changed after its last green driver row holds a seat —
    # the five r11-staged registrations (never certified yet, so they
    # lead their section of the window per the governor above) plus the
    # r12 changed-code pair (streaming/incremental.py gained the
    # _applied_batch_id replay watermark, ADVICE r11: the merge consumer
    # changed behavior; the upsert consumer is seated defensively for the
    # shared-module edit).
    canaries = {
        # r12 changed-code: foreachBatch replay idempotency (ADVICE r11)
        "incremental_recompute_equivalence",
        "streaming_foreachbatch_upsert",
        # late-r12 changed-code: the N17 rasterizer/SH tier became real
        # math and the decode+render path batched (operators/rasterize.py);
        # the decode query is seated for the shared affine refactor
        "flame_render_pipeline",
        "flame_decode_landmarks",
        # r12 registrations (staged r11, three-SF oracle + invariance)
        "reliability_bins_lang",
        "isotonic_calibration_lang",
        "ks_two_sample_chars",
        "k_anonymity_audit",
        "attribution_first_last_touch",
    }
    assert canaries <= prefix, f"missing canaries: {sorted(canaries - prefix)}"
    # Staleness floor: the full remaining r7-era tier is seated, so after
    # r12 no key's latest green row predates r8.
    r7_era = {
        "event_transition_matrix", "fk_integrity_audit",
        "frequent_event_trigrams", "fuzzy_blocking_recall_certified",
        "fuzzy_name_clusters", "fuzzy_part_match_pairs",
        "gopher_quality_filter", "group_split_no_leakage",
        "hard_negative_mining", "histogram_fixed_width",
        "kcenter_coreset_selection", "keyword_domain_tags",
        "knn_mutual_edges", "llm_curation_pipeline",
        "minhash_estimate_error", "mode_nation_per_segment",
        "nb_lang_classifier_scores", "nb_lang_margin",
        "order_interarrival_by_segment", "psi_snapshot_drift",
        "retention_cohorts", "rfm_segments", "rolling_mad_anomalies",
        "rrf_hybrid_topk", "semdedup_prune_stats",
        "sim_lsh_recall_certified", "temperature_mixture_weights",
        "tokenizer_fertility_per_lang", "trailing_zscore_anomalies",
        "unigram_kl_per_source", "zipf_slope_per_lang",
    }
    assert r7_era <= prefix, f"unseated r7-era keys: {sorted(r7_era - prefix)}"



def test_compare_is_numeric_type_sensitive():
    """Round-1 regression: Spark BIGINT 40024 vs DuckDB DOUBLE 40024.0
    passed the old ``==`` compare but failed the driver's dtype-sensitive
    hash. The hardened compare must FAIL it locally."""
    import pandas as pd

    from tests.oracle_harness import compare_frames

    spark_pdf = pd.DataFrame({"total_lines": pd.array([40024], dtype="int64")})
    oracle_pdf = pd.DataFrame({"total_lines": pd.array([40024.0], dtype="float64")})
    res = compare_frames("widening_regression", spark_pdf, oracle_pdf)
    assert not res.ok, "int-vs-float widening must be a local FAIL"
    same = compare_frames(
        "widening_ok",
        pd.DataFrame({"x": pd.array([40024.0], dtype="float64")}),
        pd.DataFrame({"x": pd.array([40024.0], dtype="float64")}),
    )
    assert same.ok
