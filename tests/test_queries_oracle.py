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

    # round-11 canaries: every query whose implementation (or output
    # contract) changed after its last green driver row holds a seat —
    # the five r10-staged registrations (never certified yet, so they
    # lead their section of the window per the governor above) plus any
    # r11 changed-code query (flame_render_pipeline gains the N17
    # projection columns, VERDICT r10 #2 — added with that change).
    canaries = {
        # r11 changed-code: N17 projection columns (VERDICT r10 #2)
        "flame_render_pipeline",
        # r11 registrations (staged r10, three-SF oracle + invariance)
        "kfold_linreg_cv",
        "pca_power_doc_features",
        "auc_mann_whitney_lang",
        "nelson_aalen_conversion_hazard",
        "changepoint_daily_revenue",
        # r11 registration (VERDICT r10 #3): IVM ≡ recompute certification
        "incremental_recompute_equivalence",
    }
    assert canaries <= prefix, f"missing canaries: {sorted(canaries - prefix)}"
    # Staleness floor (VERDICT r10 #4): the full r6-era tier is seated,
    # so after r11 no key's latest green row predates r7.
    r6_era = {
        "ewma_user_values", "gap_fill_hourly", "gopher_dup_line_signals",
        "gopher_dup_trigram_coverage", "hll_distinct_users",
        "item_cf_top_recs", "lineitem_measure_correlations",
        "merge_upsert_latest", "ohlc_6h_bars", "pagerank_trade_network",
        "pmi_top_collocations", "random_projection_jl",
        "range_frame_trailing_30min", "recursive_cte_key_depths",
        "robust_outlier_flags", "scd2_user_value_intervals",
        "session_funnel_conversion", "sim_ivf_trained_topk",
        "sim_ivfpq_topk", "sim_pq_adc_topk", "sim_sq8_quant_topk",
        "snapshot_diff_summary", "source_mixture_manifest",
        "substring_dup_coverage", "table_integrity_checksums",
        "text_unigram_entropy", "tfidf_top_terms", "triangle_count_copart",
        "weighted_topk_sample_es", "zorder_data_skipping",
    }
    assert r6_era <= prefix, f"unseated r6-era keys: {sorted(r6_era - prefix)}"



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
