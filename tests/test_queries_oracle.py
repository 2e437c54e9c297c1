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
    check. A rows-only registration silently downgrades the driver's
    verdict for that key, so the exception list is PINNED, not open: the
    only entry is the bootstrap's xxhash64 production twin (VERDICT r12
    #5a — registered to publish the production cost in the bench HEADLINE;
    Spark-native xxhash64 has no DuckDB twin, and its value certification
    rides the md5 twin's oracle via the plan-shape-equality and
    weight-moment pins in tests/test_bootstrap_staged.py)."""
    assert _ROWS_ONLY == ["bootstrap_ci_order_value_prod"], (
        f"rows-only queries outside the pinned exception: {_ROWS_ONLY}"
    )


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
            if (v.get("err") is None and v.get("rows_match") is not False)
            # A deliberately oracle-less query (oracle=None — e.g. the
            # xxhash64 bootstrap prod twin, Spark-native hash with no
            # DuckDB twin) records err="no_oracle" with its row count:
            # that rows-only row IS its certification — the strongest
            # check the driver can ever run for it — so it must not
            # occupy a window seat every round forever.
            or (v.get("err") == "no_oracle" and v.get("spark_rows") is not None)
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

    # round-14 canaries: every query whose implementation (or output
    # contract) changed after its last green driver row holds a seat —
    # the eight r14 registrations (never certified yet, so they lead the
    # window per the governor above). r14's other code edits touch only
    # the UNREGISTERED r15-staged kmv query (ADVICE r13 ANSI div guard)
    # and comments, so no changed-code canaries are owed.
    canaries = {
        # r14 registrations (staged r13, three-SF oracle + invariance)
        "n17_render_shaded_checksum",
        "n17_render_texture_checksum",
        "kaplan_meier_survival",
        "logrank_segment_survival",
        "bh_fdr_lang_source",
        "dbscan_grid_roles",
        "triangle_count_brand_graph",
        "acf_ljung_box_daily",
    }
    assert canaries <= prefix, f"missing canaries: {sorted(canaries - prefix)}"
    # Staleness floor: the full remaining r9-era tier is seated, so after
    # r14 no key's latest green row predates r10 (the r8 tier drained in
    # r13 the same way).
    r9_era = {
        "lang_id_heuristic", "multimodal_binary_features",
        "multimodal_frame_sample", "multimodal_image_channel_means",
        "n10_bbox_transform_chain", "n14_code_split", "pack_token_budget",
        "profile_documents", "q14_promo_revenue_ratio", "q15_top_supplier",
        "q17_below_avg_quantity", "q19_disjunctive_revenue",
        "q22_dormant_rich_customers", "q6_forecast_revenue",
        "q7_volume_shipping", "q8_market_share", "q9_product_type_profit",
        "range_interval_join", "revenue_mom_growth", "s5_blink_features",
        "s7_resample_linear", "sim_brute_cosine_topk",
        "sim_cosine_topk_per_label", "sim_ivf_probe_topk",
        "sim_lsh_bucket_topk", "simhash_fingerprint",
        "simhash_hamming_near_dups", "skew_salted_quantity_rollup",
        "source_overlap_matrix", "split_train_val_test",
        "stratified_sample_by_lang", "streaming_late_data_metrics",
        "streaming_late_sink_counts", "string_functions_suite",
        "table_profile_orders", "text_bpe_token_count",
        "text_quality_score", "text_token_stats", "wav2vec_features_stub",
        "weighted_sample_by_length", "wide_source_assembly",
        "window_rank_suite",
    }
    assert r9_era <= prefix, f"unseated r9-era keys: {sorted(r9_era - prefix)}"



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
