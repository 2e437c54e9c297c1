"""Mathematical-invariant pins for the round-6 statistical operators:
properties guaranteed by the math itself, independent of any reference
implementation — a wrong-side-of-the-formula bug can pass a differential
test when both dialects share it, but it cannot beat a theorem.
"""

from __future__ import annotations

from talkinghead_datapipeline_spark.queries import all_queries

_SPECS = all_queries()


def test_kcenter_radius_sequence_non_increasing(spark, sf_dir):
    """Farthest-first theorem: each greedy pick's selection-time distance
    is the current covering radius, and adding centers can only shrink it
    — the radius sequence must be non-increasing after the seed row."""
    rows = (
        _SPECS["kcenter_coreset_selection"]
        .spark(spark, sf_dir)
        .toPandas()
        .sort_values("sel_idx")
    )
    radii = rows.radius.tolist()[1:]  # seed row carries 0.0 by convention
    assert all(a >= b for a, b in zip(radii, radii[1:])), radii
    assert all(r >= 0 for r in radii)


def test_psi_terms_individually_non_negative(spark, sf_dir):
    """(p−q)·ln(p/q) ≥ 0 for every bin: the factors always share a sign.
    A sign error in either factor (the classic PSI transcription bug)
    would surface as a negative term."""
    rows = _SPECS["psi_snapshot_drift"].spark(spark, sf_dir).toPandas()
    assert (rows.psi_term >= 0).all(), rows[rows.psi_term < 0]


def test_chi2_terms_non_negative_and_marginals_consistent(spark, sf_dir):
    """(O−E)²/E ≥ 0 per cell, and the dense grid's expected counts must
    reproduce the observed grand total exactly (Σ E = Σ O = N)."""
    rows = _SPECS["chi2_lang_source_cells"].spark(spark, sf_dir).toPandas()
    assert (rows.chi2_term >= 0).all()
    assert abs(rows.expected.sum() - rows.observed.sum()) < 1e-3


def test_temperature_shares_are_distributions(spark, sf_dir):
    """Both share columns are probability distributions (sum to 1), and
    alpha < 1 upweights exactly the below-average-share languages:
    upsample_factor > 1 iff raw_share < the n^α-weighted pivot — checked
    via the monotonicity corollary (factors sorted by raw share are
    non-increasing)."""
    rows = (
        _SPECS["temperature_mixture_weights"]
        .spark(spark, sf_dir)
        .toPandas()
        .sort_values("raw_share")
    )
    assert abs(rows.raw_share.sum() - 1.0) < 1e-4
    assert abs(rows.temp_share.sum() - 1.0) < 1e-4
    f = rows.upsample_factor.tolist()
    assert all(a >= b - 1e-9 for a, b in zip(f, f[1:])), f


def test_covariance_diagonal_non_negative(spark, sf_dir):
    """Variances (the i == j cells) are non-negative by definition; a
    centering bug (Σxy − ΣxΣy/n sign slip) would drive them negative."""
    rows = _SPECS["emb_covariance_upper"].spark(spark, sf_dir).toPandas()
    diag = rows[rows.i == rows.j]
    assert len(diag) == 64
    # diag["cov"]: attribute access collides with Series.cov
    assert (diag["cov"] >= 0).all()


def test_benford_probabilities_and_digit_domain(spark, sf_dir):
    """The Benford reference column must itself be the Benford
    distribution (sums to 1 over digits 1..9) and every observed digit
    must be in 1..9."""
    rows = _SPECS["benford_first_digit"].spark(spark, sf_dir).toPandas()
    assert rows.digit.between(1, 9).all()
    assert abs(rows.observed_p.sum() - 1.0) < 1e-4
    # reference shares for PRESENT digits are each log10(1+1/d) exactly
    import math

    for _, r in rows.iterrows():
        assert abs(r.benford_p - math.log10(1 + 1 / r.digit)) < 1e-6


def test_mutual_knn_is_symmetric_subset(spark, sf_dir):
    """Every emitted mutual edge is (a < b)-oriented exactly once, and
    edges never cross cluster labels."""
    rows = _SPECS["knn_mutual_edges"].spark(spark, sf_dir).toPandas()
    pairs = list(zip(rows.key_a, rows.key_b))
    assert len(pairs) == len(set(pairs))
    assert (rows.key_a < rows.key_b).all()
