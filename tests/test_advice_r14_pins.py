"""Pins for the two load-bearing invariants ADVICE r14 flagged as
comment-only after the r14 optimization rewrites.

- pagerank_trade_network dropped its per-iteration nodes-LEFT-join on the
  argument that the bidirectional edge construction makes every node some
  edge's dst; if edges ever become directed, ranks would silently lose
  zero-in-degree nodes while still normalizing by n_nodes.
- sim_lsh_recall_certified's single full-outer pass counts per-side
  non-nulls; duplicates on either side would multiply join rows and
  inflate all three counts.
"""

from __future__ import annotations


def test_pagerank_every_node_is_some_edges_dst(spark, sf_dir):
    from talkinghead_datapipeline_spark.queries.graph import _trade_edges

    edges = _trade_edges(spark, sf_dir)
    src = {r[0] for r in edges.select("src").distinct().collect()}
    dst = {r[0] for r in edges.select("dst").distinct().collect()}
    assert src == dst, (
        f"bidirectional invariant broken: {len(src - dst)} src-only, "
        f"{len(dst - src)} dst-only nodes — pagerank's removed "
        "nodes-LEFT-join is no longer dead code"
    )


def test_lsh_recall_sides_are_distinct_on_vec_id(spark, sf_dir):
    from talkinghead_datapipeline_spark.queries import _REGISTRY, _ensure_loaded

    _ensure_loaded()
    for name in ("sim_brute_cosine_topk", "sim_lsh_bucket_topk"):
        ids = [
            r[0]
            for r in _REGISTRY[name].spark(spark, sf_dir).select("vec_id").collect()
        ]
        assert len(ids) == len(set(ids)), (
            f"{name} emits duplicate vec_ids — sim_lsh_recall_certified's "
            "full-outer count rewrite assumes per-side uniqueness"
        )
