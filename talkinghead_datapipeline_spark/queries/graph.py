"""Iterative graph queries over the TPC-H trade network.

The duplicate-clustering operator (``operators/components.py``) covers the
connectivity class; this module adds the *value-iteration* class — a
fixed-iteration PageRank whose every step is the canonical Pregel shape
re-expressed as DataFrame joins: rank-state joins edges on src (one
shuffle), contributions aggregate on dst (one shuffle), teleport is a
map-side literal. A FIXED iteration count keeps the computation a pure
function of the input, so a DuckDB oracle can unroll the same three
iterations as CTEs and the driver certifies every rank value.

At 100 TB: the edge list is the big table and stays hash-partitioned by
src across iterations (one explicit repartition, then every per-iteration
join reuses that distribution); rank state is ~|V| rows, re-shuffled on
dst each step — exactly GraphX's join-strategy, minus the driver-side
convergence check a fixed count avoids. Lineage stays 3 steps deep, so no
checkpoint is needed; an open-ended variant would cut lineage every ~10
steps like ``operators/components.py`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.catalog import load_table, persist_once
from talkinghead_datapipeline_spark.queries import register

_DAMP = 0.85
_ITERS = 3
# Supplier node ids are offset past any custkey (sf10k custkeys < 2^31).
_SUPP_OFFSET = 10_000_000_000


def _pagerank_oracle() -> str:
    """Unrolled 3-iteration PageRank as DuckDB CTEs — same edges, same
    teleport, same damping, so both engines walk identical doubles."""
    steps = []
    prev = "r0"
    for i in range(1, _ITERS + 1):
        steps.append(
            f"""
    r{i} AS (
      SELECT n.node,
             (1.0 - {_DAMP}) / (SELECT n_nodes FROM meta)
             + {_DAMP} * coalesce(c.contrib, 0.0) AS rank
      FROM nodes n
      LEFT JOIN (
        SELECT e.dst AS node, sum(p.rank / d.outdeg) AS contrib
        FROM edges e
        JOIN {prev} p ON p.node = e.src
        JOIN outdeg d ON d.node = e.src
        GROUP BY e.dst
      ) c ON c.node = n.node
    )"""
        )
        prev = f"r{i}"
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT CAST(cust AS BIGINT) AS src,
             CAST(supp + {_SUPP_OFFSET} AS BIGINT) AS dst FROM pairs
      UNION ALL
      SELECT CAST(supp + {_SUPP_OFFSET} AS BIGINT) AS src,
             CAST(cust AS BIGINT) AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    meta AS (SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM nodes),
    outdeg AS (
      SELECT src AS node, CAST(count(*) AS DOUBLE) AS outdeg
      FROM edges GROUP BY src
    ),
    r0 AS (
      SELECT node, 1.0 / (SELECT n_nodes FROM meta) AS rank FROM nodes
    ),{','.join(steps)}
    SELECT CASE WHEN node >= {_SUPP_OFFSET} THEN 'supplier' ELSE 'customer' END
             AS node_kind,
           CAST(CASE WHEN node >= {_SUPP_OFFSET}
                     THEN node - {_SUPP_OFFSET} ELSE node END AS BIGINT)
             AS node_key,
           round(rank * 1000.0, 9) AS rank_x1000
    FROM {prev}
    ORDER BY rank_x1000 DESC, node_kind ASC, node_key ASC
    LIMIT 20
    """


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional customer↔supplier edge list behind pagerank — exposed
    so tests can pin the load-bearing invariant `distinct src == distinct
    dst` (every node is some edge's dst), which is what makes the removed
    per-iteration nodes-LEFT-join dead code (ADVICE r14). A future switch
    to directed edges breaks the test before it can silently drop
    zero-in-degree nodes from the ranks."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    return pairs.select(
        F.col("o_custkey").cast("bigint").alias("src"),
        (F.col("l_suppkey") + _SUPP_OFFSET).cast("bigint").alias("dst"),
    ).unionAll(
        pairs.select(
            (F.col("l_suppkey") + _SUPP_OFFSET).cast("bigint").alias("src"),
            F.col("o_custkey").cast("bigint").alias("dst"),
        )
    )


@register("pagerank_trade_network", oracle=_pagerank_oracle(), tags=("graph", "iterative"))
def pagerank_trade_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 fixed iterations) over the bidirectional
    customer↔supplier trade graph derived from orders⨝lineitem; top-20
    nodes by rank. Bidirectionality makes every node's out-degree ≥ 1, so
    there is no dangling mass to redistribute and the per-step update is
    rank' = (1-d)/N + d·Σ_in rank/outdeg — the exact form the oracle
    unrolls. Ranks are reported ×1000 rounded to 9: cross-engine float
    noise on a 3-deep double chain is ~1e-15 relative, orders below the
    rounding quantum."""
    # One explicit hash distribution by src; each iteration's rank⨝edges
    # then reuses it instead of re-shuffling the (big) edge side.
    edges = _trade_edges(spark, sf_dir).repartition("src")
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("double").alias("outdeg")
    )
    # persist the ITERATION state (edges ⨝ outdeg), not the raw edge list:
    # the whole 3-iteration DAG executes as ONE job, inside which the
    # state subtree appears _ITERS times — with only edges persisted, the
    # outdeg agg + join re-executed per iteration. Locally that's a wash
    # (cold-cache medians 2.95s edges-persist vs 3.04s state-persist at
    # sf0.1 — co-partitioning makes the re-run shuffle-free), but the
    # degree-annotated adjacency is the canonical materialization: per
    # iteration it reads one cache instead of re-running an agg + join
    # over it, and it costs the same memory (one extra double per edge).
    state = persist_once(
        edges.join(outdeg, edges.src == outdeg.node).select(
            "src", "dst", "outdeg"
        )
    )
    nodes = persist_once(state.select(F.col("src").alias("node")).distinct())
    n_nodes = float(nodes.count())  # one tiny job; |V| is an agg, not data

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - _DAMP) / n_nodes
    # No per-iteration nodes-LEFT-join: the graph is bidirectional by
    # construction (every (cust, supp) pair emits BOTH directions), so every
    # node in `nodes` (= distinct src) is also some edge's dst and appears
    # in `contrib` — the left join's coalesce(contrib, 0) branch was dead
    # code costing a join per iteration. The coalesce stays in the rank
    # expression so the update arithmetic is token-identical. Each
    # iteration is now ONE exchange (the dst-keyed agg); the next join
    # needs ranks hashed by node and contrib's dst-hash output already
    # satisfies it (same key domain, same partition count).
    for _ in range(_ITERS):
        contrib = (
            state.join(ranks, state.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("contrib"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (
                F.lit(teleport) + _DAMP * F.coalesce("contrib", F.lit(0.0))
            ).alias("rank"),
        )

    return (
        ranks.select(
            F.when(F.col("node") >= _SUPP_OFFSET, "supplier")
            .otherwise("customer")
            .alias("node_kind"),
            F.when(
                F.col("node") >= _SUPP_OFFSET, F.col("node") - _SUPP_OFFSET
            )
            .otherwise(F.col("node"))
            .cast("bigint")
            .alias("node_key"),
            F.round(F.col("rank") * 1000.0, 9).alias("rank_x1000"),
        )
        .orderBy(F.desc("rank_x1000"), "node_kind", "node_key")
        .limit(20)
    )


@register(
    "recursive_cte_key_depths",
    oracle="""
    WITH RECURSIVE walk(key, node, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer
      UNION ALL
      SELECT key, node // 2, depth + 1 FROM walk WHERE node > 1
    )
    SELECT CAST(depth AS BIGINT) AS root_depth,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(min(key) AS BIGINT) AS min_key,
           CAST(max(key) AS BIGINT) AS max_key
    FROM (SELECT key, max(depth) AS depth FROM walk GROUP BY key)
    GROUP BY root_depth
    """,
    tags=("graph", "recursive", "sql"),
)
def recursive_cte_key_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE on the Spark side (new in Spark 4): walk every
    customer key up the implicit binary tree (parent = key div 2) to the
    root and histogram the path depths. Exercises the recursive-CTE
    surface end to end — seed ∪ step fixpoint, integer-division parity
    (`div` vs `//`), per-key max aggregation over the recursion — against
    DuckDB's recursive CTE on identical SQL semantics. Depth is
    O(log maxkey), so the fixpoint runs ~⌈log2 N⌉ rounds; each round is
    one self-referencing projection, the same iteration shape as the
    pointer-jumping components operator, but expressed declaratively."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_rcte"
    )
    return spark.sql(
        """
        WITH RECURSIVE walk(key, node, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer_rcte
          UNION ALL
          SELECT key, node DIV 2, depth + 1 FROM walk WHERE node > 1
        )
        SELECT CAST(depth AS BIGINT) AS root_depth,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(min(key) AS BIGINT) AS min_key,
               CAST(max(key) AS BIGINT) AS max_key
        FROM (SELECT key, max(depth) AS depth FROM walk GROUP BY key)
        GROUP BY root_depth
        """
    )


# ---------------------------------------------------------------------------
# Triangle counting — the local-clustering primitive, on the part co-purchase
# graph: parts are nodes, an (undirected) edge connects two parts that appear
# together in >= 2 orders (the support threshold keeps the graph the
# affinity graph, and bounds edge count at any SF — measured ~3.4k edges at
# sf0.01 AND ~3.6k at sf0.1, because co-purchase support concentrates).
# ---------------------------------------------------------------------------

_TRI_SUPPORT = 2
_TRI_TOPK = 15


@register(
    "triangle_count_copart",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    edges AS (
      SELECT a.p AS pa, b.p AS pb
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING count(*) >= {_TRI_SUPPORT}
    ),
    tris AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM edges e1
      JOIN edges e2 ON e1.pb = e2.pa
      JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    per_node AS (
      SELECT node, count(*) AS n_triangles FROM (
        SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris
      ) GROUP BY 1
    )
    SELECT node AS p_partkey, n_triangles
    FROM per_node
    ORDER BY n_triangles DESC, p_partkey
    LIMIT {_TRI_TOPK}
    """,
    tags=("graph", "triangle"),
)
def triangle_count_copart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 parts by triangle participation in the co-purchase graph.

    Scale shape: the edge build is one (order) self-join plus a
    (pa, pb) count shuffle; triangle enumeration is the canonical oriented
    2-path join — edges ordered pa < pb mean each triangle is produced
    exactly once, the wedge join keys on the shared middle node, and the
    closing edge check is an equi-join (broadcast here: the support
    threshold keeps |E| dim-sized; at denser graphs you'd orient by
    (degree, id) instead of id so wedge fan-out concentrates on low-degree
    middles — noted, not needed at this support level). Per-node counts
    are a posexplode-free 3-way UNION ALL + count."""
    # The distinct (order, part) base is persisted alongside the edge frame:
    # it feeds the self-join here and, in item_cf_top_recs, BOTH the co
    # frame and the per-item totals — without it the totals branch re-ran
    # the lineitem scan + distinct exchange on every execution.
    li = persist_once(
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    edges = persist_once(
        li.alias("a")
        .join(li.alias("b"), F.expr("a.o = b.o AND a.p < b.p"))
        .select(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _TRI_SUPPORT)
        .select("pa", "pb")
    )
    e1 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = edges.select(F.col("pa").alias("b2"), F.col("pb").alias("c"))
    e3 = edges.select(F.col("pa").alias("a3"), F.col("pb").alias("c3"))
    tris = (
        # support-thresholded affinity edges are dim-sized at every SF
        # (~3.5k at sf0.01 AND sf0.1), so both the wedge side and the
        # closing-edge side broadcast; a denser graph would SMJ the wedge.
        e1.join(F.broadcast(e2), F.col("b") == F.col("b2"))
        .join(
            F.broadcast(e3),
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
            "left_semi",
        )
        .select("a", "b", "c")
    )
    nodes = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
    )
    return (
        nodes.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .select(F.col("node").alias("p_partkey"), "n_triangles")
        .orderBy(F.desc("n_triangles"), F.asc("p_partkey"))
        .limit(_TRI_TOPK)
    )


# ---------------------------------------------------------------------------
# Item-item collaborative filtering — the classic co-occurrence recommender
# (Jaccard-weighted "customers who bought X also bought Y"), sharing the
# support-thresholded co-purchase edge machinery with triangle counting.
# ---------------------------------------------------------------------------


@register(
    "item_cf_top_recs",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    cnt AS (SELECT p, count(*) AS c FROM li GROUP BY 1),
    co AS (
      SELECT a.p AS pa, b.p AS pb, count(*) AS co
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING count(*) >= {_TRI_SUPPORT}
    ),
    sym AS (
      SELECT pa AS item, pb AS rec, co FROM co
      UNION ALL SELECT pb, pa, co FROM co
    ),
    scored AS (
      SELECT s.item, s.rec, s.co,
             round(CAST(s.co AS DOUBLE) / (ca.c + cb.c - s.co), 6) AS jaccard
      FROM sym s
      JOIN cnt ca ON ca.p = s.item
      JOIN cnt cb ON cb.p = s.rec
    ),
    best AS (
      SELECT item, rec, co, jaccard,
             row_number() OVER (PARTITION BY item
                                ORDER BY jaccard DESC, rec) AS rk
      FROM scored
    )
    SELECT item AS p_partkey, rec AS rec_partkey,
           CAST(co AS BIGINT) AS n_co_orders, jaccard
    FROM best WHERE rk = 1
    ORDER BY jaccard DESC, p_partkey
    LIMIT 25
    """,
    tags=("graph", "recommendation", "similarity"),
)
def item_cf_top_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-weighted item-item CF: for each part, its single best
    "bought-together" recommendation (top-25 strongest overall).

    Scale shape: co-occurrence is the one heavy shuffle (same edge build
    triangle_count_copart caches — literally the same persist_once frame),
    per-item totals are a dim-sized count broadcast into the score join,
    the per-item argmax is WindowGroupLimit-prunable rank=1, and the final
    list is TakeOrderedAndProject. Support >= 2 bounds the pair set the
    same way it bounds the triangle edge set."""
    # Same persisted distinct base as triangle_count_copart (identical
    # plan → one cache entry serves both queries in a shared session): the
    # per-item totals otherwise re-ran the lineitem scan + distinct
    # exchange per execution while only the co frame was cached.
    li = persist_once(
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    cnt = li.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    co = persist_once(
        li.alias("a")
        .join(li.alias("b"), F.expr("a.o = b.o AND a.p < b.p"))
        .select(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= _TRI_SUPPORT)
    )
    sym = co.select(
        F.col("pa").alias("item"), F.col("pb").alias("rec"), "co"
    ).unionAll(co.select(F.col("pb").alias("item"), F.col("pa").alias("rec"), "co"))
    scored = (
        sym.join(
            F.broadcast(cnt.select(F.col("p").alias("item"), F.col("c").alias("ca"))),
            "item",
        )
        .join(
            F.broadcast(cnt.select(F.col("p").alias("rec"), F.col("c").alias("cb"))),
            "rec",
        )
        .select(
            "item",
            "rec",
            "co",
            F.round(
                F.col("co").cast("double") / (F.col("ca") + F.col("cb") - F.col("co")),
                6,
            ).alias("jaccard"),
        )
    )
    from pyspark.sql.window import Window as W

    rk = F.row_number().over(
        W.partitionBy("item").orderBy(F.desc("jaccard"), F.asc("rec"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            F.col("item").alias("p_partkey"),
            F.col("rec").alias("rec_partkey"),
            F.col("co").cast("bigint").alias("n_co_orders"),
            "jaccard",
        )
        .orderBy(F.desc("jaccard"), F.asc("p_partkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# STAGED for r14 registration — triangle_count_brand_graph (r13: the
# triangle/motif-counting class — the third classical graph primitive next
# to PageRank (value iteration) and the dedup clusters (connectivity)).
#
# Graph: the brand co-purchase graph — an edge between two brands that
# appear together in at least 2.2% of orders (the basket machinery with a
# HIGHER gate: uniform TPC-H co-purchase sits tightly around ~2% per
# pair, so the basket query's 0.1% gate passes EVERY pair — fine for
# rule mining, degenerate as a graph topology; 2.2% keeps roughly half
# the pairs at every SF — 137/149/176 edges at sf0.001/0.01/0.1). Emits ONE row: nodes, edges, exact
# triangle count (a<b<c edge-join — each triangle counted once), exact
# wedge count Σ deg·(deg−1)/2, and the global clustering coefficient
# 3T/W floor-ppm (NULL when W = 0 — no wedges, coefficient undefined).
#
# Determinism: every quantity is an exact BIGINT; the one division is an
# integer floor. Scale shape: the order→brand projection is the only
# data-sized stage (a broadcast part-dim join + distinct, shared with the
# basket query); the pair frame is ≤ C(|brands|, 2) rows (vocabulary-
# bounded), and the triangle join runs over the GATED edge frame —
# bounded by |brands|³ in the worst case but by Σ deg² in practice,
# never by data size. The 1-row order-count / aggregate crossJoins are
# broadcast nested-loops by design — whitelist entry pre-added.
# ---------------------------------------------------------------------------

TRIANGLE_ORACLE = """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM ob),
pairs AS (
  SELECT a.b AS ba, c.b AS bb, CAST(count(*) AS BIGINT) AS n_ab
  FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b
  GROUP BY 1, 2
),
edges AS (
  SELECT ba, bb FROM pairs CROSS JOIN n WHERE n_ab * 1000 >= 22 * n_orders
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT ba AS v FROM edges UNION ALL SELECT bb AS v FROM edges)
  GROUP BY v
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.ba = e1.bb
  JOIN edges e3 ON e3.ba = e1.ba AND e3.bb = e2.bb
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(COALESCE(sum((d * (d - 1)) // 2), 0) AS BIGINT) AS n_wedges
  FROM deg
),
ecnt AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges)
SELECT a.n_nodes, e.n_edges, t.n_triangles, a.n_wedges,
       CASE WHEN a.n_wedges > 0
            THEN (3 * t.n_triangles * 1000000) // a.n_wedges
       END AS clustering_ppm
FROM agg a CROSS JOIN ecnt e CROSS JOIN tri t
"""


@register(
    "triangle_count_brand_graph",
    oracle=TRIANGLE_ORACLE,
    tags=("graph", "triangles", "clustering-coefficient"),
)
def triangle_count_brand_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count, wedge count, and global clustering coefficient
    of the support-gated brand co-purchase graph — one a<b<c edge-join per
    triangle, Σ deg·(deg−1)/2 wedges, 3T/W floor-ppm (NULL when no
    wedges). See the staging comment for the shared basket machinery and
    the vocabulary-bounded scale shape. STAGED r13, REGISTERED r14."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = persist_once(
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    n = ob.agg(F.countDistinct("o").cast("bigint").alias("n_orders"))
    a = ob.select("o", F.col("b").alias("ba"))
    c = ob.select(F.col("o").alias("o2"), F.col("b").alias("bb"))
    edges = persist_once(
        a.join(c, (F.col("o") == F.col("o2")) & (F.col("ba") < F.col("bb")))
        .groupBy("ba", "bb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("n_ab") * 1000 >= 22 * F.col("n_orders"))
        .select("ba", "bb")
    )
    deg = (
        edges.select(F.col("ba").alias("v"))
        .unionAll(edges.select(F.col("bb").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    agg = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.coalesce(F.sum(F.expr("(d * (d - 1)) div 2")), F.lit(0))
        .cast("bigint")
        .alias("n_wedges"),
    )
    e1 = edges.select(F.col("ba").alias("a1"), F.col("bb").alias("b1"))
    e2 = edges.select(F.col("ba").alias("a2"), F.col("bb").alias("b2"))
    e3 = edges.select(F.col("ba").alias("a3"), F.col("bb").alias("b3"))
    tri = (
        e1.join(e2, F.col("a2") == F.col("b1"))
        .join(e3, (F.col("a3") == F.col("a1")) & (F.col("b3") == F.col("b2")))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    ecnt = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        agg.crossJoin(F.broadcast(ecnt))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.expr(
                "CASE WHEN n_wedges > 0"
                " THEN (3 * n_triangles * 1000000) div n_wedges END"
            ).alias("clustering_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# STAGED for r15 registration — hits_hubs_authorities (r13 continuation:
# completes the link-analysis pair — pagerank_trade_network certifies the
# random-surfer ranking, but nothing in the registry computes Kleinberg's
# mutually-recursive hub/authority scores, the other canonical
# link-analysis fixpoint).
#
# HITS on the bipartite customer (hub) ↔ part-brand (authority) purchase
# graph: edges are DISTINCT (custkey, brand) pairs from orders ⋈
# lineitem ⋈ part. Two full hub/authority sweeps from a0 ≡ 1e6, with
# MAX-normalization after every half-step — HITS is normalization-
# agnostic up to scale (Kleinberg §3: any per-step rescaling converges to
# the same ray); dividing by the step maximum keeps every intermediate an
# exact BIGINT:
#   h_i = (Σ_adj a_{i-1} · 10^6) div max_c(Σ_adj a_{i-1})   ∈ [0, 10^6]
#   a_i = (Σ_adj h_i     · 10^6) div max_b(Σ_adj h_i)       ∈ [0, 10^6]
# Integer end-to-end — adjacency sums of ≤1e6 scores over ≤|customers|
# neighbors (bound: |customers|·1e6·1e6 — 1.5e16 at sf0.1, ×4 → 6e16,
# 150× inside int64, asserted in the staged test), floor divs of
# non-negative BIGINTs. No float op anywhere.
#
# Output: all brand authority scores + the top-20 hub customers, ranked
# with deterministic (score DESC, key ASC) tiebreaks.
#
# Scale shape: the Pregel shape pagerank certifies — per-iteration
# adjacency groupBys on the edge list (2 sweeps = 4 bounded shuffles),
# the edge frame persisted once and reused; the per-step max is a 1-row
# broadcast crossJoin (whitelist entry pre-added at staging time). The
# DuckDB oracle unrolls the identical two sweeps as CTEs (the pagerank
# precedent: for an iterative fixpoint the unrolled recurrence IS the
# spec).
# ---------------------------------------------------------------------------

HITS_ORACLE = """
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS cust, p.p_brand AS brand
  FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
),
h1raw AS (
  SELECT cust, CAST(count(*) AS BIGINT) * 1000000 AS raw
  FROM edges GROUP BY cust
),
h1 AS (
  SELECT cust, (raw * 1000000) // (SELECT max(raw) FROM h1raw) AS h
  FROM h1raw
),
a1raw AS (
  SELECT e.brand, CAST(sum(h.h) AS BIGINT) AS raw
  FROM edges e JOIN h1 h ON h.cust = e.cust GROUP BY e.brand
),
a1 AS (
  SELECT brand, (raw * 1000000) // (SELECT max(raw) FROM a1raw) AS a
  FROM a1raw
),
h2raw AS (
  SELECT e.cust, CAST(sum(a.a) AS BIGINT) AS raw
  FROM edges e JOIN a1 a ON a.brand = e.brand GROUP BY e.cust
),
h2 AS (
  SELECT cust, (raw * 1000000) // (SELECT max(raw) FROM h2raw) AS h
  FROM h2raw
),
a2raw AS (
  SELECT e.brand, CAST(sum(h.h) AS BIGINT) AS raw
  FROM edges e JOIN h2 h ON h.cust = e.cust GROUP BY e.brand
),
a2 AS (
  SELECT brand, (raw * 1000000) // (SELECT max(raw) FROM a2raw) AS a
  FROM a2raw
),
auth AS (
  SELECT 'authority' AS role, brand AS node, a AS score_ppm,
         CAST(row_number() OVER (ORDER BY a DESC, brand ASC) AS BIGINT)
           AS rnk
  FROM a2
),
hubs AS (
  SELECT 'hub' AS role, CAST(cust AS VARCHAR) AS node, h AS score_ppm,
         CAST(row_number() OVER (ORDER BY h DESC, cust ASC) AS BIGINT)
           AS rnk
  FROM h2
)
SELECT role, node, score_ppm, rnk FROM auth
UNION ALL
SELECT role, node, score_ppm, rnk FROM hubs WHERE rnk <= 20
ORDER BY role, rnk
"""


def _max_normalize(df: DataFrame, key: str, out: str) -> DataFrame:
    """(raw · 10^6) div max(raw) — the exact-integer HITS half-step."""
    mx = df.agg(F.max("raw").alias("mx"))
    return df.crossJoin(F.broadcast(mx)).select(
        key, F.expr("(raw * 1000000) div mx").alias(out)
    )


def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg HITS (2 sweeps, max-normalized exact-integer half-steps)
    on the customer↔brand purchase bipartite graph: every brand authority
    score + the top-20 hub customers, deterministically tie-broken. The
    oracle unrolls the identical recurrence (the pagerank precedent).
    Integer end-to-end; see the staging comment for the bound. STAGED
    r13 -> registers r15 (the r14 window is full)."""
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    edges = persist_once(
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("o_custkey").alias("cust"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    h1raw = edges.groupBy("cust").agg(
        (F.count(F.lit(1)) * 1_000_000).cast("bigint").alias("raw")
    )
    h1 = _max_normalize(h1raw, "cust", "h")
    a1raw = edges.join(h1, "cust").groupBy("brand").agg(
        F.sum("h").cast("bigint").alias("raw")
    )
    a1 = _max_normalize(a1raw, "brand", "a")
    # the brand side is dim-bounded — broadcast it back onto the edges
    h2raw = edges.join(F.broadcast(a1), "brand").groupBy("cust").agg(
        F.sum("a").cast("bigint").alias("raw")
    )
    h2 = persist_once(_max_normalize(h2raw, "cust", "h"))
    a2raw = edges.join(h2, "cust").groupBy("brand").agg(
        F.sum("h").cast("bigint").alias("raw")
    )
    a2 = _max_normalize(a2raw, "brand", "a")
    auth = a2.select(
        F.lit("authority").alias("role"),
        F.col("brand").alias("node"),
        F.col("a").alias("score_ppm"),
        F.row_number()
        .over(W.orderBy(F.desc("a"), F.asc("brand")))
        .cast("bigint")
        .alias("rnk"),
    )
    # top-20 FIRST via distributed TakeOrderedAndProject, THEN the rank
    # window over the 20-row result — a global row_number over every
    # customer would funnel the full hub frame through one partition
    top_hubs = h2.orderBy(F.desc("h"), F.asc("cust")).limit(20)
    hubs = top_hubs.select(
        F.lit("hub").alias("role"),
        F.col("cust").cast("string").alias("node"),
        F.col("h").alias("score_ppm"),
        F.row_number()
        .over(W.orderBy(F.desc("h"), F.asc("cust")))
        .cast("bigint")
        .alias("rnk"),
    )
    return auth.unionByName(hubs).orderBy("role", "rnk")


# ---------------------------------------------------------------------------
# STAGED for r15 registration — bfs_hops_trade_network (r13 continuation:
# the graph-traversal class — pagerank/HITS rank nodes and the CC family
# labels components, but nothing in the registry computes multi-source
# SHORTEST-PATH layers, the frontier-expansion primitive behind
# reachability, influence radius, and graph-distance features).
#
# Multi-source BFS on the pagerank trade network (the customer↔supplier
# bipartite graph, both edge directions, supplier ids offset by 1e10):
# seeds are the suppliers of region ASIA's nations; four frontier
# expansions assign each node min(#hops from any seed) ∈ {0..4}; output
# is the per-(distance, node-kind) histogram with the unreached remainder
# (distance −1 sentinel) counted against the FULL customer/supplier node
# universe — isolated nodes (customers with no orders) are unreached by
# definition, not silently dropped.
#
# Determinism: pure integer set algebra — frontier joins, anti-join
# against the visited set, counts. No arithmetic at all beyond counting.
#
# Spark formulation (the 100 TB shape): textbook Pregel-style frontier
# iteration — per hop, ONE equi-join of the (persisted) frontier against
# the edge list and ONE anti-join against the accumulated visited frame,
# both hash-partitioned on node id; the visited/frontier frames are
# persisted per level so the union tree never recomputes. Work per level
# is O(edges incident to the frontier), the BFS optimum. The DuckDB
# oracle walks the same graph with a recursive CTE in (node, dist) space
# (UNION-dedup bounds it at nodes × 5 levels) and takes min(dist) per
# node — a set-recursive formulation with no frontier/anti-join
# machinery, independently arriving at the same layers.
# ---------------------------------------------------------------------------

_BFS_MAX_HOPS = 4
_BFS_SEED_REGION = "ASIA"

BFS_HOPS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT CAST(cust AS BIGINT) AS src,
         CAST(supp + {_SUPP_OFFSET} AS BIGINT) AS dst FROM pairs
  UNION ALL
  SELECT CAST(supp + {_SUPP_OFFSET} AS BIGINT) AS src,
         CAST(cust AS BIGINT) AS dst FROM pairs
),
seeds AS (
  SELECT CAST(s.s_suppkey + {_SUPP_OFFSET} AS BIGINT) AS node
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{_BFS_SEED_REGION}'
),
walk(node, dist) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, w.dist + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < {_BFS_MAX_HOPS}
),
reached AS (
  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY node
),
universe AS (
  SELECT CAST(c_custkey AS BIGINT) AS node, 'customer' AS node_kind
  FROM customer
  UNION ALL
  SELECT CAST(s_suppkey + {_SUPP_OFFSET} AS BIGINT) AS node,
         'supplier' AS node_kind
  FROM supplier
)
SELECT COALESCE(r.dist, -1) AS dist, u.node_kind,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM universe u LEFT JOIN reached r ON r.node = u.node
GROUP BY 1, 2
ORDER BY dist, node_kind
"""


def bfs_hops_trade_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS layers on the customer↔supplier trade network
    (seeds: region-ASIA suppliers, _BFS_MAX_HOPS = 4 frontier expansions):
    histogram of min-hop distance per node kind over the FULL node
    universe, unreached nodes at distance −1. Pregel-shaped frontier
    joins + visited anti-joins; the oracle recurses in (node, dist) space
    and min-reduces — an independent formulation. STAGED r13 ->
    registers r15 (the r14 window is full)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    edges = persist_once(
        pairs.select(
            F.col("o_custkey").cast("bigint").alias("src"),
            (F.col("l_suppkey") + F.lit(_SUPP_OFFSET)).cast("bigint").alias(
                "dst"
            ),
        ).unionByName(
            pairs.select(
                (F.col("l_suppkey") + F.lit(_SUPP_OFFSET))
                .cast("bigint")
                .alias("src"),
                F.col("o_custkey").cast("bigint").alias("dst"),
            )
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _BFS_SEED_REGION
    )
    seeds = (
        supp.join(
            F.broadcast(nat), supp.s_nationkey == nat.n_nationkey
        )
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(
            (F.col("s_suppkey") + F.lit(_SUPP_OFFSET))
            .cast("bigint")
            .alias("node")
        )
    )
    visited = persist_once(
        seeds.withColumn("dist", F.lit(0).cast("bigint"))
    )
    frontier = visited.select("node")
    for k in range(1, _BFS_MAX_HOPS + 1):
        nxt = persist_once(
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(k).cast("bigint"))
        )
        visited = persist_once(visited.unionByName(nxt))
        frontier = nxt.select("node")
    cust_nodes = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("node"),
        F.lit("customer").alias("node_kind"),
    )
    supp_nodes = supp.select(
        (F.col("s_suppkey") + F.lit(_SUPP_OFFSET)).cast("bigint").alias(
            "node"
        ),
        F.lit("supplier").alias("node_kind"),
    )
    universe = cust_nodes.unionByName(supp_nodes)
    return (
        universe.join(visited, "node", "left")
        .select(
            F.coalesce(F.col("dist"), F.lit(-1).cast("bigint")).alias("dist"),
            "node_kind",
        )
        .groupBy("dist", "node_kind")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .orderBy("dist", "node_kind")
    )


# ---------------------------------------------------------------------------
# STAGED for r15 registration — degree_assortativity_trade (r13
# continuation: completes the network-statistics shelf — pagerank/HITS
# rank, triangles/clustering count motifs, BFS measures distance, CC
# labels components; degree ASSORTATIVITY (Newman 2002) is the canonical
# remaining global statistic: do high-degree nodes attach to high-degree
# nodes?).
#
# Pearson correlation of (deg(src), deg(dst)) over the DIRECTED edge
# list of the undirected customer↔supplier trade network (both
# directions present — the pagerank edge construction). The symmetry of
# that edge list is the exactness win: Σdeg_src = Σdeg_dst and
# Σdeg_src² = Σdeg_dst², so the usual sqrt(d_x)·sqrt(d_y) denominator
# collapses to the single integer d = m·Σx² − (Σx)² and
#     r = (m·Σxy − (Σx)²) / d
# is EXACTLY RATIONAL — no square root in the estimator at all. The
# certified columns are the exact BIGINT m, Σx, Σx², Σxy, num, d; the
# displayed r_ppm is one pinned-order IEEE division over them (the
# acf/spearman precedent: correctly-rounded int64→double casts stay
# deterministic past 2^53), NULL for a degree-regular graph (d = 0).
#
# Overflow documented in the staged test from measured fixture maxima
# (m·Σxy is the big term; ~2.4e14 at sf0.1, 2^63 leaves ~5 orders of
# magnitude).
#
# Scale shape: degrees via one groupBy on the edge list; two equi-joins
# to attach deg(src)/deg(dst); one combinable moment aggregation to a
# single row. No windows, no all-pairs, no nested loop of its own (the
# final 1-row frame may broadcast under AQE — whitelist entry pre-added
# defensively, the logrank precedent).
# ---------------------------------------------------------------------------

ASSORTATIVITY_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT CAST(cust AS BIGINT) AS src,
         CAST(supp + {_SUPP_OFFSET} AS BIGINT) AS dst FROM pairs
  UNION ALL
  SELECT CAST(supp + {_SUPP_OFFSET} AS BIGINT) AS src,
         CAST(cust AS BIGINT) AS dst FROM pairs
),
deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src
),
joined AS (
  SELECT ds.d AS dx, dd.d AS dy
  FROM edges e
  JOIN deg ds ON ds.node = e.src
  JOIN deg dd ON dd.node = e.dst
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(dx) AS BIGINT) AS sx,
         CAST(sum(dx * dx) AS BIGINT) AS sxx,
         CAST(sum(dx * dy) AS BIGINT) AS sxy
  FROM joined
)
SELECT m, sx, sxx, sxy,
       m * sxy - sx * sx AS num,
       m * sxx - sx * sx AS den,
       CASE WHEN m * sxx - sx * sx > 0 THEN
         CAST(floor((CAST(m * sxy - sx * sx AS DOUBLE)
                     / CAST(m * sxx - sx * sx AS DOUBLE))
                    * 1000000.0) AS BIGINT)
       END AS r_ppm
FROM mom
"""


def degree_assortativity_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the trade network — exactly
    rational on the symmetric directed edge list (no sqrt: the two
    standard deviations coincide), exact BIGINT moments certified raw,
    r_ppm one pinned-order IEEE division, NULL on degree-regular graphs.
    See the staging comment. STAGED r13 -> registers r15 (the r14 window
    is full)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    edges = persist_once(
        pairs.select(
            F.col("o_custkey").cast("bigint").alias("src"),
            (F.col("l_suppkey") + F.lit(_SUPP_OFFSET)).cast("bigint").alias(
                "dst"
            ),
        ).unionByName(
            pairs.select(
                (F.col("l_suppkey") + F.lit(_SUPP_OFFSET))
                .cast("bigint")
                .alias("src"),
                F.col("o_custkey").cast("bigint").alias("dst"),
            )
        )
    )
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    ).withColumnRenamed("src", "node")
    joined = (
        edges.join(deg.withColumnRenamed("d", "dx"), edges.src == deg.node)
        .drop("node")
        .join(
            deg.withColumnRenamed("d", "dy").withColumnRenamed(
                "node", "node2"
            ),
            edges.dst == F.col("node2"),
        )
        .select("dx", "dy")
    )
    mom = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("dx").cast("bigint").alias("sx"),
        F.sum(F.expr("dx * dx")).cast("bigint").alias("sxx"),
        F.sum(F.expr("dx * dy")).cast("bigint").alias("sxy"),
    )
    return mom.select(
        "m",
        "sx",
        "sxx",
        "sxy",
        F.expr("m * sxy - sx * sx").alias("num"),
        F.expr("m * sxx - sx * sx").alias("den"),
        F.expr(
            "CASE WHEN m * sxx - sx * sx > 0 THEN"
            " CAST(floor((CAST(m * sxy - sx * sx AS DOUBLE)"
            " / CAST(m * sxx - sx * sx AS DOUBLE)) * 1000000.0) AS BIGINT)"
            " END"
        ).alias("r_ppm"),
    )


# ---------------------------------------------------------------------------
# STAGED for r15 registration — modularity_nation_partition (r13
# continuation: the community-QUALITY class — dedup_cluster_assignments
# labels components and triangle/assortativity measure local/global
# structure, but nothing scores a PARTITION of the graph; Newman-Girvan
# modularity is the canonical objective every community-detection
# pipeline optimizes and audits).
#
# Modularity Q of the nation partition of the trade network (customers
# and suppliers both carry a nationkey — the natural given partition).
# On the DIRECTED edge list of M = 2·|undirected| entries,
#     Q = Σ_c [ A_c/M − (K_c/M)² ]
# with A_c = directed edges inside community c and K_c = Σ degrees of
# c's nodes — so
#     Q · M² = Σ_c (M·A_c − K_c²)
# is an EXACT BIGINT (the assortativity trick again: pick the algebraic
# form whose denominator is one integer). Output: one row per community
# with the exact (n_nodes, a_inner, k_degree, contribution numerator)
# plus the partition total q_ppm = (Σ_c(M·A_c − K_c²)·10⁶) div M² — a
# single integer division of exact integers (truncating toward zero in
# BOTH engines, the measured trunc-div agreement — Q is legitimately
# negative for anti-community partitions); no float op anywhere.
#
# Overflow: Σ_c K_c² ≤ M² — ~8.5e9 at sf0.1 (M ≈ 92k), ×10⁶ = 8.5e15;
# ×16 → M ≈ 1.5e6, M²·… 2.2e18 — inside int64, asserted in the staged
# test.
#
# Scale shape: degrees and community labels via one groupBy + two
# broadcast-dim joins (nation is 25 rows; the node→nation map is
# entity-bounded); A_c via an equi-join of the edge list to the two
# endpoint labels; ONE combinable aggregation to |nations| rows and a
# 1-row M crossJoin (whitelist entry pre-added).
# ---------------------------------------------------------------------------

MODULARITY_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT CAST(cust AS BIGINT) AS src,
         CAST(supp + {_SUPP_OFFSET} AS BIGINT) AS dst FROM pairs
  UNION ALL
  SELECT CAST(supp + {_SUPP_OFFSET} AS BIGINT) AS src,
         CAST(cust AS BIGINT) AS dst FROM pairs
),
labels AS (
  SELECT CAST(c_custkey AS BIGINT) AS node,
         CAST(c_nationkey AS BIGINT) AS community
  FROM customer
  UNION ALL
  SELECT CAST(s_suppkey + {_SUPP_OFFSET} AS BIGINT) AS node,
         CAST(s_nationkey AS BIGINT) AS community
  FROM supplier
),
lab_edges AS (
  SELECT ls.community AS c_src, ld.community AS c_dst
  FROM edges e
  JOIN labels ls ON ls.node = e.src
  JOIN labels ld ON ld.node = e.dst
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m_dir FROM lab_edges),
per_c AS (
  SELECT c_src AS community,
         CAST(count(*) AS BIGINT) AS k_degree,
         CAST(sum(CASE WHEN c_dst = c_src THEN 1 ELSE 0 END) AS BIGINT)
           AS a_inner
  FROM lab_edges GROUP BY c_src
),
nodes_per AS (
  SELECT l.community, CAST(count(*) AS BIGINT) AS n_nodes
  FROM labels l
  WHERE l.node IN (SELECT src FROM edges)
  GROUP BY l.community
),
contrib AS (
  SELECT p.community, n.n_nodes, p.a_inner, p.k_degree,
         m.m_dir * p.a_inner - p.k_degree * p.k_degree AS q_num
  FROM per_c p JOIN nodes_per n ON n.community = p.community
  CROSS JOIN m
)
SELECT community, n_nodes, a_inner, k_degree, q_num,
       (CAST((SELECT sum(q_num) FROM contrib) AS BIGINT) * 1000000)
         // ((SELECT m_dir FROM m) * (SELECT m_dir FROM m)) AS q_ppm
FROM contrib
ORDER BY community
"""


def modularity_nation_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman-Girvan modularity of the nation partition of the trade
    network — exactly rational via Q·M² = Σ_c(M·A_c − K_c²) on the
    directed edge list: per-community exact BIGINT (nodes, inner edges,
    degree mass, contribution numerator) and the partition q_ppm as one
    truncating integer division (negative Q legal). No float op anywhere. See the staging comment for
    the bound. STAGED r13 -> registers r15 (the r14 window is full)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    edges = pairs.select(
        F.col("o_custkey").cast("bigint").alias("src"),
        (F.col("l_suppkey") + F.lit(_SUPP_OFFSET)).cast("bigint").alias(
            "dst"
        ),
    ).unionByName(
        pairs.select(
            (F.col("l_suppkey") + F.lit(_SUPP_OFFSET))
            .cast("bigint")
            .alias("src"),
            F.col("o_custkey").cast("bigint").alias("dst"),
        )
    )
    cust_lab = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("node"),
        F.col("c_nationkey").cast("bigint").alias("community"),
    )
    supp_lab = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + F.lit(_SUPP_OFFSET)).cast("bigint").alias(
            "node"
        ),
        F.col("s_nationkey").cast("bigint").alias("community"),
    )
    labels = cust_lab.unionByName(supp_lab)
    lab_edges = persist_once(
        edges.join(
            labels.withColumnRenamed("community", "c_src"),
            edges.src == labels.node,
        )
        .drop("node")
        .join(
            labels.withColumnRenamed("community", "c_dst").withColumnRenamed(
                "node", "node2"
            ),
            edges.dst == F.col("node2"),
        )
        .select("src", "c_src", "c_dst")
    )
    m = lab_edges.agg(F.count(F.lit(1)).cast("bigint").alias("m_dir"))
    per_c = lab_edges.groupBy(F.col("c_src").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("k_degree"),
        F.sum(
            F.when(F.col("c_dst") == F.col("c_src"), 1).otherwise(0)
        ).cast("bigint").alias("a_inner"),
    )
    nodes_per = (
        lab_edges.select(F.col("src").alias("node"), F.col("c_src").alias("community"))
        .distinct()
        .groupBy("community")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    contrib = persist_once(
        per_c.join(nodes_per, "community")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            "a_inner",
            "k_degree",
            (
                F.col("m_dir") * F.col("a_inner")
                - F.col("k_degree") * F.col("k_degree")
            ).alias("q_num"),
            "m_dir",
        )
    )
    total = contrib.agg(
        F.sum("q_num").cast("bigint").alias("q_total"),
        F.max("m_dir").alias("m_dir"),
    )
    return (
        contrib.drop("m_dir")
        .crossJoin(F.broadcast(total))
        .select(
            "community",
            "n_nodes",
            "a_inner",
            "k_degree",
            "q_num",
            F.expr("(q_total * 1000000) div (m_dir * m_dir)").alias("q_ppm"),
        )
        .orderBy("community")
    )
