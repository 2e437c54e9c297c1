"""Similarity search over the `embeddings` table (north-star extensions).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (operators.similarity) is the 100 TB scale path. Dot products are
computed position-sequentially in DOUBLE on both engines so the fold order
— and therefore the float result — is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from talkinghead_datapipeline_spark.catalog import load_table
from talkinghead_datapipeline_spark.queries import register


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    prods = F.zip_with(
        F.transform(a, lambda x: x.cast("double")),
        F.transform(b, lambda x: x.cast("double")),
        lambda x, y: x * y,
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


_DOT_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)


def _dot_sql(a: str, b: str) -> str:
    return _DOT_SQL.format(a=a, b=b)


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"
    )


@register(
    "emb_norms_per_label",
    oracle=f"""
    SELECT label,
           count(*) AS n_vecs,
           round(avg(sqrt({_dot_sql('embedding', 'embedding')})), 6) AS avg_norm,
           round(min(sqrt({_dot_sql('embedding', 'embedding')})), 6) AS min_norm,
           round(max(sqrt({_dot_sql('embedding', 'embedding')})), 6) AS max_norm
    FROM embeddings
    GROUP BY label
    """,
    tags=("similarity", "array"),
)
def emb_norms_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm statistics per label — array fold + hash agg, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg(_norm(F.col("embedding"))), 6).alias("avg_norm"),
        F.round(F.min(_norm(F.col("embedding"))), 6).alias("min_norm"),
        F.round(F.max(_norm(F.col("embedding"))), 6).alias("max_norm"),
    )


@register(
    "sim_brute_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           round({_cosine_sql('embedding', 'qvec')}, 6) AS cos_sim
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """,
    tags=("similarity", "topk"),
)
def sim_brute_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0. The query vector is a
    1-row broadcast cross join — at 100 TB this stays a map-only scan plus a
    driver-side top-k (TakeOrderedAndProject), no shuffle of the big side."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qvec")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "sim_cosine_topk_per_label",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
         scored AS (
           SELECT vec_id, label,
                  round({_cosine_sql('embedding', 'qvec')}, 6) AS cos_sim
           FROM embeddings, q
           WHERE vec_id <> 0
         )
    SELECT label, vec_id, cos_sim
    FROM (
      SELECT label, vec_id, cos_sim,
             row_number() OVER (PARTITION BY label
                                ORDER BY cos_sim DESC, vec_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
    tags=("similarity", "topk", "window"),
)
def sim_cosine_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label top-3 nearest neighbors — grouped ANN evaluation shape
    (rank over the label partition; ties broken by vec_id)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qvec")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("label").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("label", "vec_id", "cos_sim")
    )
