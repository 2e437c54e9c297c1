"""Text-analysis operators over `documents` (north-star extensions).

Large-scale training-data pipeline text layer: exact dedup, token counting,
quality scoring, document fingerprinting, language-ID heuristic. All are
single-scan column-expression pipelines — they hold at 100 TB because the
only shuffle is the final groupBy (dedup) or none at all (scoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from talkinghead_datapipeline_spark.catalog import load_table
from talkinghead_datapipeline_spark.queries import register

# ---------------------------------------------------------------------------
# Exact deduplication: hash-groupBy on content digest, keep min doc_id.
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_groups",
    oracle="""
    SELECT md5(text) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS canonical_doc_id
    FROM documents
    GROUP BY 1
    HAVING count(*) > 1
    """,
    tags=("dedup", "text"),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content md5 — one shuffle on the digest
    (uniform key distribution ⇒ no skew at any scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


@register(
    "dedup_exact_keep_first",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    tags=("dedup", "text"),
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the lowest doc_id per content group (the usual
    keep-canonical policy); window over the digest, not a self-join."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_chars")
    )


# ---------------------------------------------------------------------------
# Token counting + quality scoring (length / punctuation / stopword ratios).
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "data")
_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                w -> w IN ({_SW_SQL}))) AS BIGINT) AS n_stopwords,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           round(CAST(length(text) AS DOUBLE)
                 / len(string_split_regex(text, '\\s+')), 6) AS avg_token_len
    FROM documents
    WHERE length(text) > 0
    """,
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + stopword counting — all built-in array ops."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    tokens = F.split(F.col("text"), r"\s+")
    low_tokens = F.split(F.lower(F.col("text")), r"\s+")
    n_tokens = F.size(tokens).cast("bigint")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.size(F.filter(low_tokens, lambda w: w.isin(*_STOPWORDS)))
        .cast("bigint")
        .alias("n_stopwords"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.round(F.length("text").cast("double") / F.size(tokens), 6).alias(
            "avg_token_len"
        ),
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id, lang,
           round(least(CAST(length(text) AS DOUBLE) / 500, 1.0), 6) AS length_score,
           round(1.0 - CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                 w -> w IN ({_SW_SQL}))) AS DOUBLE)
                     / len(string_split_regex(text, '\\s+')), 6) AS content_ratio,
           round(0.5 * least(CAST(length(text) AS DOUBLE) / 500, 1.0)
               + 0.5 * (1.0 - CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                        w -> w IN ({_SW_SQL}))) AS DOUBLE)
                            / len(string_split_regex(text, '\\s+'))), 6) AS quality
    FROM documents
    WHERE length(text) > 0
    """,
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: capped length score + non-stopword ratio.
    (The standard pre-training quality-filter shape: cheap, fully pushed
    into one projection.)"""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    tokens = F.split(F.col("text"), r"\s+")
    low_tokens = F.split(F.lower(F.col("text")), r"\s+")
    length_score = F.least(F.length("text").cast("double") / 500, F.lit(1.0))
    sw = F.size(F.filter(low_tokens, lambda w: w.isin(*_STOPWORDS))).cast("double")
    content_ratio = F.lit(1.0) - sw / F.size(tokens)
    return docs.select(
        "doc_id",
        "lang",
        F.round(length_score, 6).alias("length_score"),
        F.round(content_ratio, 6).alias("content_ratio"),
        F.round(0.5 * length_score + 0.5 * content_ratio, 6).alias("quality"),
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: stable 64-bit-style fingerprint from md5 prefix.
# ---------------------------------------------------------------------------


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           CAST(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS BIGINT)
             AS fingerprint,
           substr(md5(text), 1, 8) AS fp_hex
    FROM documents
    """,
    tags=("text", "dedup"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 60-bit fingerprint = first 15 hex chars of content md5 —
    engine-portable (same value in Spark, DuckDB, and any SQL dialect),
    unlike engine-native hash() functions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("fingerprint"),
        F.substring(F.md5("text"), 1, 8).alias("fp_hex"),
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic: stopword-profile voting, pure SQL.
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
}


def _lang_score_sql(lang: str) -> str:
    ws = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return (
        f"CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),"
        f" w -> w IN ({ws}))) AS DOUBLE)"
    )


_LANGID_ORACLE = f"""
    SELECT doc_id, lang AS labeled_lang,
           round({_lang_score_sql('en')}
                 / len(string_split_regex(text, '\\s+')), 6) AS en_score,
           round({_lang_score_sql('es')}
                 / len(string_split_regex(text, '\\s+')), 6) AS es_score,
           CASE WHEN {_lang_score_sql('en')} >= {_lang_score_sql('es')}
                THEN 'en' ELSE 'es' END AS predicted_lang
    FROM documents
    WHERE length(text) > 0
"""


@register("lang_id_heuristic", oracle=_LANGID_ORACLE, tags=("text",))
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language scoring (the n-gram-free fallback tier of a
    language-ID stack); argmax over per-language marker densities."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    low_tokens = F.split(F.lower(F.col("text")), r"\s+")
    n_tokens = F.size(F.split(F.col("text"), r"\s+"))

    def score(lang: str) -> F.Column:
        return F.size(
            F.filter(low_tokens, lambda w: w.isin(*_LANG_MARKERS[lang]))
        ).cast("double")

    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.round(score("en") / n_tokens, 6).alias("en_score"),
        F.round(score("es") / n_tokens, 6).alias("es_score"),
        F.when(score("en") >= score("es"), F.lit("en"))
        .otherwise(F.lit("es"))
        .alias("predicted_lang"),
    )


# ---------------------------------------------------------------------------
# BPE-ish subword token counting (north-star: token budgeting for LLM data).
# ---------------------------------------------------------------------------

# GPT-2-style pre-tokenizer shape, restricted to RE2/Java-common syntax:
# contractions | optional-space + letters | optional-space + digits |
# optional-space + punctuation runs. Whitespace itself is not a token.
_BPE_RE = "'[a-z]{1,2}| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"


@register(
    "text_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_ws_tokens,
           round(CAST(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}')) AS DOUBLE)
                 / len(string_split_regex(text, '\\s+')), 6) AS tokens_per_word
    FROM documents
    WHERE length(text) > 0
    """,
    tags=("text", "tokenize"),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting with a BPE-style pre-tokenizer regex (the GPT-2
    pattern's portable core): subword-ish token count vs whitespace count
    per document — pure regexp_extract_all, single scan, codegen-resident.
    The per-corpus rollup (sum over 100 TB) is a partial-agg reduce."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    bpe = F.expr(
        f"regexp_extract_all(text, '{_BPE_RE.replace(chr(39), chr(39) * 2)}', 0)"
    )
    ws = F.split(F.col("text"), r"\s+")
    return docs.select(
        "doc_id",
        F.size(bpe).cast("bigint").alias("n_bpe_tokens"),
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
        F.round(F.size(bpe).cast("double") / F.size(ws), 6).alias("tokens_per_word"),
    )


# ---------------------------------------------------------------------------
# Corpus profiling (data-quality gate before any training-data run).
# ---------------------------------------------------------------------------


@register(
    "profile_documents",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           round(avg(length(text)), 6) AS avg_chars,
           round(quantile_cont(length(text), 0.5), 6) AS med_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM documents
    GROUP BY source
    """,
    tags=("text", "profiling"),
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile: row counts, empty-text rate, language
    cardinality, length distribution — the null-rate/cardinality sweep every
    ingest runs before touching 100 TB (one pass, partial aggs)."""
    docs = load_table(spark, sf_dir, "documents")
    empty = F.when(F.col("text").isNull() | (F.length("text") == 0), 1).otherwise(0)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(empty).cast("bigint").alias("n_empty"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.round(F.avg(F.length("text")), 6).alias("avg_chars"),
        F.round(F.percentile(F.length("text"), F.lit(0.5)), 6).alias("med_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )
