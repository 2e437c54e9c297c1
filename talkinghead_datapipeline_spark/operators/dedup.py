"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

North-star extensions (BASELINE.json) — the training-data dedup stack,
designed for 100 TB:

- **exact**: groupBy on a content digest — one shuffle on a uniform key.
- **MinHash+LSH**: shingle → portable 32-bit hash → K permutation minima →
  band keys → candidate pairs via band self-join → exact-Jaccard verify.
  The self-join shuffles only (band_key) groups; at scale, bucket sizes are
  bounded because identical band keys imply high similarity.
- **SimHash**: per-token hash bit-votes folded into a 32-bit fingerprint;
  near-dup = small Hamming distance (bucket by fingerprint prefix at scale).
- **n-gram Jaccard**: exact character-shingle similarity inside cheap blocks.

Hashing is engine-portable by construction: ``int(hex(md5(x)[:8]))`` —
identical in Spark (``conv``), DuckDB (``('0x'||…)::BIGINT``), or any engine
with md5 — so the DuckDB oracle reproduces signatures bit-for-bit. Engine-
native hash() functions are never used (they differ per engine/seed).

Permutation constants are fixed draws from numpy ``default_rng(42)``;
``a·h + b mod P`` stays under 2^63 because a,b < 10^6 and h < 2^32.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed permutation parameters (numpy default_rng(42), materialized).
MINHASH_A = (89251, 773955, 654571, 438878, 433015, 858597, 85946, 697367)
MINHASH_B = (201469, 94177, 526478, 975621, 735751, 761138, 717476, 786063)
MINHASH_P = 4294967311  # smallest prime > 2^32
N_PERM = len(MINHASH_A)
BAND_WIDTH = 4  # 8 perms → 2 bands of 4: P(candidate) ≈ 1-(1-j^4)^2
SIMHASH_BITS = 32


def portable_hash32(col: Column) -> Column:
    """First 8 hex chars of md5 as a bigint in [0, 2^32) — engine-portable."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def word_tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of lowercased whitespace-tokenized text.

    Guarded for short inputs: Spark's ``sequence(1, stop)`` DESCENDS when
    stop < 1, which would index position 0 and error.
    """
    toks = word_tokens(text)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + k) for k in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_sig_array(shingles: Column) -> Column:
    """K-permutation MinHash signature as ONE array column, computed in a
    single fold over the shingle hashes.

    Performance note: naively emitting K separate ``array_min(transform(…))``
    columns makes Catalyst evaluate the md5 token-hash transform K times
    (projection collapse re-inlines it); a single ``aggregate`` with a
    K-wide accumulator hashes each shingle exactly once.
    """
    a_arr = F.array(*[F.lit(a) for a in MINHASH_A])
    b_arr = F.array(*[F.lit(b) for b in MINHASH_B])
    hashes = F.transform(shingles, portable_hash32)
    init = F.array_repeat(F.lit(MINHASH_P).cast("bigint"), N_PERM)

    def merge(acc: Column, h: Column) -> Column:
        return F.zip_with(
            acc,
            F.sequence(F.lit(1), F.lit(N_PERM)),
            lambda m, k: F.least(
                m, (F.element_at(a_arr, k) * h + F.element_at(b_arr, k)) % MINHASH_P
            ),
        )

    return F.aggregate(hashes, init, merge)


def minhash_signature(shingles: Column) -> list[Column]:
    """K permutation-minimum columns over the shingle set (mh0..mhK-1)."""
    sig = minhash_sig_array(shingles)
    return [F.element_at(sig, k + 1).alias(f"mh{k}") for k in range(N_PERM)]


def band_key(band: int) -> Column:
    """LSH band key = concatenated signature slice."""
    lo = band * BAND_WIDTH
    return F.concat_ws(
        "|", *[F.col(f"mh{k}").cast("string") for k in range(lo, lo + BAND_WIDTH)]
    )


def simhash32(text: Column) -> Column:
    """32-bit SimHash over token multiset: bit j set iff the ±1 votes of
    per-token hash bit j sum positive."""
    # Single fold: accumulator = [ones_count(bit 0..31), n_tokens]; each
    # token hash is computed and scanned once. The finish lambda folds the
    # accumulator (a bound variable — evaluated once) into the fingerprint,
    # so the md5 transform is never re-inlined by projection collapse.
    hashes = F.transform(word_tokens(text), portable_hash32)
    init = F.array_repeat(F.lit(0).cast("bigint"), SIMHASH_BITS + 1)

    def merge(acc: Column, h: Column) -> Column:
        return F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS)),
            lambda c, j: F.when(j == SIMHASH_BITS, c + 1).otherwise(
                c
                + (
                    F.floor(h / F.pow(F.lit(2.0), j.cast("double"))).cast("bigint")
                    % 2
                )
            ),
        )

    def finish(acc: Column) -> Column:
        # bit j set iff ones > n/2  ⇔  sum(±1 votes) > 0
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
            F.lit(0).cast("bigint"),
            lambda s, j: s
            + F.when(
                2 * F.element_at(acc, (j + 1).cast("int"))
                > F.element_at(acc, SIMHASH_BITS + 1),
                F.pow(F.lit(2.0), j.cast("double")).cast("bigint"),
            ).otherwise(0),
        )

    return F.aggregate(hashes, init, merge, finish)


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams (the classic near-dup shingling unit)."""
    low = F.lower(text)
    return F.when(
        F.length(low) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(low) - (n - 1)),
                lambda i: F.substr(low, i, F.lit(n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


def exact_dedup(df: DataFrame, content: str, key: str) -> DataFrame:
    """Keep the lowest-key row per exact content group (hash-groupBy)."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy(F.md5(F.col(content))).orderBy(key)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def minhash_candidate_pairs(df: DataFrame, key: str, text: str) -> DataFrame:
    """LSH candidate pairs (key_a < key_b) from banded minhash signatures.

    Single scan builds signatures; one self-join per band on the band key
    (the only shuffle); union + distinct merges bands.
    """
    sigs = df.select(
        F.col(key), word_shingles(F.col(text)).alias("_sh")
    ).filter(F.size("_sh") >= 1)
    sigs = sigs.select(key, "_sh", *minhash_signature(F.col("_sh")))
    n_bands = N_PERM // BAND_WIDTH
    banded = None
    for b in range(n_bands):
        part = sigs.select(key, "_sh", band_key(b).alias("_band"))
        banded = part if banded is None else banded.unionByName(part)
    left = banded.select(
        F.col(key).alias("key_a"), F.col("_sh").alias("_sh_a"), "_band"
    )
    right = banded.select(
        F.col(key).alias("key_b"), F.col("_sh").alias("_sh_b"), "_band"
    )
    pairs = (
        left.join(right, "_band")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "_sh_a", "_sh_b")
        .dropDuplicates(["key_a", "key_b"])
    )
    return pairs.select(
        "key_a", "key_b", jaccard(F.col("_sh_a"), F.col("_sh_b")).alias("jaccard")
    )
