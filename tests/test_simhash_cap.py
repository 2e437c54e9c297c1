"""Machine-check of simhash_hamming_near_dups' _MAX_BUCKET scale guard
(VERDICT r10 #5): the registry's one query whose sf0.01 hash-match provably
does NOT extend to arbitrarily large data, by design. Three pins:

1. INACTIVE AT ORACLE SCALES — the largest band bucket at the certified SFs
   sits under _MAX_BUCKET, so the uncapped self-join oracle is exact there.
2. SUBSET — on a crafted corpus with an oversized bucket, the capped star
   listing is a subset of the uncapped all-pairs listing (the star pairs
   pass the same hamming verify and band-0 suppression, so capping can only
   REMOVE pairs, never invent or alter one).
3. CONNECTIVITY FOR DUPLICATE CLUSTERS — for the identical-duplicate
   cluster that actually creates giant buckets at scale (hamming 0
   throughout), the star listing keeps the cluster one connected component,
   exactly like the uncapped clique; the component partition over all docs
   is unchanged by the cap.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from talkinghead_datapipeline_spark.operators import dedup as D
from talkinghead_datapipeline_spark.queries import dedup as qdedup


def _components(pairs: set[tuple[int, int]], nodes: set[int]) -> frozenset:
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[int, set[int]] = {}
    for n in nodes:
        groups.setdefault(find(n), set()).add(n)
    return frozenset(frozenset(g) for g in groups.values())


def _run_pairs(spark, sf_dir: str) -> set[tuple[int, int]]:
    return {
        (r["key_a"], r["key_b"])
        for r in qdedup.simhash_hamming_near_dups(spark, sf_dir).collect()
    }


@pytest.fixture(scope="module")
def crafted_sf_dir(spark):
    """A documents table with one 40-doc identical-duplicate cluster (the
    giant-bucket shape) plus 30 distinct docs in small buckets."""
    work = tempfile.mkdtemp(prefix="thdp_simhash_cap_")
    rows = []
    for i in range(40):  # identical texts -> identical simhash -> one bucket
        rows.append((i, "the quick brown fox jumps over the lazy dog", "en"))
    for i in range(30):  # distinct docs
        rows.append((100 + i, f"unique document number {i} with words {i * 7}", "en"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["source"] = "crafted"
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf.to_parquet(os.path.join(work, "documents.parquet"), index=False)
    return work


def test_cap_inactive_at_oracle_scales(spark):
    """The exactness precondition of the certified rows: max band bucket at
    the oracle SFs is below _MAX_BUCKET (measured 291 at sf0.1)."""
    from talkinghead_datapipeline_spark.catalog import load_table

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
        f = docs.select("doc_id", D.simhash32(F.col("text")).alias("simhash"))
        banded = f.select(
            F.posexplode(
                F.array(F.col("simhash") % 65536, F.floor(F.col("simhash") / 65536))
            ).alias("bi", "bv")
        )
        mx = (
            banded.groupBy("bi", "bv")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )
        assert mx < qdedup._MAX_BUCKET, (sf_dir, mx)


def test_capped_listing_is_subset_with_cluster_connectivity(
    spark, crafted_sf_dir, monkeypatch
):
    # uncapped reference listing (cap far above any bucket)
    monkeypatch.setattr(qdedup, "_MAX_BUCKET", 10**9)
    uncapped = _run_pairs(spark, crafted_sf_dir)
    # the 40-clique contributes C(40,2) pairs
    clique = {(a, b) for a in range(40) for b in range(40) if a < b}
    assert clique <= uncapped

    # capped: the 40-doc bucket exceeds the cap and star-expands
    monkeypatch.setattr(qdedup, "_MAX_BUCKET", 8)
    capped = _run_pairs(spark, crafted_sf_dir)

    # 2. subset: capping only removes pairs
    assert capped <= uncapped
    assert len(capped) < len(uncapped)
    # the cluster collapsed to its star (39 pairs from the bucket minimum)
    star = {(0, b) for b in range(1, 40)}
    assert star <= capped
    assert not (clique - star) & capped

    # 3. connectivity: component partition over ALL docs is unchanged
    nodes = set(range(40)) | {100 + i for i in range(30)}
    assert _components(capped, nodes) == _components(uncapped, nodes)


def test_cap_boundary_is_exact(spark, crafted_sf_dir, monkeypatch):
    """size(mem) == _MAX_BUCKET must still take the exact all-pairs path —
    the guard is strictly 'beyond', so certification at a measured max
    bucket of B is valid for any cap >= B."""
    monkeypatch.setattr(qdedup, "_MAX_BUCKET", 40)  # exactly the bucket size
    at_cap = _run_pairs(spark, crafted_sf_dir)
    monkeypatch.setattr(qdedup, "_MAX_BUCKET", 10**9)
    uncapped = _run_pairs(spark, crafted_sf_dir)
    assert at_cap == uncapped
