"""Adversarial-skew stress for the pair-free drop-set dedup path.

The duplicate-heavy-corpus shape at 100 TB: one mega-cluster of tens of
thousands of near-identical boilerplate docs (far beyond any bucket
cap) riding alongside a power-law host distribution. The pairs path is
structurally blind to clusters larger than max_bucket; the drop-set
path must still remove them — in time linear in the input, never
O(cluster²). scripts/skew_stress.py measures the linearity curve and
records it under BENCH/.
"""

import pytest
from pyspark.sql import functions as F


def adversarial_corpus(spark, n_cluster: int, n_unique: int = 500):
    """(docs, expected_cluster_ids): ``n_cluster`` near-identical docs —
    100 identical-signature subgroups (a shared 40-word base + a short
    per-subgroup variant tail, pairwise shingle-jaccard ≈ 0.9) — plus
    ``n_unique`` genuinely distinct docs, over power-law hosts
    (host rank h gets ~1/h of the traffic)."""
    base = " ".join(f"boilerplate template token{w} body" for w in range(10))
    cluster = spark.range(n_cluster).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(base + " variant "), (F.col("id") % 100).cast("string")
        ).alias("text"),
        F.concat(
            F.lit("https://host"),
            F.floor(F.pow(F.lit(2.0), F.col("id") % 8)).cast("string"),
            F.lit(".example/p"),
            F.col("id").cast("string"),
        ).alias("url"),
    )
    unique = spark.range(n_unique).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.lit("entirely distinct document number "),
            F.col("id").cast("string"),
            F.lit(" with its own words "),
            F.sha2(F.col("id").cast("string"), 256),
        ).alias("text"),
        F.concat(F.lit("https://tail"), F.col("id").cast("string"), F.lit(".example/")).alias("url"),
    )
    return cluster.unionByName(unique)


class TestAdversarialSkew:
    def test_mega_cluster_50k_with_power_law_hosts(self, spark):
        """50k-member near-dup cluster: the drop set must contain every
        cluster member except the per-signature reps that survive as
        cluster representatives, and every unique doc must survive."""
        from pdf_extraction_spark.operators.dedup import minhash_near_dup_drops

        n = 50_000
        docs = adversarial_corpus(spark, n).persist()
        docs.count()
        drops = minhash_near_dup_drops(
            docs, "text", "doc_id", num_hashes=32, bands=8, threshold=0.8
        )
        drop_ids = {r["doc_id"] for r in drops.collect()}
        # identical-sig collapse alone guarantees ≥ n - 100 drops; LSH
        # over the ≤100 reps removes near-dup reps too (est-jaccard noise
        # keeps a handful of reps as distinct survivors)
        assert len(drop_ids) >= n - 100
        assert all(d < n for d in drop_ids)  # no unique doc dropped
        survivors = docs.join(drops, "doc_id", "left_anti")
        n_surv = survivors.count()
        assert n_surv == 500 + (n - len(drop_ids))
        assert n_surv <= 600  # mega-cluster reduced to a handful of reps

        # power-law host stats over the survivors stay exact under skew
        from pdf_extraction_spark.operators.skew import host_col, salted_agg

        stats = salted_agg(
            survivors,
            host_col(F.col("url")),
            {"n_docs": (F.count("*"), F.sum)},
            salt_buckets=16,
        )
        assert stats.agg(F.sum("n_docs")).first()[0] == n_surv
        docs.unpersist()

    def test_drop_set_equals_pairs_semantics_on_uncapped_slice(self, spark):
        """Where caps don't bind (5-member clusters), the drop set is
        exactly the pairs-path drop set — same corpus generator, so the
        50k result above is the same semantics at scale."""
        from pdf_extraction_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_near_dup_drops,
        )

        docs = adversarial_corpus(spark, 180, n_unique=60)
        # 180 cluster docs in 100 subgroups → subgroup size ≤ 2, well
        # under max_bucket; pairs path sees everything
        pairs = minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=32, bands=8
        ).filter(F.col("est_jaccard") >= 0.8)
        expected = {r["id_b"] for r in pairs.select("id_b").distinct().collect()}
        got = {
            r["doc_id"]
            for r in minhash_near_dup_drops(
                docs, "text", "doc_id", num_hashes=32, bands=8, threshold=0.8
            ).collect()
        }
        assert got == expected
