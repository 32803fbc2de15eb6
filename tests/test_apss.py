"""All-pairs similarity search with prefix filtering
(operators/apss.py): losslessness vs the in-engine brute force, the
integer prefix-bound contract, df pruning, hand-computed cosines, and
partition invariance."""

import math

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.apss import (
    apss_pairs,
    apss_pairs_brute,
    doc_features,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestFeatures:
    def test_bigrams_distinct(self, spark):
        d = _docs(spark, [(1, "a b a b"), (2, "x")])
        rows = sorted(
            (r["doc_id"], r["term"]) for r in doc_features(d).collect()
        )
        # "a b a b" → bigrams {a b, b a}; single-word doc → none
        assert rows == [(1, "a b"), (1, "b a")]

    def test_tokenizer_shared(self, spark):
        # the shared corpus tokenizer lowercases and splits on
        # whitespace (punctuation stays attached — same in the twin)
        d = _docs(spark, [(1, "Hello, World! hello")])
        terms = {r["term"] for r in doc_features(d).collect()}
        assert terms == {"hello, world!", "world! hello"}


class TestAPSS:
    def test_hand_cosine(self, spark):
        # doc1 bigrams {a b, b c}; doc2 bigrams {a b, b d}
        # dot = 1, ss = 2 each → cos = 1/2
        d = _docs(spark, [(1, "a b c"), (2, "a b d")])
        rows = apss_pairs(d, tau=0.4, max_df=250).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["doc_a"], r["doc_b"], r["dot"]) == (1, 2, 1)
        assert r["cos"] == 0.5

    def test_threshold_excludes(self, spark):
        d = _docs(spark, [(1, "a b c"), (2, "a b d")])
        assert apss_pairs(d, tau=0.6, max_df=250).count() == 0

    def test_lossless_vs_brute(self, spark):
        # adversarial mix: near-dups, partial overlaps, disjoint docs
        rows = []
        for i in range(40):
            base = " ".join("w%d" % ((i * 3 + j) % 17) for j in range(12))
            rows.append((i, base + (" tail%d" % (i % 5))))
        d = _docs(spark, rows)
        for tau in (0.3, 0.5, 0.8):
            fast = sorted(
                tuple(r) for r in apss_pairs(d, tau=tau, max_df=250).collect()
            )
            brute = sorted(
                tuple(r)
                for r in apss_pairs_brute(d, tau=tau, max_df=250).collect()
            )
            assert fast == brute, tau
        assert brute  # non-degenerate at the loosest tau

    def test_prefix_actually_prunes(self, spark):
        # at high tau the index must be smaller than the full postings
        rows = [
            (i, " ".join("t%d" % ((i + j) % 9) for j in range(8)))
            for i in range(30)
        ]
        d = _docs(spark, rows)
        from pdf_extraction_spark.operators.apss import APSS_SCALE
        from pyspark.sql.window import Window

        feats = doc_features(d)
        dfreq = feats.groupBy("term").agg(F.count("*").alias("df"))
        kept = feats.join(dfreq, "term")
        full = kept.count()
        ss = kept.groupBy("doc_id").agg(F.count("*").alias("ss"))
        w = Window.partitionBy("doc_id").orderBy("df", "term")
        pos = kept.select(
            "doc_id", F.row_number().over(w).cast("long").alias("pos")
        ).join(ss, "doc_id")
        t2 = int(0.9 * 0.9 * APSS_SCALE)
        idx = pos.filter(
            (F.col("ss") - F.col("pos") + 1) * APSS_SCALE
            >= F.lit(t2) * F.col("ss")
        ).count()
        assert idx < full

    def test_max_df_prunes_stopwords(self, spark):
        # shared stopword bigram in every doc; rare tails disjoint →
        # with the stopword pruned, no pair survives
        d = _docs(
            spark,
            [(i, "the same stop words r%d s%d" % (i, i)) for i in range(10)],
        )
        assert apss_pairs(d, tau=0.3, max_df=5).count() == 0

    def test_bad_tau_rejected(self, spark):
        d = _docs(spark, [(1, "a b")])
        with pytest.raises(ValueError):
            apss_pairs(d, tau=0.0)
        with pytest.raises(ValueError):
            apss_pairs(d, tau=1.5)

    def test_partition_invariance(self, spark):
        rows = [
            (i, " ".join("w%d" % ((i + j) % 11) for j in range(9)))
            for i in range(30)
        ]
        d = _docs(spark, rows)
        one = sorted(
            tuple(r) for r in apss_pairs(d.coalesce(1), tau=0.4).collect()
        )
        many = sorted(
            tuple(r) for r in apss_pairs(d.repartition(8), tau=0.4).collect()
        )
        assert one == many and one
