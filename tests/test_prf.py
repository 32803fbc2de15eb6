"""Rocchio/RM3 pseudo-relevance feedback
(operators/retrieval.py:rocchio_bm25_topk): expansion recall (a doc
with no query term enters via feedback vocabulary), β=0 degeneracy to
plain BM25 ranking, original-term exclusion from expansion, and
partition invariance."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.retrieval import (
    bm25_topk,
    rocchio_bm25_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(spark):
    # topic docs pair "apple" with "orchard harvest"; doc 99 talks about
    # orchards/harvest WITHOUT the word apple — only PRF can find it
    rows = [
        (1, "apple orchard harvest apple crisp autumn"),
        (2, "apple orchard harvest basket press cider"),
        (3, "apple harvest orchard ladder crate field"),
        (99, "orchard harvest orchard harvest crate basket"),
    ]
    rows += [
        (10 + i, "unrelated words about w%d x%d y%d z" % (i, i * 2, i * 3))
        for i in range(10)
    ]
    return _docs(spark, rows)


class TestPRF:
    def test_expansion_recalls_new_doc(self, spark):
        d = _corpus(spark)
        plain = {r["doc_id"] for r in bm25_topk(d, ["apple"], k=4).collect()}
        prf = {
            r["doc_id"]
            for r in rocchio_bm25_topk(
                d, ["apple"], k=4, k_fb=3, m_exp=4, min_df=2
            ).collect()
        }
        assert 99 not in plain
        assert 99 in prf

    def test_beta_zero_matches_plain_bm25_ranking(self, spark):
        d = _corpus(spark)
        plain = [
            (r["doc_id"], r["bm25"])
            for r in bm25_topk(d, ["apple"], k=10).collect()
        ]
        zero = [
            (r["doc_id"], r["bm25"])
            for r in rocchio_bm25_topk(
                d, ["apple"], k=10, k_fb=3, m_exp=4, beta=0.0, min_df=2
            ).collect()
            if r["bm25"] > 0.0
        ]
        assert zero == plain

    def test_matched_terms_counted(self, spark):
        d = _corpus(spark)
        rows = rocchio_bm25_topk(
            d, ["apple"], k=4, k_fb=3, m_exp=4, min_df=2
        ).collect()
        by_id = {r["doc_id"]: r for r in rows}
        # doc 1 matches apple + expansion terms; doc 99 expansion only
        assert by_id[1]["n_terms"] > 1
        assert by_id[99]["n_terms"] >= 1

    def test_partition_invariance(self, spark):
        d = _corpus(spark)
        one = [
            tuple(r)
            for r in rocchio_bm25_topk(
                d.coalesce(1), ["apple"], k=14, k_fb=3, m_exp=4, min_df=2
            ).collect()
        ]
        many = [
            tuple(r)
            for r in rocchio_bm25_topk(
                d.repartition(7), ["apple"], k=14, k_fb=3, m_exp=4, min_df=2
            ).collect()
        ]
        assert one == many and one
