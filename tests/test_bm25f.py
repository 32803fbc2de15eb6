"""BM25F field-weighted retrieval (operators/retrieval.py:bm25f_topk):
published properties — field weights dominate, combined-tf linearity,
single-field rank-equivalence to BM25, NULL fields — and partition
invariance."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.retrieval import bm25_topk, bm25f_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, body string, url string")


class TestBM25F:
    def test_weighted_field_dominates(self, spark):
        # same term, same tf; doc 1 has it in the 4x-weighted url field
        rows = [
            (1, "filler words here", "apple page"),
            (2, "apple words here", "other page"),
        ] + [(10 + i, "filler neutral text", "neutral page") for i in range(6)]
        d = _docs(spark, rows)
        out = bm25f_topk(
            d, ["apple"], fields=[("body", 1.0, 0.75), ("url", 4.0, 0.75)], k=5
        ).collect()
        assert out[0]["doc_id"] == 1

    def test_combined_tf_is_linear_across_fields(self, spark):
        # equal weights/b and equal field lengths: tf split 1+1 across
        # fields == tf 2 in one field (tfn is linear), so scores tie
        rows = [
            (1, "apple zz apple yy", "aa bb cc dd"),
            (2, "apple zz ww yy", "apple bb cc dd"),
            (3, "qq zz ww yy", "aa bb cc dd"),
        ]
        d = _docs(spark, rows)
        out = {
            r["doc_id"]: r["bm25f"]
            for r in bm25f_topk(
                d,
                ["apple"],
                fields=[("body", 1.0, 0.5), ("url", 1.0, 0.5)],
                k=5,
            ).collect()
        }
        assert out[1] == out[2]

    def test_single_field_rank_matches_bm25(self, spark):
        rows = [
            (i, "apple " * (i % 4) + "pear banana fig " * (2 + i % 3), "u")
            for i in range(12)
        ]
        d = _docs(spark, rows)
        f_rank = [
            r["doc_id"]
            for r in bm25f_topk(
                d, ["apple", "pear"], fields=[("body", 1.0, 0.75)], k=12
            ).collect()
        ]
        b_rank = [
            r["doc_id"]
            for r in bm25_topk(
                d, ["apple", "pear"], k=12, text_col="body"
            ).collect()
        ]
        assert f_rank == b_rank

    def test_null_field_is_empty(self, spark):
        d = _docs(spark, [(1, "apple", None), (2, "apple", "apple")])
        out = bm25f_topk(
            d, ["apple"], fields=[("body", 1.0, 0.75), ("url", 2.0, 0.75)], k=2
        ).collect()
        assert out[0]["doc_id"] == 2

    def test_validation(self, spark):
        d = _docs(spark, [(1, "a", "b")])
        with pytest.raises(ValueError):
            bm25f_topk(d, ["a"], fields=[])

    def test_partition_invariance(self, spark):
        rows = [
            (
                i,
                " ".join("w%d" % ((i + j) % 9) for j in range(10)),
                "u%d site page" % (i % 5),
            )
            for i in range(40)
        ]
        d = _docs(spark, rows)
        fields = [("body", 1.0, 0.75), ("url", 3.0, 0.5)]
        one = [
            tuple(r)
            for r in bm25f_topk(
                d.coalesce(1), ["w1", "u2", "site"], fields=fields, k=40
            ).collect()
        ]
        many = [
            tuple(r)
            for r in bm25f_topk(
                d.repartition(8), ["w1", "u2", "site"], fields=fields, k=40
            ).collect()
        ]
        assert one == many and one
