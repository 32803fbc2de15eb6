"""Dirichlet query-likelihood retrieval
(operators/retrieval.py:qlm_topk): LM-retrieval properties — hits beat
no-hits, Dirichlet length preference, no-hit docs still ranked by
smoothing mass, OOV query terms are neutral — and partition
invariance."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.retrieval import qlm_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestQLM:
    def test_hit_beats_no_hit(self, spark):
        d = _docs(
            spark,
            [(1, "apple pear fig"), (2, "pear fig plum"), (3, "plum fig pear")],
        )
        out = qlm_topk(d, ["apple"], k=3).collect()
        assert out[0]["doc_id"] == 1 and out[0]["n_hit"] == 1

    def test_dirichlet_length_preference(self, spark):
        # same tf, shorter doc → larger p(t|θ_d) → higher score
        d = _docs(
            spark,
            [(1, "apple pear"), (2, "apple " + "pear fig plum " * 10)],
        )
        out = qlm_topk(d, ["apple"], k=2).collect()
        assert [r["doc_id"] for r in out] == [1, 2]

    def test_no_hit_docs_ranked_by_length(self, spark):
        d = _docs(
            spark,
            [(1, "x y"), (2, "x y z w v u t s r q"), (3, "apple x")],
        )
        out = qlm_topk(d, ["apple"], k=3).collect()
        ids = [r["doc_id"] for r in out]
        assert ids[0] == 3          # the only hit
        assert ids[1:] == [1, 2]    # then shorter no-hit first
        assert all(r["n_hit"] == 0 for r in out[1:])

    def test_oov_term_is_neutral(self, spark):
        d = _docs(
            spark, [(i, "apple w%d x y" % i) for i in range(8)]
        )
        a = [(r["doc_id"], r["qlm"]) for r in qlm_topk(d, ["apple"], k=8).collect()]
        b = [(r["doc_id"], r["qlm"]) for r in qlm_topk(
            d, ["apple", "zzzznotincorpus"], k=8).collect()]
        assert a == b

    def test_partition_invariance(self, spark):
        rows = [
            (i, " ".join("w%d" % ((i * j) % 7) for j in range(12)))
            for i in range(30)
        ]
        d = _docs(spark, rows)
        one = [
            tuple(r)
            for r in qlm_topk(d.coalesce(1), ["w1", "w3"], k=30).collect()
        ]
        many = [
            tuple(r)
            for r in qlm_topk(d.repartition(9), ["w1", "w3"], k=30).collect()
        ]
        assert one == many and one
