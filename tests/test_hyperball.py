"""HyperBall radius-2 (operators/graphstats.py:hyperball_r2): the
sketch-merge path must equal sketching the exact 2-hop member set
(associativity), directed-ball semantics, estimation accuracy on known
balls, and partition invariance."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.graphstats import hyperball_r2


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src_host string, dst_host string")


def _exact_ball2(rows):
    succ = {}
    nodes = set()
    for s, d in rows:
        succ.setdefault(s, set()).add(d)
        nodes.update((s, d))
    out = {}
    for v in nodes:
        b1 = {v} | succ.get(v, set())
        b2 = set(b1)
        for u in b1:
            b2 |= {u} | succ.get(u, set())
        out[v] = b2
    return out


class TestHyperBall:
    def test_merge_path_equals_direct_sketch(self, spark):
        """The load-bearing claim: merging radius-1 sketches along
        edges lands on the SAME registers as sketching the exact
        2-hop member set directly."""
        from pdf_extraction_spark.operators.sketches import hll_distinct_by

        rows = [
            ("h%d" % (i % 11), "h%d" % ((i * i + 3) % 11)) for i in range(60)
        ]
        rows = [(s, d) for s, d in rows if s != d]
        e = _edges(spark, rows)
        got = {
            (r["host"], r["n_registers"], r["est_ball2"])
            for r in hyperball_r2(e).collect()
        }
        exact = _exact_ball2(set(rows))
        member_rows = [
            (v, m) for v, ms in exact.items() for m in ms
        ]
        direct = spark.createDataFrame(member_rows, "node string, member string")
        want = {
            (r["node"], r["n_registers"], r["est_distinct"])
            for r in hll_distinct_by(direct, "node", F.col("member")).collect()
        }
        assert got == want

    def test_directed_star(self, spark):
        # center → 6 leaves: center's ball2 = 7 nodes; a leaf's = itself
        rows = [("hub", "leaf%d" % i) for i in range(6)]
        est = {r["host"]: r["est_ball2"] for r in hyperball_r2(_edges(spark, rows)).collect()}
        assert abs(est["hub"] - 7) / 7 < 0.10
        assert abs(est["leaf0"] - 1) < 0.10

    def test_two_hops_reached(self, spark):
        # a → b → c → d: ball2(a) = {a,b,c}, NOT d
        rows = [("a", "b"), ("b", "c"), ("c", "d")]
        est = {r["host"]: r["est_ball2"] for r in hyperball_r2(_edges(spark, rows)).collect()}
        assert abs(est["a"] - 3) / 3 < 0.10
        assert abs(est["c"] - 2) / 2 < 0.10

    def test_partition_invariance(self, spark):
        rows = [
            ("h%d" % (i % 13), "h%d" % ((i * 5 + 1) % 13)) for i in range(100)
        ]
        e = _edges(spark, rows)
        one = sorted(tuple(r) for r in hyperball_r2(e.coalesce(1)).collect())
        many = sorted(tuple(r) for r in hyperball_r2(e.repartition(7)).collect())
        assert one == many and one
