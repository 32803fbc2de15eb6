"""Host-level set-overlap similarity (operators/hostsim.py):
co-citation, bibliographic coupling, Bharat-Broder mirror detection —
hand-computed overlaps, the hub/boilerplate prune contract, Jaccard
fixed-point exactness, and partition invariance."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.hostsim import (
    JACCARD_SCALE,
    cocitation_hosts,
    coupling_hosts,
    mirror_hosts,
    pair_overlap,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "key string, item string")


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src_host string, dst_host string")


class TestPairOverlap:
    def test_hand_example(self, spark):
        # keys k1,k2 shared by (a,b); k3 only on a; k4 only on c
        p = _pairs(
            spark,
            [
                ("k1", "a"), ("k1", "b"),
                ("k2", "a"), ("k2", "b"),
                ("k3", "a"),
                ("k4", "c"),
            ],
        )
        rows = pair_overlap(p, min_shared=2, k=10).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["item_a"], r["item_b"]) == ("a", "b")
        assert r["shared"] == 2 and r["deg_a"] == 3 and r["deg_b"] == 2
        # jaccard = 2 / (3 + 2 - 2) = 2/3 → floor ppm
        assert r["jaccard_ppm"] == 2 * JACCARD_SCALE // 3

    def test_duplicate_rows_collapse(self, spark):
        p = _pairs(spark, [("k1", "a"), ("k1", "a"), ("k1", "b"), ("k1", "b")])
        rows = pair_overlap(p, min_shared=1, k=10).collect()
        assert len(rows) == 1 and rows[0]["shared"] == 1

    def test_hub_prune_drops_key_entirely(self, spark):
        # k-hub touches 3 items > max_degree=2 → contributes nothing,
        # and degrees are counted over the pruned universe
        p = _pairs(
            spark,
            [
                ("hub", "a"), ("hub", "b"), ("hub", "c"),
                ("k1", "a"), ("k1", "b"),
            ],
        )
        rows = pair_overlap(p, max_degree=2, min_shared=1, k=10).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["shared"] == 1 and r["deg_a"] == 1 and r["deg_b"] == 1
        assert r["jaccard_ppm"] == JACCARD_SCALE  # 1/1

    def test_nulls_dropped(self, spark):
        p = _pairs(
            spark,
            [("k1", "a"), ("k1", "b"), (None, "a"), ("k2", None)],
        )
        rows = pair_overlap(p, min_shared=1, k=10).collect()
        assert len(rows) == 1 and rows[0]["shared"] == 1

    def test_min_shared_gate(self, spark):
        p = _pairs(spark, [("k1", "a"), ("k1", "b")])
        assert pair_overlap(p, min_shared=2, k=10).count() == 0

    def test_deterministic_topk_boundary(self, spark):
        # three pairs tie on shared+jaccard; k=2 must keep the two
        # lexicographically smallest (total order ends in item names)
        p = _pairs(
            spark,
            [("k%d" % i, x) for i in (1, 2) for x in ("a", "b")]
            + [("k%d" % i, x) for i in (3, 4) for x in ("c", "d")]
            + [("k%d" % i, x) for i in (5, 6) for x in ("e", "f")],
        )
        rows = pair_overlap(p, min_shared=2, k=2).collect()
        got = sorted((r["item_a"], r["item_b"]) for r in rows)
        assert got == [("a", "b"), ("c", "d")]

    def test_partition_invariance(self, spark):
        rows = [("k%d" % (i % 7), "h%d" % (i % 5)) for i in range(200)]
        p = _pairs(spark, rows)
        one = sorted(
            tuple(r) for r in pair_overlap(p.coalesce(1), min_shared=1).collect()
        )
        many = sorted(
            tuple(r)
            for r in pair_overlap(p.repartition(13), min_shared=1).collect()
        )
        assert one == many and one


class TestDirections:
    def test_cocitation_vs_coupling_transpose(self, spark):
        # s1,s2 both link to {a,b} → co-citation pairs (a,b);
        # a,b both linked FROM s1,s2 → coupling pairs (s1,s2)
        e = _edges(
            spark,
            [("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "b")],
        )
        co = cocitation_hosts(e, min_shared=2).collect()
        cp = coupling_hosts(e, min_shared=2).collect()
        assert [(r["host_a"], r["host_b"]) for r in co] == [("a", "b")]
        assert [(r["host_a"], r["host_b"]) for r in cp] == [("s1", "s2")]

    def test_mirror_resemblance(self, spark):
        docs = spark.createDataFrame(
            [("h1", "f1"), ("h1", "f2"), ("h1", "f3"), ("h2", "f1"), ("h2", "f2")],
            "host string, fingerprint string",
        )
        rows = mirror_hosts(docs, min_shared=2).collect()
        assert len(rows) == 1
        r = rows[0]
        # resemblance = 2 / (3 + 2 - 2) = 2/3
        assert r["shared"] == 2 and r["jaccard_ppm"] == 2 * JACCARD_SCALE // 3
