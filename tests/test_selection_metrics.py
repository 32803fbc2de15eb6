"""Moore-Lewis cross-entropy-difference selection (mlfilter.py) and
Gini mass concentration (hostcap.py): published-property checks —
in-domain docs outrank out-of-domain ones, the contrastive subtraction
cancels intrinsic easiness, Gini endpoints (uniform → 0, monopolized →
(n−1)/n), and partition invariance."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.hostcap import mass_gini
from pdf_extraction_spark.operators.mlfilter import moore_lewis_select


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestMooreLewis:
    def test_in_domain_ranks_first(self, spark):
        # target domain speaks about ships; pool has 2 ship docs and
        # 4 cooking docs — the ship docs must take the top-2 slots
        target = _docs(
            spark,
            [
                (100, "the ship sailed the harbor"),
                (101, "a ship left the harbor at dawn"),
                (102, "sailors load the ship in the harbor"),
            ],
        )
        pool = _docs(
            spark,
            [
                (1, "the ship entered the harbor"),
                (2, "a ship in the harbor at dawn"),
                (3, "simmer the onions in butter"),
                (4, "whisk the eggs with flour"),
                (5, "bake the bread until golden"),
                (6, "chop the garlic and onions"),
            ],
        )
        rows = moore_lewis_select(pool, target, k=6).collect()
        order = [r["doc_id"] for r in rows]
        assert set(order[:2]) == {1, 2}
        assert all(
            rows[0]["ml_diff"] >= r["ml_diff"] for r in rows[1:]
        )

    def test_diff_is_rounded_subtraction(self, spark):
        target = _docs(spark, [(100, "alpha beta gamma")])
        pool = _docs(spark, [(1, "alpha beta"), (2, "delta epsilon")])
        for r in moore_lewis_select(pool, target, k=5).collect():
            assert r["ml_diff"] == round(
                round(r["lp_target"] - r["lp_raw"], 6), 6
            )

    def test_k_bounds_output(self, spark):
        target = _docs(spark, [(100, "x y z")])
        pool = _docs(spark, [(i, "w%d x" % i) for i in range(10)])
        assert moore_lewis_select(pool, target, k=3).count() == 3

    def test_partition_invariance(self, spark):
        target = _docs(spark, [(100 + i, "t%d common" % i) for i in range(5)])
        pool = _docs(
            spark, [(i, "p%d common t%d" % (i, i % 5)) for i in range(30)]
        )
        one = [
            tuple(r)
            for r in moore_lewis_select(
                pool.coalesce(1), target.coalesce(1), k=30
            ).collect()
        ]
        many = [
            tuple(r)
            for r in moore_lewis_select(
                pool.repartition(8), target.repartition(3), k=30
            ).collect()
        ]
        assert one == many and one


def _mass(spark, rows):
    return spark.createDataFrame(rows, "source string, n_chars long")


class TestMassGini:
    def test_uniform_is_zero(self, spark):
        d = _mass(spark, [("s%d" % i, 100) for i in range(8)])
        r = mass_gini(d).collect()[0]
        assert r["n_groups"] == 8 and r["total_mass"] == 800
        assert r["gini_ppm"] == 0

    def test_monopoly_approaches_one(self, spark):
        # one group owns everything: G = (n-1)/n exactly
        d = _mass(
            spark, [("rich", 1000)] + [("s%d" % i, 0) for i in range(9)]
        )
        r = mass_gini(d).collect()[0]
        assert r["gini_ppm"] == 9 * 1_000_000 // 10

    def test_hand_example(self, spark):
        # masses 1,2,3,4 sorted: S1 = 1+4+9+16 = 30, T = 10, n = 4
        # G = (60 - 50) / 40 = 0.25
        d = _mass(spark, [("a", 1), ("b", 2), ("c", 3), ("d", 4)])
        assert mass_gini(d).collect()[0]["gini_ppm"] == 250_000

    def test_multiple_rows_per_group_summed(self, spark):
        d = _mass(spark, [("a", 1), ("a", 3), ("b", 4)])
        r = mass_gini(d).collect()[0]
        assert r["n_groups"] == 2 and r["total_mass"] == 8
        assert r["gini_ppm"] == 0  # 4 vs 4 after summing

    def test_nulls_excluded(self, spark):
        d = _mass(spark, [("a", 5), (None, 100), ("b", None), ("b", 5)])
        r = mass_gini(d).collect()[0]
        assert r["n_groups"] == 2 and r["total_mass"] == 10
        assert r["gini_ppm"] == 0

    def test_empty_input(self, spark):
        d = _mass(spark, []).filter(F.lit(False))
        r = mass_gini(d).collect()[0]
        assert r["gini_ppm"] == 0

    def test_partition_invariance(self, spark):
        d = _mass(
            spark, [("s%d" % (i % 11), (i * 7) % 23 + 1) for i in range(300)]
        )
        one = mass_gini(d.coalesce(1)).collect()[0]
        many = mass_gini(d.repartition(9)).collect()[0]
        assert tuple(one) == tuple(many)
