"""Facility-location greedy selection (operators/coreset.py):
published submodularity properties (diminishing marginal gains,
monotone coverage, exact-duplicate gain is zero), first-pick
optimality, and partition invariance."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.coreset import facility_location_select


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _cluster(center, eps, i):
    return [c + eps * ((i + j) % 3 - 1) for j, c in enumerate(center)]


class TestFacilityLocation:
    def _two_clusters(self, spark):
        a, b = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
        rows = [(i, _cluster(a, 0.01, i)) for i in range(10)]
        rows += [(100 + i, _cluster(b, 0.01, i)) for i in range(10)]
        return _emb(spark, rows)

    def test_covers_both_clusters(self, spark):
        # two tight orthogonal clusters: the first two picks must come
        # from DIFFERENT clusters (covering the second cluster gains
        # ~10 full sims; another pick in the first gains ~0)
        e = self._two_clusters(spark)
        rows = facility_location_select(e, k=2, pool=20).collect()
        ids = [r["vec_id"] for r in sorted(rows, key=lambda r: r["round"])]
        assert (ids[0] < 100) != (ids[1] < 100)

    def test_diminishing_gains_and_monotone_coverage(self, spark):
        e = self._two_clusters(spark)
        rows = sorted(
            facility_location_select(e, k=4, pool=20).collect(),
            key=lambda r: r["round"],
        )
        gains = [r["gain_micro"] for r in rows]
        cover = [r["coverage_micro"] for r in rows]
        assert gains == sorted(gains, reverse=True)  # greedy is ordered
        assert cover == sorted(cover)  # coverage never decreases
        # coverage after round r equals the prefix sum of gains
        acc = 0
        for g, c in zip(gains, cover):
            acc += g
            assert c == acc

    def test_duplicate_of_pick_gains_zero(self, spark):
        # vec 50 duplicates vec 0 exactly: once one is picked, the
        # other's marginal gain is exactly 0 (integer-exact)
        v = [0.6, 0.8, 0.0]
        rows = [(0, v), (50, v), (1, [0.0, 0.0, 1.0])]
        e = _emb(spark, rows)
        out = sorted(
            facility_location_select(e, k=3, pool=3).collect(),
            key=lambda r: r["round"],
        )
        dup_round = [r for r in out if r["vec_id"] in (0, 50)][1]
        assert dup_round["gain_micro"] == 0

    def test_null_vectors_excluded(self, spark):
        e = _emb(spark, [(0, [1.0, 0.0]), (1, None), (2, [0.0, 1.0])])
        rows = facility_location_select(e, k=2, pool=2).collect()
        assert {r["vec_id"] for r in rows} <= {0, 2}

    def test_validation(self, spark):
        e = _emb(spark, [(0, [1.0])])
        with pytest.raises(ValueError):
            facility_location_select(e, k=0)
        with pytest.raises(ValueError):
            facility_location_select(e, k=5, pool=3)

    def test_partition_invariance(self, spark):
        rows = [
            (i, [((i * j + 7) % 11) / 10.0 for j in range(6)])
            for i in range(40)
        ]
        e = _emb(spark, rows)
        one = sorted(
            tuple(r)
            for r in facility_location_select(e.coalesce(1), k=3, pool=8).collect()
        )
        many = sorted(
            tuple(r)
            for r in facility_location_select(
                e.repartition(7), k=3, pool=8
            ).collect()
        )
        assert one == many and one
