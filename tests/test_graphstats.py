"""Triangle counting + clustering coefficients
(operators/graphstats.py): hand-built graphs with known triangle
structure, orientation invariants, duplicate/self-loop handling, and
partition invariance."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.graphstats import (
    CLUST_SCALE,
    triangle_stats,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src_host string, dst_host string")


class TestTriangles:
    def test_single_triangle(self, spark):
        e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        rows = {r["host"]: r for r in triangle_stats(e).collect()}
        assert all(rows[h]["triangles"] == 1 for h in "abc")
        assert all(rows[h]["deg"] == 2 for h in "abc")
        # c = 2·1 / (2·1) = 1
        assert all(rows[h]["clustering_ppm"] == CLUST_SCALE for h in "abc")

    def test_direction_and_duplicates_ignored(self, spark):
        # same triangle with reversed and duplicated edges + self-loop
        e = _edges(
            spark,
            [
                ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
                ("c", "a"), ("a", "a"),
            ],
        )
        rows = {r["host"]: r for r in triangle_stats(e).collect()}
        assert all(rows[h]["triangles"] == 1 for h in "abc")

    def test_k4_counts(self, spark):
        # complete graph on 4 nodes: 4 triangles, each node in 3
        nodes = "abcd"
        e = _edges(
            spark,
            [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]],
        )
        rows = {r["host"]: r for r in triangle_stats(e).collect()}
        assert all(rows[h]["triangles"] == 3 for h in nodes)
        assert all(rows[h]["deg"] == 3 for h in nodes)
        # c = 2·3/(3·2) = 1
        assert all(rows[h]["clustering_ppm"] == CLUST_SCALE for h in nodes)

    def test_path_has_no_triangles(self, spark):
        e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        rows = triangle_stats(e).collect()
        assert all(r["triangles"] == 0 for r in rows)
        assert all(r["clustering_ppm"] == 0 for r in rows)

    def test_open_wedge_clustering(self, spark):
        # b is the middle of a wedge plus one closed triangle:
        # edges a-b, b-c, a-c (triangle) and b-d (open)
        e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("b", "d")])
        rows = {r["host"]: r for r in triangle_stats(e).collect()}
        assert rows["b"]["deg"] == 3 and rows["b"]["triangles"] == 1
        # c(b) = 2·1/(3·2) = 1/3
        assert rows["b"]["clustering_ppm"] == 2 * CLUST_SCALE // 6
        assert rows["d"]["deg"] == 1 and rows["d"]["clustering_ppm"] == 0

    def test_nulls_dropped(self, spark):
        e = _edges(spark, [("a", "b"), (None, "b"), ("a", None)])
        rows = triangle_stats(e).collect()
        assert sorted(r["host"] for r in rows) == ["a", "b"]

    def test_partition_invariance(self, spark):
        rows = [
            ("h%d" % (i % 9), "h%d" % ((i * i + 1) % 9)) for i in range(120)
        ]
        e = _edges(spark, rows)
        one = sorted(tuple(r) for r in triangle_stats(e.coalesce(1)).collect())
        many = sorted(
            tuple(r) for r in triangle_stats(e.repartition(7)).collect()
        )
        assert one == many and one
