"""Nepotistic-link classification
(operators/htmlgraph.py:nepotistic_links): each Davison flag exercised
in isolation on hand-built link frames, the ppm arithmetic, and
partition invariance."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.htmlgraph import nepotistic_links

SCHEMA = (
    "doc_id long, src_host string, href string, anchor_text string, "
    "dst_host string"
)


def _links(spark, rows):
    return spark.createDataFrame(
        [(i, s, "http://x/", a, d) for i, (s, d, a) in enumerate(rows)],
        SCHEMA,
    )


class TestFlags:
    def test_same_host(self, spark):
        l = _links(spark, [("a.com", "a.com", "About us")])
        r = nepotistic_links(l).collect()[0]
        assert r["n_same_host"] == 1 and r["nepotism_ppm"] == 1_000_000

    def test_same_registrable_domain(self, spark):
        l = _links(
            spark,
            [
                ("blog.shop.com", "www2.shop.com", "Our store"),
                ("blog.shop.com", "other.net", "External study"),
            ],
        )
        r = nepotistic_links(l).collect()[0]
        assert r["n_same_domain"] == 1 and r["n_same_host"] == 0
        assert r["nepotism_ppm"] == 1_000_000 // 2

    def test_reciprocal_pair(self, spark):
        l = _links(
            spark,
            [
                ("a.com", "b.net", "Great partner"),
                ("b.net", "a.com", "Back at you"),
                ("a.com", "c.org", "One way"),
            ],
        )
        rows = {r["src_host"]: r for r in nepotistic_links(l).collect()}
        assert rows["a.com"]["n_reciprocal"] == 1
        assert rows["b.net"]["n_reciprocal"] == 1
        assert rows["a.com"]["nepotism_ppm"] == 1_000_000 // 2

    def test_generic_anchor_signal_only(self, spark):
        # generic anchors are a signal COLUMN, not part of nepotism_ppm
        l = _links(
            spark,
            [
                ("a.com", "b.net", "click here"),
                ("a.com", "c.org", None),
                ("a.com", "d.io", "Detailed citation of the study"),
            ],
        )
        r = nepotistic_links(l).collect()[0]
        assert r["n_generic_anchor"] == 2
        assert r["nepotism_ppm"] == 0

    def test_bare_suffix_host_never_same_domain(self, spark):
        # a bare public suffix has NULL registrable — must not equal
        # another NULL (the eqNullSafe trap, inverted)
        l = _links(spark, [("com", "net", "x")])
        r = nepotistic_links(l).collect()[0]
        assert r["n_same_domain"] == 0 and r["nepotism_ppm"] == 0

    def test_partition_invariance(self, spark):
        rows = []
        for i in range(120):
            rows.append(
                (
                    "h%d.site%d.com" % (i % 3, i % 7),
                    "h%d.site%d.com" % ((i + 1) % 3, (i * 2) % 7),
                    ["click here", "a detailed reference", None][i % 3],
                )
            )
        l = _links(spark, rows)
        one = sorted(tuple(r) for r in nepotistic_links(l.coalesce(1)).collect())
        many = sorted(
            tuple(r) for r in nepotistic_links(l.repartition(9)).collect()
        )
        assert one == many and one
