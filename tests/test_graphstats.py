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


class TestKcore:
    def _clique_tail(self, spark):
        # 4-clique + 2-node tail off 'a' + isolated pair + junk rows
        cl = ["a", "b", "c", "d"]
        rows = [(cl[i], cl[j]) for i in range(4) for j in range(i + 1, 4)]
        rows += [("a", "e"), ("e", "f"), ("g", "h"), ("x", "x"), (None, "y")]
        return _edges(spark, rows)

    def test_three_core_is_the_clique(self, spark):
        from pdf_extraction_spark.operators.graphstats import kcore

        out = sorted(
            tuple(r) for r in kcore(self._clique_tail(spark), k=3, n_rounds=3).collect()
        )
        assert out == [(h, 3, True) for h in "abcd"]

    def test_core_nesting(self, spark):
        """(k+1)-core ⊆ k-core (Seidman's nesting property)."""
        from pdf_extraction_spark.operators.graphstats import kcore

        e = self._clique_tail(spark)
        k2 = {r.host for r in kcore(e, k=2, n_rounds=4).collect()}
        k3 = {r.host for r in kcore(e, k=3, n_rounds=4).collect()}
        k4 = {r.host for r in kcore(e, k=4, n_rounds=4).collect()}
        assert k4 <= k3 <= k2
        assert k4 == set()  # 4-clique has max degree 3

    def test_capped_unroll_reports_unconverged(self, spark):
        """A 10-node path peels one layer per synchronous round; after
        1 round the 2-core isn't reached and the flag must say so."""
        from pdf_extraction_spark.operators.graphstats import kcore

        path = _edges(spark, [(f"n{i}", f"n{i + 1}") for i in range(10)])
        rows = kcore(path, k=2, n_rounds=1).collect()
        assert rows and all(r.converged is False for r in rows)
        # fully peeled: a path has an empty 2-core
        assert kcore(path, k=2, n_rounds=6).count() == 0

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.graphstats import kcore, sql_kcore

        rows = [(c[0], c[1]) for c in ["ab", "bc", "ca", "cd", "de", "ec", "fg"]]
        got = sorted(
            tuple(r)
            for r in kcore(_edges(spark, rows), k=2, n_rounds=4).collect()
        )
        con = duckdb.connect()
        con.register("edges", pd.DataFrame(rows, columns=["src_host", "dst_host"]))
        want = sorted(
            tuple(r)
            for r in con.execute(
                sql_kcore("SELECT * FROM edges", k=2, n_rounds=4)
            ).fetchall()
        )
        assert got == want

    def test_empty_graph(self, spark):
        from pdf_extraction_spark.operators.graphstats import kcore

        e = _edges(spark, [("x", "x")])  # only a self-loop → no edges
        assert kcore(e, k=1, n_rounds=2).count() == 0


class TestAssortativity:
    def test_star_is_maximally_disassortative(self, spark):
        from pdf_extraction_spark.operators.graphstats import assortativity

        e = _edges(spark, [("c", f"l{i}") for i in range(5)])
        r = assortativity(e).collect()[0]
        assert r.assort == -1.0
        assert (r.n_pairs, r.sum_deg) == (10, 30)

    def test_disjoint_cliques_are_assortative(self, spark):
        from pdf_extraction_spark.operators.graphstats import assortativity

        rows = []
        for grp, size in (("p", 3), ("q", 5)):
            ns = [f"{grp}{i}" for i in range(size)]
            rows += [(ns[i], ns[j]) for i in range(size) for j in range(i + 1, size)]
        assert assortativity(_edges(spark, rows)).collect()[0].assort == 1.0

    def test_regular_graph_is_null(self, spark):
        from pdf_extraction_spark.operators.graphstats import assortativity

        e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        assert assortativity(e).collect()[0].assort is None

    def test_empty_graph_row(self, spark):
        from pdf_extraction_spark.operators.graphstats import assortativity

        r = assortativity(_edges(spark, [("x", "x")])).collect()[0]
        assert tuple(r) == (0, 0, 0, 0, None)

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.graphstats import (
            assortativity,
            sql_assortativity,
        )

        rows = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"), ("e", "a"), ("f", "b")]
        got = [tuple(r) for r in assortativity(_edges(spark, rows)).collect()]
        con = duckdb.connect()
        con.register("edges", pd.DataFrame(rows, columns=["src_host", "dst_host"]))
        want = [
            tuple(r)
            for r in con.execute(sql_assortativity("SELECT * FROM edges")).fetchall()
        ]
        assert got == want


class TestHarmonicCentrality:
    ROWS = [("a", "b"), ("b", "c"), ("c", "d"), ("h", "a"), ("h", "b"), ("h", "c")]

    def test_estimates_track_exact_truncated_harmonic(self, spark):
        """Ground truth = BFS to depth 3; the p_hex=2 sketch (256
        registers) must land within its ~7% error band."""
        import collections

        from pdf_extraction_spark.operators.graphstats import harmonic_centrality

        adj = collections.defaultdict(set)
        for s, d in self.ROWS:
            adj[s].add(d)
        nodes = set(adj) | {d for _, d in self.ROWS}
        got = {
            r.host: r.harmonic
            for r in harmonic_centrality(_edges(spark, self.ROWS), r_max=3).collect()
        }
        assert set(got) == nodes
        for v in nodes:
            dist, frontier = {v: 0}, [v]
            for r in range(1, 4):
                nf = []
                for u in frontier:
                    for w in adj[u]:
                        if w not in dist:
                            dist[w] = r
                            nf.append(w)
                frontier = nf
            exact = sum(1.0 / d for d in dist.values() if d > 0)
            assert abs(got[v] - exact) < 0.25 * max(exact, 1.0)

    def test_sink_scores_zero_ball_growth(self, spark):
        from pdf_extraction_spark.operators.graphstats import harmonic_centrality

        rows = {
            r.host: r
            for r in harmonic_centrality(_edges(spark, self.ROWS), r_max=3).collect()
        }
        # d has no outlinks: every ball is {d}, harmonic ≈ 0
        assert rows["d"].est_b1 == rows["d"].est_b2 == rows["d"].est_b3
        assert rows["d"].harmonic < 0.01
        # the hub reaches everything: largest harmonic
        assert rows["h"].harmonic == max(r.harmonic for r in rows.values())

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.graphstats import (
            harmonic_centrality,
            sql_harmonic_centrality,
        )

        got = sorted(
            tuple(r)
            for r in harmonic_centrality(_edges(spark, self.ROWS), r_max=3).collect()
        )
        con = duckdb.connect()
        con.register("edges", pd.DataFrame(self.ROWS, columns=["src_host", "dst_host"]))
        want = sorted(
            tuple(r)
            for r in con.execute(
                sql_harmonic_centrality("SELECT * FROM edges", r_max=3)
            ).fetchall()
        )
        assert got == want

    def test_r1_equals_hyperball_b1_leg(self, spark):
        """r_max=1 degenerates to |B_1| − 1: the radius-1 sketch the
        hyperball_r2 operator starts from."""
        from pdf_extraction_spark.operators.graphstats import harmonic_centrality

        rows = {
            r.host: r
            for r in harmonic_centrality(_edges(spark, self.ROWS), r_max=1).collect()
        }
        assert rows["h"].harmonic == round(rows["h"].est_b1 - 1.0, 4)


class TestAdamicAdar:
    def _rows(self):
        rows = [("a", "z1"), ("b", "z1"), ("a", "z2"), ("b", "z2"),
                ("a", "c"), ("c", "z1"), ("hub", "a")]
        rows += [("hub", f"m{i}") for i in range(70)]
        return rows

    def test_formula_and_exclusions(self, spark):
        import math

        from pdf_extraction_spark.operators.graphstats import adamic_adar

        got = {
            (r.node_a, r.node_b): r
            for r in adamic_adar(
                _edges(spark, self._rows()), max_degree=64, k=10
            ).collect()
        }
        exp = 10**18 // round(math.log(3) * 1e9) + 10**18 // round(
            math.log(2) * 1e9
        )
        assert got[("a", "b")].aa_nano == exp
        assert got[("a", "b")].n_common == 2
        # linked pairs are never predicted
        assert ("a", "c") not in got
        # the deg-71 hub is capped out of the middle role: no m_i-m_j pairs
        assert not any(
            a.startswith("m") and b.startswith("m") for a, b in got
        )

    def test_top1_is_strongest_pair(self, spark):
        from pdf_extraction_spark.operators.graphstats import adamic_adar

        top = adamic_adar(_edges(spark, self._rows()), max_degree=64, k=1).collect()
        assert (top[0].node_a, top[0].node_b) == ("a", "b")

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.graphstats import (
            adamic_adar,
            sql_adamic_adar,
        )

        rows = self._rows()
        got = [
            tuple(r)
            for r in adamic_adar(_edges(spark, rows), max_degree=64, k=10).collect()
        ]
        con = duckdb.connect()
        con.register("edges", pd.DataFrame(rows, columns=["src_host", "dst_host"]))
        want = [
            tuple(r)
            for r in con.execute(
                sql_adamic_adar("SELECT * FROM edges", 64, 10)
            ).fetchall()
        ]
        assert got == want


class TestBowtie:
    ROWS = [
        ("a", "b"), ("b", "c"), ("c", "a"),       # core cycle
        ("a", "b2"), ("b2", "a"),                 # widen the core; 'a' top degree
        ("i1", "a"), ("i2", "i1"),                # IN chain
        ("c", "o1"), ("o1", "o2"),                # OUT chain
        ("i1", "t1"),                             # tendril off IN
        ("x", "y"),                               # disconnected island
    ]

    def test_classes(self, spark):
        from pdf_extraction_spark.operators.graphstats import bowtie

        d = dict(
            (r.host, r.cls) for r in bowtie(_edges(spark, self.ROWS)).collect()
        )
        assert {h for h, c in d.items() if c == "core"} == {"a", "b", "b2", "c"}
        assert {h for h, c in d.items() if c == "in_"} == {"i1", "i2"}
        assert {h for h, c in d.items() if c == "out"} == {"o1", "o2"}
        assert {h for h, c in d.items() if c == "tendril"} == {"t1"}
        assert {h for h, c in d.items() if c == "disconnected"} == {"x", "y"}

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.graphstats import bowtie, sql_bowtie

        got = sorted(tuple(r) for r in bowtie(_edges(spark, self.ROWS)).collect())
        con = duckdb.connect()
        con.register(
            "edges", pd.DataFrame(self.ROWS, columns=["src_host", "dst_host"])
        )
        want = sorted(
            tuple(r)
            for r in con.execute(sql_bowtie("SELECT * FROM edges")).fetchall()
        )
        assert got == want

    def test_acyclic_graph_core_is_pivot_only(self, spark):
        from pdf_extraction_spark.operators.graphstats import bowtie

        # star out of the pivot: no cycle, so CORE = {pivot}
        d = dict(
            (r.host, r.cls)
            for r in bowtie(
                _edges(spark, [("p", f"l{i}") for i in range(4)])
            ).collect()
        )
        assert d["p"] == "core"
        assert all(d[f"l{i}"] == "out" for i in range(4))

    def test_explicit_pivot_override(self, spark):
        from pdf_extraction_spark.operators.graphstats import bowtie

        d = dict(
            (r.host, r.cls)
            for r in bowtie(_edges(spark, self.ROWS), pivot="x").collect()
        )
        assert d["x"] == "core" and d["y"] == "out"
        # everything else is merely disconnected from x's weak component
        assert d["a"] == "disconnected"

    def test_empty_graph(self, spark):
        from pdf_extraction_spark.operators.graphstats import bowtie

        assert bowtie(_edges(spark, [("x", "x")])).count() == 0


class TestPowerlawFit:
    def test_known_alpha_and_twin(self, spark):
        import math

        import duckdb

        from pdf_extraction_spark.operators.graphstats import (
            powerlaw_fit,
            sql_powerlaw_fit,
        )

        # in-degrees drawn as a crafted histogram: degree k appears
        # roughly proportional to k^-2.5 over 1..32
        edges = []
        eid = 0
        for k in range(1, 33):
            for node in range(max(1, int(1000 * k ** -2.5))):
                for j in range(k):
                    edges.append((f"s{eid}_{j}", f"t{k}_{node}"))
                eid += 1
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.k_min: r for r in powerlaw_fit(df, k_mins=(1, 2)).collect()}
        # replay the exact integer formula
        from collections import Counter

        deg = Counter()
        for _, d in set(edges):
            deg[d] += 1
        hist = Counter(deg.values())
        for km in (1, 2):
            n = sum(c for k, c in hist.items() if k >= km)
            s = sum(
                c
                * (
                    int(round(math.log(2 * k) * 1e9))
                    - int(round(math.log(2 * km - 1) * 1e9))
                )
                for k, c in hist.items()
                if k >= km
            )
            want = round(1.0 + n * 1e9 / s, 6) + 0.0
            assert got[km].n_tail == n and got[km].alpha_6 == want, km
        # the generator's exponent is recovered to first order
        assert 2.0 < got[2].alpha_6 < 3.2
        con = duckdb.connect()
        vals = ", ".join(f"('{s_}', '{d}')" for s_, d in edges[:2000])
        spark_small = spark.createDataFrame(edges[:2000], "src string, dst string")
        a = sorted(map(tuple, powerlaw_fit(spark_small, k_mins=(1, 2)).collect()))
        b = sorted(
            con.execute(
                sql_powerlaw_fit(
                    f"SELECT * FROM (VALUES {vals}) t(src, dst)", k_mins=(1, 2)
                )
            ).fetchall()
        )
        assert a == b

    def test_degenerate_tail(self, spark):
        from pdf_extraction_spark.operators.graphstats import powerlaw_fit

        # every in-degree == 1: at k_min=1 the denominator is
        # sum ln(2/1) > 0 — defined; at k_min=5 the tail is empty
        df = spark.createDataFrame(
            [(f"s{i}", f"t{i}") for i in range(10)], "src string, dst string"
        )
        got = {r.k_min: r for r in powerlaw_fit(df, k_mins=(1, 5)).collect()}
        assert got[1].alpha_6 is not None
        assert got[5].n_tail == 0 and got[5].alpha_6 is None


class TestGraphSummary:
    def test_hand_values_and_twin(self, spark):
        import duckdb

        from pdf_extraction_spark.operators.graphstats import (
            graph_summary,
            sql_graph_summary,
        )

        edges = [
            ("a", "b"), ("b", "a"),       # reciprocal pair: 2 edges
            ("a", "c"), ("c", "d"),
            ("d", "d"),                    # self-loop dropped
            ("a", "b"),                    # duplicate collapses
            (None, "x"), ("x", None),      # NULLs dropped
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        [r] = graph_summary(df).collect()
        assert (r.n_nodes, r.n_edges, r.n_recip) == (4, 4, 2)
        assert r.recip_ppm == 2 * 10**6 // 4
        assert r.density_ppb == 4 * 10**9 // (4 * 3)
        assert (r.max_in_deg, r.max_out_deg) == (1, 2)
        assert r.mean_out_micro == 10**6
        con = duckdb.connect()
        vals = ", ".join(
            "(%s, %s)"
            % tuple("NULL" if v is None else f"'{v}'" for v in (s_, d))
            for s_, d in edges
        )
        [o] = con.execute(
            sql_graph_summary(f"SELECT * FROM (VALUES {vals}) t(src, dst)")
        ).fetchall()
        assert tuple(r) == o
