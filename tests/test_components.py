"""Connected-components / dedup-cluster tests."""

import random

from pdf_extraction_spark.operators.components import connected_components, dedup_clusters


def _brute_components(edges):
    """Union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


class TestConnectedComponents:
    def test_chain_and_clique(self, spark):
        edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21), (21, 22), (20, 22)]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.node: r.component for r in connected_components(df).collect()}
        assert got == _brute_components(edges)
        clusters = {r.component: (r.n_members, r.keep_id) for r in dedup_clusters(df).collect()}
        assert clusters == {1: (4, 1), 10: (2, 10), 20: (3, 20)}

    def test_random_graph_matches_union_find(self, spark):
        rng = random.Random(42)
        nodes = list(range(200))
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.node: r.component for r in connected_components(df).collect()}
        assert got == _brute_components(edges)

    def test_long_path_converges(self, spark):
        # path of length 40 → needs multiple propagation rounds
        edges = [(i, i + 1) for i in range(40)]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.component for r in connected_components(df, max_iterations=50).collect()}
        assert got == {0}


class TestPagerank:
    """Fixed-point integer PageRank: parity with a pure-Python
    implementation of the SAME integer recursion, conservation, and
    graph-hygiene rules. Cross-engine twin parity lives in the strict
    oracle sweep (host_pagerank)."""

    @staticmethod
    def _py_pagerank(edges, n_iter=5, damping_pct=85, scale=10**12):
        es = {(s, d) for s, d in edges if s is not None and d is not None and s != d}
        nodes = sorted({s for s, _ in es} | {d for _, d in es})
        out = {}
        for s, _ in es:
            out[s] = out.get(s, 0) + 1
        n = len(nodes)
        base = ((100 - damping_pct) * scale) // (100 * n)
        r = {v: scale // n for v in nodes}
        for _ in range(n_iter):
            dm = sum(r[v] for v in nodes if v not in out)
            cs = {v: 0 for v in nodes}
            for s, d in es:
                cs[d] += r[s] // out[s]
            r = {
                v: base + (damping_pct * (cs[v] + dm // n)) // 100
                for v in nodes
            }
        q = scale // 10**6  # integer half-up, mirroring the operator
        return {v: ((r[v] + q // 2) // q) / 1e6 for v in nodes}

    def _run(self, spark, edges, n_iter=5):
        from pdf_extraction_spark.operators.components import pagerank

        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: r.rank for r in pagerank(df, n_iter=n_iter).collect()}
        want = self._py_pagerank(edges, n_iter=n_iter)
        assert got == want

    def test_matches_pure_python_recursion(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
        self._run(spark, edges)

    def test_dangling_sink_and_hygiene(self, spark):
        # parallel edge, self-loop, NULL endpoint all collapse/drop;
        # "sink" has no out-edges — its mass must recirculate
        edges = [
            ("a", "sink"), ("a", "sink"), ("b", "sink"), ("b", "b"),
            ("a", "b"), (None, "a"), ("b", None),
        ]
        self._run(spark, edges)
        from pdf_extraction_spark.operators.components import pagerank

        df = spark.createDataFrame(edges, "src string, dst string")
        ranks = {r.node: r.rank for r in pagerank(df, n_iter=5).collect()}
        assert set(ranks) == {"a", "b", "sink"}
        assert ranks["sink"] > ranks["a"]  # sink absorbs from both
        assert abs(sum(ranks.values()) - 1.0) < 1e-3

    def test_partition_invariance(self, spark):
        random.seed(11)
        edges = [
            (f"h{random.randrange(30)}", f"h{random.randrange(40)}")
            for _ in range(300)
        ]
        from pdf_extraction_spark.operators.components import pagerank

        df1 = spark.createDataFrame(edges, "src string, dst string")
        a = sorted(map(tuple, pagerank(df1, n_iter=4).collect()))
        b = sorted(
            map(tuple, pagerank(df1.repartition(13), n_iter=4).collect())
        )
        assert a == b
        self._run(spark, edges, n_iter=4)

    def test_empty_graph(self, spark):
        from pdf_extraction_spark.operators.components import pagerank

        df = spark.createDataFrame([], "src string, dst string")
        assert pagerank(df).collect() == []

    def test_half_tie_rounds_identically(self, spark):
        """A fixed-point rank landing exactly on a 6th-decimal half-tie
        must round half-up in BOTH engines (integer-domain rounding;
        float round() rules differ per engine). scale=10^8 makes the
        uniform starting rank of a 4-node cycle hit r % 100 == 50."""
        from pdf_extraction_spark.operators.components import (
            pagerank,
            sql_pagerank,
        )
        import duckdb

        # direct check of the crafted tie value: fixed-point 3_500_000
        # at scale 10^12 is rank 3.5e-6 — integer half-up must give
        # 4e-6 in both engines (float round() would disagree: Spark
        # HALF_UPs the decimal repr, Python correct-rounds the binary)
        import duckdb as _d
        from pyspark.sql import functions as F

        spark_tie = (
            spark.range(1)
            .select(
                (
                    F.expr("(3500000L + 500000L) div 1000000L").cast("double")
                    / 1e6
                ).alias("rank")
            )
            .first()
            .rank
        )
        duck_tie = _d.connect().execute(
            "SELECT CAST((3500000 + 500000) // 1000000 AS DOUBLE) / 1e6"
        ).fetchone()[0]
        assert spark_tie == 4e-06 == duck_tie
        # and the full recursion at a non-default scale stays three-way
        # identical (Spark vs pure-Python replay vs DuckDB twin)
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r.node: r.rank
            for r in pagerank(df, n_iter=3, scale=10**8).collect()
        }
        want = self._py_pagerank(edges, n_iter=3, scale=10**8)
        assert got == want
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE edges_t AS SELECT * FROM (VALUES "
            + ", ".join(f"('{s}', '{d}')" for s, d in edges)
            + ") t(src, dst)"
        )
        orows = dict(
            con.execute(
                sql_pagerank("SELECT src, dst FROM edges_t", 3, scale=10**8)
            ).fetchall()
        )
        assert got == orows

    def test_empty_graph_twin_emits_zero_rows(self, spark):
        """All-NULL / self-loop edges: Spark returns [], and the twin
        must emit zero rows rather than divide by zero."""
        import duckdb

        from pdf_extraction_spark.operators.components import (
            pagerank,
            sql_pagerank,
        )

        edges = [(None, "a"), ("b", None), ("c", "c")]
        df = spark.createDataFrame(edges, "src string, dst string")
        assert pagerank(df).collect() == []
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE edges_t(src VARCHAR, dst VARCHAR); "
            "INSERT INTO edges_t VALUES (NULL, 'a'), ('b', NULL), ('c', 'c')"
        )
        assert con.execute(
            sql_pagerank("SELECT src, dst FROM edges_t")
        ).fetchall() == []

    def test_deep_iteration_plan_stays_bounded(self, spark):
        """n_iter=20 (a normal PageRank depth) must finish quickly —
        the per-round localCheckpoint keeps the plan linear instead of
        2^n_iter subtrees."""
        from pdf_extraction_spark.operators.components import pagerank

        edges = [(f"h{i}", f"h{(i * 3 + 1) % 10}") for i in range(10)]
        df = spark.createDataFrame(edges, "src string, dst string")
        ranks = pagerank(df, n_iter=20).collect()
        assert len(ranks) == 10
        assert abs(sum(r.rank for r in ranks) - 1.0) < 1e-3


class TestTrustrank:
    """Seeded fixed-point TrustRank: parity with a pure-Python replay
    of the SAME integer recursion, seed semantics (zero rank off the
    seed-reachable set, dangling mass returns to seeds), hygiene and
    partition invariance. Cross-engine twin parity lives in the strict
    oracle sweep (host_trustrank)."""

    @staticmethod
    def _py_trustrank(edges, seeds, n_iter=5, damping_pct=85, scale=10**12):
        es = {(s, d) for s, d in edges if s is not None and d is not None and s != d}
        nodes = sorted({s for s, _ in es} | {d for _, d in es})
        sset = {s for s in seeds if s is not None} & set(nodes)
        out = {}
        for s, _ in es:
            out[s] = out.get(s, 0) + 1
        q = scale // 10**6
        if not sset:
            return {v: 0.0 for v in nodes}
        k = len(sset)
        base = ((100 - damping_pct) * scale) // (100 * k)
        r = {v: (scale // k if v in sset else 0) for v in nodes}
        for _ in range(n_iter):
            dm = sum(r[v] for v in nodes if v not in out)
            cs = {v: 0 for v in nodes}
            for s, d in es:
                cs[d] += r[s] // out[s]
            r = {
                v: (
                    base + (damping_pct * (cs[v] + dm // k)) // 100
                    if v in sset
                    else (damping_pct * cs[v]) // 100
                )
                for v in nodes
            }
        return {v: ((r[v] + q // 2) // q) / 1e6 for v in nodes}

    def _run(self, spark, edges, seeds, n_iter=5):
        from pdf_extraction_spark.operators.components import trustrank

        df = spark.createDataFrame(edges, "src string, dst string")
        sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
        got = {
            r.node: r.rank
            for r in trustrank(df, sdf, n_iter=n_iter).collect()
        }
        want = self._py_trustrank(edges, seeds, n_iter=n_iter)
        assert got == want

    def test_matches_pure_python_recursion(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
        self._run(spark, edges, ["a"])
        self._run(spark, edges, ["a", "d"])

    def test_unreachable_nodes_rank_zero(self, spark):
        # two disjoint components; seeding only the first must leave
        # the second at exactly 0 after any number of rounds
        from pdf_extraction_spark.operators.components import trustrank

        edges = [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")]
        df = spark.createDataFrame(edges, "src string, dst string")
        sdf = spark.createDataFrame([("a",)], "node string")
        ranks = {r.node: r.rank for r in trustrank(df, sdf, n_iter=6).collect()}
        assert ranks["x"] == 0.0 and ranks["y"] == 0.0
        assert ranks["a"] > 0.0 and ranks["b"] > 0.0
        # mass conservation: seeded component carries the whole unit
        assert abs(sum(ranks.values()) - 1.0) < 1e-3
        self._run(spark, edges, ["a"], n_iter=6)

    def test_dangling_mass_returns_to_seeds(self, spark):
        # "sink" has no out-edges; its mass must re-enter at the seed,
        # plus full hygiene (parallel edge, self-loop, NULL endpoint)
        edges = [
            ("a", "sink"), ("a", "sink"), ("b", "sink"), ("b", "b"),
            ("a", "b"), (None, "a"), ("b", None),
        ]
        self._run(spark, edges, ["a", None])

    def test_out_of_graph_and_empty_seed_sets(self, spark):
        from pdf_extraction_spark.operators.components import trustrank

        edges = [("a", "b"), ("b", "a")]
        df = spark.createDataFrame(edges, "src string, dst string")
        # seeds entirely outside the graph behave like no seeds: all 0
        sdf = spark.createDataFrame([("zz",)], "node string")
        ranks = {r.node: r.rank for r in trustrank(df, sdf).collect()}
        assert ranks == {"a": 0.0, "b": 0.0}
        empty = spark.createDataFrame([], "node string")
        ranks = {r.node: r.rank for r in trustrank(df, empty).collect()}
        assert ranks == {"a": 0.0, "b": 0.0}

    def test_partition_invariance(self, spark):
        random.seed(13)
        edges = [
            (f"h{random.randrange(30)}", f"h{random.randrange(40)}")
            for _ in range(300)
        ]
        seeds = ["h0", "h3", "h7"]
        from pdf_extraction_spark.operators.components import trustrank

        df = spark.createDataFrame(edges, "src string, dst string")
        sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
        a = sorted(map(tuple, trustrank(df, sdf, n_iter=4).collect()))
        b = sorted(
            map(
                tuple,
                trustrank(df.repartition(13), sdf, n_iter=4).collect(),
            )
        )
        assert a == b
        self._run(spark, edges, seeds, n_iter=4)


class TestLabelPropagation:
    """Deterministic synchronous LPA: parity with a pure-Python replay
    of the SAME recursion, planted-community recovery, tie rule,
    hygiene, invariances. Cross-engine twin parity lives in the strict
    oracle sweep (host_communities)."""

    @staticmethod
    def _py_lpa(edges, n_iter=5):
        es = {
            (a, b)
            for s, d in edges
            if s is not None and d is not None and s != d
            for a, b in ((s, d), (d, s))
        }
        nbrs = {}
        for a, b in es:
            nbrs.setdefault(a, []).append(b)
        lbl = {v: v for v in nbrs}
        for _ in range(n_iter):
            new = {}
            for v, ns in nbrs.items():
                counts = {}
                for u in ns:
                    counts[lbl[u]] = counts.get(lbl[u], 0) + 1
                new[v] = min(counts, key=lambda c: (-counts[c], c))
            lbl = new
        return lbl

    def _run(self, spark, edges, n_iter=5):
        from pdf_extraction_spark.operators.components import label_propagation

        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r.node: r.community
            for r in label_propagation(df, n_iter=n_iter).collect()
        }
        assert got == self._py_lpa(edges, n_iter=n_iter)
        return got

    def test_two_cliques_with_bridge_stay_separate(self, spark):
        clique = lambda pre: [  # noqa: E731
            (f"{pre}{i}", f"{pre}{j}") for i in range(4) for j in range(i + 1, 4)
        ]
        edges = clique("a") + clique("b") + [("a0", "b0")]
        got = self._run(spark, edges)
        assert {got[f"a{i}"] for i in range(4)} == {"a0"}
        assert {got[f"b{i}"] for i in range(4)} == {"b0"}

    def test_tie_breaks_to_smallest_label(self, spark):
        # m sees one 'a' and one 'z' neighbor: counts tie, 'a' wins
        got = self._run(spark, [("a", "m"), ("z", "m")], n_iter=1)
        assert got["m"] == "a"

    def test_hygiene_nulls_selfloops_parallel_edges(self, spark):
        edges = [("a", "b"), ("a", "b"), ("b", "a"), ("a", "a"),
                 (None, "b"), ("a", None)]
        got = self._run(spark, edges)
        assert set(got) == {"a", "b"}

    def test_direction_is_ignored(self, spark):
        e1 = [("a", "b"), ("b", "c"), ("c", "a")]
        e2 = [(d, s) for s, d in e1]
        assert self._run(spark, e1) == self._run(spark, e2)

    def test_partition_invariance(self, spark):
        from pdf_extraction_spark.operators.components import label_propagation

        edges = [(f"n{i}", f"n{(i * 3 + 1) % 17}") for i in range(17)]
        df = spark.createDataFrame(edges, "src string, dst string")
        a = sorted(
            (r.node, r.community)
            for r in label_propagation(df.repartition(1)).collect()
        )
        b = sorted(
            (r.node, r.community)
            for r in label_propagation(df.repartition(13, "dst")).collect()
        )
        assert a == b

    def test_empty_graph_returns_zero_rows(self, spark):
        from pdf_extraction_spark.operators.components import label_propagation

        df = spark.createDataFrame([], "src string, dst string")
        assert label_propagation(df, n_iter=2).count() == 0


class TestSalsa:
    LINKS = [
        ("h1", "a1"), ("h1", "a2"), ("h2", "a2"),
        ("h2", "a3"), ("h1", "a3"), ("h3", "a4"),
    ]

    def _df(self, spark, rows=None):
        return spark.createDataFrame(rows or self.LINKS, "src string, dst string")

    def test_matches_power_iteration_of_the_chain(self, spark):
        """Ground truth = 200 power-iteration steps of the paper's
        authority Markov chain (back along an in-link, forward along an
        out-link), components weighted |c∩A|/|A| — entirely independent
        of the closed-form implementation."""
        import numpy as np

        from pdf_extraction_spark.operators.components import salsa

        links = self.LINKS
        hubs = sorted({s for s, _ in links})
        auths = sorted({d for _, d in links})
        din = {a: sum(1 for _, d in links if d == a) for a in auths}
        dout = {h: sum(1 for s, _ in links if s == h) for h in hubs}
        T = np.zeros((len(auths), len(auths)))
        for i, a in enumerate(auths):
            for s, d in links:
                if d != a:
                    continue
                for s2, d2 in links:
                    if s2 == s:
                        T[i, auths.index(d2)] += 1.0 / din[a] / dout[s]
        expect = {}
        for comp, w in ((["a1", "a2", "a3"], 0.75), (["a4"], 0.25)):
            idx = [auths.index(a) for a in comp]
            v = np.ones(len(idx)) / len(idx)
            for _ in range(200):
                v = v @ T[np.ix_(idx, idx)]
            v = v / v.sum()
            for a, p in zip(comp, v):
                expect[a] = w * p
        got = {
            r.node: r.authority_nano / 1e9
            for r in salsa(self._df(spark)).collect()
            if r.authority_nano > 0
        }
        assert got.keys() == expect.keys()
        for a in expect:
            assert abs(got[a] - expect[a]) < 2e-9

    def test_scores_sum_to_scale(self, spark):
        """Each side is a probability distribution at nano scale
        (floor-division shortfall < one quantum per node)."""
        from pdf_extraction_spark.operators.components import SALSA_SCALE, salsa

        rows = salsa(self._df(spark)).collect()
        ha = sum(r.hub_nano for r in rows)
        aa = sum(r.authority_nano for r in rows)
        assert SALSA_SCALE - 10 <= ha <= SALSA_SCALE
        assert SALSA_SCALE - 10 <= aa <= SALSA_SCALE

    def test_connected_support_reduces_to_degree_share(self, spark):
        """One component ⇒ a(j) = d_in(j)/|E| exactly (the known
        degenerate case)."""
        from pdf_extraction_spark.operators.components import salsa

        links = [("h1", "a1"), ("h2", "a1"), ("h2", "a2")]
        got = {
            r.node: r.authority_nano
            for r in salsa(self._df(spark, links)).collect()
            if r.authority_nano
        }
        assert got == {"a1": 666666666, "a2": 333333333}

    def test_hygiene_and_dual_role_nodes(self, spark):
        from pdf_extraction_spark.operators.components import salsa

        links = [("x", "y"), ("y", "x"), ("x", "x"), (None, "y"), ("x", None)]
        rows = {r.node: r for r in salsa(self._df(spark, links)).collect()}
        # x and y each hub once and authority once in one component
        assert rows["x"].hub_nano > 0 and rows["x"].authority_nano > 0
        assert rows["y"].hub_nano > 0 and rows["y"].authority_nano > 0

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.components import salsa, sql_salsa

        got = sorted(tuple(r) for r in salsa(self._df(spark)).collect())
        con = duckdb.connect()
        con.register("links", pd.DataFrame(self.LINKS, columns=["src", "dst"]))
        want = sorted(
            tuple(r) for r in con.execute(sql_salsa("SELECT * FROM links")).fetchall()
        )
        assert got == want

    def test_empty_graph(self, spark):
        from pdf_extraction_spark.operators.components import salsa

        df = spark.createDataFrame([], "src string, dst string")
        assert salsa(df).count() == 0


class TestModularity:
    def _fixture(self, spark):
        edges = []
        for grp in ("p", "q"):
            ns = [f"{grp}{i}" for i in range(4)]
            edges += [(ns[i], ns[j]) for i in range(4) for j in range(i + 1, 4)]
        edges.append(("p0", "q0"))
        edf = spark.createDataFrame(edges, "src string, dst string")
        lab = spark.createDataFrame(
            [(f"{g}{i}", g) for g in "pq" for i in range(4)],
            "node string, community string",
        )
        return edges, edf, lab

    def test_two_cliques_exact_q(self, spark):
        from pdf_extraction_spark.operators.components import modularity

        _, edf, lab = self._fixture(spark)
        rows = modularity(edf, lab).collect()
        q = sum(r.contribution for r in rows)
        # m=13, e_c=6, d_c=13 per clique: Q = 2·(6/13 − (13/26)²) = 12/13 − 1/2
        assert abs(q - (12 / 13 - 0.5)) < 1e-12
        assert all(r.n_nodes == 4 and r.intra_edges == 6 for r in rows)

    def test_trivial_partition_scores_zero(self, spark):
        from pdf_extraction_spark.operators.components import modularity

        _, edf, _ = self._fixture(spark)
        one = spark.createDataFrame(
            [(f"{g}{i}", "all") for g in "pq" for i in range(4)],
            "node string, community string",
        )
        rows = modularity(edf, one).collect()
        assert abs(sum(r.contribution for r in rows)) < 1e-12

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.components import (
            modularity,
            sql_modularity,
        )

        edges, edf, lab = self._fixture(spark)
        got = sorted(tuple(r) for r in modularity(edf, lab).collect())
        con = duckdb.connect()
        con.register("edges", pd.DataFrame(edges, columns=["src", "dst"]))
        con.register(
            "labels",
            pd.DataFrame(
                [(f"{g}{i}", g) for g in "pq" for i in range(4)],
                columns=["node", "community"],
            ),
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                sql_modularity("SELECT * FROM edges", "SELECT * FROM labels")
            ).fetchall()
        )
        assert got == want

    def test_unlabelled_nodes_excluded(self, spark):
        from pdf_extraction_spark.operators.components import modularity

        edf = spark.createDataFrame(
            [("a", "b"), ("b", "x")], "src string, dst string"
        )
        lab = spark.createDataFrame(
            [("a", "c1"), ("b", "c1")], "node string, community string"
        )
        rows = modularity(edf, lab).collect()
        # only edge (a,b) is in the labelled universe: Q = 1 − 1 = 0... m=1,
        # e=1, d=2: contribution = 1/1 − (2/2)² = 0
        assert len(rows) == 1 and abs(rows[0].contribution) < 1e-12


class TestKatzCentrality:
    def _replay(self, edges, n_iter, shift, scale=10**12):
        from collections import defaultdict

        e = set(
            (s, d)
            for s, d in edges
            if s is not None and d is not None and s != d
        )
        nodes = set(s for s, _ in e) | set(d for _, d in e)
        x = {v: scale for v in nodes}
        for _ in range(n_iter):
            inc = defaultdict(int)
            for s, d in e:
                inc[d] += x[s]
            x = {v: scale + (inc[v] >> shift) for v in nodes}
        return {v: xv // 10**6 for v, xv in x.items()}

    def test_replay_parity_and_hygiene(self, spark):
        from pdf_extraction_spark.operators.components import katz_centrality

        edges = [
            ("a", "b"), ("a", "b"),  # parallel edge collapses
            ("b", "c"), ("c", "b"),  # 2-cycle accumulates over rounds
            ("d", "c"), ("e", "c"),
            ("f", "f"),              # self-loop dropped (f isolated out)
            (None, "b"), ("a", None),
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: r.katz_micro for r in katz_centrality(df, 3, 4).collect()}
        want = self._replay(edges, 3, 4)
        assert got == want
        assert "f" not in got  # only the self-loop touched f
        # no-inlink nodes read exactly the beta baseline
        assert got["a"] == 10**6 and got["d"] == 10**6
        # c has 3 in-edges (b, d, e) → strictly above baseline and
        # above b's 2 in-edge status... b gets a+c, c gets b+d+e
        assert got["c"] > got["b"] > 10**6

    def test_no_outdegree_normalization(self, spark):
        from pdf_extraction_spark.operators.components import katz_centrality

        # hub h endorses 3 targets; pagerank would split h's mass,
        # Katz gives each target the FULL attenuated hub status
        edges = [("h", "t1"), ("h", "t2"), ("h", "t3"), ("s", "h")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: r.katz_micro for r in katz_centrality(df, 2, 2).collect()}
        assert got["t1"] == got["t2"] == got["t3"]
        # each target got the full alpha*x_h, not a third of it:
        # round1 x_h = scale + scale/4; round2 t = scale + x_h/4
        assert got["t1"] == (10**12 + (10**12 + (10**12 >> 2)) // 4) // 10**6

    def test_twin_parity_and_partition_invariance(self, spark):
        import duckdb

        from pdf_extraction_spark.operators.components import (
            katz_centrality,
            sql_katz_centrality,
        )

        edges = [(f"n{i % 7}", f"n{(i * 3 + 1) % 7}") for i in range(30)]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = sorted(
            (r.node, r.katz_micro) for r in katz_centrality(df, 4, 5).collect()
        )
        got2 = sorted(
            (r.node, r.katz_micro)
            for r in katz_centrality(df.repartition(5), 4, 5).collect()
        )
        assert got == got2
        con = duckdb.connect()
        vals = ", ".join(f"('{s}', '{d}')" for s, d in edges)
        want = sorted(
            con.execute(
                sql_katz_centrality(
                    f"SELECT * FROM (VALUES {vals}) t(src, dst)", 4, 5
                )
            ).fetchall()
        )
        assert got == want
