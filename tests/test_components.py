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
