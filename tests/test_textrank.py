"""TextRank keyterms (operators/terms.py:textrank_terms): published
properties (hubs outrank leaves, symmetric nodes tie), an exact
pure-Python fixed-point replay, isolated-token exclusion, and
partition invariance."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.terms import TEXTRANK_SCALE, textrank_terms


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _replay(text, n_iter=4, damping_pct=85):
    """Exact integer replay of the fixed-point recursion for ONE doc."""
    toks = [w for w in text.lower().split() if w]
    from collections import Counter, defaultdict

    edges = Counter()
    for a, b in zip(toks, toks[1:]):
        if a != b:
            edges[(min(a, b), max(a, b))] += 1
    dedges = defaultdict(dict)
    for (lo, hi), w in edges.items():
        dedges[lo][hi] = dedges[lo].get(hi, 0) + w
        dedges[hi][lo] = dedges[hi].get(lo, 0) + w
    wdeg = {u: sum(vs.values()) for u, vs in dedges.items()}
    r = {u: TEXTRANK_SCALE for u in dedges}
    base = (100 - damping_pct) * TEXTRANK_SCALE // 100
    for _ in range(n_iter):
        nxt = {}
        for v in dedges:
            s = sum(r[u] * w // wdeg[u] for u, w in (
                (u, dedges[u][v]) for u in dedges if v in dedges[u]
            ))
            nxt[v] = base + damping_pct * s // 100
        r = nxt
    return {u: (rv + 500_000) // 1_000_000 for u, rv in r.items()}


class TestTextRank:
    def test_hub_ranks_first(self, spark):
        d = _docs(spark, [(1, "hub a hub b hub c")])
        rows = textrank_terms(d, k=10).collect()
        got = {r["term"]: r["rank_micro"] for r in rows}
        assert max(got, key=got.get) == "hub"
        assert got["a"] == got["b"] > got["c"]  # symmetric pair beats leaf

    def test_matches_pure_python_replay(self, spark):
        texts = [
            "the cat sat on the mat the cat ran",
            "alpha beta gamma alpha delta beta alpha",
            "x y z y x w v w x",
        ]
        d = _docs(spark, list(enumerate(texts)))
        rows = textrank_terms(d, k=50).collect()
        got = {}
        for r in rows:
            got.setdefault(r["doc_id"], {})[r["term"]] = r["rank_micro"]
        for i, t in enumerate(texts):
            exp = _replay(t)
            exp_top = dict(
                sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
            )
            assert got[i] == exp_top, i

    def test_symmetric_cycle_all_tie(self, spark):
        # a-b-c-a ring: all nodes identical by symmetry
        d = _docs(spark, [(1, "a b c a")])
        rows = textrank_terms(d, k=10).collect()
        assert len({r["rank_micro"] for r in rows}) == 1

    def test_isolated_tokens_excluded(self, spark):
        # single token and pure self-repetition build no edges
        d = _docs(spark, [(1, "solo"), (2, "rep rep rep"), (3, "a b")])
        rows = textrank_terms(d, k=10).collect()
        assert {r["doc_id"] for r in rows} == {3}

    def test_k_and_tiebreak(self, spark):
        d = _docs(spark, [(1, "a b c a")])  # all tie → term asc wins
        rows = textrank_terms(d, k=2).collect()
        assert sorted(r["term"] for r in rows) == ["a", "b"]

    def test_partition_invariance(self, spark):
        rows = [
            (i, " ".join("w%d" % ((i * j + j * j) % 13) for j in range(20)))
            for i in range(30)
        ]
        d = _docs(spark, rows)
        one = sorted(
            tuple(r) for r in textrank_terms(d.coalesce(1), k=3).collect()
        )
        many = sorted(
            tuple(r) for r in textrank_terms(d.repartition(7), k=3).collect()
        )
        assert one == many and one
