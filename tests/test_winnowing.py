"""Winnowing fingerprints (Schleimer et al. 2003): the paper's
guarantee (any shared token run of length >= w + k - 1 yields a shared
fingerprint), the ~2/(w+1) density bound, the rightmost-min tie rule,
short/empty-doc rules, and partition invariance. Cross-engine twin
parity lives in the strict oracle sweep (winnow_fp)."""

import hashlib

import pytest
from pdf_extraction_spark.operators.dedup import winnow_fingerprints


def _fps(spark, docs, k=3, w=4):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = winnow_fingerprints(df, k=k, w=w).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    return by_doc


def _gram_hash(words):
    return int(hashlib.md5(" ".join(words).encode()).hexdigest()[:13], 16)


class TestWinnowing:
    def test_matches_pure_python_reference(self, spark):
        """Full parity with a textbook winnowing implementation
        (rightmost-min per window) on a mixed-length corpus."""
        k, w = 3, 4
        docs = [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "Spark shuffles Partition data ACROSS executors at scale"),
            (3, "a b a b a b a b a b a b"),  # heavy repetition
        ]
        got = _fps(spark, docs, k=k, w=w)
        for doc_id, text in docs:
            toks = text.lower().split()
            hs = [_gram_hash(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            want = set()
            wp = min(w, len(hs))
            for j in range(max(len(hs) - w, 0) + 1):
                win = hs[j : j + wp]
                m = min(win)
                pos = j + max(i for i, h in enumerate(win) if h == m)
                want.add((pos, m))
            assert got[doc_id] == want, doc_id

    def test_shared_run_guarantee(self, spark):
        """Two docs sharing a run of w + k - 1 = 6 tokens must share at
        least one fingerprint VALUE regardless of surrounding text."""
        shared = "alpha beta gamma delta epsilon zeta"
        docs = [
            (1, f"completely unrelated prefix words here {shared} tail one"),
            (2, f"{shared} other suffix entirely different content rows"),
            (3, "no overlap with anything else at all whatsoever"),
        ]
        got = _fps(spark, docs)
        v1 = {fp for _, fp in got[1]}
        v2 = {fp for _, fp in got[2]}
        v3 = {fp for _, fp in got[3]}
        assert v1 & v2
        assert not (v1 & v3) and not (v2 & v3)

    def test_density_bound(self, spark):
        """Selected fraction stays near 2/(w+1) on random-ish text and
        never exceeds the window count."""
        import random

        random.seed(7)
        toks = [f"t{random.randrange(5000)}" for _ in range(400)]
        got = _fps(spark, [(1, " ".join(toks))], k=3, w=8)
        n_grams = 400 - 3 + 1
        frac = len(got[1]) / n_grams
        assert 0.1 < frac < 0.4  # 2/(w+1) = 0.22 ± slack

    def test_short_and_empty_docs(self, spark):
        docs = [
            (1, "one two"),      # < k tokens: whole-text gram, 1 fp
            (2, "one two three"),  # exactly k tokens: 1 gram, 1 window
            (3, ""),
            (4, None),
            (5, "   \t  "),
        ]
        got = _fps(spark, docs)
        assert got.get(1) == {(0, _gram_hash(["one", "two"]))}
        assert got.get(2) == {(0, _gram_hash(["one", "two", "three"]))}
        assert 3 not in got and 4 not in got and 5 not in got

    def test_rightmost_tie_rule(self, spark):
        """Identical grams inside one window: the RIGHTMOST minimum is
        selected (every window of the all-equal doc picks its last
        slot)."""
        text = "x x x x x x x x"  # 6 identical 3-grams, w=4 windows
        got = _fps(spark, [(1, text)], k=3, w=4)
        h = _gram_hash(["x", "x", "x"])
        assert got[1] == {(3, h), (4, h), (5, h)}

    def test_partition_invariance(self, spark):
        docs = [(i, f"w{i} " * 3 + "alpha beta gamma delta epsilon") for i in range(40)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        a = sorted(map(tuple, winnow_fingerprints(df).collect()))
        b = sorted(map(tuple, winnow_fingerprints(df.repartition(11)).collect()))
        assert a == b

    def test_bad_params_raise(self, spark):
        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError):
            winnow_fingerprints(df, k=0)
        with pytest.raises(ValueError):
            winnow_fingerprints(df, w=0)
