"""BLEU-2 cleaner-damage score (bleu_pair): pure-Python replay of the
quantized formula, identity/brevity/clipping/undefined branches, twin
parity on crafted rows. Cross-engine strict parity at corpus scale
lives in the oracle sweep (clean_bleu)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.textanalysis import bleu_pair, sql_bleu_pair

ROWS = [
    (0, "the cat sat on the mat", "the cat sat on the mat"),   # identity
    (1, "the cat sat", "the cat sat on the mat"),              # shortened: BP fires
    (2, "the the the the", "a the b c"),                       # clipping: ref has 1 'the'
    (3, "", "some reference text here"),                       # empty cand: undefined
    (4, "zebra yak", "the cat sat"),                           # m1=0: undefined
    (5, "cat the sat on the mat", "the cat sat on the mat"),   # reorder: p1=1, p2<1
    (6, None, None),                                           # NULL pair
    (7, "one", "one"),                                         # no bigrams: undefined
]


def _iln(x):
    return int(round(math.log(x) * 1e9))


def _replay(cand, ref):
    def toks(t):
        return (t or "").lower().split()

    def grams(ws, n):
        return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]

    from collections import Counter

    cw, rw = toks(cand), toks(ref)
    out = {}
    for n in (1, 2):
        cg, rg = Counter(grams(cw, n)), Counter(grams(rw, n))
        out[f"c{n}"] = sum(cg.values())
        out[f"m{n}"] = sum(min(c, rg[g]) for g, c in cg.items())
    c1, m1, c2, m2, r = out["c1"], out["m1"], out["c2"], out["m2"], len(rw)
    p1 = m1 * 10**6 // c1 if c1 else None
    p2 = m2 * 10**6 // c2 if c2 else None
    bp = (0 if c1 >= r else -((r - c1) * 10**9 // c1)) if c1 else None
    bleu = (
        bp - ((_iln(c1) - _iln(m1) + _iln(c2) - _iln(m2)) // 2)
        if c1 and c2 and m1 and m2
        else None
    )
    return (c1, m1, c2, m2, r, p1, p2, bp, bleu)


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, cand string, ref string")
    return {r.doc_id: r for r in bleu_pair(df, "cand", "ref").collect()}


def test_replay_parity(result):
    for d, cand, ref in ROWS:
        r = result[d]
        assert (
            r.c1, r.m1, r.c2, r.m2, r.r_len,
            r.p1_ppm, r.p2_ppm, r.bp_nano, r.bleu_nano,
        ) == _replay(cand, ref), d


def test_branches(result):
    assert result[0].bleu_nano == 0 and result[0].bp_nano == 0   # identity
    assert result[1].bp_nano < 0                                 # brevity fires
    assert result[2].p1_ppm == 250_000                           # clipped to 1/4
    assert result[3].bleu_nano is None and result[3].p1_ppm is None
    assert result[4].bleu_nano is None and result[4].p1_ppm == 0
    assert result[5].p1_ppm == 10**6 and result[5].p2_ppm < 10**6
    assert result[6].c1 == 0 and result[6].r_len == 0
    assert result[7].bleu_nano is None                           # no bigrams


def test_every_doc_emits_exactly_one_row(result):
    assert set(result) == {d for d, _, _ in ROWS}


def test_twin_parity_and_partition_invariance(spark):
    import pandas as pd

    df = spark.createDataFrame(ROWS, "doc_id long, cand string, ref string")
    got = sorted(
        (tuple(r) for r in bleu_pair(df, "cand", "ref").collect()), key=repr
    )
    got2 = sorted(
        (tuple(r) for r in bleu_pair(df.repartition(5), "cand", "ref").collect()),
        key=repr,
    )
    assert got == got2
    con = duckdb.connect()
    con.register("pairsrc", pd.DataFrame(ROWS, columns=["doc_id", "cand", "ref"]))
    want = sorted(
        (
            tuple(r)
            for r in con.execute(
                sql_bleu_pair("SELECT * FROM pairsrc", "cand", "ref")
            ).fetchall()
        ),
        key=repr,
    )
    assert got == want


class TestCtLangid:
    # two "languages" with distinct character statistics + noise rows
    ROWS = [
        (0, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (1, "every good thing comes to those who wait for the right time", "en"),
        (2, "she sells sea shells down by the sea shore all day long", "en"),
        (3, "szczebrzeszyn chrzaszcz brzmi w trzcinie i szczaw rosnie", "pl"),
        (4, "wszystko dobrze przy szczytach gdzie szczyty szybko szumia", "pl"),
        (5, "przez szyby deszcz szumi w szczelinach przy szosie", "pl"),
        (6, "the quick brown dog waits by the sea shore", None),   # unlabeled
        (7, "szybko szumi deszcz przy szczycie", None),             # unlabeled
        (8, "", "en"),
        (9, None, "pl"),
    ]

    def test_semantics(self, spark):
        from pdf_extraction_spark.operators.textanalysis import ct_langid

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string, lang string")
        got = {r.doc_id: r for r in ct_langid(df, k=30).collect()}
        assert set(got) == set(range(10))
        for i in (0, 1, 2, 6):
            assert got[i].pred == "en", i
        for i in (3, 4, 5, 7):
            assert got[i].pred == "pl", i
        # the winner's distance is a real integer and beats the bound
        assert 0 <= got[0].dist <= 30 * 30
        # empty/NULL text: no profile -> no verdict
        assert got[8].pred is None and got[9].pred is None

    def test_self_profile_is_best_and_partition_invariant(self, spark):
        from pdf_extraction_spark.operators.textanalysis import ct_langid

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string, lang string")
        a = sorted((tuple(r) for r in ct_langid(df, k=30).collect()), key=repr)
        b = sorted(
            (tuple(r) for r in ct_langid(df.repartition(5), k=30).collect()),
            key=repr,
        )
        assert a == b

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.textanalysis import (
            ct_langid,
            sql_ct_langid,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string, lang string")
        got = sorted((tuple(r) for r in ct_langid(df, k=30).collect()), key=repr)
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(self.ROWS, columns=["doc_id", "text", "lang"]),
        )
        want = sorted(
            (
                tuple(r)
                for r in con.execute(sql_ct_langid("documents", k=30)).fetchall()
            ),
            key=repr,
        )
        assert got == want


class TestBigramCondEntropy:
    ROWS = [
        # deterministic template: every word fully determines the next
        (0, "a b c a b c a b c a b c a b c", "tmpl"),
        (1, "a b c a b c a b c", "tmpl"),
        # varied continuations
        (2, "the cat ran and the dog sat and the fox hid", "nat"),
        (3, "the end came when the end left while the end stayed", "nat"),
        (4, "one two", None),   # NULL stratum with a single bigram
        (5, "solo", "tiny"),    # <2 tokens: no bigram, no row
        (6, None, "tiny"),
    ]

    def _replay(self, rows):
        import math
        from collections import Counter, defaultdict

        bi, left = defaultdict(Counter), defaultdict(Counter)
        for _, t, g in rows:
            ws = (t or "").lower().split()
            for a, b in zip(ws, ws[1:]):
                bi[g][(a, b)] += 1
                left[g][a] += 1

        def iln(x):
            return int(round(math.log(x) * 1e9))

        out = {}
        for g, cnt in bi.items():
            if not cnt:
                continue
            n = sum(cnt.values())
            s_ab = sum(c * iln(c) for c in cnt.values())
            s_a = sum(c * iln(c) for c in left[g].values())
            out[g] = (n, round((s_a - s_ab) / (n * 1e9), 6) + 0.0)
        return out

    def test_replay_and_semantics(self, spark):
        from pdf_extraction_spark.operators.textanalysis import (
            bigram_cond_entropy,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string, source string")
        got = {r.source: r for r in bigram_cond_entropy(df).collect()}
        want = self._replay(self.ROWS)
        assert set(got) == set(want)
        for g, (n, h) in want.items():
            assert (got[g].n_bigrams, got[g].h_cond) == (n, h), g
        # the pure template is perfectly predictable
        assert got["tmpl"].h_cond == 0.0
        # varied continuations carry real conditional entropy
        assert got["nat"].h_cond > 0.5
        # single-bigram NULL stratum: deterministic too
        assert got[None].h_cond == 0.0
        # no-bigram source emits no row
        assert "tiny" not in got

    def test_twin_parity_and_partition_invariance(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.textanalysis import (
            bigram_cond_entropy,
            sql_bigram_cond_entropy,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string, source string")
        got = sorted((tuple(r) for r in bigram_cond_entropy(df).collect()), key=repr)
        got2 = sorted(
            (tuple(r) for r in bigram_cond_entropy(df.repartition(5)).collect()),
            key=repr,
        )
        assert got == got2
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(self.ROWS, columns=["doc_id", "text", "source"]),
        )
        want = sorted(
            (
                tuple(r)
                for r in con.execute(
                    sql_bigram_cond_entropy("documents")
                ).fetchall()
            ),
            key=repr,
        )
        assert got == want


class TestBurrowsDelta:
    ROWS = [
        # two stylistic twins (same function-word rates) + one outlier
        (0, "the of and the of and a in to the", "a1"),
        (1, "the of and the of and a in to the", "a2"),
        (2, "zz qq xx zz qq xx vv ww yy zz", "b"),
        (3, "the of and a in to", None),     # NULL source excluded
        (4, "", "a1"),
    ]

    def _replay(self, rows, k):
        import math
        from collections import Counter, defaultdict

        sw, tot = defaultdict(Counter), Counter()
        for _, t, g in rows:
            if g is None:
                continue
            for w in (t or "").lower().split():
                sw[g][w] += 1
                tot[w] += 1
        top = sorted(tot.items(), key=lambda x: (-x[1], x[0]))[:k]
        top = [w for w, _ in top]
        srcs = sorted(sw)
        m = len(srcs)
        f = {
            (s, w): sw[s][w] * 10**6 // sum(sw[s].values())
            for s in srcs
            for w in top
        }
        out = {}
        for i, a in enumerate(srcs):
            for b in srcs[i + 1:]:
                total = 0
                nw = 0
                for w in top:
                    s1 = sum(f[(s, w)] for s in srcs)
                    s2 = sum(f[(s, w)] ** 2 for s in srcs)
                    v = m * s2 - s1 * s1
                    if v > 0:
                        nw += 1
                        total += m * abs(f[(a, w)] - f[(b, w)]) * 1000 // math.isqrt(v)
                out[(a, b)] = (nw, total // k)
        return out

    def test_replay_and_semantics(self, spark):
        from pdf_extraction_spark.operators.textanalysis import burrows_delta

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string, source string")
        got = {
            (r.src_a, r.src_b): (r.n_words, r.delta_milli)
            for r in burrows_delta(df, k=6).collect()
        }
        want = self._replay(self.ROWS, 6)
        assert got == want
        # stylistic twins are at distance 0; both far from the outlier
        assert got[("a1", "a2")][1] == 0
        assert got[("a1", "b")][1] > 0 and got[("a2", "b")][1] > 0
        assert got[("a1", "b")] == got[("a2", "b")]

    def test_twin_parity_and_partition_invariance(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.textanalysis import (
            burrows_delta,
            sql_burrows_delta,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string, source string")
        got = sorted((tuple(r) for r in burrows_delta(df, k=6).collect()), key=repr)
        got2 = sorted(
            (tuple(r) for r in burrows_delta(df.repartition(5), k=6).collect()),
            key=repr,
        )
        assert got == got2
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(self.ROWS, columns=["doc_id", "text", "source"]),
        )
        want = sorted(
            (
                tuple(r)
                for r in con.execute(
                    sql_burrows_delta("documents", k=6)
                ).fetchall()
            ),
            key=repr,
        )
        assert got == want
