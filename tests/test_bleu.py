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
