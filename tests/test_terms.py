"""PMI collocations + TF-IDF key terms: semantics against a pure-Python
replay of the same fixed-point integer formula, tie-breaks, degenerate
inputs, and DuckDB twin parity on crafted rows."""

import math

import duckdb
import pytest

DOCS = [
    (0, "new york is big and new york is loud"),
    (1, "new york again but also brand new ideas"),
    (2, "completely different words here entirely"),
    (3, "the cat and the dog and the bird"),
    (4, ""),
    (5, None),
]


def _iln(x: int) -> int:
    return int(round(math.log(x) * 1e9))


def _tokens(t):
    # exact replay of curation._lower_words: lowercase, split on runs of
    # the Java \s body, drop empties (punctuation stays inside tokens)
    import re

    return [w for w in re.split(r"[ \t\n\x0B\f\r]+", (t or "").lower()) if w]


def _replay_pmi(docs, min_count):
    from collections import Counter

    uni, pairs = Counter(), Counter()
    for _, t in docs:
        toks = _tokens(t)
        uni.update(toks)
        pairs.update(zip(toks, toks[1:]))
    n_tok, n_big = sum(uni.values()), sum(pairs.values())
    out = {}
    for (w1, w2), c in pairs.items():
        if c >= min_count:
            nano = _iln(c) - _iln(n_big) - _iln(uni[w1]) - _iln(uni[w2]) \
                + 2 * _iln(n_tok)
            out[(w1, w2)] = (c, nano / 1e9)
    return out


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestPmi:
    def test_matches_pure_python_replay(self, spark, docs_df):
        from pdf_extraction_spark.operators.terms import pmi_collocations

        got = {
            (r.w1, r.w2): (r.n_pair, r.pmi)
            for r in pmi_collocations(docs_df, min_count=1).collect()
        }
        want = _replay_pmi(DOCS, 1)
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            assert got[k][1] == pytest.approx(want[k][1], abs=0)  # bit-equal

    def test_collocation_beats_chance(self, spark, docs_df):
        from pdf_extraction_spark.operators.terms import pmi_collocations

        got = {
            (r.w1, r.w2): r.pmi
            for r in pmi_collocations(docs_df, min_count=1).collect()
        }
        # 'new york' (always adjacent: 3 pair occurrences) beats
        # 'and new' (1 co-occurrence); with count(and) == count(york)
        # the analytic gap is exactly ln(3/1) ≈ 1.0986
        assert got[("new", "york")] > 1.0
        assert got[("new", "york")] == pytest.approx(
            got[("and", "new")] + math.log(3), abs=1e-6
        )

    def test_min_count_prunes(self, spark, docs_df):
        from pdf_extraction_spark.operators.terms import pmi_collocations

        rows = pmi_collocations(docs_df, min_count=3).collect()
        assert {(r.w1, r.w2) for r in rows} == {("new", "york")}

    def test_twin_parity(self, spark, docs_df):
        from pdf_extraction_spark.operators.terms import (
            pmi_collocations,
            sql_pmi_collocations,
        )

        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
        cols = ["w1", "w2", "n_pair", "pmi"]
        got = sorted(
            map(
                tuple,
                pmi_collocations(docs_df, min_count=1)
                .toPandas()[cols]
                .itertuples(index=False),
            )
        )
        want = sorted(
            map(tuple, con.execute(sql_pmi_collocations(min_count=1)).fetchall())
        )
        assert got == want


class TestKeyTerms:
    def test_tokenless_docs_emit_nothing(self, spark, docs_df):
        from pdf_extraction_spark.operators.terms import doc_key_terms

        rows = doc_key_terms(docs_df, k=1).collect()
        # one winner per doc with tokens; empty/NULL docs emit nothing
        assert {r.doc_id for r in rows} == {0, 1, 2, 3}
        assert len(rows) == 4

    def test_score_and_tiebreak_match_replay(self, spark, docs_df):
        from collections import Counter

        from pdf_extraction_spark.operators.terms import doc_key_terms

        tf = {}
        for i, t in DOCS:
            for w, c in Counter(_tokens(t)).items():
                tf[(i, w)] = c
        df_ = Counter(w for (_, w) in tf)
        n_docs = len({i for (i, _) in tf})
        best = {}
        for (i, w), c in tf.items():
            nano = c * (_iln(n_docs) - _iln(df_[w]))
            key = (-nano, w)
            if i not in best or key < best[i][0]:
                best[i] = (key, w, c, nano / 1e9)
        got = {r.doc_id: (r.term, r.tf, r.score)
               for r in doc_key_terms(docs_df, k=1).collect()}
        for i, (_, w, c, s) in best.items():
            assert got[i] == (w, c, pytest.approx(s, abs=0))

    def test_k_bounds_output(self, spark, docs_df):
        from pdf_extraction_spark.operators.terms import doc_key_terms

        rows = doc_key_terms(docs_df, k=2).collect()
        from collections import Counter

        per_doc = Counter(r.doc_id for r in rows)
        assert all(v <= 2 for v in per_doc.values())

    def test_twin_parity(self, spark, docs_df):
        from pdf_extraction_spark.operators.terms import (
            doc_key_terms,
            sql_doc_key_terms,
        )

        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
        cols = ["doc_id", "term", "tf", "score"]
        got = sorted(
            map(
                tuple,
                doc_key_terms(docs_df, k=3).toPandas()[cols].itertuples(index=False),
            )
        )
        want = sorted(map(tuple, con.execute(sql_doc_key_terms(k=3)).fetchall()))
        assert got == want


RAKE_DOCS = [
    (
        0,
        "Compatibility of systems of linear constraints over the set of "
        "natural numbers. Criteria of compatibility of a system of linear "
        "Diophantine equations, strict inequations, and nonstrict "
        "inequations are considered.",
    ),
    (1, "machine learning pipeline; machine learning models. pipeline!"),
    (2, "the and of to in is"),
    (3, ""),
    (4, None),
    (5, "one-token"),
]


def _replay_rake(docs, k):
    """Independent pure-Python RAKE replay: same fragment split,
    stoplist, integer deg·10⁶//freq word score and (score desc, phrase
    asc) top-k."""
    import re
    from collections import Counter

    from pdf_extraction_spark.operators.terms import RAKE_STOPWORDS

    stops = set(RAKE_STOPWORDS)
    out = []
    for doc_id, text in docs:
        frags = re.split(r"[^a-z0-9 \t\n\x0B\f\r]+", (text or "").lower())
        cands = []
        for frag in frags:
            toks = [w for w in re.split(r"[ \t\n\x0B\f\r]+", frag) if w]
            cur = []
            for t in toks + ["the"]:  # sentinel stop flushes the tail
                if t in stops:
                    if cur:
                        cands.append(cur)
                    cur = []
                else:
                    cur.append(t)
        freq, deg = Counter(), Counter()
        for c in cands:
            for w in c:
                freq[w] += 1
                deg[w] += len(c)
        ws = {w: deg[w] * 10**6 // freq[w] for w in freq}
        seen = {}
        for c in cands:
            seen[" ".join(c)] = (len(c), sum(ws[w] for w in c))
        ranked = sorted(
            ((v[1], p, v[0]) for p, v in seen.items()),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        out.extend((doc_id, p, n, s) for s, p, n in ranked)
    return sorted(out)


class TestRake:
    def test_matches_pure_python_replay(self, spark):
        from pdf_extraction_spark.operators.terms import rake_phrases

        df = spark.createDataFrame(RAKE_DOCS, "doc_id long, text string")
        got = sorted(
            (r.doc_id, r.phrase, r.n_words, r.score_micro)
            for r in rake_phrases(df, k=3).collect()
        )
        assert got == _replay_rake(RAKE_DOCS, 3)

    def test_paper_abstract_scores(self, spark):
        """The RAKE paper's canonical abstract: 'linear diophantine
        equations' scores 9.0 (deg/freq: linear 4/2 + diophantine 3/1 +
        equations 3/1... at 10⁶ scale), top phrases match."""
        from pdf_extraction_spark.operators.terms import rake_phrases

        df = spark.createDataFrame([RAKE_DOCS[0]], "doc_id long, text string")
        rows = {
            r.phrase: (r.n_words, r.score_micro)
            for r in rake_phrases(df, k=3).collect()
        }
        assert rows["linear diophantine equations"] == (3, 8_500_000)
        assert "linear constraints" in rows

    def test_stopword_only_empty_null_emit_nothing(self, spark):
        from pdf_extraction_spark.operators.terms import rake_phrases

        df = spark.createDataFrame(
            [RAKE_DOCS[2], RAKE_DOCS[3], RAKE_DOCS[4]], "doc_id long, text string"
        )
        assert rake_phrases(df, k=3).count() == 0

    def test_phrase_never_crosses_punctuation(self, spark):
        from pdf_extraction_spark.operators.terms import rake_phrases

        df = spark.createDataFrame(
            [(0, "alpha beta. gamma delta")], "doc_id long, text string"
        )
        phrases = {r.phrase for r in rake_phrases(df, k=10).collect()}
        assert phrases == {"alpha beta", "gamma delta"}

    def test_duplicate_phrases_collapse(self, spark):
        from pdf_extraction_spark.operators.terms import rake_phrases

        df = spark.createDataFrame(
            [(0, "red fox. red fox. red fox")], "doc_id long, text string"
        )
        rows = rake_phrases(df, k=10).collect()
        assert len(rows) == 1
        assert rows[0].phrase == "red fox"

    def test_twin_parity(self, spark):
        import duckdb as _dd
        import pandas as pd

        from pdf_extraction_spark.operators.terms import (
            rake_phrases,
            sql_rake_phrases,
        )

        df = spark.createDataFrame(RAKE_DOCS, "doc_id long, text string")
        got = sorted(
            (r.doc_id, r.phrase, r.n_words, r.score_micro)
            for r in rake_phrases(df, k=3).collect()
        )
        con = _dd.connect()
        con.register("documents", pd.DataFrame(RAKE_DOCS, columns=["doc_id", "text"]))
        want = sorted(tuple(r) for r in con.execute(sql_rake_phrases("documents", k=3)).fetchall())
        assert got == want


class TestGoodTuring:
    ROWS = [(1, "a a a b b c d e"), (2, "b c f"), (3, None), (4, "")]

    def test_known_table(self, spark):
        from pdf_extraction_spark.operators.terms import good_turing

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        d = {r.r: r for r in good_turing(df).collect()}
        # counts: a,b:3  c:2  d,e,f:1 → N1=3, N2=1, N3=2, N=11
        assert (d[1].n_r, d[2].n_r, d[3].n_r) == (3, 1, 2)
        assert d[1].r_star_micro == 2 * 10**6 // 3  # (1+1)·N2/N1
        assert d[2].r_star_micro == 3 * 2 * 10**6 // 1
        assert d[3].r_star_micro == 0  # N4 = 0: undefined → 0
        assert d[1].p_mass_ppm == 3 * 10**6 // 11  # P0 = N1/N

    def test_mass_sums_to_one(self, spark):
        from pdf_extraction_spark.operators.terms import good_turing

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        total = sum(r.p_mass_ppm for r in good_turing(df).collect())
        assert 10**6 - 5 <= total <= 10**6  # floor shortfall only

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.terms import (
            good_turing,
            sql_good_turing,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = sorted(tuple(r) for r in good_turing(df).collect())
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(self.ROWS, columns=["doc_id", "text"]))
        want = sorted(
            tuple(r) for r in con.execute(sql_good_turing("documents")).fetchall()
        )
        assert got == want


class TestKeyness:
    # spam flood concentrated in one source; shared filler everywhere
    ROWS = [
        (0, "buy pills buy pills buy pills cheap now", "spam"),
        (1, "buy pills now cheap cheap deal deal deal", "spam"),
        (2, "the quiet garden held the morning light", "news"),
        (3, "the garden light fell on the morning path", "news"),
        (4, "morning light and garden path and quiet", None),
        (5, "", "spam"),
        (6, None, None),
    ]

    def _replay(self, rows, min_count, k):
        import re
        from collections import Counter

        def toks(t):
            return [
                w
                for w in re.split(r"[ \t\n\x0B\f\r]+", (t or "").lower())
                if w
            ]

        ct, tfc, ngc = Counter(), Counter(), Counter()
        for _, t, g in rows:
            for w in toks(t):
                ct[(g, w)] += 1
                tfc[w] += 1
                ngc[g] += 1
        n = sum(tfc.values())

        def iln(x):
            return int(round(math.log(x) * 1e9))

        def s(x):
            return x * iln(x) if x > 0 else 0

        out = {}
        for (g, w), a in ct.items():
            tf = tfc[w]
            if tf < min_count:
                continue
            ng = ngc[g]
            b, c, d = tf - a, ng - a, n - ng - (tf - a)
            g2 = 2 * (
                s(a) + s(b) + s(c) + s(d)
                - s(tf) - s(n - tf) - s(ng) - s(n - ng) + s(n)
            )
            lr = iln(a) + iln(n) - iln(tf) - iln(ng)
            nd = float(a) * float(d) - float(b) * float(c)
            chi2 = (
                round(
                    float(n) * nd * nd
                    / (float(tf) * float(n - tf) * float(ng) * float(n - ng)),
                    6,
                )
                + 0.0
                if 0 < tf < n and 0 < ng < n
                else None
            )
            out[(g, w)] = (a, tf, g2, lr, chi2)
        top = {}
        for g in set(g for g, _ in out):
            ranked = sorted(
                ((v[2], w) for (gg, w), v in out.items() if gg == g),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            top[g] = set(w for _, w in ranked)
        return out, top

    def test_replay_parity(self, spark):
        from pdf_extraction_spark.operators.terms import keyness

        df = spark.createDataFrame(
            self.ROWS, "doc_id long, text string, source string"
        )
        got = keyness(df, min_count=2, k=4).collect()
        want, top = self._replay(self.ROWS, 2, 4)
        assert len(got) > 0
        for r in got:
            key = (r.source, r.tok)
            assert r.tok in top[r.source], key
            a, tf, g2, lr, chi2 = want[key]
            assert (r.tf_group, r.tf_corpus) == (a, tf), key
            assert r.g2_nano == g2, key
            assert r.lr_nano == lr, key
            assert r.chi2 == chi2, key

    def test_direction_and_null_stratum(self, spark):
        from pdf_extraction_spark.operators.terms import keyness

        df = spark.createDataFrame(
            self.ROWS, "doc_id long, text string, source string"
        )
        rows = keyness(df, min_count=2, k=10).collect()
        by = {(r.source, r.tok): r for r in rows}
        # "pills" lives only in spam → over-represented there
        assert by[("spam", "pills")].lr_nano > 0
        # "the" never occurs in spam rows → no (spam, the) row at all,
        # and in news (where it concentrates) it reads positive
        assert ("spam", "the") not in by
        assert by[("news", "the")].lr_nano > 0
        # the NULL source is a real stratum with its own ranked terms
        assert any(r.source is None for r in rows)

    def test_partition_invariance(self, spark):
        from pdf_extraction_spark.operators.terms import keyness

        df = spark.createDataFrame(
            self.ROWS, "doc_id long, text string, source string"
        )
        a = sorted(map(tuple, keyness(df, min_count=2, k=4).collect()), key=repr)
        b = sorted(
            map(tuple, keyness(df.repartition(7), min_count=2, k=4).collect()),
            key=repr,
        )
        assert a == b

    def test_twin_parity(self, spark):
        import pandas as pd

        from pdf_extraction_spark.operators.terms import keyness, sql_keyness

        df = spark.createDataFrame(
            self.ROWS, "doc_id long, text string, source string"
        )
        got = sorted(
            (tuple(r) for r in keyness(df, min_count=2, k=4).collect()),
            key=repr,
        )
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(self.ROWS, columns=["doc_id", "text", "source"]),
        )
        want = sorted(
            (
                tuple(r)
                for r in con.execute(
                    sql_keyness("documents", min_count=2, k=4)
                ).fetchall()
            ),
            key=repr,
        )
        assert got == want


class TestCooccurRules:
    ROWS = [
        # {alpha, beta} co-occur in 4 baskets; gamma rides with alpha twice;
        # rare words pruned by min_docs
        (0, "alpha beta filler one"),
        (1, "alpha beta gamma two"),
        (2, "alpha beta three gamma"),
        (3, "beta alpha four"),
        (4, "alpha solo five"),
        (5, "beta lonely six"),
        (6, "gamma only seven rare"),
        (7, ""),
        (8, None),
    ]

    def test_hand_values(self, spark):
        from pdf_extraction_spark.operators.terms import cooccur_rules

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = {
            (r.w1, r.w2): r
            for r in cooccur_rules(df, min_docs=3, k=10).collect()
        }
        ab = got[("alpha", "beta")]
        # alpha in 5 docs, beta in 5, together in 4; 7 docs have tokens
        assert (ab.n_ab, ab.n_a, ab.n_b) == (4, 5, 5)
        assert ab.supp_ppm == 4 * 10**6 // 7
        assert ab.conf_a_ppm == 4 * 10**6 // 5
        assert ab.lift6 == round(4 * 7 / 25, 6)
        # gamma appears in 3 docs but each pair with it is < min_docs
        assert all("gamma" not in k for k in got)

    def test_apriori_prune_bounds_pairs(self, spark):
        from pdf_extraction_spark.operators.terms import cooccur_rules

        # singleton words never pair even if a doc holds many of them
        df = spark.createDataFrame(
            [(0, " ".join(f"u{i}" for i in range(50)))], "doc_id long, text string"
        )
        assert cooccur_rules(df, min_docs=2, k=10).count() == 0

    def test_twin_parity_and_partition_invariance(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.terms import (
            cooccur_rules,
            sql_cooccur_rules,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = [tuple(r) for r in cooccur_rules(df, min_docs=2, k=10).collect()]
        got2 = [
            tuple(r)
            for r in cooccur_rules(df.repartition(5), min_docs=2, k=10).collect()
        ]
        assert got == got2
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(self.ROWS, columns=["doc_id", "text"]))
        want = [
            tuple(r)
            for r in con.execute(
                sql_cooccur_rules("documents", min_docs=2, k=10)
            ).fetchall()
        ]
        assert got == want
