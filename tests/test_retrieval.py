"""BM25 lexical retrieval + sliding-window chunker.

The strict cross-engine oracles live in __spark_entry__ (bm25_topk,
chunk_docs); these tests pin the operator semantics themselves on tiny
inline corpora plus the scale-shape plan properties.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_topk,
    chunk_sliding_window,
    sql_bm25_topk,
    sql_chunk_sliding_window,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunker:
    def test_short_doc_single_chunk(self, spark):
        out = chunk_sliding_window(
            _docs(spark, [(1, "a b c")]), size=4, overlap=1
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.chunk_idx, r.n_tokens, r.chunk_text) == (0, 3, "a b c")

    def test_overlap_and_coverage(self, spark):
        toks = [f"t{i}" for i in range(10)]
        out = (
            chunk_sliding_window(
                _docs(spark, [(1, " ".join(toks))]), size=4, overlap=2
            )
            .orderBy("chunk_idx")
            .collect()
        )
        # stride 2: windows [0:4],[2:6],[4:8],[6:10] -> 1+ceil(6/2)=4 chunks
        assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
        chunks = [r.chunk_text.split(" ") for r in out]
        assert chunks[0] == toks[0:4] and chunks[1] == toks[2:6]
        assert chunks[3] == toks[6:10]
        # consecutive chunks share exactly `overlap` tokens
        for a, b in zip(chunks, chunks[1:]):
            assert a[-2:] == b[:2]
        # every token appears in some chunk
        assert set(toks) == {t for c in chunks for t in c}

    def test_ragged_final_chunk(self, spark):
        toks = [f"t{i}" for i in range(11)]
        out = (
            chunk_sliding_window(
                _docs(spark, [(1, " ".join(toks))]), size=4, overlap=2
            )
            .orderBy("chunk_idx")
            .collect()
        )
        # windows start at 0,2,4,6,8 — the last holds 3 tokens
        assert [r.n_tokens for r in out] == [4, 4, 4, 4, 3]
        assert out[-1].chunk_text == "t8 t9 t10"

    def test_tokenless_doc_emits_nothing(self, spark):
        out = chunk_sliding_window(
            _docs(spark, [(1, " ... !!! "), (2, "")]), size=4, overlap=1
        ).collect()
        assert out == []

    def test_tokenizer_splits_punctuation_keeps_case(self, spark):
        out = chunk_sliding_window(
            _docs(spark, [(1, "Hello, World—2024 test")]), size=8, overlap=0
        ).collect()
        assert out[0].chunk_text == "Hello World 2024 test"

    def test_bad_params_raise(self, spark):
        with pytest.raises(ValueError):
            chunk_sliding_window(_docs(spark, [(1, "a")]), size=4, overlap=4)

    def test_duckdb_twin_matches(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "alpha beta"),
            (3, "!!!"),
        ]
        got = sorted(
            (r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text)
            for r in chunk_sliding_window(
                _docs(spark, rows), size=5, overlap=2
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE docs (doc_id BIGINT, text VARCHAR)"
        )
        con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
        want = sorted(
            tuple(r)
            for r in con.sql(
                sql_chunk_sliding_window("docs", size=5, overlap=2)
            ).fetchall()
        )
        assert got == want

    def test_plan_is_narrow(self, spark):
        """Pure map: no Exchange anywhere in the chunker plan."""
        df = chunk_sliding_window(_docs(spark, [(1, "a b c")]), size=4, overlap=1)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def _bm25_expected(corpus, terms, k1=BM25_K1, b=BM25_B):
    """Reference BM25 computed in plain Python."""
    toks = {d: [t.lower() for t in txt.split()] for d, txt in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, ts in toks.items():
        s = 0.0
        for term in sorted(set(terms)):
            tf = ts.count(term)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s:
            out[d] = round(s, 4)
    return out


class TestBM25:
    CORPUS = [
        (1, "spark table join join join"),
        (2, "table scan filter window sort merge"),
        (3, "window window window table"),
        (4, "nothing relevant here at all"),
        (5, "join"),
    ]

    def test_matches_reference_formula(self, spark):
        got = {
            r.doc_id: r.bm25
            for r in bm25_topk(
                _docs(spark, self.CORPUS), ["table", "join", "window"], k=10
            ).collect()
        }
        assert got == _bm25_expected(self.CORPUS, ["table", "join", "window"])

    def test_k_bounds_and_ordering(self, spark):
        out = bm25_topk(
            _docs(spark, self.CORPUS), ["table", "join", "window"], k=2
        ).collect()
        assert len(out) == 2
        assert out[0].bm25 >= out[1].bm25

    def test_query_terms_case_folded(self, spark):
        a = bm25_topk(_docs(spark, self.CORPUS), ["TABLE"], k=5).collect()
        b = bm25_topk(_docs(spark, self.CORPUS), ["table"], k=5).collect()
        assert [(r.doc_id, r.bm25) for r in a] == [(r.doc_id, r.bm25) for r in b]

    def test_no_hits_empty(self, spark):
        assert bm25_topk(_docs(spark, self.CORPUS), ["zzz"], k=5).collect() == []

    def test_duckdb_twin_matches(self, spark):
        got = [
            (r.doc_id, r.bm25)
            for r in bm25_topk(
                _docs(spark, self.CORPUS), ["table", "join", "window"], k=3
            ).collect()
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", self.CORPUS)
        want = con.sql(
            sql_bm25_topk("docs", ["table", "join", "window"], k=3)
        ).fetchall()
        assert got == [tuple(r) for r in want]

    def test_plan_shape(self, spark):
        """Top-k must be TakeOrderedAndProject (bounded, distributed),
        stats/df attaches broadcast, and no CartesianProduct."""
        df = bm25_topk(_docs(spark, self.CORPUS), ["table", "join"], k=3)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


class TestPhraseMatch:
    """Positional phrase search: overlap exactness, boundary rules,
    prefilter safety, multi-word ordering. Twin parity lives in the
    strict oracle sweep (phrase_search)."""

    @staticmethod
    def _run(spark, rows, phrase):
        from pdf_extraction_spark.operators.retrieval import phrase_match

        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {}
        for r in phrase_match(df, phrase).collect():
            out.setdefault(r.doc_id, []).append(r.match_pos)
        return {k: sorted(v) for k, v in out.items()}

    def test_positions_and_overlaps(self, spark):
        got = self._run(
            spark,
            [
                (0, "a b a b a"),          # overlapping "a b a" at 0 and 2
                (1, "x a b a y"),
                (2, "a c a b b"),
                (3, None),
                (4, ""),
            ],
            ["a", "b", "a"],
        )
        assert got == {0: [0, 2], 1: [1]}

    def test_case_and_punctuation_normalization(self, spark):
        # the BM25 tokenizer lowercases and splits on non-alnum
        got = self._run(spark, [(0, "The Table, HASH!")], ["table", "hash"])
        assert got == {0: [1]}

    def test_order_matters_and_no_cross_boundary(self, spark):
        got = self._run(spark, [(0, "hash table"), (1, "table hash")], ["table", "hash"])
        assert got == {1: [0]}

    def test_single_word_and_doc_shorter_than_phrase(self, spark):
        got = self._run(spark, [(0, "x y x"), (1, "x")], ["x"])
        assert got == {0: [0, 2], 1: [0]}
        got = self._run(spark, [(0, "a b")], ["a", "b", "c"])
        assert got == {}

    def test_prefilter_never_drops_matches(self, spark):
        # longest word chosen for the contains prefilter is 'tables';
        # a doc where it appears only inside a larger token still has
        # to be scanned (and then correctly NOT matched)
        got = self._run(
            spark,
            [(0, "many tables here"), (1, "turntables only")],
            ["tables", "here"],
        )
        assert got == {0: [1]}

    def test_bad_phrases_raise(self, spark):
        import pytest

        from pdf_extraction_spark.operators.retrieval import phrase_match

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            phrase_match(df, [])
        with pytest.raises(ValueError):
            phrase_match(df, ["a", ""])


class TestSnippets:
    ROWS = [
        (1, "alpha beta gamma. the spark engine joins tables fast; "
            "spark joins scale. omega end"),
        (2, "no relevant words here at all"),
        (3, None),
        (4, "spark spark spark spark"),
        (5, "x spark y . . . z spark w spark q"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "doc_id long, text string")

    def test_picks_densest_window(self, spark):
        from pdf_extraction_spark.operators.retrieval import snippet_best_window

        by = {
            r.doc_id: r
            for r in snippet_best_window(
                self._df(spark), ["spark", "joins"], window=5
            ).collect()
        }
        assert by[1].snippet == "joins tables fast spark joins"
        assert by[1].n_hits == 3

    def test_no_hit_and_null_docs_emit_nothing(self, spark):
        from pdf_extraction_spark.operators.retrieval import snippet_best_window

        ids = {
            r.doc_id
            for r in snippet_best_window(
                self._df(spark), ["spark", "joins"], window=5
            ).collect()
        }
        assert ids == {1, 4, 5}

    def test_tie_breaks_to_earliest_window(self, spark):
        from pdf_extraction_spark.operators.retrieval import snippet_best_window

        by = {
            r.doc_id: r
            for r in snippet_best_window(
                self._df(spark), ["spark", "joins"], window=5
            ).collect()
        }
        # doc5 has several 2-hit windows; earliest starts at token 0
        assert by[5].start_pos == 0 and by[5].n_hits == 2

    def test_window_never_exceeds_width(self, spark):
        from pdf_extraction_spark.operators.retrieval import snippet_best_window

        rows = snippet_best_window(
            self._df(spark), ["spark", "joins"], window=5
        ).collect()
        assert all(len(r.snippet.split(" ")) <= 5 for r in rows)

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.retrieval import (
            snippet_best_window,
            sql_snippet_best_window,
        )

        got = sorted(
            tuple(r)
            for r in snippet_best_window(
                self._df(spark), ["spark", "joins"], window=5
            ).collect()
        )
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(self.ROWS, columns=["doc_id", "text"]))
        want = sorted(
            tuple(r)
            for r in con.execute(
                sql_snippet_best_window("documents", ["spark", "joins"], window=5)
            ).fetchall()
        )
        assert got == want
