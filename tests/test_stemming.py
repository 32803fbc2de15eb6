"""Porter stemmer (kernels/stemmer.py + operators/stemming.py): the
paper's full-pipeline vectors, algorithm invariants, and the
vocabulary-trick operator shapes."""

import pytest

from pdf_extraction_spark.kernels.stemmer import porter_stem

# full-pipeline expectations (paper step examples, cascaded through all
# steps where later steps fire — e.g. electrical → electr via step 4)
VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
    "differentli": "differ",
}


class TestKernel:
    def test_paper_vectors(self):
        bad = {w: (porter_stem(w), e) for w, e in VECTORS.items() if porter_stem(w) != e}
        assert not bad

    def test_short_words_unchanged(self):
        for w in ["", "a", "is", "by"]:
            assert porter_stem(w) == w

    def test_idempotent_on_common_stems(self):
        """Stemming a stem is a fixed point for typical outputs (not a
        theorem of the algorithm in general, but it must hold on our
        vector set — a drift here means a rule fires twice)."""
        for w in VECTORS.values():
            assert porter_stem(porter_stem(w)) == porter_stem(w)


class TestOperators:
    def test_stem_vocabulary_matches_kernel(self, spark):
        from pdf_extraction_spark.operators.stemming import stem_vocabulary

        df = spark.createDataFrame(
            [(1, "the ponies agreed; hopping happily"), (2, None)],
            "doc_id long, text string",
        )
        got = {r.word: r.stem for r in stem_vocabulary(df).collect()}
        assert got == {
            w: porter_stem(w)
            for w in ["the", "ponies", "agreed", "hopping", "happily"]
        }

    def test_stemmed_term_counts_collapse_variants(self, spark):
        from pdf_extraction_spark.operators.stemming import stemmed_term_counts

        df = spark.createDataFrame(
            [(1, "connect connected connecting connection connections")],
            "doc_id long, text string",
        )
        rows = {r.stem: r for r in stemmed_term_counts(df).collect()}
        assert rows["connect"].n_tokens == 5
        assert rows["connect"].n_words == 5

    def test_single_python_stage_over_vocabulary(self, spark):
        """The Arrow UDF must run over the DISTINCT vocabulary (after
        the combinable groupBy), never the token stream: the plan has
        exactly one ArrowEvalPython above an aggregate."""
        from pdf_extraction_spark.operators.stemming import stemmed_term_counts

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        p = (
            stemmed_term_counts(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert p.count("ArrowEvalPython") == 1


class TestCompressionGate:
    def test_matches_pure_zlib_and_gates_repetition(self, spark):
        import zlib

        from pdf_extraction_spark.operators.compressgate import compression_ratio

        rows = [
            (1, "organic prose with varied vocabulary and no repeats at all"),
            (2, "spam spam spam " * 200),
            (3, ""),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        by = {
            r.doc_id: r
            for r in compression_ratio(df, max_ratio_ppm=200_000).collect()
        }
        for i, t in rows:
            if t is not None:
                assert by[i].n_compressed == (
                    len(zlib.compress(t.encode("utf-8"), 6))
                )
        # flood compresses far below organic prose
        assert by[2].ratio_ppm < 100_000 < by[1].ratio_ppm
        assert by[2].keep is False and by[1].keep is True
        # degenerate docs pass the gate (NULL ratio)
        assert by[3].keep is True and by[4].keep is True

    def test_single_python_stage(self, spark):
        from pdf_extraction_spark.operators.compressgate import compression_ratio

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        p = compression_ratio(df)._jdf.queryExecution().executedPlan().toString()
        assert p.count("ArrowEvalPython") == 1
