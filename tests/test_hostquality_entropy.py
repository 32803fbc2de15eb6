"""Semantic pins for the round-4 quality-signal additions:

- with_unigram_entropy: RedPajama-v2's rps_doc_unigram_entropy via the
  fixed-point int64 device — known-value, boundary, partition-
  invariance, and an exhaustive cross-engine ln-table sweep (the ONLY
  float op in the operator is round(ln(c)·1e9); if the engines ever
  disagree on a single count value the strict twin breaks, so the
  table itself is pinned over every count the tests can reach).
- host_quality_gate: two-level domain induction — flagged hosts drop
  their good docs too, low-support hosts get the benefit of the doubt,
  NULL hosts group and join as one key.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.hostcap import host_quality_gate
from pdf_extraction_spark.operators.textanalysis import with_unigram_entropy


def _entropy_rows(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: r for r in with_unigram_entropy(df).collect()}


class TestUnigramEntropy:
    def test_known_value(self, spark):
        rows = _entropy_rows(spark, [(1, "a a b")])
        assert rows[1].n_words == 3
        expected = math.log(3) - (2 * math.log(2)) / 3
        assert rows[1].entropy == pytest.approx(expected, abs=1e-5)

    def test_repetitive_scores_zero_distinct_scores_log_n(self, spark):
        rows = _entropy_rows(
            spark,
            [(1, "spam spam spam spam"), (2, "alpha beta gamma delta")],
        )
        assert rows[1].entropy == 0.0
        assert rows[2].entropy == pytest.approx(math.log(4), abs=1e-5)
        # the signal orders as the quality intuition demands
        assert rows[1].entropy < rows[2].entropy

    def test_tokenizer_is_shared_curation_splitter(self, spark):
        # case-folds and splits on Java \s+ — "The the" is ONE word twice
        rows = _entropy_rows(spark, [(1, "The the"), (2, "The cat")])
        assert rows[1].entropy == 0.0
        assert rows[2].entropy == pytest.approx(math.log(2), abs=1e-5)

    def test_zero_token_docs_emit_no_row(self, spark):
        rows = _entropy_rows(
            spark, [(1, None), (2, ""), (3, " \t\n "), (4, "word")]
        )
        assert set(rows) == {4}

    def test_partition_invariance(self, spark):
        docs = [(i, f"w{i % 7} x y{i % 3} common common") for i in range(200)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        one = sorted(
            (r.doc_id, r.n_words, r.entropy)
            for r in with_unigram_entropy(df.repartition(1)).collect()
        )
        many = sorted(
            (r.doc_id, r.n_words, r.entropy)
            for r in with_unigram_entropy(df.repartition(13)).collect()
        )
        assert one == many

    def test_iln_table_cross_engine(self, spark):
        """round(ln(c)·1e9) must agree Spark↔DuckDB for every count the
        operator can see. Sweep 1..50_000 (far past any per-doc word
        count in the corpora) + a log-spaced tail to the int64 comfort
        bound."""
        counts = list(range(1, 50_001)) + [10**k for k in range(5, 9)]
        sdf = spark.createDataFrame([(c,) for c in counts], "c long")
        spark_tbl = {
            r.c: r.i
            for r in sdf.select(
                "c",
                F.round(F.log(F.col("c").cast("double")) * F.lit(1e9))
                .cast("long")
                .alias("i"),
            ).collect()
        }
        duck = duckdb.connect()
        duck_tbl = dict(
            duck.execute(
                "SELECT c, CAST(round(ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT) "
                "FROM (SELECT unnest(?) AS c)",
                [counts],
            ).fetchall()
        )
        assert spark_tbl == duck_tbl


HQ_SCHEMA = "doc_id long, text string, source string"
GOOD = "this text has plenty of reasonable words " * 5  # 40 words
BAD = "too short"


class TestHostQualityGate:
    def test_flagged_host_drops_good_docs_too(self, spark):
        docs = [(i, BAD if i < 2 else GOOD, "farm") for i in range(4)]
        docs += [(10 + i, GOOD, "clean") for i in range(4)]
        out = {
            r.doc_id: r
            for r in host_quality_gate(
                spark.createDataFrame(docs, HQ_SCHEMA)
            ).collect()
        }
        # farm: 2 bad of 4 → 4·2 > 4 → flagged; its GOOD docs die too
        assert out[0].host_flagged and not out[0].keep
        assert not out[3].doc_bad and not out[3].keep
        # clean host survives untouched
        assert all(out[10 + i].keep for i in range(4))

    def test_low_support_host_gets_benefit_of_doubt(self, spark):
        docs = [(0, BAD, "tiny"), (1, BAD, "tiny")]
        out = host_quality_gate(
            spark.createDataFrame(docs, HQ_SCHEMA)
        ).collect()
        assert all(r.doc_bad for r in out)
        assert all(not r.host_flagged and r.keep for r in out)

    def test_null_host_is_one_key(self, spark):
        docs = [(i, BAD, None) for i in range(3)] + [(9, GOOD, None)]
        out = {
            r.doc_id: r
            for r in host_quality_gate(
                spark.createDataFrame(docs, HQ_SCHEMA)
            ).collect()
        }
        assert len(out) == 4  # the NULL-host join found every row
        assert all(r.host_docs == 4 for r in out.values())
        assert all(r.host_flagged for r in out.values())

    def test_avg_word_length_clause(self, spark):
        # 35 single-char words: n_words ≥ 30 but sum_chars(35) < 4·35
        frag = " ".join(["x"] * 35)
        docs = [(0, frag, "h"), (1, GOOD, "h"), (2, GOOD, "h")]
        out = {
            r.doc_id: r
            for r in host_quality_gate(
                spark.createDataFrame(docs, HQ_SCHEMA)
            ).collect()
        }
        assert out[0].doc_bad and not out[1].doc_bad
