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


# ---------------------------------------------------------------------------
# source_divergence
# ---------------------------------------------------------------------------


class TestSourceDivergence:
    def _run(self, spark, rows):
        from pdf_extraction_spark.operators.textanalysis import source_divergence

        df = spark.createDataFrame(rows, "source string, text string")
        return {r.source: r for r in source_divergence(df).collect()}

    def test_known_value_vs_pure_python(self, spark):
        rows = [
            ("web", "the cat sat on the mat"),
            ("web", "the dog ate the cat food"),
            ("code", "def foo return foo x x"),
        ]
        got = self._run(spark, rows)
        # pure-python KL over the same whitespace-ish tokenizer output
        from collections import Counter

        sw, n_s = {}, Counter()
        for s, t in rows:
            c = sw.setdefault(s, Counter())
            for w in t.lower().split():
                c[w] += 1
                n_s[s] += 1
        cw = Counter()
        for c in sw.values():
            cw.update(c)
        N = sum(cw.values())
        import math

        for s, c in sw.items():
            kl = sum(
                (k / n_s[s]) * math.log((k * N) / (cw[w] * n_s[s]))
                for w, k in c.items()
            )
            assert got[s].kl_to_corpus == pytest.approx(kl, abs=1e-5), s
            assert got[s].n_words == n_s[s]
            assert got[s].n_types == len(c)

    def test_single_source_has_zero_divergence(self, spark):
        got = self._run(spark, [("only", "a b c a b a")])
        assert got["only"].kl_to_corpus == 0.0

    def test_identical_sources_have_zero_divergence(self, spark):
        rows = [("a", "x y z"), ("b", "x y z")]
        got = self._run(spark, rows)
        assert got["a"].kl_to_corpus == 0.0
        assert got["b"].kl_to_corpus == 0.0

    def test_outlier_source_scores_highest(self, spark):
        rows = [
            ("en1", "the quick brown fox jumps over the lazy dog"),
            ("en2", "the slow brown dog walks under the quick fox"),
            ("code", "lambda lambda def yield async await self self"),
        ]
        got = self._run(spark, rows)
        assert got["code"].kl_to_corpus > got["en1"].kl_to_corpus
        assert got["code"].kl_to_corpus > got["en2"].kl_to_corpus

    def test_null_source_groups_and_empty_emits_no_row(self, spark):
        rows = [(None, "words here"), ("empty", ""), ("nulls", None), ("x", "a")]
        got = self._run(spark, rows)
        assert None in got and got[None].n_words == 2
        assert "empty" not in got and "nulls" not in got

    def test_partition_invariance(self, spark):
        rows = [(f"s{i % 3}", f"w{i % 7} w{i % 5} common") for i in range(60)]
        df = spark.createDataFrame(rows, "source string, text string")
        from pdf_extraction_spark.operators.textanalysis import source_divergence

        a = sorted(map(tuple, source_divergence(df).collect()))
        b = sorted(map(tuple, source_divergence(df.repartition(13)).collect()))
        c = sorted(map(tuple, source_divergence(df.coalesce(1)).collect()))
        assert a == b == c


# ---------------------------------------------------------------------------
# zipf_slope
# ---------------------------------------------------------------------------


class TestZipfSlope:
    def _run(self, spark, rows, k=100):
        from pdf_extraction_spark.operators.textanalysis import zipf_slope

        df = spark.createDataFrame(rows, "source string, text string")
        return {r.source: r for r in zipf_slope(df, k=k).collect()}

    def test_matches_pure_python_regression(self, spark):
        import math

        # frequencies 8,4,2,1 on ranks 1..4
        text = " ".join(["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2 + ["dd"])
        got = self._run(spark, [("s", text)])
        xs = [round(math.log(r) * 1e5) for r in (1, 2, 3, 4)]
        ys = [round(math.log(c) * 1e5) for c in (8, 4, 2, 1)]
        n = 4
        num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
        den = n * sum(x * x for x in xs) - sum(xs) ** 2
        assert got["s"].n_ranks == 4
        assert got["s"].slope == pytest.approx(num / den, abs=2e-6)

    def test_perfect_zipf_reads_minus_one(self, spark):
        # c(r) = 1200//r for r=1..12 is near-exact Zipf: slope ≈ -1
        words = []
        for r in range(1, 13):
            words += [f"w{r:02d}"] * (1200 // r)
        got = self._run(spark, [("s", " ".join(words))])
        assert got["s"].slope == pytest.approx(-1.0, abs=0.05)

    def test_template_flood_is_steeper_than_text(self, spark):
        natural = " ".join(
            f"w{i % 40}" for i in range(400)
        )  # flat-ish repertoire
        template = " ".join(["header"] * 500 + ["footer"] * 3 + ["nav"])
        got = self._run(spark, [("nat", natural), ("tpl", template)])
        assert got["tpl"].slope < got["nat"].slope  # steeper = more negative

    def test_rank_ties_break_by_word_and_k_caps(self, spark):
        got = self._run(spark, [("s", "b b a a c")], k=2)
        # counts: a=2, b=2, c=1 → top-2 = a then b (tie by word asc)
        assert got["s"].n_ranks == 2

    def test_single_type_source_has_null_slope(self, spark):
        got = self._run(spark, [("s", "same same same")])
        assert got["s"].n_ranks == 1 and got["s"].slope is None

    def test_partition_invariance_and_null_source(self, spark):
        from pdf_extraction_spark.operators.textanalysis import zipf_slope

        rows = [(f"s{i % 2}", f"w{i % 9} w{i % 5} w0") for i in range(40)]
        rows.append((None, "dropped words"))
        df = spark.createDataFrame(rows, "source string, text string")
        a = sorted(map(tuple, zipf_slope(df, k=10).collect()))
        b = sorted(map(tuple, zipf_slope(df.repartition(11), k=10).collect()))
        assert a == b
        assert all(r[0] is not None for r in a)


class TestHostWilsonRank:
    def _run(self, spark, docs):
        from pdf_extraction_spark.operators.hostcap import host_wilson_rank

        return {
            r.host: r
            for r in host_wilson_rank(
                spark.createDataFrame(docs, HQ_SCHEMA)
            ).collect()
        }

    def test_matches_float_closed_form(self, spark):
        import math

        docs = [(i, GOOD if i % 5 else BAD, f"h{i % 3}") for i in range(60)]
        out = self._run(spark, docs)
        for r in out.values():
            n, s = r.n_docs, r.n_pass
            lb = (s + 2 - 2 * math.sqrt(s * (n - s) / n + 1)) / (n + 4)
            # exact fixed-point vs float closed form: within 2 ppm
            assert abs(r.wilson_lb_ppm - lb * 1e6) < 2, r

    def test_shrinks_low_support(self, spark):
        # 1/1 host vs 49/50 host: raw rate says the tiny host wins,
        # Wilson says the supported host wins decisively
        docs = [(0, GOOD, "tiny")]
        docs += [(10 + i, BAD if i == 0 else GOOD, "big") for i in range(50)]
        out = self._run(spark, docs)
        assert out["tiny"].n_pass * out["big"].n_docs > out[
            "big"
        ].n_pass * out["tiny"].n_docs  # raw rate: tiny ahead
        assert out["big"].wilson_lb_ppm > out["tiny"].wilson_lb_ppm

    def test_zero_pass_is_zero_not_negative(self, spark):
        docs = [(i, BAD, "h") for i in range(5)]
        out = self._run(spark, docs)
        assert out["h"].wilson_lb_ppm == 0

    def test_null_host_dropped(self, spark):
        docs = [(0, GOOD, None), (1, GOOD, "h")]
        out = self._run(spark, docs)
        assert set(out) == {"h"}

    def test_strict_twin_parity(self, spark, tmp_path):
        import duckdb

        from pdf_extraction_spark.operators.hostcap import (
            host_wilson_rank,
            sql_host_wilson_rank,
        )

        docs = [
            (i, GOOD if (i * 7) % 11 > 3 else BAD, f"s{i % 7}")
            for i in range(200)
        ]
        df = spark.createDataFrame(docs, HQ_SCHEMA)
        pq = str(tmp_path / "docs.parquet")
        df.write.mode("overwrite").parquet(pq)
        got = sorted(
            tuple(r)
            for r in host_wilson_rank(spark.read.parquet(pq)).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'"
        )
        want = sorted(tuple(r) for r in con.execute(
            sql_host_wilson_rank()
        ).fetchall())
        assert got == want
