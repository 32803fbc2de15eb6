"""Pins for the remaining operators without dedicated tests:
speakers_of, read_raw_crawl, host_col/salted_agg equivalence at op
level, chunk ids, context assembly edge cases, package_zip."""

import zipfile

from pyspark.sql import functions as F


class TestSpeakersOf:
    def test_sorted_distinct(self, spark):
        from pdf_extraction_spark.operators.parse import speakers_of

        rows = [
            ([("Zoe", "a"), ("Al Bu", "b"), ("Zoe", "c")],),
            ([],),
        ]
        df = spark.createDataFrame(
            rows, "turns array<struct<speaker:string,text:string>>"
        )
        got = [r.speakers for r in speakers_of(df).collect()]
        assert got[0] == ["Al Bu", "Zoe"]
        assert got[1] == []


class TestRawCrawlSource:
    def test_binary_file_to_pages(self, spark, tmp_path):
        from pdf_extraction_spark.operators.extract import extract_parse
        from pdf_extraction_spark.sources.pages import read_raw_crawl
        from pdf_extraction_spark.sources.synth import synth_page_row

        for i in range(4):
            row = synth_page_row(i)
            ext = "pdf" if row["url"].endswith(".pdf") else "html"
            (tmp_path / f"doc{i}.{ext}").write_bytes(row["html"])
        pages = read_raw_crawl(spark, str(tmp_path / "*"))
        assert pages.count() == 4
        docs = extract_parse(pages)
        assert docs.filter(F.length("text") > 0).count() >= 3


class TestSaltedEquivalence:
    def test_salted_equals_naive_on_pages(self, spark):
        from pdf_extraction_spark.operators.skew import naive_host_stats, salted_host_stats
        from pdf_extraction_spark.sources.pages import synth_pages_df

        pages = synth_pages_df(spark, 60).cache()
        naive = {r.host: (r.n_docs, r.total_bytes) for r in naive_host_stats(pages).collect()}
        salted = {r.host: (r.n_docs, r.total_bytes) for r in salted_host_stats(pages).collect()}
        assert naive == salted
        # skew present: host0 dominates
        assert max(naive.items(), key=lambda kv: kv[1][0])[0] == "host0.example"


class TestChunkId:
    def test_stable_and_shaped(self, spark):
        from pdf_extraction_spark.operators.project import chunk_id_col

        df = spark.createDataFrame(
            [("ACME", "2020-01-01", "A Very Long Speaker Name", "some content here")],
            "company string, date string, speaker string, content string",
        )
        cid = df.select(
            chunk_id_col(F.col("company"), F.col("date"), F.col("speaker"), F.col("content")).alias("id")
        ).first().id
        company, date, spk10, h = cid.split("_")
        assert (company, date, spk10) == ("ACME", "2020-01-01", "A Very Lon")
        assert 0 <= int(h) < 10000
        # deterministic
        cid2 = df.select(
            chunk_id_col(F.col("company"), F.col("date"), F.col("speaker"), F.col("content")).alias("id")
        ).first().id
        assert cid == cid2


class TestContextAssemblyEdge:
    def test_empty_topk(self, spark):
        from pdf_extraction_spark.operators.topk import assemble_context

        df = spark.createDataFrame([], "vec_id int, weighted_score double, content string")
        out = assemble_context(df).first()
        assert out.n_contexts == 0 and out.context == ""


class TestPackaging:
    def test_package_zip_contents(self):
        from pdf_extraction_spark.session import package_zip

        path = package_zip()
        names = zipfile.ZipFile(path).namelist()
        assert "pdf_extraction_spark/__init__.py" in names
        assert "pdf_extraction_spark/kernels/extract.py" in names
        assert all(n.endswith(".py") for n in names)


class TestMinhashNearDupDrops:
    def test_equivalent_to_pairs_path_when_caps_dont_bind(self, spark):
        from pyspark.sql import functions as F

        from pdf_extraction_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_near_dup_drops,
        )

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        pairs = minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=32, bands=8).filter(
            F.col("est_jaccard") >= 0.5
        )
        expected = {r["id_b"] for r in pairs.select("id_b").distinct().collect()}
        got = {
            r["doc_id"]
            for r in minhash_near_dup_drops(
                docs, "text", "doc_id", num_hashes=32, bands=8, threshold=0.5
            ).collect()
        }
        # small clusters at sf0.01 → the no-pairs path drops the same set
        assert got == expected

    def test_mega_cluster_does_not_evade(self, spark):
        """A near-identical cluster larger than max_bucket evades the
        pairs path (capped buckets drop it) but NOT the drop-set path:
        identical signatures collapse before banding."""
        from pyspark.sql import functions as F

        from pdf_extraction_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_near_dup_drops,
        )

        base = "the exact same boilerplate template text repeated verbatim across pages"
        rows = [(i, base) for i in range(300)] + [
            (1000, "a completely different document about something else entirely today")
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = minhash_lsh_pairs(df, "text", "doc_id", num_hashes=32, bands=8, max_bucket=200)
        assert pairs.count() == 0  # 300-doc cluster > cap → pairs path blind
        drops = {
            r["doc_id"]
            for r in minhash_near_dup_drops(
                df, "text", "doc_id", num_hashes=32, bands=8, max_bucket=200
            ).collect()
        }
        assert drops == set(range(1, 300))  # min id 0 survives, 1000 untouched


class TestIncrementalDedup:
    def _hist_and_new(self, spark):
        from pdf_extraction_spark.operators.dedup import minhash_signatures

        hist_docs = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
                (1, "completely different historical content about spark plans"),
            ],
            "doc_id long, text string",
        )
        history = minhash_signatures(hist_docs, num_hashes=32)
        new_docs = spark.createDataFrame(
            [
                # exact copy of history doc 0 → drops
                (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
                # two identical new docs → min id survives phase 1, then
                # the rep ALSO exact-matches history → all copies drop
                (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
                # near-dup of history doc 1 (tail tweak) → LSH drop
                (102, "completely different historical content about spark planning"),
                # genuinely new → kept
                (103, "fresh never before seen text with its own words entirely"),
                # two identical NEW-only docs: higher id drops, lower kept
                (104, "brand new duplicated batch content here once more again"),
                (105, "brand new duplicated batch content here once more again"),
            ],
            "doc_id long, text string",
        )
        return hist_docs, history, new_docs

    def test_semantics_and_history_immutability(self, spark):
        from pdf_extraction_spark.operators.dedup import (
            append_history,
            minhash_incremental_drops,
        )

        hist_docs, history, new_docs = self._hist_and_new(spark)
        drops = {
            r.doc_id
            for r in minhash_incremental_drops(
                new_docs, history, num_hashes=32, bands=8, threshold=0.5
            ).collect()
        }
        assert drops == {100, 101, 102, 105}
        # history ids never appear in the drop set by construction
        assert all(d >= 100 for d in drops)
        # store update: history plus the kept new sigs
        from pdf_extraction_spark.operators.dedup import minhash_signatures

        new_sigs = minhash_signatures(new_docs, num_hashes=32)
        updated = append_history(history, new_sigs, spark.createDataFrame(
            [(d,) for d in drops], "doc_id long"
        ))
        assert {r.doc_id for r in updated.select("doc_id").collect()} == {0, 1, 103, 104}

    def test_empty_history_reduces_to_batch_drop_set(self, spark):
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from pdf_extraction_spark.operators.dedup import (
            minhash_incremental_drops,
            minhash_near_dup_drops,
        )

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        empty_hist = spark.createDataFrame(
            [], T.StructType([
                T.StructField("doc_id", T.LongType()),
                T.StructField("sig", T.ArrayType(T.LongType())),
            ])
        )
        inc = {
            r.doc_id
            for r in minhash_incremental_drops(
                docs, empty_hist, num_hashes=32, bands=8, threshold=0.5
            ).collect()
        }
        batch = {
            r.doc_id
            for r in minhash_near_dup_drops(
                docs, "text", "doc_id", num_hashes=32, bands=8, threshold=0.5
            ).collect()
        }
        assert inc == batch


class TestSourceOverlap:
    def _run(self, spark, rows):
        from pdf_extraction_spark.operators.dedup import source_overlap

        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        return {
            (r.src_a, r.src_b): r for r in source_overlap(df).collect()
        }

    def test_shared_shingles_counted_once_per_pair(self, spark):
        rows = [
            (1, "a", "the quick brown fox jumps high"),
            (2, "b", "the quick brown fox runs away"),   # shares 2 shingles with a
            (3, "b", "the quick brown fox runs away"),   # dup doc: no double count
            (4, "c", "entirely different words here now"),
        ]
        got = self._run(spark, rows)
        # shared distinct 3-shingles between a and b:
        # 'the quick brown', 'quick brown fox'
        assert set(got) == {("a", "b")}
        assert got[("a", "b")].n_shared == 2

    def test_containment_per_mille_directions(self, spark):
        # a is a subset slice of b: a's shingles all appear in b
        rows = [
            (1, "a", "alpha beta gamma delta"),          # 2 shingles
            (2, "b", "alpha beta gamma delta epsilon zeta eta"),  # 5 shingles
        ]
        got = self._run(spark, rows)
        r = got[("a", "b")]
        assert r.n_shared == 2
        assert r.a_pm == 1000          # a fully contained in b
        assert r.b_pm == 2 * 1000 // 5

    def test_mirror_sources_read_full_containment_both_ways(self, spark):
        text = "one two three four five six seven"
        got = self._run(spark, [(1, "x", text), (2, "y", text)])
        r = got[("x", "y")]
        assert r.a_pm == 1000 and r.b_pm == 1000

    def test_null_sources_dropped_and_no_self_pairs(self, spark):
        rows = [
            (1, None, "shared phrase of words here"),
            (2, "a", "shared phrase of words here"),
            (3, "a", "shared phrase of words here"),
        ]
        got = self._run(spark, rows)
        assert got == {}  # NULL dropped; a never pairs with itself

    def test_matches_duckdb_self_join_twin(self, spark):
        import duckdb

        from pdf_extraction_spark.operators.dedup import sql_source_overlap
        from pdf_extraction_spark.operators.curation import WORD_SPLIT_RE

        rows = [
            (i, f"s{i % 3}", f"w{i % 4} w{(i + 1) % 4} w{(i + 2) % 4} w{(i + 3) % 4}")
            for i in range(24)
        ] + [(100, None, "w0 w1 w2 w3")]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        from pdf_extraction_spark.operators.dedup import source_overlap

        got = sorted(map(tuple, source_overlap(df).collect()))
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?,?,?)", rows)
        frag = (
            "SELECT source, unnest(gs) AS shingle FROM ("
            "SELECT source, CASE WHEN len(w) >= 3 THEN "
            "list_distinct([array_to_string(w[i:i+2], ' ') "
            "FOR i IN range(1, len(w) - 1)]) "
            "WHEN len(w) > 0 THEN [array_to_string(w, ' ')] "
            "ELSE [] END AS gs FROM ("
            f"SELECT source, list_filter(string_split_regex(lower(text), "
            f"'{WORD_SPLIT_RE}'), x -> x <> '') AS w FROM documents))"
        )
        want = sorted(map(tuple, con.execute(sql_source_overlap(frag)).fetchall()))
        assert got == want


class TestReadabilityPanel:
    ROWS = [
        (
            1,
            "The cat sat on the mat. It was a sunny day. Everything "
            "considered, the administration reconsidered.",
        ),
        (2, "Go. Run! Now?"),
        (3, ""),
        (4, None),
    ]

    def _out(self, spark):
        from pdf_extraction_spark.operators.textanalysis import (
            with_readability_panel,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        return {r.doc_id: r for r in with_readability_panel(df).collect()}

    def test_ari_matches_float_replay(self, spark):
        import re

        by = self._out(spark)
        text = self.ROWS[0][1]
        ws = [w for w in re.split(r"[ \t\n\x0B\f\r]+", text.lower()) if w]
        chars = sum(len(w) for w in ws)
        sents = len(re.findall(r"[.!?]+", text))
        ari = 4.71 * chars / len(ws) + 0.5 * len(ws) / sents - 21.43
        assert abs(by[1].ari - ari) < 1e-2
        fog = 0.4 * (len(ws) / sents + 100 * by[1].rd_complex / len(ws))
        assert abs(by[1].gunning_fog - fog) < 1e-2

    def test_complex_words_are_three_plus_runs(self, spark):
        by = self._out(spark)
        # considered, administration, reconsidered, everything → 4
        assert by[1].rd_complex == 4
        assert by[2].rd_complex == 0

    def test_degenerate_docs_score_null_and_clamp(self, spark):
        by = self._out(spark)
        assert by[3].ari is None and by[4].gunning_fog is None
        # short doc clamps at 0 rather than going negative
        assert by[2].ari == 0.0 and by[2].coleman_liau == 0.0

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.textanalysis import (
            sql_readability_panel,
            with_readability_panel,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = sorted(
            tuple(r)
            for r in with_readability_panel(df)
            .select(
                "doc_id", "rd_words", "rd_sents", "rd_chars", "rd_complex",
                "ari", "coleman_liau", "gunning_fog",
            )
            .collect()
        )
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(self.ROWS, columns=["doc_id", "text"]))
        want = sorted(
            tuple(r)
            for r in con.execute(sql_readability_panel("documents")).fetchall()
        )
        assert got == want


class TestYuleK:
    ROWS = [
        (1, "the the the the"),
        (2, "all distinct words here now"),
        (3, "a"),
        (4, ""),
        (5, None),
    ]

    def test_known_values(self, spark):
        from pdf_extraction_spark.operators.textanalysis import with_yule_k

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        by = {r.doc_id: r for r in with_yule_k(df).collect()}
        assert by[1].yule_k == 7500.0  # 10⁴·(16−4)/16: max repetition
        assert by[2].yule_k == 0.0  # all hapax
        assert by[3].yule_k is None  # N < 2
        assert 4 not in by and 5 not in by  # tokenless docs emit nothing

    def test_length_invariance_on_doubling(self, spark):
        """Doubling a text doubles every tf and N: K is exactly
        invariant when sum_tf_sq and N both scale (10⁴·(4s−2n)/4n² =
        ... not exactly — K(2x) = 10⁴·(4s−2n)/(4n²); assert the
        documented near-invariance within 1/n."""
        from pdf_extraction_spark.operators.textanalysis import with_yule_k

        t = "spam spam eggs ham eggs spam words more words again"
        df = spark.createDataFrame(
            [(1, t), (2, (t + " ") * 2)], "doc_id long, text string"
        )
        by = {r.doc_id: r for r in with_yule_k(df).collect()}
        assert abs(by[1].yule_k - by[2].yule_k) < 10**4 / by[1].n_tokens

    def test_twin_parity(self, spark):
        import duckdb
        import pandas as pd

        from pdf_extraction_spark.operators.textanalysis import (
            sql_yule_k,
            with_yule_k,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = sorted(tuple(r) for r in with_yule_k(df).collect())
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(self.ROWS, columns=["doc_id", "text"]))
        want = sorted(tuple(r) for r in con.execute(sql_yule_k("documents")).fetchall())
        assert got == want
