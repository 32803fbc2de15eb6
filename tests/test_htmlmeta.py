"""Native HTML head-metadata extraction: field coverage, both quote
styles, multiline-title cleanup, attribute-order rule, absent-field
NULLs, and hostile markup. Cross-engine twin parity lives in the strict
oracle sweep (html_meta) and the adversarial sweep."""

from pdf_extraction_spark.operators.htmlmeta import with_html_meta

FIELDS = [
    "page_title", "meta_description", "canonical_url",
    "og_title", "html_lang", "html_charset",
]


def _meta(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, html string")
    return {r.doc_id: r for r in with_html_meta(df).collect()}


class TestHtmlMeta:
    def test_full_double_quoted_page(self, spark):
        html = (
            '<html lang="en-US"><head>\n'
            "<title>A Page</title>\n"
            '<meta name="description" content="the description here">\n'
            '<meta property="og:title" content="OG name">\n'
            '<link rel="canonical" href="https://ex.com/a">\n'
            '<meta charset="utf-8"></head><body>x</body></html>'
        )
        r = _meta(spark, [(0, html)])[0]
        assert r.page_title == "A Page"
        assert r.meta_description == "the description here"
        assert r.canonical_url == "https://ex.com/a"
        assert r.og_title == "OG name"
        assert r.html_lang == "en-US"
        assert r.html_charset == "utf-8"

    def test_single_quoted_and_unquoted(self, spark):
        html = (
            "<html lang='fr'><head><meta charset=iso-8859-1>"
            "<meta name='description' content='desc sq'>"
            "<link rel='canonical' href='https://ex.com/sq'></head>"
        )
        r = _meta(spark, [(0, html)])[0]
        assert r.meta_description == "desc sq"
        assert r.canonical_url == "https://ex.com/sq"
        assert r.html_lang == "fr"
        assert r.html_charset == "iso-8859-1"

    def test_multiline_title_collapses_whitespace(self, spark):
        r = _meta(spark, [(0, "<title>\n  Two\n\t lines \n</title>")])[0]
        assert r.page_title == "Two lines"

    def test_absent_fields_are_null(self, spark):
        r = _meta(spark, [(0, "<html><body>plain</body></html>")])[0]
        assert all(getattr(r, f) is None for f in FIELDS)

    def test_empty_and_null_html(self, spark):
        got = _meta(spark, [(0, ""), (1, None)])
        for i in (0, 1):
            assert all(getattr(got[i], f) is None for f in FIELDS)

    def test_first_match_wins(self, spark):
        html = "<title>First</title><title>Second</title>"
        assert _meta(spark, [(0, html)])[0].page_title == "First"

    def test_reversed_attr_order_is_skipped(self, spark):
        # documented rule: content= before name= does not match
        html = '<meta content="x" name="description">'
        assert _meta(spark, [(0, html)])[0].meta_description is None

    def test_hostile_markup_degrades_not_crashes(self, spark):
        rows = [
            (0, "<title>unclosed"),
            (1, "<<<>>>&&&"),
            (2, '<meta name="description" content="'),
            (3, "<html lang=éé>"),  # non-ascii lang value
        ]
        got = _meta(spark, rows)
        assert got[0].page_title is None
        assert got[1].meta_description is None
        assert got[2].meta_description is None
        assert got[3].html_lang is None  # class is [A-Za-z0-9_-]


class TestRobotsFlags:
    def _flags(self, spark, rows):
        from pdf_extraction_spark.operators.htmlmeta import with_robots_flags

        df = spark.createDataFrame(rows, "doc_id long, html string")
        return {r.doc_id: r for r in with_robots_flags(df).collect()}

    def test_directive_parsing(self, spark):
        got = self._flags(spark, [
            (0, '<meta name="robots" content="noindex, nofollow">'),
            (1, "<meta name='robots' content='NOFOLLOW'>"),
            (2, '<meta name="robots" content="none">'),
            (3, '<meta name="robots" content="index, follow">'),
            (4, "<html><head><title>no tag</title></head></html>"),
        ])
        assert (got[0].noindex, got[0].nofollow) == (True, True)
        assert (got[1].noindex, got[1].nofollow) == (False, True)  # case fold
        assert (got[2].noindex, got[2].nofollow) == (True, True)  # none alias
        assert (got[3].noindex, got[3].indexable) == (False, True)
        assert got[4].robots_content is None and got[4].indexable

    def test_token_boundaries(self, spark):
        # substrings must NOT match: noindexing / nofollowup
        got = self._flags(spark, [
            (0, '<meta name="robots" content="noindexing nofollowup">'),
            (1, '<meta name="robots" content="noarchive,noindex">'),
            (2, '<meta name="robots" content="noindex">'),  # single, \z edge
        ])
        assert (got[0].noindex, got[0].nofollow) == (False, False)
        assert got[1].noindex is True
        assert got[2].noindex is True and got[2].nofollow is False

    def test_null_and_empty(self, spark):
        got = self._flags(spark, [(0, None), (1, "")])
        for i in (0, 1):
            assert got[i].robots_content is None
            assert not got[i].noindex and got[i].indexable

    def test_twin_parity_on_crafted_rows(self, spark):
        import duckdb

        from pdf_extraction_spark.operators.htmlmeta import (
            sql_robots_flags,
            with_robots_flags,
        )

        rows = [
            (0, '<meta name="robots" content="noindex, nofollow">'),
            (1, "<meta name='robots' content='NONE'>"),
            (2, '<meta name="robots" content="noindexing">'),
            (3, '<meta name="robots" content="nofollow,noindex">'),
            (4, "<html></html>"),
            (5, None),
            (6, '<meta name="robots" content="noindex\n">'),
        ]
        df = spark.createDataFrame(rows, "doc_id long, html string")
        out = with_robots_flags(df).select(
            "doc_id", "robots_content", "noindex", "nofollow", "indexable"
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE pages (doc_id BIGINT, html VARCHAR)")
        con.executemany("INSERT INTO pages VALUES (?, ?)", rows)
        cols = ["doc_id", "robots_content", "noindex", "nofollow", "indexable"]
        got = sorted(map(tuple, out.toPandas()[cols].itertuples(index=False)))
        want = sorted(map(tuple, con.execute(sql_robots_flags("pages")).fetchall()))
        assert got == want
