"""HTML outlink extraction / host link graph + host-scoped boilerplate
strip: resolution rules, host normalization, anchor cleanup, host-scope
semantics vs corpus-wide line dedup, and DuckDB twin parity on crafted
rows. The sf-corpus twin parity lives in the strict oracle sweep
(html_outlinks, host_boilerplate)."""

import duckdb
import pytest

from pdf_extraction_spark.operators.htmlgraph import (
    extract_outlinks,
    host_link_graph,
    sql_host_link_graph,
)

PAGES = [
    # url, html
    (
        0,
        "https://WWW.Alpha.example:443/p/0",
        '<html><body><a href="https://beta.example/x">Cross  Link</a>'
        "<a href='/about'>About</a>"
        '<A HREF="//cdn.beta.example/a.js">asset</A>'
        '<a href="mailto:a@b.c">mail</a><a href="#top">top</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="rel/path.html">relative</a>'
        '<a href="">empty</a>'
        "<a name='x'>no href</a></body></html>",
    ),
    (
        1,
        "https://beta.example/p/1",
        '<a href="HTTP://ALPHA.EXAMPLE:8080/y">back\n  link</a>'
        '<a href="https://beta.example/self"></a>',
    ),
    (2, None, '<a href="https://gamma.example/z">from nowhere</a>'),
    (3, "https://delta.example/p/3", None),
    (4, "not a url at all", '<a href="/x">rooted</a>'),
]


def _links(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, url string, html string")
    return extract_outlinks(df)


class TestOutlinks:
    def test_resolution_rules(self, spark):
        rows = _links(spark).collect()
        by = {}
        for r in rows:
            by.setdefault(r.doc_id, []).append(r)
        d0 = {r.href: r for r in by[0]}
        # absolute cross-host
        assert d0["https://beta.example/x"].dst_host == "beta.example"
        # root-relative + path-relative resolve to the (normalized) page host
        assert d0["/about"].dst_host == "alpha.example"
        assert d0["rel/path.html"].dst_host == "alpha.example"
        # protocol-relative
        assert d0["//cdn.beta.example/a.js"].dst_host == "cdn.beta.example"
        # dropped: mailto / javascript / fragment / empty / no-href
        assert set(d0) == {
            "https://beta.example/x", "/about",
            "//cdn.beta.example/a.js", "rel/path.html",
        }

    def test_host_normalization_and_anchor_cleanup(self, spark):
        rows = {r.href: r for r in _links(spark).collect() if r.doc_id == 1}
        r = rows["HTTP://ALPHA.EXAMPLE:8080/y"]
        assert r.src_host == "beta.example"
        assert r.dst_host == "alpha.example"  # case + :port stripped
        assert r.anchor_text == "back link"  # newline run collapsed
        assert rows["https://beta.example/self"].anchor_text is None

    def test_null_url_pages(self, spark):
        rows = [r for r in _links(spark).collect() if r.doc_id in (2, 3, 4)]
        by = {r.doc_id: r for r in rows}
        # NULL url: absolute links still captured, src unknown
        assert by[2].src_host is None and by[2].dst_host == "gamma.example"
        # NULL html: no links; unparseable url: relative link unresolvable
        assert 3 not in by
        assert 4 not in by

    def test_graph_aggregation(self, spark):
        g = {
            (r.src_host, r.dst_host): r
            for r in host_link_graph(_links(spark)).collect()
        }
        e = g[("alpha.example", "alpha.example")]  # the two self-links
        assert e.n_links == 2 and e.n_docs == 1
        assert e.sample_anchor == "About"  # min of {About, relative}

    def test_twin_parity_on_crafted_rows(self, spark):
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE pages (doc_id BIGINT, url VARCHAR, html VARCHAR)"
        )
        con.executemany("INSERT INTO pages VALUES (?, ?, ?)", PAGES)
        got = sorted(
            map(
                tuple,
                host_link_graph(_links(spark))
                .toPandas()[
                    ["src_host", "dst_host", "n_links", "n_docs", "sample_anchor"]
                ]
                .itertuples(index=False),
            ),
            key=str,
        )
        want = sorted(
            map(tuple, con.execute(
                sql_host_link_graph("pages")
                + " ORDER BY 1, 2"
            ).fetchall()),
            key=str,
        )
        assert got == want


BOILER_DOCS = [
    # host a: banner on 3 docs → template; 'once per host' line on 1
    (0, "real content zero\nSite Banner\nonce per host", "a"),
    (1, "real content one\nSite Banner", "a"),
    (2, "real content two\n  site banner  ", "a"),  # normalized match
    # host b: same banner text but only 2 docs → NOT template on b
    (3, "other content three\nSite Banner\nonce per host", "b"),
    (4, "other content four\nSite Banner", "b"),
    (5, None, "b"),
    (6, "", "a"),
    (7, "solo doc on its own host\nSite Banner", None),  # NULL host bucket
]


class TestHostBoilerplate:
    def _run(self, spark):
        from pdf_extraction_spark.operators.curation import (
            host_boilerplate_strip,
        )

        df = spark.createDataFrame(
            BOILER_DOCS, "doc_id long, text string, source string"
        )
        return {
            r.doc_id: r
            for r in host_boilerplate_strip(df, min_docs=3).collect()
        }

    def test_host_scoped_semantics(self, spark):
        rows = self._run(spark)
        # host a: banner stripped everywhere (3 distinct docs, normalized)
        assert rows[0].clean_text == "real content zero\nonce per host"
        assert rows[1].clean_text == "real content one"
        assert rows[2].clean_text == "real content two"
        # host b: the SAME banner survives — only 2 docs of host b carry it
        assert rows[3].clean_text == (
            "other content three\nSite Banner\nonce per host"
        )
        assert rows[4].n_lines_removed == 0
        # total on NULL/empty text; NULL host is its own bucket
        assert rows[5].clean_text == "" and rows[5].n_lines_kept == 0
        assert rows[6].clean_text == ""
        assert rows[7].n_lines_removed == 0

    def test_twin_parity_on_crafted_rows(self, spark):
        from pdf_extraction_spark.operators.curation import (
            host_boilerplate_strip,
            sql_host_boilerplate,
        )

        df = spark.createDataFrame(
            BOILER_DOCS, "doc_id long, text string, source string"
        )
        out = host_boilerplate_strip(df, min_docs=3)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)"
        )
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)", BOILER_DOCS)
        cols = ["doc_id", "clean_text", "n_lines_kept", "n_lines_removed"]
        got = sorted(map(tuple, out.toPandas()[cols].itertuples(index=False)))
        want = sorted(
            map(tuple, con.execute(sql_host_boilerplate(3)).fetchall())
        )
        assert got == want


class TestAnchorTerms:
    def test_term_profile_and_referrer_count(self, spark):
        from pdf_extraction_spark.operators.htmlgraph import anchor_terms

        rows = anchor_terms(_links(spark), min_count=1).collect()
        by = {(r.dst_host, r.term): r for r in rows}
        # 'link' reaches beta.example from doc 0 ("Cross  Link") — and
        # alpha.example from doc 1 ("back\n  link")
        assert by[("beta.example", "link")].n_anchors == 1
        assert by[("alpha.example", "link")].n_src_hosts == 1
        # empty/NULL anchors contribute no terms
        assert ("beta.example", "") not in by

    def test_min_count_prunes(self, spark):
        from pdf_extraction_spark.operators.htmlgraph import anchor_terms

        rows = anchor_terms(_links(spark), min_count=3).collect()
        assert all(r.n_anchors >= 3 for r in rows)

    def test_twin_parity_on_crafted_rows(self, spark):
        from pdf_extraction_spark.operators.htmlgraph import (
            anchor_terms,
            sql_anchor_terms,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE pages (doc_id BIGINT, url VARCHAR, html VARCHAR)"
        )
        con.executemany("INSERT INTO pages VALUES (?, ?, ?)", PAGES)
        cols = ["dst_host", "term", "n_anchors", "n_src_hosts"]
        got = sorted(
            map(
                tuple,
                anchor_terms(_links(spark), min_count=1)
                .toPandas()[cols]
                .itertuples(index=False),
            ),
            key=str,
        )
        want = sorted(
            map(tuple, con.execute(sql_anchor_terms("pages", 1)).fetchall()),
            key=str,
        )
        assert got == want
