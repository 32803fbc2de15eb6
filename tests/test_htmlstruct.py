"""Structural HTML extraction (operators/htmlstruct.py): heading
outline, JSON-LD @type inventory, first-table cell grid — Spark
behavior pinned on adversarial fragments, plus DuckDB twin parity on
the same rows (the strict oracle covers the registry fixture; these
cover the corners the fixture can't reach)."""

import duckdb
import pandas as pd
import pytest

from pdf_extraction_spark.operators.htmlstruct import (
    explode_headings,
    html_table_cells,
    jsonld_types,
    sql_explode_headings,
    sql_html_table_cells,
    sql_jsonld_types,
)

DOCS = [
    # inline markup, ws collapse, nested ld-json entity, 2 tables
    (0, '<html><h1>Big <em>News</em></h1><h2 class="s">Sec\t \none</h2>'
        '<script type="application/ld+json">'
        '{"@type":"NewsArticle","author":{"@type":"Person"}}</script>'
        '<table class="d"><tr><th>Name</th><th>Qty</th></tr>'
        '<tr><td>alpha</td><td>3</td></tr>'
        '<tr><td><a href="/x">beta</a></td><td></td></tr></table>'
        '<table><tr><td>ignored</td></tr></table><h3>End</h3></html>'),
    # uppercase tags, single-quoted type attr, newline in heading
    (1, "<SCRIPT TYPE='application/ld+json'>{\"@type\": \"Product\"}"
        "</SCRIPT><H4>Level\nfour</H4>"
        "<TABLE><TR><TD>a</TD><TD>b</TD></TR></TABLE>"),
    # empty-after-strip heading dropped; mismatched close kept (level 2)
    (2, '<h6>deep</h6><h1><span></span></h1><h2>mismatch</h3><h2>ok</h2>'),
    # array @type extracts nothing; ragged row with mid-row <th>
    (3, '<script type="application/ld+json">{"@type": ["A","B"]}</script>'
        '<script type="application/ld+json">{"@type":"FAQPage",'
        '"m":[{"@type":"Question"},{"@type" : "Answer"}]}</script>'
        '<table><tr><td colspan="2">wide</td></tr>'
        '<tr><td>x</td><th>y</th><td>z</td></tr></table>'),
    (4, ''),
    (5, None),
    # script without type attr is NOT json-ld; plain <script> ignored
    (6, '<script>{"@type":"Nope"}</script><h5 id="a">five</h5>'),
    # unclosed table -> no grid; unclosed heading -> dropped
    (7, '<table><tr><td>lost</td></tr><h1>dangling'),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, html string")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "html"]))
    return c


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestHeadings:
    def test_outline(self, docs_df):
        rows = _rows(explode_headings(docs_df))
        assert (0, 0, 1, "Big News") in rows
        assert (0, 1, 2, "Sec one") in rows  # ws collapsed
        assert (0, 2, 3, "End") in rows
        assert (1, 0, 4, "Level four") in rows  # newline collapsed
        # empty-after-strip h1 dropped; pos contiguous over kept
        assert (2, 0, 6, "deep") in rows
        assert (2, 1, 2, "mismatch") in rows  # closes at first </hN>
        assert (2, 2, 2, "ok") in rows
        assert (6, 0, 5, "five") in rows
        assert not [r for r in rows if r[0] in (4, 5, 7)]

    def test_twin(self, docs_df, con):
        assert _rows(explode_headings(docs_df)) == sorted(
            tuple(r) for r in con.execute(sql_explode_headings("docs")).fetchall()
        )


class TestJsonld:
    def test_types(self, docs_df):
        rows = _rows(jsonld_types(docs_df))
        assert [r for r in rows if r[0] == 0] == [
            (0, 0, "NewsArticle"), (0, 1, "Person")]
        assert (1, 0, "Product") in rows
        # array form skipped entirely; second block's types start at 0
        assert [r for r in rows if r[0] == 3] == [
            (3, 0, "FAQPage"), (3, 1, "Question"), (3, 2, "Answer")]
        assert not [r for r in rows if r[0] in (4, 5, 6)]

    def test_twin(self, docs_df, con):
        assert _rows(jsonld_types(docs_df)) == sorted(
            tuple(r) for r in con.execute(sql_jsonld_types("docs")).fetchall()
        )


class TestTableCells:
    def test_grid(self, docs_df):
        rows = _rows(html_table_cells(docs_df))
        d0 = [r for r in rows if r[0] == 0]
        assert (0, 0, 0, True, "Name") in d0 and (0, 0, 1, True, "Qty") in d0
        assert (0, 1, 1, False, "3") in d0
        assert (0, 2, 0, False, "beta") in d0  # markup stripped
        assert (0, 2, 1, False, None) in d0  # empty cell keeps position
        assert len(d0) == 6  # second table ignored
        # ragged row + mid-row header cell
        assert [r for r in rows if r[0] == 3] == [
            (3, 0, 0, False, "wide"),
            (3, 1, 0, False, "x"), (3, 1, 1, True, "y"), (3, 1, 2, False, "z")]
        # unclosed table extracts nothing
        assert not [r for r in rows if r[0] in (4, 5, 7)]

    def test_twin(self, docs_df, con):
        assert _rows(html_table_cells(docs_df)) == sorted(
            tuple(r) for r in con.execute(sql_html_table_cells("docs")).fetchall()
        )


class TestContentSpans:
    """Span-offset map of the block classifier (kernels.htmlio
    .extract_block_spans + operators.extract.content_spans)."""

    HTML = ('<html><head><title>T</title><script>var x="<p>no</p>";</script>'
            '</head><body><nav><a href="/">Home</a> <a href="/x">X</a></nav>'
            '<p>First &amp; real   paragraph with several words here.</p>'
            '<div>Short</div>'
            '<p>Substantial block <b>with</b> inline <a href="y">link text'
            '</a> and more words follows here.</p>'
            '<footer>c 2020</footer></body></html>')

    def test_span_invariant_rescans_to_same_words(self):
        from pdf_extraction_spark.kernels.htmlio import (
            _scan_blocks, extract_block_spans, extract_blocks)

        spans = extract_block_spans(self.HTML)
        blocks = extract_blocks(self.HTML)
        assert len(spans) == len(blocks) > 3
        for (s, e, nw, ld, keep), (text, nw2, ld2, keep2) in zip(spans, blocks):
            # rescanning the sliced fragment reproduces the words
            rewords = [w for b in _scan_blocks(self.HTML[s:e]) for w in b.words]
            assert rewords == (text.split(" ") if text else [])
            assert (nw, ld, keep) == (nw2, ld2, keep2)

    def test_content_text_rebuilds_from_spans(self):
        from pdf_extraction_spark.kernels.htmlio import (
            _scan_blocks, extract_block_spans, extract_main_content)

        joined = "\n".join(
            " ".join(w for b in _scan_blocks(self.HTML[s:e]) for w in b.words)
            for (s, e, _, _, keep) in extract_block_spans(self.HTML)
            if keep
        )
        assert joined == extract_main_content(self.HTML)

    def test_operator_matches_kernel_and_skips_pdf(self, spark):
        from pdf_extraction_spark.kernels.htmlio import (
            decode_html_payload, extract_block_spans)
        from pdf_extraction_spark.operators.extract import content_spans
        from pdf_extraction_spark.sources.synth import synth_page_row

        rows = [synth_page_row(i) for i in range(12)]
        pages = spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        got = {}
        for r in content_spans(pages).collect():
            got.setdefault(r["url"], []).append(
                (r["block_no"], r["span_start"], r["span_end"],
                 r["n_words"], r["link_density"], r["is_content"]))
        for r in rows:
            if r["html"][:5] == b"%PDF-":
                assert r["url"] not in got  # pdf branch emits no spans
                continue
            exp = [
                (no, s, e, nw, ld, keep)
                for no, (s, e, nw, ld, keep) in enumerate(
                    extract_block_spans(decode_html_payload(r["html"])))
            ]
            assert sorted(got.get(r["url"], [])) == exp
