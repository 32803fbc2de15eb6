"""Property/fuzz tests (seeded, deterministic): the kernels must never
raise and must satisfy their basic invariants on arbitrary input —
Common-Crawl payloads are adversarial by nature."""

from hypothesis import given, settings, strategies as st

from pdf_extraction_spark.kernels import (
    categorize,
    clean_dialogue_text,
    clean_text,
    extract_all_metrics,
    extract_main_content,
    extract_pdf_text,
    parse_transcript,
    quality_score,
    speaker_role,
)
from pdf_extraction_spark.kernels.extract import extract_document_text
from pdf_extraction_spark.kernels.htmlio import _parser_blocks, _scan_blocks
from pdf_extraction_spark.kernels.textstats import (
    detect_language,
    fingerprint,
    minhash_signature,
    simhash,
    token_count,
)

text_strategy = st.text(max_size=400)
html_strategy = st.text(
    alphabet=st.sampled_from(list("<>/abp div spannavfooter\"'= &;#\n\tqz!-")), max_size=300
)


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_text_kernels_total(t):
    assert isinstance(clean_text(t), str)
    assert isinstance(clean_dialogue_text(t), str)
    speakers, dialogue = parse_transcript(t)
    assert speakers == sorted(speakers)
    for d in dialogue:
        assert d["text"] == d["text"].strip()
    assert 1.0 <= quality_score(t) <= 10.0
    assert isinstance(speaker_role(t), str)
    cats = categorize(t)
    assert cats and isinstance(cats, list)
    m = extract_all_metrics(t)
    assert set(m) == {"revenue", "growth_rates", "ebitda", "margins", "quarter_info"}
    assert token_count(t) >= 0
    assert isinstance(detect_language(t), str)
    assert 0 <= fingerprint(t) < 2**64
    assert 0 <= simhash(t) < 2**64
    assert len(minhash_signature(t, 16)) == 16


@settings(max_examples=150, deadline=None)
@given(html_strategy)
def test_html_scanner_total(h):
    # totality on arbitrary tag soup: never raises, both implementations.
    # (Exact block parity is asserted on realistic HTML in
    # test_extraction.py::test_scanner_parser_parity — for garbage like a
    # dangling '<' at EOF, html.parser splits data chunks differently,
    # which is out of the parity contract.)
    _scan_blocks(h)
    _parser_blocks(h)
    assert isinstance(extract_main_content(h), str)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=600))
def test_warc_parser_total(data):
    from pdf_extraction_spark.sources.warc import parse_warc_bytes

    # arbitrary bytes, including fake record markers — never raises
    rows = parse_warc_bytes(data)
    rows2 = parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n" + data)
    assert isinstance(rows, list) and isinstance(rows2, list)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=400))
def test_binary_payloads_total(payload):
    # arbitrary bytes through both dispatch branches — never raises
    assert isinstance(extract_document_text("https://x.example/a.html", payload), str)
    assert isinstance(extract_document_text("https://x.example/a.pdf", payload), str)
    assert isinstance(extract_pdf_text(b"%PDF-" + payload), str)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_pdf_string_decoders_total(raw):
    """Literal/hex string decoders on arbitrary bytes: never raise
    (regression class: \\8 and \\9 escapes used to ValueError)."""
    from pdf_extraction_spark.kernels.pdfio import _decode_hex, _decode_literal

    assert isinstance(_decode_literal(raw), str)
    assert isinstance(_decode_hex(raw), str)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=400))
def test_pdf_content_stream_total(data):
    """Arbitrary bytes wrapped as a content stream (incl. malformed
    BT/ET blocks, TJ arrays, hex strings) — never raises."""
    from pdf_extraction_spark.kernels.pdfio import _stream_text

    assert isinstance(_stream_text(data), str)
    assert isinstance(_stream_text(b"BT " + data + b" ET"), str)
    assert isinstance(_stream_text(b"BT [" + data + b"] TJ ET"), str)


# ---------------------------------------------------------------------------
# session-11 fuzz: RAKE and Kleinberg bursts vs their pure-Python
# replays under random inputs (one Spark job per CASE SET, not per
# example — hypothesis drives the replay; Spark parity runs on a
# deterministic sample of the generated corpus)
# ---------------------------------------------------------------------------

_rake_text = st.text(
    alphabet="abcdefg THE the and of. ,;x0123!\n\t",
    max_size=160,
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_rake_text, min_size=1, max_size=4))
def test_rake_replay_is_total_and_bounded(texts):
    """The pure-Python RAKE replay (the contract the Spark op is tested
    against) never crashes, never emits empty phrases, and scores are
    non-negative — over adversarial text soup."""
    from test_terms import _replay_rake

    docs = list(enumerate(texts))
    out = _replay_rake(docs, 3)
    for doc_id, phrase, n_words, score in out:
        assert phrase and n_words >= 1 and score >= 0
        assert len(phrase.split(" ")) == n_words


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**7),
        min_size=5,
        max_size=40,
    )
)
def test_burst_viterbi_replay_invariants(ts_seconds):
    """Viterbi invariants on random event times: burst count bounded by
    gaps, min cost finite, and a uniform-gap sequence never bursts."""
    from test_forensics import TestKleinbergBursts

    us = sorted(t * 10**6 for t in ts_seconds)
    r = TestKleinbergBursts._replay(us)
    if r is not None:
        n, t, bursts, cost, state = r
        assert 0 <= bursts <= n
        assert state in (0, 1)
    uniform = [i * 60 * 10**6 for i in range(10)]
    assert TestKleinbergBursts._replay(uniform)[2] == 0


def test_rake_spark_parity_on_fuzz_corpus(spark):
    """One Spark run over a hypothesis-shaped corpus (deterministic
    sample of the soup alphabet) vs the replay — the cross-engine leg
    of the fuzz above."""
    import random

    from test_terms import _replay_rake

    from pdf_extraction_spark.operators.terms import rake_phrases

    rng = random.Random(11)
    alphabet = "abcdefg THE the and of. ,;x0123!\n\t"
    docs = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 160))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.phrase, r.n_words, r.score_micro)
        for r in rake_phrases(df, k=3).collect()
    )
    assert got == _replay_rake(docs, 3)


def test_bursts_spark_parity_on_fuzz_events(spark):
    """One Spark run over random event streams vs the replay."""
    import random
    from datetime import datetime, timedelta, timezone

    from test_forensics import TestKleinbergBursts

    from pdf_extraction_spark.operators.forensics import kleinberg_bursts

    rng = random.Random(13)
    base = datetime(2024, 1, 1)
    rows = []
    for u in range(12):
        t = 0
        for _ in range(rng.randrange(2, 30)):
            rows.append((f"u{u}", base + timedelta(seconds=t)))
            t += rng.choice([0, 1, 1, 5, 60, 600, 86400])
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = sorted(
        tuple(r) for r in kleinberg_bursts(df, min_events=5).collect()
    )
    byu = {}
    for u, ts in rows:
        byu.setdefault(u, []).append(
            int(ts.replace(tzinfo=timezone.utc).timestamp() * 1e6)
        )
    exp = []
    for u, ts in byu.items():
        r = TestKleinbergBursts._replay(sorted(ts))
        if r is not None:
            exp.append((u,) + r)
    assert got == sorted(exp)
