"""Round-4 continuation operators: Luhn credit-card scrub, soft-404
detection, per-group discrete quantiles, publication-date extraction.

Each operator's cross-engine twin is exercised by oracle_check /
test_oracle_subset through the __spark_entry__ registration; the tests
here pin the SEMANTICS on hand-built edge cases (the twin only proves
both engines agree — these prove they agree on the right answer).
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Luhn credit-card scrub
# ---------------------------------------------------------------------------

CC_ROWS = [
    (1, "pay 4111 1111 1111 1111 now or 4111111111111112"),
    (2, "amex 340000000000009 and order 12345678901234567890"),
    (3, None),
    (4, "cards 4111-1111-1111-1111 twice 4111-1111-1111-1111 ok"),
    (5, "phone +1 (555) 123-4567 year 2024 zip 94110"),
    (6, "diners 30569309025904 visa16 4012888888881881"),
    (7, "mix 6011000990139424, then text 5555555555554444."),
    (8, "run 4111111111111111111111111111111111"),
]

CC_EXPECT = {
    # valid spaced Visa masks, near-miss (+1 check digit) survives
    1: ("pay <CC> now or 4111111111111112", 1),
    # 15-digit Amex masks; 20-digit order id is no candidate fit
    2: ("amex <CC> and order 12345678901234567890", 1),
    # NULL text → '' (the pass-through convention of scrub_pii)
    3: ("", 0),
    # the same card twice: one candidate value, both occurrences masked,
    # but counted per match (2)
    4: ("cards <CC> twice <CC> ok", 2),
    # phone numbers and years never reach 13 joined digits
    5: ("phone +1 (555) 123-4567 year 2024 zip 94110", 0),
    # documented false negative: 'visa16 ' glues leading digits into the
    # candidate chain, widened candidate fails Luhn, real card shadowed
    6: ("diners <CC> visa16 4012888888881881", 1),
    # punctuation breaks the chain cleanly on both sides
    7: ("mix <CC>, then text <CC>.", 2),
    # 34-digit run: 19-digit prefix candidate fails Luhn; remaining 15
    # digits re-match and fail too → untouched
    8: ("run 4111111111111111111111111111111111", 0),
}


def test_cc_scrub_semantics(spark):
    from pdf_extraction_spark.operators.curation import scrub_credit_cards

    df = spark.createDataFrame(CC_ROWS, "doc_id long, text string")
    got = {r["doc_id"]: (r["cc_masked"], r["n_cc"]) for r in scrub_credit_cards(df).collect()}
    assert got == CC_EXPECT


def test_cc_scrub_duckdb_parity_on_edges(spark):
    """The oracle run covers corpus text; this pins parity on the
    adversarial hand-built rows above (incl. the shadowing case)."""
    from pdf_extraction_spark.operators.curation import (
        scrub_credit_cards,
        sql_scrub_credit_cards,
    )

    df = spark.createDataFrame(CC_ROWS, "doc_id long, text string")
    got = {r["doc_id"]: (r["cc_masked"], r["n_cc"]) for r in scrub_credit_cards(df).collect()}
    con = duckdb.connect()
    con.register("docs_src", pd.DataFrame(CC_ROWS, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_src")
    want = {r[0]: (r[1], r[2]) for r in con.execute(sql_scrub_credit_cards()).fetchall()}
    assert got == want


def test_cc_scrub_is_native(spark):
    from pdf_extraction_spark.operators.curation import scrub_credit_cards

    df = spark.createDataFrame(CC_ROWS, "doc_id long, text string")
    plan = scrub_credit_cards(df)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Soft-404 detection
# ---------------------------------------------------------------------------

def test_soft404_branches(spark):
    from pdf_extraction_spark.operators.webshape import soft404_flags

    rows = [
        (0, "HTTP 404 Error. The page you requested was not found."),
        (1, "word " * 200 + "an error occurred while rendering comments"),
        (2, "Sorry, this page has been removed by the author."),
        (3, "A perfectly normal article about gardening in spring."),
        (4, None),
        (5, "ACCESS DENIED"),  # case-insensitive phrase
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in soft404_flags(df).collect()}
    assert got[0]["is_soft404"] and got[0]["has_error_phrase"]
    # phrase present but the page is long → error mention, not a shell
    assert got[1]["has_error_phrase"] and not got[1]["is_soft404"]
    assert got[2]["is_soft404"]
    assert not got[3]["has_error_phrase"] and not got[3]["is_soft404"]
    assert got[4]["n_words"] == 0 and not got[4]["is_soft404"]
    assert got[5]["is_soft404"]


# ---------------------------------------------------------------------------
# Per-group discrete quantiles
# ---------------------------------------------------------------------------

def test_group_quantiles_known_values(spark):
    from pdf_extraction_spark.operators.agg import group_discrete_quantiles

    # group a: values 1..8 → n=8; ceil(8/4)=2 → 2, ceil(8/2)=4 → 4,
    # ceil(24/4)=6 → 6. group b: 10,10,10,40 → cum(10)=3 covers ranks
    # 1,2,3 → q25=10, q50=10, q75=10 (discrete, no interpolation).
    rows = [("a", v) for v in range(1, 9)] + [("b", 10), ("b", 10), ("b", 10), ("b", 40)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r["g"], r["q"]): r["cutoff"]
        for r in group_discrete_quantiles(df, "g", "v").collect()
    }
    assert got == {
        ("a", 0.25): 2, ("a", 0.5): 4, ("a", 0.75): 6,
        ("b", 0.25): 10, ("b", 0.5): 10, ("b", 0.75): 10,
    }


def test_group_quantiles_null_group_and_values(spark):
    from pdf_extraction_spark.operators.agg import group_discrete_quantiles

    rows = [(None, 1), (None, 3), ("a", None), ("a", 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r["g"], r["q"]): r["cutoff"]
        for r in group_discrete_quantiles(df, "g", "v", qs=((1, 2),)).collect()
    }
    # NULL group quantiles among itself; NULL values excluded
    assert got == {(None, 0.5): 1, ("a", 0.5): 5}


def test_group_quantiles_median_is_discrete(spark):
    from pdf_extraction_spark.operators.agg import group_discrete_quantiles

    # even n: discrete median = value at rank ceil(n/2) = 2nd of 4 —
    # NOT the interpolated midpoint
    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("x", 100), ("x", 200)], "g string, v long"
    )
    [(q, cut)] = [
        (r["q"], r["cutoff"])
        for r in group_discrete_quantiles(df, "g", "v", qs=((1, 2),)).collect()
    ]
    assert (q, cut) == (0.5, 2)


# ---------------------------------------------------------------------------
# Publication-date extraction
# ---------------------------------------------------------------------------

def _pub(spark, html, url="https://h.example/p/1"):
    from pdf_extraction_spark.operators.htmlmeta import with_pub_date

    df = spark.createDataFrame([(1, html, url)], "doc_id long, html string, url string")
    return with_pub_date(df).select("pub_date_src", "pub_date_raw", "pub_date").first()


def test_pubdate_meta_beats_jsonld(spark):
    r = _pub(
        spark,
        '<meta property="article:published_time" content="2023-05-17T08:30:00Z">'
        '<script type="application/ld+json">{"datePublished": "1999-01-01"}</script>',
    )
    assert r["pub_date_src"] == "meta"
    assert str(r["pub_date"]) == "2023-05-17"


def test_pubdate_time_and_jsonld(spark):
    r = _pub(spark, "<time datetime='2021-02-03'>Feb 3</time>")
    assert (r["pub_date_src"], str(r["pub_date"])) == ("time", "2021-02-03")
    r = _pub(spark, '{"datePublished": "2020-12-31T23:59:59+01:00"}')
    assert (r["pub_date_src"], str(r["pub_date"])) == ("jsonld", "2020-12-31")


def test_pubdate_url_fallback_and_invalid(spark):
    r = _pub(spark, "<html>no dates</html>", "https://h.example/2019/07/04/post")
    assert (r["pub_date_src"], r["pub_date_raw"], str(r["pub_date"])) == (
        "url", "2019-07-04", "2019-07-04",
    )
    # invalid month: raw survives, parsed date NULLs (try_cast)
    r = _pub(spark, '<meta property="article:published_time" content="2021-13-99">')
    assert r["pub_date_src"] == "meta"
    assert r["pub_date_raw"] == "2021-13-99"
    assert r["pub_date"] is None
    # no source at all
    r = _pub(spark, "<html>plain</html>")
    assert r["pub_date_src"] is None and r["pub_date"] is None


def test_pubdate_no_url_column(spark):
    from pdf_extraction_spark.operators.htmlmeta import with_pub_date

    df = spark.createDataFrame([(1, "<html>x</html>")], "doc_id long, html string")
    r = with_pub_date(df, url_col=None).first()
    assert r["pub_date_src"] is None and r["pub_date"] is None


# ---------------------------------------------------------------------------
# Head-link profile (meta refresh / feeds / AMP) + hreflang alternates
# ---------------------------------------------------------------------------

def _profile(spark, html):
    from pdf_extraction_spark.operators.htmlmeta import with_link_profile

    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return with_link_profile(df).first()


def test_meta_refresh_redirect(spark):
    r = _profile(spark, '<meta http-equiv="refresh" content="0; url=https://m.example/x">')
    assert (r["refresh_delay"], r["refresh_url"], r["is_meta_redirect"]) == (
        0, "https://m.example/x", True,
    )
    # delay-only refresh reloads, it does not redirect
    r = _profile(spark, "<meta http-equiv='refresh' content='5'>")
    assert (r["refresh_delay"], r["refresh_url"], r["is_meta_redirect"]) == (5, None, False)
    # quoted url form + uppercase URL key
    r = _profile(spark, '<meta http-equiv="refresh" content="3;URL=\'/new\'">')
    assert (r["refresh_delay"], r["refresh_url"]) == (3, "/new")


def test_feed_discovery_attr_order_free(spark):
    r = _profile(
        spark,
        '<link rel="alternate" type="application/rss+xml" href="/rss">'
        '<link type="application/atom+xml" rel="alternate" href="/atom">'
        '<link rel="alternate" type="application/rss+xml">'  # no href → dropped
        '<link rel="stylesheet" href="/style.css">',
    )
    assert r["feed_urls"] == ["/rss", "/atom"]
    assert r["n_feeds"] == 2


def test_amp_url_and_clean_page(spark):
    r = _profile(spark, '<link rel="amphtml" href="https://amp.example/p/1">')
    assert r["amp_url"] == "https://amp.example/p/1"
    r = _profile(spark, "<html><head><title>x</title></head></html>")
    assert r["n_feeds"] == 0 and r["feed_urls"] == [] and r["amp_url"] is None
    assert not r["is_meta_redirect"] and r["refresh_delay"] is None


def test_hreflang_alternates(spark):
    from pdf_extraction_spark.operators.htmlmeta import hreflang_alternates

    html = (
        '<link rel="alternate" hreflang="en" href="https://en.example/p">'
        "<link rel='alternate' hreflang='de-AT' href='https://de.example/p'>"
        '<link rel="alternate" hreflang="fr">'  # no href → dropped
        '<link hreflang="es" href="/es">'  # no rel=alternate → dropped
    )
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    got = {(r["hreflang"], r["href"]) for r in hreflang_alternates(df).collect()}
    assert got == {
        ("en", "https://en.example/p"),
        ("de-AT", "https://de.example/p"),
    }


# ---------------------------------------------------------------------------
# Sentence segmentation
# ---------------------------------------------------------------------------

def test_sentences_basic(spark):
    from pdf_extraction_spark.operators.textanalysis import explode_sentences

    df = spark.createDataFrame(
        [(1, 'Hello there. How are you? "Fine!" she said. End')],
        "doc_id long, text string",
    )
    got = [(r["sent_no"], r["sentence"], r["n_words"]) for r in
           explode_sentences(df).orderBy("sent_no").collect()]
    assert got == [
        (0, "Hello there.", 2),
        (1, "How are you?", 3),
        (2, '"Fine!"', 1),
        (3, "she said.", 2),
        (4, "End", 1),  # trailing fragment kept
    ]


def test_sentences_edges(spark):
    from pdf_extraction_spark.operators.textanalysis import explode_sentences

    rows = [
        (1, None),                       # NULL → no rows
        (2, ""),                         # empty → no rows
        (3, "no terminator at all"),     # one fragment
        (4, "Multi.. dots... edge!  Two  spaces."),
        (5, "ends clean."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in explode_sentences(df).collect():
        got.setdefault(r["doc_id"], []).append((r["sent_no"], r["sentence"]))
    assert 1 not in got and 2 not in got
    assert got[3] == [(0, "no terminator at all")]
    assert [s for _, s in sorted(got[4])] == ["Multi..", "dots...", "edge!", "Two  spaces."]
    assert got[5] == [(0, "ends clean.")]


# ---------------------------------------------------------------------------
# Meta keywords / stuffing
# ---------------------------------------------------------------------------

def test_meta_keywords(spark):
    from pdf_extraction_spark.operators.htmlmeta import with_meta_keywords

    rows = [
        (0, '<meta name="keywords" content="spark, data, web">'),
        (1, "<meta name='keywords' content='Cheap, cheap, CHEAP, deals, deals'>"),
        (2, '<meta name="keywords" content=" , , ">'),
        (3, "<html><head></head></html>"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in with_meta_keywords(df).collect()}
    assert got[0]["keywords"] == ["spark", "data", "web"]
    assert got[0]["n_dup_keywords"] == 0 and not got[0]["is_keyword_stuffed"]
    assert got[1]["n_keywords"] == 5 and got[1]["n_dup_keywords"] == 3
    assert got[1]["is_keyword_stuffed"]
    assert got[2]["n_keywords"] == 0 and not got[2]["is_keyword_stuffed"]
    assert got[3]["keywords"] == [] and got[4]["keywords"] == []


# ---------------------------------------------------------------------------
# Paragraph language mixing
# ---------------------------------------------------------------------------

def test_lang_mix(spark):
    from pdf_extraction_spark.operators.textanalysis import with_language_mix

    rows = [
        # two english paragraphs -> pure page
        (0, "the and is of to in that it was for\n\nthe cat is on the mat and it sat"),
        # es / en / es -> dominant es, mixed
        (1, "el la de que y en un ser se no\n\nthe and is of to that was it in for\n\nel la de que y en los del"),
        # de / fr / und three-way tie -> lexicographic min 'de'
        (2, "der die und in den von zu das mit sich\n\nle la de et les des en un du une\n\nshort x"),
        (3, ""),
        (4, None),
        # no stopword hits anywhere -> dominant 'und', zero real langs
        (5, "word soup nothing matching anywhere\n\n\n\nxyz abc qrs"),
        # per-paragraph tie (en==es hits) -> dict order: en wins
        (6, "the la of de and y is que"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in with_language_mix(df).collect()}
    assert got[0]["dominant_lang"] == "en" and got[0]["mix_frac"] == 0.0
    assert not got[0]["is_mixed"] and got[0]["n_langs"] == 1
    assert got[1]["dominant_lang"] == "es" and got[1]["n_langs"] == 2
    assert got[1]["is_mixed"] and abs(got[1]["mix_frac"] - 1 / 3) < 1e-12
    assert got[2]["dominant_lang"] == "de" and got[2]["n_paras"] == 3
    for d in (3, 4):
        assert got[d]["n_paras"] == 0 and got[d]["dominant_lang"] is None
        assert got[d]["mix_frac"] is None and not got[d]["is_mixed"]
    assert got[5]["dominant_lang"] == "und" and got[5]["n_langs"] == 0
    assert not got[5]["is_mixed"]
    assert got[6]["dominant_lang"] == "en" and got[6]["n_paras"] == 1


# ---------------------------------------------------------------------------
# Lexical diversity
# ---------------------------------------------------------------------------

def test_lexical_diversity(spark):
    from pdf_extraction_spark.operators.textanalysis import with_lexical_diversity

    rows = [
        (0, "the cat the dog the bird"),   # 6 tokens, 4 types, 3 hapax
        (1, "all unique words here now"),  # everything hapax
        (2, "same same same"),             # one type, zero hapax
        (3, ""), (4, None), (5, " \t\n "),
        (6, "Mixed CASE mixed case Words words!"),  # case-folded types
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in with_lexical_diversity(df).collect()}
    assert set(got) == {0, 1, 2, 6}  # zero-token docs emit no row
    assert (got[0]["n_tokens"], got[0]["n_types"], got[0]["n_hapax"]) == (6, 4, 3)
    assert got[0]["ttr"] == 4 / 6 and got[0]["hapax_frac"] == 0.75
    assert got[1]["ttr"] == 1.0 and got[1]["hapax_frac"] == 1.0
    assert got[2]["n_types"] == 1 and got[2]["hapax_frac"] == 0.0
    assert got[6]["n_types"] == 4  # lower() folds case before counting


# ---------------------------------------------------------------------------
# OpenGraph / Twitter card
# ---------------------------------------------------------------------------

def test_og_card(spark):
    from pdf_extraction_spark.operators.htmlmeta import with_og_card

    rows = [
        (0, '<meta property="og:type" content="article">'
            '<meta property="og:image" content="https://i.example/x.jpg">'
            '<meta property="og:description" content="A  multi\tspace blurb">'
            '<meta name="twitter:card" content="summary_large_image">'),
        (1, "<meta property='og:type' content='product'>"),
        (2, '<meta name="twitter:card" content="player">'),  # no og:*
        (3, "<html><head><title>bare</title></head></html>"),
        (4, None),
        # reversed attribute order extracts empty (documented rule)
        (5, '<meta content="article" property="og:type">'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in with_og_card(df).collect()}
    assert got[0]["og_type"] == "article" and got[0]["has_og_card"]
    assert got[0]["og_description"] == "A multi space blurb"  # ws collapsed
    assert got[0]["twitter_card"] == "summary_large_image"
    assert got[1]["og_type"] == "product" and got[1]["has_og_card"]
    assert got[2]["twitter_card"] == "player" and not got[2]["has_og_card"]
    for d in (3, 4, 5):
        assert not got[d]["has_og_card"] and got[d]["og_type"] is None


# ---------------------------------------------------------------------------
# Image alt-text pairs
# ---------------------------------------------------------------------------

def test_img_alt_pairs(spark):
    from pdf_extraction_spark.operators.htmlstruct import img_alt_pairs

    rows = [
        (0, '<img src="https://a.example/1.jpg" alt="A red fox jumping">'
            "<img alt='icon' src='/i.png'><img src=\"/no-alt.gif\">"),
        (1, '<IMG SRC="/up.JPG" ALT="Two  words">'
            '<img alt="orphan no src"><img src="">'),
        (2, '<img\n  src="data:image/png;base64,AA"\n  alt="inline data uri">'),
        (3, ""), (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = sorted(tuple(r) for r in img_alt_pairs(df).collect())
    assert got == [
        (0, 0, "https://a.example/1.jpg", "A red fox jumping", 4, False, True),
        (0, 1, "/i.png", "icon", 1, False, False),
        (0, 2, "/no-alt.gif", None, 0, False, False),
        (1, 0, "/up.JPG", "Two words", 2, False, False),
        (2, 0, "data:image/png;base64,AA", "inline data uri", 3, True, True),
    ]


# ---------------------------------------------------------------------------
# Page shape / login walls
# ---------------------------------------------------------------------------

def test_page_shape(spark):
    from pdf_extraction_spark.operators.webshape import page_shape

    rows = [
        (0, "<html><head><script>var x=1;</script><style>.a{}</style></head>"
            "<body><p>Real visible text.</p></body></html>"),
        (1, '<form action="/x"><input type="text"><input type="password"></form>'),
        (2, "<div><div><span></span></div></div>"),
        (3, "plain text, no markup"),
        (4, ""), (5, None),
        (6, "<INPUT TYPE=password>"),  # unquoted attr, uppercase
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in page_shape(df).collect()}
    assert got[0]["n_scripts"] == 2  # script AND style blocks
    assert got[0]["visible_len"] == len("Real visible text.")
    assert not got[0]["is_markup_shell"]
    assert got[1]["is_login_wall"] and got[1]["n_inputs"] == 2
    assert got[1]["is_markup_shell"]  # zero visible text
    assert got[2]["is_markup_shell"] and not got[2]["is_login_wall"]
    assert got[3]["visible_ratio"] == 1.0 and got[3]["n_tags"] == 0
    for d in (4, 5):
        assert got[d]["html_len"] == 0 and got[d]["visible_ratio"] is None
        assert not got[d]["is_markup_shell"]
    assert got[6]["has_password"]


# ---------------------------------------------------------------------------
# Punctuation normalization
# ---------------------------------------------------------------------------

def test_normalize_punct(spark):
    from pdf_extraction_spark.operators.textanalysis import with_normalized_punct

    rows = [
        (0, "“Smart” quotes ‘here’ — and–dashes…"),
        (1, "plain ascii - no change."),
        (2, "zero​width‌ and nbsp here﻿"),
        (3, ""), (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in with_normalized_punct(df).collect()}
    assert got[0]["norm_text"] == "\"Smart\" quotes 'here' - and-dashes..."
    assert got[0]["was_changed"]
    assert got[1]["norm_text"] == "plain ascii - no change."
    assert not got[1]["was_changed"]
    assert got[2]["norm_text"] == "zerowidth and nbsp here"
    assert got[3]["norm_text"] == "" and not got[3]["was_changed"]
    assert got[4]["norm_text"] is None and not got[4]["was_changed"]


# ---------------------------------------------------------------------------
# edit-distance pair verification
# ---------------------------------------------------------------------------


def test_edit_verify_gate_and_lengths(spark):
    from pdf_extraction_spark.operators.dedup import edit_verify_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumped over the lazy dog"),
            (3, "completely different text about something else"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5), (1, 1)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in edit_verify_pairs(pairs, docs, max_dist_pct=20).collect()
    }
    # one-word inflection: tiny distance, gated dup
    r = out[(1, 2)]
    assert r["edit_dist"] == 2 and r["is_dup"]
    # unrelated: large distance, not dup
    assert not out[(1, 3)]["is_dup"]
    # empty vs NULL-coalesced-empty: 0 <= 0 gates as dup
    r = out[(4, 5)]
    assert (r["edit_dist"], r["len_a"], r["len_b"], r["is_dup"]) == (0, 0, 0, True)
    assert out[(1, 1)]["edit_dist"] == 0


def test_edit_verify_unicode_fold_parity(spark):
    """Non-ASCII codepoints fold to '?' on both engines, so Spark's
    codepoint levenshtein and DuckDB's byte-level one agree exactly."""
    from pdf_extraction_spark.operators.dedup import (
        edit_verify_pairs,
        sql_edit_verify_pairs,
    )

    docs_rows = [
        (1, "naïve café culture"),
        (2, "naive cafe culture"),
        (3, "日本語のテスト文です"),
        (4, "日本語のテスト文だよ"),
    ]
    pairs_rows = [(1, 2), (3, 4), (1, 3)]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    pairs = spark.createDataFrame(pairs_rows, "id_a long, id_b long")
    got = sorted(
        tuple(r)
        for r in edit_verify_pairs(pairs, docs, max_dist_pct=30).collect()
    )
    con = duckdb.connect()
    dvals = ", ".join(f"({i}, '{t}')" for i, t in docs_rows)
    pvals = ", ".join(f"({a}, {b})" for a, b in pairs_rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_edit_verify_pairs(
                f"SELECT * FROM (VALUES {pvals}) p(id_a, id_b)",
                f"SELECT * FROM (VALUES {dvals}) d(doc_id, text)",
                max_dist_pct=30,
            )
        ).fetchall()
    )
    assert got == want
    # the folded 'naïve café'/'naive cafe' pair differs at exactly the
    # two folded codepoints
    by_pair = {(a, b): d for a, b, d, *_ in got}
    assert by_pair[(1, 2)] == 2


def test_edit_verify_closes_lsh_funnel(spark):
    """Composition: minhash-LSH candidates -> edit verification keeps
    the true near-dup and rejects the false-positive shape."""
    from pdf_extraction_spark.operators.dedup import (
        edit_verify_pairs,
        minhash_lsh_pairs,
    )

    base = "word" + " word".join(str(i) for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " tail"),
            (3, "entirely unrelated content " * 10),
        ],
        "doc_id long, text string",
    )
    cands = minhash_lsh_pairs(docs).select("id_a", "id_b")
    verified = edit_verify_pairs(cands, docs, max_dist_pct=20)
    rows = verified.collect()
    assert any(
        {r["id_a"], r["id_b"]} == {1, 2} and r["is_dup"] for r in rows
    )
    assert all(3 not in {r["id_a"], r["id_b"]} or not r["is_dup"] for r in rows)


# ---------------------------------------------------------------------------
# with_robust_outliers (median/MAD Hampel gate)
# ---------------------------------------------------------------------------


def _hampel(spark, rows, k_num=3, k_den=1):
    from pdf_extraction_spark.operators.agg import with_robust_outliers

    df = spark.createDataFrame(rows, "doc_id long, g string, v long")
    return {
        r.doc_id: r
        for r in with_robust_outliers(df, "g", "v", k_num, k_den).collect()
    }


def test_hampel_matches_pure_python_replay(spark):
    rows = [
        (1, "a", 10), (2, "a", 12), (3, "a", 11), (4, "a", 13), (5, "a", 500),
        (6, "b", 7), (7, "b", 7), (8, "b", 7), (9, "b", 9),
        (10, None, 4), (11, None, 100), (12, "c", None), (13, "c", 5),
    ]
    got = _hampel(spark, rows)

    def lomed(vals):
        vals = sorted(vals)
        return vals[(len(vals) + 1) // 2 - 1]

    from collections import defaultdict

    by_g = defaultdict(list)
    for _, g, v in rows:
        if v is not None:
            by_g[g].append(v)
    stats = {
        g: (lomed(vs), lomed([abs(x - lomed(vs)) for x in vs]))
        for g, vs in by_g.items()
    }
    for d, g, v in rows:
        m, mad = stats[g]
        assert got[d].grp_median == m, d
        assert got[d].grp_mad == mad, d
        want = None if v is None else abs(v - m) > 3 * mad
        assert got[d].is_outlier == want, d


def test_hampel_outlier_cannot_drag_the_gate(spark):
    # the z-score failure mode: ONE huge value inflates stddev enough to
    # hide itself; median/MAD is immune — the spike flags regardless of
    # its magnitude
    for spike in (100, 10_000, 10**12):
        rows = [(i, "a", 50 + (i % 5)) for i in range(20)] + [(99, "a", spike)]
        got = _hampel(spark, rows)
        assert got[99].is_outlier is True, spike
        assert all(not got[i].is_outlier for i in range(20))


def test_hampel_zero_mad_flags_everything_off_median(spark):
    rows = [(1, "a", 5), (2, "a", 5), (3, "a", 5), (4, "a", 6)]
    got = _hampel(spark, rows)
    assert got[4].grp_mad == 0 and got[4].is_outlier is True
    assert got[1].is_outlier is False


def test_hampel_k_is_a_rational_threshold(spark):
    # med=10, MAD=2; v=15 → dev 5: k=5/2 exact boundary is NOT an
    # outlier (strict >), k=2/1 is
    rows = [(1, "a", 8), (2, "a", 10), (3, "a", 12), (4, "a", 15), (5, "a", 10)]
    assert _hampel(spark, rows, 5, 2)[4].is_outlier is False
    assert _hampel(spark, rows, 2, 1)[4].is_outlier is True


def test_hampel_partition_invariance(spark):
    from pdf_extraction_spark.operators.agg import with_robust_outliers

    rows = [(i, f"g{i % 3}", (i * 7) % 23) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, g string, v long")
    a = sorted(map(tuple, with_robust_outliers(df, "g", "v").collect()))
    b = sorted(
        map(tuple, with_robust_outliers(df.repartition(17), "g", "v").collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# sentence_chunks — budget-quantized sentence-boundary RAG chunking
# ---------------------------------------------------------------------------


class TestSentenceChunks:
    def _chunks(self, spark, rows, budget):
        from pdf_extraction_spark.operators.textanalysis import (
            sentence_chunks,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return sentence_chunks(df, budget=budget).collect()

    def test_quantization_semantics_and_roundtrip(self, spark):
        # 6 sentences x 10 words, budget 25 -> chunks at prefix 0-20,
        # 30-40, 50: sentence k (prefix 10k) -> chunk (10k div 25)
        text = " ".join(
            "w%d%d" % (s, i) for s in range(6) for i in range(9)
        )  # build 6 sentences manually below instead
        sents = [
            " ".join(f"s{k}w{i}" for i in range(10)) + "." for k in range(6)
        ]
        rows = [(0, " ".join(sents))]
        out = sorted(self._chunks(spark, rows, 25), key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in out] == [0, 1, 2]
        assert [r.n_sents for r in out] == [3, 2, 1]  # 0,10,20 | 30,40 | 50
        assert [r.n_words for r in out] == [30, 20, 10]
        # round-trip: concatenating chunks in id order restores the doc
        joined = " ".join(r.chunk_text for r in out)
        assert joined == " ".join(sents)

    def test_overshoot_bounded_by_one_sentence(self, spark):
        # a 40-word sentence at prefix 20 joins chunk 0 (20 div 25 = 0):
        # chunk 0 holds 60 words — overshoot ≤ its closing sentence,
        # the same bound greedy packing has
        sents = [
            " ".join(f"a{i}" for i in range(20)) + ".",
            " ".join(f"b{i}" for i in range(40)) + ".",
            " ".join(f"c{i}" for i in range(10)) + ".",
        ]
        out = {r.chunk_id: r for r in self._chunks(spark, [(0, " ".join(sents))], 25)}
        assert out[0].n_words == 60 and out[0].n_sents == 2
        assert out[2].n_words == 10  # prefix 60 div 25 = 2

    def test_empty_and_null_docs_emit_nothing(self, spark):
        assert self._chunks(spark, [(0, ""), (1, None)], 25) == []

    def test_chunk_ids_stable_under_repartition(self, spark):
        from pdf_extraction_spark.operators.textanalysis import (
            sentence_chunks,
        )

        rows = [
            (i, " ".join(f"d{i}s{k}w{j}" for j in range(7)) + ". " * 1)
            for i in range(50)
            for k in range(1)
        ]
        docs = [
            (i, ". ".join(" ".join(f"w{i}{k}{j}" for j in range(8)) for k in range(5)) + ".")
            for i in range(50)
        ]
        df1 = spark.createDataFrame(docs, "doc_id long, text string")
        a = sorted(tuple(r) for r in sentence_chunks(df1, budget=13).collect())
        b = sorted(
            tuple(r)
            for r in sentence_chunks(
                df1.repartition(7, "text"), budget=13
            ).collect()
        )
        assert a == b and len(a) > 50


class TestNativeSimhash:
    """All-JVM SimHash: majority-vote semantics and cross-doc behavior."""

    def _sigs(self, spark, rows):
        from pdf_extraction_spark.operators.dedup import native_simhash

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r.doc_id: r for r in native_simhash(df).collect()}

    def test_single_word_sig_is_the_word_hash(self, spark):
        # one occurrence: every set bit wins its majority vote, so the
        # signature IS the 52-bit md5-prefix hash of the word
        import hashlib

        got = self._sigs(spark, [(1, "Hello")])
        expect = int(hashlib.md5(b"hello").hexdigest()[:13], 16)
        assert got[1].sig == expect and got[1].n_tokens == 1

    def test_identical_docs_identical_sigs(self, spark):
        got = self._sigs(spark, [(1, "a b c d e"), (2, "a b c d e")])
        assert got[1].sig == got[2].sig

    def test_near_identical_closer_than_unrelated(self, spark):
        base = " ".join(f"word{i}" for i in range(40))
        got = self._sigs(
            spark,
            [
                (1, base),
                (2, base + " extra token"),
                (3, " ".join(f"other{i}" for i in range(40))),
            ],
        )
        ham = lambda a, b: bin(a ^ b).count("1")
        assert ham(got[1].sig, got[2].sig) < ham(got[1].sig, got[3].sig)

    def test_empty_and_null_docs_get_zero_sig(self, spark):
        got = self._sigs(spark, [(1, ""), (2, None)])
        for r in got.values():
            assert r.sig == 0 and r.n_tokens == 0

    def test_tie_bits_resolve_to_zero(self, spark):
        # two words: any bit where the hashes disagree is a 1-1 tie →
        # majority fails → bit 0; sig must be the AND of the two hashes
        import hashlib

        h = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:13], 16)
        got = self._sigs(spark, [(1, "alpha beta")])
        assert got[1].sig == (h("alpha") & h("beta"))


class TestLayoutGain:
    """Similarity-ordered shard layout: exact adjacent-Hamming deltas."""

    def _gain(self, spark, rows, **kw):
        from pdf_extraction_spark.operators.release import layout_gain

        df = spark.createDataFrame(rows, "doc_id long, sig long")
        return layout_gain(df, **kw).collect()

    def test_clustered_sigs_reward_simhash_order(self, spark):
        # ids interleave two far-apart sig clusters: id order pays the
        # cluster gap on every step, sig order pays it once
        rows = [(i, (0 if i % 2 == 0 else (1 << 40)) + i) for i in range(20)]
        out = self._gain(spark, rows, n_shards=1)
        assert len(out) == 1
        r = out[0]
        assert r.n_docs == 20 and r.n_pairs == 19
        assert r.sum_ham_sim < r.sum_ham_id
        assert r.delta_bits == r.sum_ham_id - r.sum_ham_sim > 0

    def test_single_doc_shard_has_no_pairs(self, spark):
        out = self._gain(spark, [(1, 12345)], n_shards=1)
        r = out[0]
        assert r.n_docs == 1 and r.n_pairs == 0
        assert r.sum_ham_sim == 0 and r.sum_ham_id == 0 and r.delta_bits == 0

    def test_shard_assignment_is_md5_stable(self, spark):
        # same frame, different physical partitioning → identical rows
        rows = [(i, i * 7919 % (1 << 30)) for i in range(200)]
        a = sorted(map(tuple, self._gain(spark, rows, n_shards=8)))
        from pdf_extraction_spark.operators.release import layout_gain

        df = spark.createDataFrame(rows, "doc_id long, sig long").repartition(13)
        b = sorted(map(tuple, layout_gain(df, n_shards=8).collect()))
        assert a == b and len(a) == 8
