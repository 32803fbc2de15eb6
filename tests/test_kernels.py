"""Kernel parity tests: byte-exact fixtures exercising every regex branch
of the reference semantics (SURVEY.md §5)."""

from datetime import datetime

from pdf_extraction_spark.kernels import (
    categorize,
    clean_dialogue_text,
    clean_text,
    extract_all_metrics,
    extract_roster,
    name_matches,
    parse_transcript,
    quality_score,
    recency_weight,
    speaker_role,
    weighted_score,
)
from pdf_extraction_spark.kernels.dates import date_from_filename, quarter_and_fy
from pdf_extraction_spark.kernels.filters import keep_chunk, should_remove_content


class TestCleanText:
    def test_apostrophe_order(self):
        # straight apostrophes deleted; curly ones survive as ASCII
        assert clean_text("don't stop") == "dont stop"
        assert clean_text("don’t stop") == "don't stop"
        assert clean_text("a'''b") == "ab"

    def test_quotes_dashes(self):
        assert clean_text("“hi” – there — ok") == '"hi" - there - ok'

    def test_whitespace_and_pagenos(self):
        assert clean_text("a   b\n\n\n\nc") == "a b\n\nc"
        assert clean_text("x Page 3 of 17 y") == "x  y".replace("  ", " ") or True
        # exact: page marker removed, spaces NOT re-collapsed after
        assert clean_text("x Page 3 of 17 y") == "x  y"
        assert clean_text("x pAGe 12 of 99 y") == "x  y"

    def test_strip(self):
        assert clean_text("  hi  ") == "hi"


class TestDialogueClean:
    def test_collapse(self):
        assert clean_dialogue_text("a\n\nb\t c") == "a b c"

    def test_control_chars(self):
        assert clean_dialogue_text("a\x01b") == "ab"


class TestParseTranscript:
    def test_basic_turns(self):
        text = (
            "Moderator: Welcome everyone.\n"
            "Rahul Sharma: Thank you. Revenue was up.\n"
            "continuation line here\n"
            "Priya Patel: Question on margins?\n"
        )
        speakers, dialogue = parse_transcript(text)
        assert speakers == ["Moderator", "Priya Patel", "Rahul Sharma"]
        assert dialogue[1] == {
            "speaker": "Rahul Sharma",
            "text": "Thank you. Revenue was up. continuation line here",
        }

    def test_invalid_headers_fall_through(self):
        text = (
            "Rahul Sharma: hello\n"
            "Page: 3\n"
            "Question: why\n"
            "Operator: connect\n"
            "Al: too short name\n"
        )
        speakers, dialogue = parse_transcript(text)
        assert speakers == ["Rahul Sharma"]
        # invalid headers become continuation text of the current turn
        assert dialogue[0]["text"] == (
            "hello Page: 3 Question: why Operator: connect Al: too short name"
        )

    def test_moderator_slice(self):
        speakers, dialogue = parse_transcript("Moderator:   hi there\n")
        assert dialogue == [{"speaker": "Moderator", "text": "hi there"}]

    def test_no_speaker_lines_dropped(self):
        speakers, dialogue = parse_transcript("just a line\nno speaker\n")
        assert speakers == [] and dialogue == []

    def test_empty_turn_not_emitted(self):
        speakers, dialogue = parse_transcript("Rahul Sharma:\nPriya Patel: hi\n")
        assert [d["speaker"] for d in dialogue] == ["Priya Patel"]
        assert "Rahul Sharma" in speakers  # speaker recorded even if empty


class TestFinancial:
    def test_revenue_inr(self):
        hits = extract_all_metrics("revenue of Rs. 1,234.5 crores this year")["revenue"]
        assert hits[0]["value"] == 1234.5
        assert hits[0]["currency"] == "INR"
        assert hits[0]["unit"] == "crores"

    def test_revenue_usd_int(self):
        hits = extract_all_metrics("sales of $ 250 million abroad")["revenue"]
        assert hits[0] == {
            "raw_text": "sales of $ 250 million",
            "value": 250,
            "currency": "USD",
            "unit": "million",
        }

    def test_growth_direction_and_type(self):
        m = extract_all_metrics("YoY growth of 8.5% but down 3% QoQ")
        types = {(g["type"], g["direction"]) for g in m["growth_rates"]}
        assert ("YoY", "positive") in types
        assert ("general", "negative") in types

    def test_ebitda(self):
        hits = extract_all_metrics("EBITDA stands at Rs 890 crores")["ebitda"]
        assert hits[0]["value"] == 890 and hits[0]["currency"] == "INR"

    def test_margins_priority(self):
        m = extract_all_metrics("22% EBITDA margin and gross margin of 61.2%")["margins"]
        # overlapping reference patterns: pattern 2 also hits "margin of
        # 61.2%" without the gross prefix → an extra "general" hit, kept
        assert {x["type"] for x in m} == {"EBITDA", "gross", "general"}

    def test_quarter_info(self):
        qi = extract_all_metrics("In Q3 FY18 and Q1, fiscal year 2018-19 and FY2021")[
            "quarter_info"
        ]
        assert qi["quarters"] == ["Q1", "Q3"]
        assert qi["combined"] == ["Q3 FY18"]
        assert "FY19" in qi["fiscal_years"] and "FY21" in qi["fiscal_years"]

    def test_duplicate_hits_kept(self):
        # pattern 1 ("5% growth") hits the middle once, pattern 3
        # ("growth of 5%") hits twice → 3 hits, duplicates preserved
        m = extract_all_metrics("growth of 5% growth of 5%")["growth_rates"]
        assert len(m) == 3


class TestQuality:
    def test_double_admin_hard_one(self):
        s = quality_score(
            "forward-looking statements and predictions, projections follow"
        )
        assert s == 1.0

    def test_single_admin_penalty(self):
        base_words = "word " * 30
        s = quality_score(base_words + "draw your attention")
        assert s == 5.0 - 3.0  # 33 words → no word bonus, no business kw

    def test_business_rich(self):
        s = quality_score(
            "revenue growth margin ebitda profit " + "filler " * 60
        )
        assert s == 5.0 + 4.0 + 1.0  # ≥5 keywords, >50 words

    def test_clamps(self):
        assert 1.0 <= quality_score("") <= 10.0
        long_rich = (
            "revenue growth margin ebitda profit market business quarter "
            + "question answer let me " + "w " * 250
        )
        assert quality_score(long_rich) == 10.0


class TestRolesAndCategories:
    def test_role_priority(self):
        assert speaker_role("Jane CEO and CFO") == "CEO"
        assert speaker_role("Chief Financial Officer") == "CFO"
        assert speaker_role("Ramdas") == "MD"  # 'md' substring, as in reference
        assert speaker_role("MANAGEMENT") == "Management"
        assert speaker_role("Random Analyst") == "Analyst/Other"

    def test_categorize_multilabel(self):
        cats = categorize("revenue and our outlook and supply chain")
        assert "Financial Performance" in cats
        assert "Guidance & Outlook" in cats
        assert "Operational Updates" in cats

    def test_general_fallback(self):
        assert categorize("nothing relevant here at all") == ["General"]

    def test_word_boundary(self):
        assert categorize("apidemic") == ["General"]  # 'api' must not match inside


class TestExecutives:
    def test_roster(self):
        r = extract_roster("MR. RAHUL SHARMA – CEO, MS. PRIYA PATEL – CFO")
        assert r == {"RAHUL SHARMA": "CEO", "PRIYA PATEL": "CFO"}

    def test_roster_role_gate(self):
        assert extract_roster("MR. X YZAB – PRESIDENT") == {}

    def test_name_match_rules(self):
        assert name_matches("Rahul Sharma", "RAHUL SHARMA")
        assert name_matches("Mr. Sharma", "RAHUL SHARMA")  # last name
        assert name_matches("Rahul K. Sharma", "RAHUL SHARMA")  # first+last
        assert not name_matches("Priya Patel", "RAHUL SHARMA")


class TestFilters:
    def test_admin_keyword(self):
        assert should_remove_content("Good day and welcome to the call " + "x " * 20)

    def test_short(self):
        assert should_remove_content("too short")

    def test_keep_precedence(self):
        assert keep_chunk("MANAGEMENT", "hi")  # allowlist beats short
        assert not keep_chunk("Operator", "a perfectly long and valid content line here ok")
        assert keep_chunk("Rahul", "eleven words of content in this line right here now ok")


class TestRerank:
    def test_recency_buckets(self):
        assert recency_weight(10) == 1.0
        assert recency_weight(200) == 0.8
        assert recency_weight(700) == 0.6
        assert recency_weight(1000) == 0.4

    def test_weighted(self):
        as_of = datetime(2024, 1, 1)
        ws, rw, days = weighted_score(0.5, "2023-12-01", as_of, 8.0)
        assert rw == 1.0 and days == 31
        assert abs(ws - (0.35 + 0.2 + 0.08)) < 1e-12

    def test_bad_date_fallback(self):
        ws, rw, days = weighted_score(0.5, "not-a-date", datetime(2024, 1, 1), None)
        assert (ws, rw, days) == (0.5, 1.0, 0)


class TestDates:
    def test_month_year(self):
        assert date_from_filename("CIPLA_Aug_2018_call.pdf") == datetime(2018, 8, 1)

    def test_quarter_fy(self):
        # reference maps Q1_FY19 → April of calendar 2019 (fy year kept
        # as-is unless the quarter starts in January)
        assert date_from_filename("Q1_FY19.pdf") == datetime(2019, 4, 1)
        assert date_from_filename("Q4_FY19.pdf") == datetime(2020, 1, 1)

    def test_bare_year(self):
        assert date_from_filename("call_2021.pdf") == datetime(2021, 1, 1)

    def test_none_fallback(self):
        assert date_from_filename("no_date_here.pdf") is None

    def test_quarter_and_fy(self):
        assert quarter_and_fy("q3_fy2018.pdf", None) == ("Q3", "FY18")
        assert quarter_and_fy("nothing.pdf", datetime(2018, 5, 1)) == ("", "FY19")
        assert quarter_and_fy("nothing.pdf", datetime(2018, 2, 1)) == ("", "FY18")
