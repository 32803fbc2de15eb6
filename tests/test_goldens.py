"""Frozen golden-fixture comparisons (FIXTURES.md §5): kernel outputs
must match the committed goldens byte-for-byte; regenerate consciously
via tests/make_goldens.py after an intentional semantics change."""

import glob
import json
import os

from pdf_extraction_spark.kernels import (
    categorize,
    clean_text,
    extract_all_metrics,
    parse_transcript,
    quality_score,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_goldens_exist():
    assert glob.glob(f"{FIXTURES}/transcript_raw_*.txt")
    assert glob.glob(f"{FIXTURES}/clean_text_*.txt")


def test_transcript_goldens():
    for raw_path in sorted(glob.glob(f"{FIXTURES}/transcript_raw_*.txt")):
        golden_path = raw_path.replace("transcript_raw_", "transcript_parsed_").replace(
            ".txt", ".json"
        )
        raw = open(raw_path).read()
        golden = json.load(open(golden_path))
        speakers, dialogue = parse_transcript(raw)
        assert speakers == golden["speakers"], raw_path
        assert dialogue == golden["dialogue"], raw_path


def test_clean_text_goldens():
    for dirty_path in sorted(glob.glob(f"{FIXTURES}/dirty_text_*.txt")):
        golden_path = dirty_path.replace("dirty_text_", "clean_text_")
        assert clean_text(open(dirty_path).read()) == open(golden_path).read(), dirty_path


def test_financial_goldens():
    for line in open(f"{FIXTURES}/financial_snippets.jsonl"):
        case = json.loads(line)
        assert extract_all_metrics(case["text"]) == case["expected"], case["text"]


def test_quality_goldens():
    for line in open(f"{FIXTURES}/quality_cases.jsonl"):
        case = json.loads(line)
        assert quality_score(case["text"]) == case["expected"], case["text"]


def test_category_goldens():
    for line in open(f"{FIXTURES}/category_cases.jsonl"):
        case = json.loads(line)
        assert categorize(case["text"]) == case["expected"], case["text"]
