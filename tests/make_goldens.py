"""Generate the frozen golden fixture files (FIXTURES.md §5).

Run once; outputs are committed. Regenerating after an intentional
kernel change is an explicit act — CI (test_goldens.py) fails on any
accidental semantic drift.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdf_extraction_spark.kernels import (  # noqa: E402
    categorize,
    clean_text,
    extract_all_metrics,
    parse_transcript,
    quality_score,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

TRANSCRIPTS = [
    "Moderator: Good day and welcome.\nRahul Sharma: Revenue grew.\ncontinuation\nPriya Patel: Thanks.",
    "Operator: ignored header\nAl: too short\nreal content line\nRahul Sharma: actual turn text",
    "Moderator:   spaced\nMANAGEMENT: MR. A B – CEO\nQuestion: not a speaker\nKen Tanaka: closing remark",
]

DIRTY_TEXTS = [
    "don't “quote” – this — now   with   spaces\n\n\n\nPage 3 of 17 done",
    "a'''b c‘d’e",
    "  leading and trailing  \n\n\n\nPage 12 of 99\n ok ",
]

FINANCIAL_SNIPPETS = [
    "revenue of Rs. 1,234.5 crores and sales of $ 250 million",
    "EBITDA stands at Rs 890 crores, up 12.5% YoY growth of 8%",
    "22% EBITDA margin, gross margin of 61.2%, Q3 FY18 fiscal year 2018-19 FY2021",
    "nothing financial here",
]

QUALITY_CASES = [
    "forward-looking statements and predictions, projections disclaimer",
    "revenue growth margin ebitda profit " + "filler " * 60,
    "short",
    "question answer let me " + "word " * 120,
    "thank you for joining " + "word " * 10,
]

CATEGORY_CASES = [
    "revenue and outlook and supply chain risk",
    "dividend buyback and r&d innovation",
    "fda approval for the drug",
    "nothing relevant",
]


def main():
    os.makedirs(FIXTURES, exist_ok=True)

    for i, t in enumerate(TRANSCRIPTS):
        with open(f"{FIXTURES}/transcript_raw_{i:02d}.txt", "w") as f:
            f.write(t)
        speakers, dialogue = parse_transcript(t)
        with open(f"{FIXTURES}/transcript_parsed_{i:02d}.json", "w") as f:
            json.dump({"speakers": speakers, "dialogue": dialogue}, f, indent=2)

    for i, t in enumerate(DIRTY_TEXTS):
        with open(f"{FIXTURES}/dirty_text_{i:02d}.txt", "w") as f:
            f.write(t)
        with open(f"{FIXTURES}/clean_text_{i:02d}.txt", "w") as f:
            f.write(clean_text(t))

    with open(f"{FIXTURES}/financial_snippets.jsonl", "w") as f:
        for t in FINANCIAL_SNIPPETS:
            f.write(json.dumps({"text": t, "expected": extract_all_metrics(t)}) + "\n")

    with open(f"{FIXTURES}/quality_cases.jsonl", "w") as f:
        for t in QUALITY_CASES:
            f.write(json.dumps({"text": t, "expected": quality_score(t)}) + "\n")

    with open(f"{FIXTURES}/category_cases.jsonl", "w") as f:
        for t in CATEGORY_CASES:
            f.write(json.dumps({"text": t, "expected": categorize(t)}) + "\n")

    print(f"goldens written to {FIXTURES}")


if __name__ == "__main__":
    main()
