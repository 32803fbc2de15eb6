"""jusText block classifier: context-free rule boundaries, every
context-sensitive branch, a seeded fuzz against a pure-Python replay of
the published two-pass algorithm, block segmentation, invariances.
Cross-engine twin parity lives in the strict oracle sweep
(justext_blocks) and the adversarial hostile-input sweep."""

import random
import re

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.justext import (
    DEFAULT_STOPWORDS,
    blocks_from_text,
    justext_classify,
)

# class-primitive lines (see the operator docstring for the rules)
GOOD = "the " * 60            # 239 chars trimmed, 100% stopwords
NEARGOOD = "the " * 30        # 119 chars, 100% stopwords
BAD = "xyzzy " * 20           # 119 chars, 0% stopwords
SHORT = "hello world"
LINKY = "see www.example.com/x www.example.com/y"
COPYR = "© 2020 xyzzy corp"


def _py_replay(lines):
    """Pure-Python replay of the same two passes."""
    stop = set(DEFAULT_STOPWORDS)

    def cf(t):
        t = t.strip()
        ws = [w for w in re.split(r"[ \t\n\x0b\f\r]", t.lower()) if w]
        n_link = sum(
            1 for w in ws if re.match(r"^(https?://|www\.)", w)
        )
        n_stop = sum(
            1
            for w in ws
            if re.sub(r"^[^a-z0-9]+|[^a-z0-9]+$", "", w) in stop
        )
        n = len(ws)
        if 100 * n_link > 20 * n or "©" in t or "&copy" in t.lower():
            return "bad"
        if len(t) < 70:
            return "bad" if n_link > 0 else "short"
        if 100 * n_stop >= 32 * n:
            return "good" if len(t) > 200 else "neargood"
        if 100 * n_stop >= 30 * n:
            return "neargood"
        return "bad"

    cfs = [cf(t) for t in lines]
    out = []
    for i, c in enumerate(cfs):
        if c in ("good", "bad"):
            out.append(c)
            continue
        prev = next(
            (cfs[j] for j in range(i - 1, -1, -1) if cfs[j] in ("good", "bad")),
            "bad",
        )
        nxt = next(
            (cfs[j] for j in range(i + 1, len(cfs)) if cfs[j] in ("good", "bad")),
            "bad",
        )
        if c == "neargood":
            out.append("bad" if prev == "bad" and nxt == "bad" else "good")
            continue
        if prev == "good" and nxt == "good":
            out.append("good")
        elif prev == "bad" and nxt == "bad":
            out.append("bad")
        elif prev == "bad":  # bad side precedes: near-good bridge before me
            lo = next(
                (j for j in range(i - 1, -1, -1) if cfs[j] in ("good", "bad")),
                -1,
            )
            out.append(
                "good"
                if any(cfs[j] == "neargood" for j in range(lo + 1, i))
                else "bad"
            )
        else:  # bad side follows
            hi = next(
                (j for j in range(i + 1, len(cfs)) if cfs[j] in ("good", "bad")),
                len(cfs),
            )
            out.append(
                "good"
                if any(cfs[j] == "neargood" for j in range(i + 1, hi))
                else "bad"
            )
    return cfs, out


def _run(spark, docs_lines):
    """docs_lines: list of line-lists; returns {(doc, idx): (cf, final)}."""
    rows = [
        (d, i, t)
        for d, lines in enumerate(docs_lines)
        for i, t in enumerate(lines)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, block_idx long, block string"
    )
    return {
        (r.doc_id, r.block_idx): (r.cf_class, r.final_class)
        for r in justext_classify(df).collect()
    }


def test_context_free_boundaries(spark):
    lines = [GOOD, NEARGOOD, BAD, SHORT, LINKY, COPYR,
             "x" * 69,          # < length_low, no link -> short
             "the " * 17 + "xx"  # 70 chars exactly -> density branch
             ]
    got = _run(spark, [lines])
    cf = [got[(0, i)][0] for i in range(len(lines))]
    assert cf == ["good", "neargood", "bad", "short", "bad", "bad",
                  "short", "neargood"]


def test_stopword_density_is_inclusive_at_32_percent(spark):
    # 8 stopwords of 25 words = exactly 32% -> neargood, not bad
    line = ("the " * 8 + "xyzzy " * 17).strip()
    assert len(line) >= 70
    got = _run(spark, [[line]])
    assert got[(0, 0)][0] == "neargood"


def test_every_context_branch(spark):
    docs = [
        [GOOD, SHORT, GOOD],            # short g+g -> good
        [BAD, SHORT, BAD],              # short b+b -> bad
        [GOOD, SHORT, NEARGOOD, BAD],   # mixed, bridge on bad side -> good
        [GOOD, SHORT, BAD],             # mixed, no bridge -> bad
        [BAD, NEARGOOD, SHORT, GOOD],   # mixed, bridge before -> good
        [GOOD, NEARGOOD, BAD],          # neargood with a good side -> good
        [BAD, NEARGOOD, BAD],           # neargood both bad -> bad
        [SHORT],                        # edges are bad -> bad
        [NEARGOOD],                     # edges are bad -> bad
    ]
    got = _run(spark, docs)
    assert got[(0, 1)][1] == "good"
    assert got[(1, 1)][1] == "bad"
    assert got[(2, 1)][1] == "good"
    assert got[(3, 1)][1] == "bad"
    assert got[(4, 2)][1] == "good"
    assert got[(5, 1)][1] == "good"
    assert got[(6, 1)][1] == "bad"
    assert got[(7, 0)][1] == "bad"
    assert got[(8, 0)][1] == "bad"


def test_fuzz_against_python_replay(spark):
    rng = random.Random(42)
    prims = [GOOD, NEARGOOD, BAD, SHORT, LINKY, COPYR]
    docs = [
        [rng.choice(prims) for _ in range(rng.randint(1, 12))]
        for _ in range(80)
    ]
    got = _run(spark, docs)
    for d, lines in enumerate(docs):
        cfs, finals = _py_replay(lines)
        for i in range(len(lines)):
            assert got[(d, i)] == (cfs[i], finals[i]), (d, i, lines[i])


def test_blocks_keep_original_line_positions(spark):
    df = spark.createDataFrame(
        [(1, "first\n\n  \nfourth")], "doc_id long, text string"
    )
    got = {(r.block_idx): r.block for r in blocks_from_text(df).collect()}
    assert got == {0: "first", 3: "fourth"}


def test_partition_invariance(spark):
    docs = [[GOOD, SHORT, BAD, NEARGOOD] * 3 for _ in range(7)]
    rows = [
        (d, i, t) for d, lines in enumerate(docs) for i, t in enumerate(lines)
    ]
    df = spark.createDataFrame(rows, "doc_id long, block_idx long, block string")
    a = sorted(map(tuple, justext_classify(df.repartition(1)).collect()))
    b = sorted(map(tuple, justext_classify(df.repartition(13, "block")).collect()))
    assert a == b


def test_plan_has_no_python_and_docwise_window(spark):
    df = spark.createDataFrame(
        [(1, 0, "x")], "doc_id long, block_idx long, block string"
    )
    plan = (
        justext_classify(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Cartesian" not in plan
