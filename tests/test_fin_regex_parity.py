"""Pattern-level cross-engine fuzz for the financial regex family.

The fin_* oracle twins derive from the same pattern constants Spark
runs, rewritten by wsre (explicit Java \\s class + explicit ASCII dual
casing replacing the engine-varying ``(?i)``), so Java↔RE2 parity of
every pattern IS the correctness contract. This fuzz feeds seeded
adversarial snippets (financial fragments glued with exotic
whitespace, newline tails, unicode-case letters like ſ/İ that expose
(?i) fold-table differences) through ``regexp_extract_all`` in BOTH
engines for every pattern and asserts identical extractions.

Known, deliberate residual — NOT exercised here: ``\\b``. Java's (and
Python's, i.e. the reference kernel's) word boundary is Unicode-aware
(no boundary between ``4`` and ``ĸ``), RE2's is ASCII-only, and RE2
has no lookbehind to spell the Java set. Spark deliberately keeps the
kernel-matching Unicode ``\\b``; the twin diverges only when a
non-ASCII word-like character is glued flush against a match edge, so
the fuzz keeps its exotic letters space-padded.
"""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.kernels.financial import (
    _EBITDA_PATTERNS,
    _GROWTH_PATTERNS,
    _MARGIN_PATTERNS,
    _REVENUE_PATTERNS,
)
from pdf_extraction_spark.kernels.wsre import java_i_twin
from pdf_extraction_spark.operators.financial import (
    COMBINED_PATTERN,
    FY_DIRECT_PATTERN,
    FY_RANGE_PATTERN,
    QUARTER_PATTERN,
    URL_QFY_PATTERN,
)

ALL_PATTERNS = (
    list(_REVENUE_PATTERNS)
    + list(_GROWTH_PATTERNS)
    + list(_EBITDA_PATTERNS)
    + list(_MARGIN_PATTERNS)
    + [
        QUARTER_PATTERN,
        COMBINED_PATTERN,
        FY_DIRECT_PATTERN,
        FY_RANGE_PATTERN,
        URL_QFY_PATTERN,
    ]
)

FRAGS = [
    "revenue of Rs. 1,234.5 crores", "Rs 99 cr", "$12.3 million", "EBITDA",
    "grew by 14.2 %", "up 3%", "margin of 18.5%", "Q1", "FY24", "Q3FY2024",
    "fiscal year 2023-24", "YoY growth of 8%", " ", "\x0b", "\n", "\t",
    " Rſ. 5 crores ",      # long-s: RE2 (?i) would fold ſ→s, Java must not
    " İNCOME ", " ĸ ", "　",  # dotted-I, kra (padded: \b residual), ideographic space
    "margin", "of", "12,345", "%", "cr", "...", "q2fy22", "Up 5 %",
    "revenue\x0bof Rs 7 cr", "8%\n",
]


def _snippets(n=300, seed=99):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(1, 6)
        sep = rng.choice([" ", "", "\x0b", "\n"])
        out.append(sep.join(rng.choice(FRAGS) for _ in range(k)))
    return out


@pytest.mark.parametrize("group", [0, 1])
def test_fin_patterns_cross_engine(spark, group):
    texts = _snippets()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, t string"
    ).persist()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    for pat in ALL_PATTERNS:
        jp = "(?i)" + pat
        rp = java_i_twin(pat).replace("'", "''")
        got = {
            r.i: r.m
            for r in df.select(
                "i", F.regexp_extract_all("t", F.lit(jp), F.lit(group)).alias("m")
            ).collect()
        }
        want = dict(
            con.execute(
                f"SELECT i, regexp_extract_all(t, '{rp}', {group}) FROM t"
            ).fetchall()
        )
        for i in range(len(texts)):
            assert got[i] == want[i], (pat, texts[i], got[i], want[i])
    df.unpersist()
