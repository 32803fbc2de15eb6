"""TextTiling (operators/texttiling.py): boundary detection on crafted
two-topic documents, an independent numpy recompute of the integer
block cosines, edge cases, and DuckDB twin parity."""

import collections
import math
import random
import re

import duckdb
import pandas as pd
import pytest


def _two_topic_doc(seed=3, n=60):
    random.seed(seed)
    cook = "pan oil salt garlic onion simmer stir sauce butter flour".split()
    astro = (
        "star orbit galaxy telescope nebula planet comet lunar solar cosmic"
    ).split()
    return (
        " ".join(random.choice(cook) for _ in range(n))
        + " "
        + " ".join(random.choice(astro) for _ in range(n))
    )


ROWS = [
    (1, _two_topic_doc()),
    # 5-token phrase aligns with the 10-token pseudo-sentences, so every
    # sequence has an identical term vector
    (2, " ".join(["pan oil salt garlic onion"] * 16)),  # homogeneous
    (3, "short text"),  # one pseudo-sentence
    (4, None),
]


@pytest.fixture()
def tiles(spark):
    from pdf_extraction_spark.operators.texttiling import texttile

    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return sorted(tuple(r) for r in texttile(df, w=10, k=3).collect())


class TestTextTiling:
    def test_topic_shift_is_the_deepest_boundary(self, tiles):
        d1 = {g[1]: g for g in tiles if g[0] == 1}
        # the junction sits at token 60 = gap 6: minimal sim, max depth
        assert d1[6][3] == min(v[3] for v in d1.values())
        assert d1[6][4] == max(v[4] for v in d1.values())
        assert d1[6][5] is True
        assert d1[6][2] == 60  # boundary_tok = gap · w

    def test_sims_match_independent_recompute(self, tiles):
        """numpy/collections replay of the spec: block term vectors,
        exact isqrt cosine at micro scale."""
        doc = ROWS[0][1]
        toks = [t.lower() for t in re.split(r"[^A-Za-z0-9]+", doc) if t]
        S = (len(toks) + 9) // 10
        seqs = [toks[i * 10 : (i + 1) * 10] for i in range(S)]

        def vec(block):
            c = collections.Counter()
            for s in block:
                c.update(s)
            return c

        d1 = {g[1]: g for g in tiles if g[0] == 1}
        for i in range(1, S):
            lv, rv = vec(seqs[max(0, i - 3) : i]), vec(seqs[i : i + 3])
            dot = sum(lv[t] * rv[t] for t in lv)
            nn = sum(v * v for v in lv.values()) * sum(v * v for v in rv.values())
            assert d1[i][3] == (dot * 10**6) // math.isqrt(nn)

    def test_homogeneous_doc_has_shallow_depths(self, tiles):
        d2 = [g[4] for g in tiles if g[0] == 2]
        assert d2 and max(d2) == 0  # identical blocks ⇒ flat similarity

    def test_degenerate_docs_emit_nothing(self, tiles):
        assert not any(g[0] in (3, 4) for g in tiles)

    def test_twin_parity(self, spark, tiles):
        from pdf_extraction_spark.operators.texttiling import sql_texttile

        con = duckdb.connect()
        con.register("documents", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
        want = sorted(
            tuple(r) for r in con.execute(sql_texttile("documents", w=10, k=3)).fetchall()
        )
        assert tiles == want
