"""Randomized cross-engine twin fuzz (seeded, deterministic): run the
same generated mini-corpus through the Spark operator and its DuckDB
twin and require exact agreement. The adversarial sweep covers a
curated hostile table; this covers the combinatorial neighborhood
around the riskiest pure-relational recursions (the BPE string fold
and the word_counts contract), where a missed edge means silent
divergence rather than a crash.

Few examples, small corpora: each example pays a Spark job, so the
value is in the WIDTH of the alphabet (separator chars, newlines,
repeats, unicode) rather than example count."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.bpe import (
    bpe_merges,
    sql_bpe_merges,
    word_counts,
)

# tight alphabet so merges collide: repeats, whitespace classes, the
# SEP control char, a quote (SQL escaping), unicode, the marker chars
_ALPHABET = list("ab xyz\t\n.\x01<>/wé日'")

doc_strategy = st.lists(
    st.text(alphabet=st.sampled_from(_ALPHABET), max_size=30),
    min_size=1,
    max_size=6,
)


def _duck_docs(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(rows):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    return con


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc_strategy)
def test_bpe_merges_twin_agrees_on_random_corpora(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [
        tuple(r) for r in bpe_merges(word_counts(docs), n_merges=4).collect()
    ]
    con = _duck_docs(texts)
    want = [tuple(r) for r in con.execute(sql_bpe_merges(4)).fetchall()]
    assert got == want
