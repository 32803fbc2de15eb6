"""BPE vocabulary induction — parity with a pure-Python replay of the
same recursion (greedy left-to-right merge, count-then-lexicographic
tie-break), determinism, and degenerate inputs. Cross-engine twin
parity lives in the strict oracle sweep (bpe_merges)."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.bpe import (
    END_OF_WORD,
    SEP,
    bpe_merges,
    sql_bpe_merges,
    word_counts,
)


def _py_bpe(word_cnt: dict, n_merges: int):
    """Textbook dict-loop BPE with the operator's exact semantics."""
    words = {tuple(w) + (END_OF_WORD,): c for w, c in word_cnt.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get(
                    (syms[i], syms[i + 1]), 0
                ) + c
        if not pairs:
            break
        (a, b), pc = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, pc))
        nxt = {}
        for syms, c in words.items():
            out = []
            for s in syms:  # greedy left-to-right on the POST-merge tail
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        words = nxt
    return merges


def _spark_bpe(spark, word_cnt, n_merges):
    df = spark.createDataFrame(list(word_cnt.items()), "word string, cnt long")
    return [tuple(r) for r in bpe_merges(df, n_merges=n_merges).collect()]


def test_matches_textbook_loop(spark):
    wc = {"lower": 5, "lowest": 3, "newer": 6, "wider": 2, "new": 4}
    assert _spark_bpe(spark, wc, 10) == _py_bpe(wc, 10)


def test_overlapping_run_merges_greedily(spark):
    # "aaa" + merge (a,a) → [aa, a]: the second overlap must NOT merge
    wc = {"aaa": 7, "aa": 2}
    got = _spark_bpe(spark, wc, 3)
    assert got == _py_bpe(wc, 3)
    assert got[0][1:3] == ("a", "a")


def test_tiebreak_is_lexicographic(spark):
    # every pair appears exactly once → counts all tie → ('b','c') vs
    # ('a','d'): lexicographic a wins
    wc = {"bc": 1, "ad": 1}
    got = _spark_bpe(spark, wc, 1)
    assert got == _py_bpe(wc, 1)
    assert got[0][1:3] == ("a", "d")


def test_partition_invariance_and_repeatability(spark):
    wc = {f"w{i}x{i % 7}y": i + 1 for i in range(200)}
    df = spark.createDataFrame(list(wc.items()), "word string, cnt long")
    a = [tuple(r) for r in bpe_merges(df, n_merges=8).collect()]
    b = [
        tuple(r)
        for r in bpe_merges(df.repartition(17), n_merges=8).collect()
    ]
    assert a == b == _py_bpe(wc, 8)


def test_runs_dry_early(spark):
    # single-char words: round 1 merges (x, </w>), after which no pair
    # remains — fewer rows than requested, not an error
    wc = {"x": 3}
    got = _spark_bpe(spark, wc, 5)
    assert got == _py_bpe(wc, 5)
    assert len(got) == 1 and got[0][1:3] == ("x", END_OF_WORD)


def test_word_counts_strips_separator_and_empties(spark):
    docs = spark.createDataFrame(
        [(1, f"a{SEP}b ab {SEP} ab"), (2, None), (3, "  ")],
        "doc_id long, text string",
    )
    got = {r.word: r.cnt for r in word_counts(docs).collect()}
    assert got == {"ab": 3}


def test_twin_parity_on_unicode_words(spark):
    import duckdb

    docs = spark.createDataFrame(
        [(1, "日本語 日本 語"), (2, "naïve café café"), (3, "\U0001F642\U0001F680 \U0001F642")],
        "doc_id long, text string",
    )
    got = [
        tuple(r) for r in bpe_merges(word_counts(docs), n_merges=6).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for r in docs.collect():
        con.execute("INSERT INTO documents VALUES (?, ?)", [r.doc_id, r.text])
    orows = [tuple(r) for r in con.execute(sql_bpe_merges(6)).fetchall()]
    assert got == orows


def test_zero_merges_yields_empty_table(spark):
    import duckdb

    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    assert bpe_merges(word_counts(docs), n_merges=0).collect() == []
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    assert con.execute(sql_bpe_merges(0)).fetchall() == []


def test_empty_word_rows_match_twin(spark):
    """Raw (word, cnt) frames with ''/NULL words: both engines must
    treat them as the bare '</w>' symbol (no phantom '' pairs)."""
    words = spark.createDataFrame(
        [("", 50), (None, 50), ("ab", 2)], "word string, cnt long"
    )
    got = [tuple(r) for r in bpe_merges(words, n_merges=2).collect()]
    # '' and NULL contribute no pairs at all: the only pairs come
    # from 'ab</w>' — phantom ('','') pairs would win at count 50
    assert got[0][1:3] == ("a", "b") and got[0][3] == 2


def _py_encode(doc_words: dict, word_cnt: dict, n_merges: int):
    """Reference: learn merges with _py_bpe's loop, apply to each doc."""
    merges = _py_bpe(word_cnt, n_merges)
    vocab = {}
    for w in word_cnt:
        syms = list(w) + [END_OF_WORD]
        for _, a, b, _pc in merges:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        vocab[w] = len(syms)
    return {
        d: (len(ws), sum(vocab[w] for w in ws)) for d, ws in doc_words.items()
    }


def test_encode_matches_reference(spark):
    texts = {
        1: "new lower newer lowest",
        2: "wider new new newer",
        3: "lower lower",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    from pdf_extraction_spark.operators.bpe import bpe_encode

    got = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in
           bpe_encode(docs, n_merges=6).collect()}
    wc = {}
    for t in texts.values():
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want = _py_encode({d: t.split() for d, t in texts.items()}, wc, 6)
    assert got == want
    # merging strictly reduces (or keeps) token counts vs chars+marker
    raw = {d: sum(len(w) + 1 for w in t.split()) for d, t in texts.items()}
    assert all(got[d][1] <= raw[d] for d in texts)


def test_encode_zero_merges_counts_chars_plus_marker(spark):
    from pdf_extraction_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame([(1, "ab cde")], "doc_id long, text string")
    r = bpe_encode(docs, n_merges=0).first()
    assert (r.n_words, r.n_bpe_tokens) == (2, 3 + 4)


def test_encode_degenerate_docs(spark):
    import duckdb

    from pdf_extraction_spark.operators.bpe import bpe_encode, sql_bpe_encode

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, SEP), (4, "ok ok.")],
        "doc_id long, text string",
    )
    got = sorted(tuple(r) for r in bpe_encode(docs, n_merges=3).collect())
    assert [g[0] for g in got] == [1, 2, 3, 4]
    assert got[0][1:] == (0, 0) and got[2][1:] == (0, 0)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for r in docs.collect():
        con.execute("INSERT INTO documents VALUES (?, ?)", [r.doc_id, r.text])
    orows = sorted(map(tuple, con.execute(sql_bpe_encode(3)).fetchall()))
    assert got == orows


def test_encode_survives_merge_exhaustion(spark):
    """Merges run dry before n_merges: the rewrite must become the
    identity, NOT annihilate the vocabulary (an empty winner frame
    cross-joined against the vocab zeroes every token count)."""
    import duckdb

    from pdf_extraction_spark.operators.bpe import bpe_encode, sql_bpe_encode

    docs = spark.createDataFrame([(1, "x x x")], "doc_id long, text string")
    # round 1 merges (x, </w>); round 2+ have no pairs left
    for n in (1, 2, 5):
        r = bpe_encode(docs, n_merges=n).first()
        assert (r.n_words, r.n_bpe_tokens) == (3, 3), f"n_merges={n}"
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR); "
                "INSERT INTO documents VALUES (1, 'x x x')")
    assert con.execute(sql_bpe_encode(5)).fetchall() == [(1, 3, 3)]
    # and the merge TABLE still stops early (no phantom sentinel rows)
    got = _spark_bpe(spark, {"x": 3}, 5)
    assert len(got) == 1
