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


# -- bpe_fertility -----------------------------------------------------------


def _fert_expected(texts_by_source: dict, n_merges: int):
    """Pure-Python replay: global vocabulary, per-source integer sums."""
    wc, per_src = {}, {}
    for src, texts in texts_by_source.items():
        for t in texts:
            for w in t.split():
                wc[w] = wc.get(w, 0) + 1
    merges = _py_bpe(wc, n_merges)
    vocab = {}
    for w in wc:
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
    for src, texts in texts_by_source.items():
        words = [w for t in texts for w in t.split()]
        nw = len(words)
        nc = sum(len(w) for w in words)
        nt = sum(vocab[w] for w in words)
        per_src[src] = (
            len(texts), nw, nc, nt,
            (1000 * nt) // nw if nw else None,
            (1000 * nc) // nt if nt else None,
        )
    return per_src


def test_fertility_matches_reference(spark):
    texts = {
        "news": ["new lower newer lowest", "wider new new newer"],
        "web": ["lower lower", "new new new new"],
    }
    rows = [
        (i, t, s)
        for i, (s, t) in enumerate(
            (s, t) for s, ts in texts.items() for t in ts
        )
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from pdf_extraction_spark.operators.bpe import bpe_fertility

    got = {
        r.source: (r.n_docs, r.n_words, r.n_chars, r.n_bpe_tokens,
                   r.fertility_milli, r.chars_per_token_milli)
        for r in bpe_fertility(docs, n_merges=6).collect()
    }
    assert got == _fert_expected(texts, 6)


def test_fertility_shares_one_global_vocabulary(spark):
    """The vocabulary is corpus-trained: identical text costs identical
    tokens in every source, even when one source dominates training."""
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha beta", "big")] * 1
        + [(i, "alpha beta alpha beta", "big") for i in range(2, 10)]
        + [(10, "alpha beta alpha beta", "tiny")],
        "doc_id long, text string, source string",
    )
    from pdf_extraction_spark.operators.bpe import bpe_fertility

    rows = {r.source: r for r in bpe_fertility(docs, n_merges=4).collect()}
    assert rows["big"].fertility_milli == rows["tiny"].fertility_milli
    assert rows["tiny"].n_docs == 1 and rows["big"].n_docs == 9


def test_fertility_degenerate_groups_match_twin(spark):
    import duckdb

    from pdf_extraction_spark.operators.bpe import (
        bpe_fertility,
        sql_bpe_fertility,
    )

    docs = spark.createDataFrame(
        [(1, None, "empty"), (2, "", "empty"), (3, SEP, "empty"),
         (4, "ok ok.", None), (5, "real text here", "web")],
        "doc_id long, text string, source string",
    )
    got = sorted(
        (tuple(r) for r in bpe_fertility(docs, n_merges=3).collect()),
        key=lambda t: (t[0] is None, t[0]),
    )
    by_src = {t[0]: t for t in got}
    # token-less group keeps its row: 3 docs, zero counts, NULL ratios
    assert by_src["empty"] == ("empty", 3, 0, 0, 0, None, None)
    assert by_src[None][1] == 1  # NULL source is a real group
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    for r in docs.collect():
        con.execute("INSERT INTO documents VALUES (?, ?, ?)",
                    [r.doc_id, r.text, r.source])
    orows = sorted(
        map(tuple, con.execute(sql_bpe_fertility(3)).fetchall()),
        key=lambda t: (t[0] is None, t[0]),
    )
    assert got == orows


# -- vocab_growth ------------------------------------------------------------


def test_vocab_growth_invariants(spark):
    docs = spark.createDataFrame(
        [(i, f"common w{i % 7} unique{i}") for i in range(200)],
        "doc_id long, text string",
    )
    from pdf_extraction_spark.operators.bpe import vocab_growth

    rows = vocab_growth(docs, n_buckets=16).orderBy("bucket").collect()
    assert [r.bucket for r in rows] == sorted({r.bucket for r in rows})
    # final cumulative points equal the exact corpus totals
    assert rows[-1].cum_tokens == 200 * 3
    assert rows[-1].cum_types == 1 + 7 + 200  # common, w0..w6, unique*
    # running sums are consistent and monotone
    ct = cy = 0
    for r in rows:
        ct += r.n_tokens
        cy += r.new_types
        assert (r.cum_tokens, r.cum_types) == (ct, cy)
    # growth curve is concave-ish: later buckets add fewer NEW types
    # than tokens (the Heaps shape on this vocabulary)
    assert rows[-1].new_types < rows[-1].n_tokens


def test_vocab_growth_partition_invariance(spark):
    docs = spark.createDataFrame(
        [(i, f"a b c tok{i % 11}") for i in range(100)],
        "doc_id long, text string",
    )
    from pdf_extraction_spark.operators.bpe import vocab_growth

    one = [tuple(r) for r in
           vocab_growth(docs.repartition(1), n_buckets=8).orderBy("bucket").collect()]
    many = [tuple(r) for r in
            vocab_growth(docs.repartition(13), n_buckets=8).orderBy("bucket").collect()]
    assert one == many


def test_vocab_growth_rejects_non_power_of_two(spark):
    import pytest as _pytest

    from pdf_extraction_spark.operators.bpe import vocab_growth

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        vocab_growth(docs, n_buckets=48)


def test_vocab_growth_degenerate_docs_match_twin(spark):
    import duckdb

    from pdf_extraction_spark.operators.bpe import (
        sql_vocab_growth,
        vocab_growth,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, SEP), (4, "solo words here"),
         (5, "solo again")],
        "doc_id long, text string",
    )
    got = [tuple(r) for r in
           vocab_growth(docs, n_buckets=4).orderBy("bucket").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for r in docs.collect():
        con.execute("INSERT INTO documents VALUES (?, ?)", [r.doc_id, r.text])
    orows = [tuple(r) for r in con.execute(
        sql_vocab_growth(n_buckets=4) + " ORDER BY bucket").fetchall()]
    assert got == orows
