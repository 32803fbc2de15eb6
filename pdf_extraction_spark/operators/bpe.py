"""BPE vocabulary induction (Sennrich et al. 2016) — learn the top-k
byte-pair merges of a corpus, fully relationally.

Tokenizer training is the last leg of an LLM data pipeline (after
dedup/quality/selection/mixing/packing): the merge table IS the
tokenizer. The textbook algorithm is a driver-side loop over a Python
dict; this version keeps every step distributed and deterministic:

* **Word counts, not the corpus.** One scan tokenizes (the shared
  whitespace contract) and groups to (word, cnt) — every later round
  works on the VOCABULARY, which is orders smaller than the corpus and
  stays so at 100 TB (Heaps' law).
* **A merge round is two shuffles on the vocab.** Pair counts = one
  explode of adjacent symbol pairs weighted by word count + a groupBy
  sum (integer counts — exact, associative, bit-identical across
  engines and partitionings with a plain sum). The winning pair is a
  bounded top-1 (count DESC, then lexicographic a, b — total order, so
  ties cannot flip between engines or runs).
* **The rewrite is a left fold, not Python.** Each word's symbol array
  folds left-to-right into a SEP-delimited string: if the accumulator
  ends with SEP‖a and the next symbol equals b, append b (merging the
  pair); else append SEP‖symbol. Greedy non-overlapping semantics
  ("aaa" + merge(a,a) → [aa, a]) fall out of checking the POST-merge
  accumulator — the same IEEE-free pure-string recursion in Spark's
  ``aggregate`` and DuckDB's ``list_reduce`` (init via list_prepend).
* **The winning pair rides a 1-row broadcast** (crossJoin of a bounded
  frame), and each round's word frame is localCheckpoint()ed: the
  frame is read by both the next pair count and the next rewrite, so
  without the cut the logical plan doubles per round.

SEP is U+0001; it is stripped from words up front (identically in both
engines), so no symbol can ever contain the delimiter. The word-end
marker is the standard ``</w>`` symbol appended after the character
split. Everything is integers and strings — no float exists anywhere,
so cross-engine parity needs no rounding conventions at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import _lower_words as _tokens
from .curation import _sql_lower_words as _sql_tokens

SEP = "\x01"
END_OF_WORD = "</w>"


def _doc_tokens(df: DataFrame, text_col: str, id_col=None) -> DataFrame:
    """(doc_id, word): SEP-stripped, tokenized, lowercased — ONE home
    for the token stream so the vocabulary and doc sides cannot drift.
    The strip happens at TEXT level BEFORE lowercasing: SEP is not
    whitespace (the strip commutes with tokenization) but Java's
    lowercasing is context-sensitive (final sigma), so strip order
    must be identical everywhere a word is produced. explode_outer
    keeps token-less docs as a NULL-word row."""
    doc_id = F.col(id_col) if id_col is not None else F.lit(0)
    return df.select(
        doc_id.alias("doc_id"),
        F.explode_outer(
            _tokens(
                F.replace(
                    F.coalesce(F.col(text_col), F.lit("")),
                    F.lit(SEP),
                    F.lit(""),
                )
            )
        ).alias("word"),
    )


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): lowercased whitespace-token frequencies — the
    bounded frame every BPE round iterates on."""
    return word_counts_from_tokens(_doc_tokens(df, text_col))


def word_counts_from_tokens(toks: DataFrame) -> DataFrame:
    """Vocabulary from an existing (…, word) token frame — lets
    bpe_encode tokenize the corpus exactly once."""
    return (
        toks.filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _char_symbols(word) -> "F.Column":
    """word → [c1, c2, …, '</w>'] (codepoint split + word-end marker).

    NULL/empty words yield just ['</w>'] — F.sequence(1, 0) would step
    DOWN to [1, 0] and mint phantom '' symbols the DuckDB twin
    (generate_series(1, 0) = []) never sees, so the upper bound clamps
    at 1 and the out-of-range '' substr results are filtered."""
    w = F.coalesce(word, F.lit(""))
    chars = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(w), F.lit(1))),
            lambda i: F.substr(w, i, F.lit(1)),
        ),
        lambda c: c != F.lit(""),
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _adjacent_pairs(syms) -> "F.Column":
    """[(s_i, s_{i+1})] — slice-length clamps at 0 for 1-symbol words."""
    return F.transform(
        F.slice(syms, 1, F.greatest(F.size(syms) - F.lit(1), F.lit(0))),
        lambda s, i: F.struct(
            s.alias("a"), F.element_at(syms, i + F.lit(2)).alias("b")
        ),
    )


def _fold_merge(syms, a, b):
    """One merge rewrite: fold ``syms`` left-to-right into a
    SEP-delimited string, gluing (a, b) greedily, then re-split."""
    folded = F.aggregate(
        syms,
        F.lit(""),
        lambda acc, s: F.when(
            acc.endswith(F.concat(F.lit(SEP), a)) & (s == b),
            F.concat(acc, s),
        ).otherwise(F.concat(acc, F.lit(SEP), s)),
    )
    return F.slice(F.split(folded, SEP), 2, 2**30)


def _merge_chain(w: DataFrame, n_merges: int, carry: list, final_rewrite: bool):
    """Run the merge recursion over a frame with (cnt, syms, *carry)
    columns. Returns (per-step winner frames, final rewritten frame —
    or None when ``final_rewrite`` is False and the last dead rewrite
    is skipped).

    When the merges run DRY (no adjacent pair left anywhere), the raw
    winner frame is empty: the merge table correctly gains no row, but
    the rewrite must NOT cross-join the vocabulary against an empty
    frame (that would annihilate it — and zero every downstream token
    count). The rewrite therefore joins a padded winner: the real pair
    if one exists, else a ('', '') sentinel that can never match (no
    symbol is empty), making the rewrite the identity."""
    spark = w.sparkSession
    noop = spark.createDataFrame(
        [("", "", -1)], "a string, b string, pair_count bigint"
    )
    merges = []
    for step in range(1, n_merges + 1):
        pairs = (
            w.select("cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        # checkpoint the 1-row winner: it feeds the rewrite AND the
        # returned union — without the cut, collecting the merge table
        # re-runs every round's vocabulary-wide aggregation job
        best = (
            pairs.orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint()
        )
        merges.append(
            best.select(F.lit(step).alias("step"), "a", "b", "pair_count")
        )
        if step == n_merges and not final_rewrite:
            return merges, None  # the last rewrite has no reader
        # real pair counts are ≥ 1, so the -1 sentinel only wins when
        # the round ran dry
        rewrite_by = (
            best.unionAll(noop)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
        )
        w = w.crossJoin(F.broadcast(rewrite_by)).select(
            "cnt",
            _fold_merge(F.col("syms"), F.col("a"), F.col("b")).alias("syms"),
            *carry,
        )
        # read twice next round (pair count + rewrite): cut the lineage
        w = w.localCheckpoint()
    return merges, w


def bpe_merges(
    words: DataFrame,
    n_merges: int = 20,
    word_col: str = "word",
    cnt_col: str = "cnt",
) -> DataFrame:
    """(step, a, b, pair_count): the first ``n_merges`` BPE merges of
    the (word, cnt) vocabulary, most-frequent pair first. Stops early
    (fewer rows) when no pair remains. All arithmetic is integer and
    every tie has a total order, so the table is bit-identical across
    engines, runs, and cluster sizes."""
    spark = words.sparkSession
    empty = spark.createDataFrame(
        [], "step int, a string, b string, pair_count bigint"
    )
    if n_merges < 1:
        return empty
    w = words.select(
        F.col(cnt_col).alias("cnt"),
        _char_symbols(F.col(word_col)).alias("syms"),
    )
    merges, _ = _merge_chain(w, n_merges, carry=[], final_rewrite=False)
    out = empty
    for m in merges:
        out = out.unionAll(m)
    return out.orderBy("step")


def bpe_encode(
    df: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): tokenize every doc with the
    BPE vocabulary learned from the SAME corpus — the production
    token-counting op (mixture budgeting, packing, billing all key on
    learned-tokenizer counts, not whitespace counts).

    The merge chain runs once over the VOCABULARY carrying the word
    column; docs then join their words to the final (word → symbol
    count) table — a vocabulary-keyed broadcast-or-shuffle join, never
    a per-doc re-encode. The corpus is tokenized exactly ONCE (the
    vocabulary derives from the same cached token frame the docs join
    from, which also pins one strip/lowercase order for both sides).
    Empty/NULL docs survive with zero counts."""
    toks = _doc_tokens(df, text_col, id_col).persist()
    words = word_counts_from_tokens(toks)
    w = words.select(
        F.col("cnt").alias("cnt"),
        _char_symbols(F.col("word")).alias("syms"),
        "word",
    )
    if n_merges >= 1:
        _, w = _merge_chain(w, n_merges, carry=["word"], final_rewrite=True)
    vocab = w.select("word", F.size("syms").alias("n_sym"))
    joined = toks.join(vocab, "word", "left")
    return joined.groupBy("doc_id").agg(
        F.count("word").alias("n_words"),
        F.coalesce(F.sum("n_sym"), F.lit(0)).alias("n_bpe_tokens"),
    )


def sql_bpe_merges(
    n_merges: int = 20,
    text_expr: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of word_counts → :func:`bpe_merges`: the identical
    recursion unrolled one CTE trio per round (pair counts, top-1,
    fold rewrite), same SEP-string fold via list_reduce. The chained
    w/b CTEs are MATERIALIZED: each is referenced twice (next round's
    pair count + rewrite; the final union), and DuckDB inlines plain
    CTEs per reference — 2^n_merges scan subtrees otherwise (the exact
    analogue of the Spark side's per-round localCheckpoint)."""
    if n_merges < 1:
        return (
            "SELECT 0 AS step, '' AS a, '' AS b, "
            "CAST(0 AS BIGINT) AS pair_count WHERE FALSE"
        )
    parts = _sql_chain(n_merges, text_expr, table, carry_word=False,
                       final_rewrite=False)
    steps = " UNION ALL ".join(
        f"SELECT {i} AS step, a, b, CAST(pair_count AS BIGINT) AS pair_count "
        f"FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH " + ", ".join(parts) + " SELECT * FROM (" + steps + ") "
        "ORDER BY step"
    )


def _sql_chain(
    n_merges: int,
    text_expr: str,
    table: str,
    carry_word: bool,
    final_rewrite: bool,
) -> list:
    """Shared CTE builder for the merge recursion (see sql_bpe_merges
    docstring for why the chained CTEs are MATERIALIZED). The SEP strip
    happens at TEXT level before lowercasing — mirroring _doc_tokens —
    and each rewrite joins the PADDED winner bb{i} (sentinel ('','')
    when the round ran dry) so an exhausted merge table cannot
    annihilate the vocabulary."""
    tx = f"replace(coalesce({text_expr}, ''), chr(1), '')"
    word_sel = ", word" if carry_word else ""
    fold = (
        "string_split(list_reduce(list_prepend('', syms), (acc, s) -> "
        "CASE WHEN ends_with(acc, chr(1) || bb{i}.a) AND s = bb{i}.b "
        "THEN acc || s ELSE acc || chr(1) || s END), chr(1))[2:]"
    )
    parts = [
        f"toks AS (SELECT unnest({_sql_tokens(tx)}) AS word FROM {table})",
        "wc AS (SELECT word, count(*) AS cnt FROM toks "
        "WHERE word IS NOT NULL GROUP BY word)",
        "w0 AS MATERIALIZED (SELECT cnt, list_append(list_transform("
        "generate_series(1, length(word)), i -> substr(word, i, 1)), "
        f"'</w>') AS syms{word_sel} FROM wc)",
    ]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        parts.append(
            f"e{i} AS (SELECT cnt, syms, "
            f"unnest(generate_series(1, len(syms) - 1)) AS j FROM {prev})"
        )
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT syms[j] AS a, syms[j + 1] AS b, "
            f"sum(cnt) AS pair_count FROM e{i} GROUP BY syms[j], syms[j + 1])"
        )
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT a, b, pair_count FROM p{i} "
            "ORDER BY pair_count DESC, a, b LIMIT 1)"
        )
        if i < n_merges or final_rewrite:
            parts.append(
                f"bb{i} AS (SELECT a, b FROM (SELECT a, b, pair_count "
                f"FROM b{i} UNION ALL SELECT '', '', -1) "
                "ORDER BY pair_count DESC, a, b LIMIT 1)"
            )
            parts.append(
                f"w{i} AS MATERIALIZED (SELECT cnt, {fold.format(i=i)} "
                f"AS syms{word_sel} FROM {prev}, bb{i})"
            )
    return parts


def sql_bpe_encode(
    n_merges: int = 20,
    text_expr: str = "text",
    table: str = "documents",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bpe_encode`: the doc token CTE feeds BOTH
    the vocabulary (via the chain's wc) and the per-doc join — one
    tokenization, one strip/lowercase order, like the Spark side. Docs
    whose text is empty after the separator strip keep a zero-count
    row (explode_outer twin)."""
    tx = f"replace(coalesce({text_expr}, ''), chr(1), '')"
    n = max(n_merges, 0)
    parts = _sql_chain(n, text_expr, table, carry_word=True,
                       final_rewrite=True)
    # reroute the chain's word source through the doc-token frame so
    # the corpus tokenizes once (the chain's own toks CTE goes unused
    # for word counting)
    parts[0] = (
        f"dt AS (SELECT {id_expr} AS doc_id, {_sql_tokens(tx)} AS ws "
        f"FROM {table})"
    )
    parts[1] = (
        "dtok AS (SELECT doc_id, unnest(CASE WHEN len(ws) = 0 "
        "THEN [NULL] ELSE ws END) AS word FROM dt), "
        "wc AS (SELECT word, count(*) AS cnt FROM dtok "
        "WHERE word IS NOT NULL GROUP BY word)"
    )
    parts += [
        f"vocab AS (SELECT word, len(syms) AS n_sym FROM w{n})",
        "j AS (SELECT dtok.doc_id, dtok.word, vocab.n_sym "
        "FROM dtok LEFT JOIN vocab USING (word))",
    ]
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT doc_id, count(word) AS n_words, "
        "CAST(coalesce(sum(n_sym), 0) AS BIGINT) AS n_bpe_tokens "
        "FROM j GROUP BY doc_id"
    )
