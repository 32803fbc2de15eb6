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


# ---------------------------------------------------------------------------
# Tokenizer fertility (per-group compression report)
# ---------------------------------------------------------------------------
# Fertility — learned-tokenizer tokens per word — is the standard
# tokenizer-evaluation metric (and the per-source compression report
# every mixture budget is priced in): a source whose fertility is 2×
# the corpus mean costs 2× the training tokens per word of content.
# Both ratios are reported in fixed-point per-mille via integer
# division of exact integer sums, so the whole table is bit-identical
# across engines, partitionings and cluster sizes — no float exists.
#
# Scale shape: ONE tokenization of the corpus (the persisted token
# frame feeds the vocabulary AND the per-group sums — same contract as
# bpe_encode), the merge chain runs over the VOCABULARY (orders smaller
# than the corpus, Heaps' law), the final join is vocabulary-keyed, and
# the output is bounded by the number of groups. count(DISTINCT doc_id)
# is the only two-phase agg, and it is keyed by (group, doc) — skew
# bounded by docs-per-group, never corpus-wide.


def bpe_fertility(
    df: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """(group, n_docs, n_words, n_chars, n_bpe_tokens, fertility_milli,
    chars_per_token_milli): per-group tokenizer fertility under the BPE
    vocabulary learned from the WHOLE corpus (train once, price every
    slice — the production shape; a per-group vocabulary would hide
    exactly the cross-source variance the report exists to show).

    fertility_milli = 1000·tokens ÷ words (integer division);
    chars_per_token_milli = 1000·chars ÷ tokens. Groups whose docs hold
    no tokens keep their row with zero counts and NULL ratios."""
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        F.explode_outer(
            _tokens(
                F.replace(
                    F.coalesce(F.col(text_col), F.lit("")),
                    F.lit(SEP),
                    F.lit(""),
                )
            )
        ).alias("word"),
    ).persist()
    words = word_counts_from_tokens(toks)
    w = words.select(
        F.col("cnt").alias("cnt"),
        _char_symbols(F.col("word")).alias("syms"),
        "word",
    )
    if n_merges >= 1:
        _, w = _merge_chain(w, n_merges, carry=["word"], final_rewrite=True)
    vocab = w.select("word", F.size("syms").alias("n_sym"))
    agg = (
        toks.join(vocab, "word", "left")
        .groupBy("grp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("word").alias("n_words"),
            F.coalesce(F.sum(F.length("word")), F.lit(0)).alias("n_chars"),
            F.coalesce(F.sum("n_sym"), F.lit(0)).alias("n_bpe_tokens"),
        )
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_words",
        "n_chars",
        "n_bpe_tokens",
        F.when(
            F.col("n_words") > 0,
            F.expr("(1000 * n_bpe_tokens) div n_words"),
        ).alias("fertility_milli"),
        F.when(
            F.col("n_bpe_tokens") > 0,
            F.expr("(1000 * n_chars) div n_bpe_tokens"),
        ).alias("chars_per_token_milli"),
    )


def sql_bpe_fertility(
    n_merges: int = 20,
    text_expr: str = "text",
    table: str = "documents",
    id_expr: str = "doc_id",
    group_expr: str = "source",
) -> str:
    """DuckDB twin of :func:`bpe_fertility`: same single doc-token CTE
    feeding vocabulary and per-group sums, same integer `div`
    (DuckDB `//` truncates like Spark `div` on these non-negative
    values), same NULL rules (count(word) skips the explode_outer NULL
    row; ratios NULL on zero denominators)."""
    tx = f"replace(coalesce({text_expr}, ''), chr(1), '')"
    n = max(n_merges, 0)
    parts = _sql_chain(n, text_expr, table, carry_word=True,
                       final_rewrite=True)
    parts[0] = (
        f"dt AS (SELECT {group_expr} AS grp, {id_expr} AS doc_id, "
        f"{_sql_tokens(tx)} AS ws FROM {table})"
    )
    parts[1] = (
        "dtok AS (SELECT grp, doc_id, unnest(CASE WHEN len(ws) = 0 "
        "THEN [NULL] ELSE ws END) AS word FROM dt), "
        "wc AS (SELECT word, count(*) AS cnt FROM dtok "
        "WHERE word IS NOT NULL GROUP BY word)"
    )
    parts += [
        f"vocab AS (SELECT word, len(syms) AS n_sym FROM w{n})",
        "j AS (SELECT dtok.grp, dtok.doc_id, dtok.word, "
        "length(dtok.word) AS wlen, vocab.n_sym "
        "FROM dtok LEFT JOIN vocab USING (word))",
        "a AS (SELECT grp, count(DISTINCT doc_id) AS n_docs, "
        "count(word) AS n_words, "
        "CAST(coalesce(sum(wlen), 0) AS BIGINT) AS n_chars, "
        "CAST(coalesce(sum(n_sym), 0) AS BIGINT) AS n_bpe_tokens "
        "FROM j GROUP BY grp)",
    ]
    return (
        "WITH " + ", ".join(parts) + " "
        f"SELECT grp AS {group_expr}, n_docs, n_words, n_chars, "
        "n_bpe_tokens, "
        "CASE WHEN n_words > 0 THEN (1000 * n_bpe_tokens) // n_words "
        "END AS fertility_milli, "
        "CASE WHEN n_bpe_tokens > 0 THEN (1000 * n_chars) // n_bpe_tokens "
        "END AS chars_per_token_milli "
        "FROM a"
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth curve
# ---------------------------------------------------------------------------
# How fast the open vocabulary grows with corpus size (Heaps 1978) is
# THE sizing input for tokenizer planning: it says how big a word-level
# vocabulary would have to be — i.e. why subword tokenization exists —
# and whether a crawl slice is template spam (flat curve) or diverse
# text (power-law growth). The standard estimator reads distinct-type
# counts at increasing prefixes of a RANDOM document permutation; here
# the permutation is the deterministic md5 order, bucketed so the curve
# has n_buckets points:
#
# * bucket(doc) = md5(doc_id‖salt) first-8-hex % n_buckets — with
#   n_buckets a power of two, 16^8 % n_buckets == 0, so the bucket is
#   EXACTLY uniform (the bloom_sketch argument) and identical in both
#   engines (the pack_sequences shard device).
# * a type is "new at bucket b" iff min(bucket over its occurrences)
#   == b — one word-keyed groupBy, the only corpus-scale shuffle.
# * the curve = running sums over the n_buckets-row frame — the window
#   runs over the SKETCH, never the corpus (hist_quantiles precedent).
#
# Everything is integer counts: bit-identical across engines,
# partitionings and cluster sizes.


def vocab_growth(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    salt: str = "heaps",
) -> DataFrame:
    """(bucket, n_tokens, new_types, cum_tokens, cum_types): vocabulary
    growth over an md5-deterministic document permutation. Buckets with
    no tokens at all are absent (identically in both engines)."""
    if n_buckets < 1 or (n_buckets & (n_buckets - 1)) != 0 or n_buckets > 2**32:
        raise ValueError("n_buckets must be a power of two <= 2^32")
    from pyspark.sql import Window

    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    toks = df.select(
        bucket.alias("bucket"),
        F.explode(
            _tokens(
                F.replace(
                    F.coalesce(F.col(text_col), F.lit("")),
                    F.lit(SEP),
                    F.lit(""),
                )
            )
        ).alias("word"),
    )
    tok_b = toks.groupBy("bucket").agg(F.count("*").alias("n_tokens"))
    first_b = (
        toks.groupBy("word")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("new_types"))
    )
    j = (
        tok_b.join(first_b, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
    )
    # the running sum's frame is the n_buckets-row curve, not the corpus
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return j.select(
        "bucket",
        "n_tokens",
        "new_types",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        F.sum("new_types").over(w).alias("cum_types"),
    )


def sql_vocab_growth(
    text_expr: str = "text",
    table: str = "documents",
    id_expr: str = "doc_id",
    n_buckets: int = 64,
    salt: str = "heaps",
) -> str:
    """DuckDB twin of :func:`vocab_growth` — same md5 bucket expression
    (the _sql_md5_bucket device), same tokenization, same running sums
    (HUGEINT window sums cast back to BIGINT, the pack_sequences
    precedent)."""
    tx = f"replace(coalesce({text_expr}, ''), chr(1), '')"
    bucket = (
        f"(CAST('0x' || substr(md5(CAST({id_expr} AS VARCHAR) || '{salt}'), "
        f"1, 8) AS BIGINT) % {n_buckets})"
    )
    return (
        f"WITH toks AS (SELECT {bucket} AS bucket, "
        f"unnest({_sql_tokens(tx)}) AS word FROM {table}), "
        "tb AS (SELECT bucket, count(*) AS n_tokens FROM toks "
        "GROUP BY bucket), "
        "fb AS (SELECT bucket, count(*) AS new_types FROM "
        "(SELECT word, min(bucket) AS bucket FROM toks GROUP BY word) "
        "GROUP BY bucket), "
        "j AS (SELECT coalesce(tb.bucket, fb.bucket) AS bucket, "
        "coalesce(tb.n_tokens, 0) AS n_tokens, "
        "coalesce(fb.new_types, 0) AS new_types "
        "FROM tb FULL JOIN fb ON tb.bucket = fb.bucket) "
        "SELECT bucket, n_tokens, new_types, "
        "CAST(sum(n_tokens) OVER (ORDER BY bucket "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens, "
        "CAST(sum(new_types) OVER (ORDER BY bucket "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types "
        "FROM j"
    )
