"""Lexical retrieval + RAG chunking over the documents table.

``bm25_topk`` is the lexical complement to the embedding retrieval path
(reference simple_rag.py / complete_rag.py rank chunks by embedding
cosine; production RAG and training-data pipelines pair that with a
BM25/keyword leg). ``chunk_sliding_window`` is the sliding-window
chunker those pipelines feed the retriever with.

Scale shape (100 TB):
- tokenization is a native ``split`` + array HOFs — no Python, no
  shuffle;
- BM25 filters the token array to the query's terms *before* the
  explode, so the exploded row count is bounded by per-doc query-term
  occurrences, not document length;
- corpus statistics (N, avgdl) and per-term document frequencies are
  tiny aggregates attached via broadcast; the only wide exchange is the
  (doc_id, term) partial-aggregated groupBy;
- the final top-k is an ``orderBy().limit(k)`` → TakeOrderedAndProject
  (per-partition heaps + driver merge of k·P rows, never a global sort);
- the chunker is a pure narrow map (sequence → transform → explode).

Cross-engine determinism: tokens are ASCII runs ``[A-Za-z0-9]+`` split
from the RAW text and lowercased afterwards, so ``lower()`` only ever
sees ASCII and Java/ICU/DuckDB lowercasing agree byte-for-byte. The
per-document BM25 sum folds a term-ordered list (array_sort +
F.aggregate vs DuckDB list_reduce(list_prepend(0.0, list(... ORDER BY
term)))) so float addition order is pinned on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ASCII-run tokenizer: engine-safe (pure ASCII class — identical in
# Java regex and RE2), applied to the raw text so case folding happens
# on ASCII-only tokens afterwards.
_SPLIT_PATTERN = r"[^A-Za-z0-9]+"

BM25_K1 = 1.2
BM25_B = 0.75


def _tokens_col(text: Column, lowercase: bool) -> Column:
    toks = F.filter(F.split(text, _SPLIT_PATTERN), lambda x: x != F.lit(""))
    if lowercase:
        toks = F.transform(toks, lambda x: F.lower(x))
    return toks


def _sql_tokens(expr: str, lowercase: bool) -> str:
    base = (
        f"list_filter(regexp_split_to_array({expr}, '[^A-Za-z0-9]+'), "
        "x -> x <> '')"
    )
    return f"list_transform({base}, x -> lower(x))" if lowercase else base


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 (Robertson/Sparck-Jones idf with the +1 floor) top-k docs
    for a bag of query terms.

    Returns (doc_id, bm25) with bm25 rounded to 4 decimals; ordering is
    by the rounded score desc then doc_id, so ranking is reproducible
    across engines despite last-ulp ``ln`` differences.
    """
    terms = sorted({t.lower() for t in query_terms})
    terms_arr = F.array(*[F.lit(t) for t in terms])

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        _tokens_col(F.col(text_col), lowercase=True).alias("ts"),
    ).withColumn("dl", F.size("ts"))

    # N and avgdl: integer-exact sums → identical doubles on any engine
    stats = d.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    # prune to query-term hits BEFORE exploding — bounded fan-out
    tf = (
        d.select(
            "doc_id",
            "dl",
            F.explode(
                F.filter("ts", lambda x: F.array_contains(terms_arr, x))
            ).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    s = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    # term-ordered left fold pins float addition order cross-engine
    per_doc = (
        scored.select("doc_id", F.struct(F.col("term"), s.alias("s")).alias("ts_s"))
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("ts_s")),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("raw")
        )
    )
    return (
        per_doc.select("doc_id", F.round("raw", 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )


def sql_bm25_topk(
    table: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bm25_topk` (same tokenizer, same ordered
    float fold, same rounded-score ordering)."""
    terms = sorted({t.lower() for t in query_terms})
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    toks = _sql_tokens(text_col, lowercase=True)
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {toks} AS ts, len({toks}) AS dl
  FROM {table}
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
tf AS (
  SELECT doc_id, dl, u.term, count(*) AS tf
  FROM d, unnest(list_filter(ts, x -> list_contains([{tlist}], x))) AS u(term)
  GROUP BY doc_id, dl, u.term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * ({k1} + 1.0)
              / (tf + {k1} * ((1.0 - {b}) + {b} * dl / avgdl))) AS s
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
)
SELECT doc_id,
       round(list_reduce(list_prepend(0.0, list(s ORDER BY term)),
                         (acc, x) -> acc + x), 4) AS bm25
FROM scored
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {k}
"""


def chunk_sliding_window(
    docs: DataFrame,
    size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window RAG chunker: fixed ``size``-token windows with
    ``overlap`` tokens shared between consecutive chunks.

    Emits (doc_id, chunk_idx, n_tokens, chunk_text); the final chunk may
    be shorter. Token-less documents emit nothing. Pure narrow map —
    sequence → transform → explode, zero exchanges.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        _tokens_col(F.col(text_col), lowercase=False).alias("ts"),
    ).withColumn("dl", F.size("ts"))
    n_chunks = F.when(F.col("dl") <= size, F.lit(1)).otherwise(
        F.ceil((F.col("dl") - size) / F.lit(float(stride))).cast("int") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.slice(F.col("ts"), i * stride + 1, size).alias("ct"),
        ),
    )
    return (
        d.filter(F.col("dl") > 0)
        .select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.size("c.ct").alias("n_tokens"),
            F.array_join("c.ct", " ").alias("chunk_text"),
        )
    )


def sql_chunk_sliding_window(
    table: str,
    size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`chunk_sliding_window`."""
    stride = size - overlap
    toks = _sql_tokens(text_col, lowercase=False)
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {toks} AS ts, len({toks}) AS dl
  FROM {table}
  WHERE len({toks}) > 0
),
c AS (
  SELECT doc_id, ts,
         unnest(generate_series(
           0,
           CASE WHEN dl <= {size} THEN 0
                ELSE CAST(ceil((dl - {size}) / {float(stride)}) AS BIGINT)
           END)) AS chunk_idx
  FROM d
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(len(ts[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {size}]) AS INT)
         AS n_tokens,
       array_to_string(ts[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {size}], ' ')
         AS chunk_text
FROM c
"""


# ---------------------------------------------------------------------------
# exact phrase search (positional match)
# ---------------------------------------------------------------------------
#
# The capability BM25's bag-of-words scoring cannot express: find every
# occurrence of an ORDERED token run. Implemented as a per-doc window
# scan over the shared BM25 tokenizer's token array — an indexed filter
# over candidate start positions with O(m) lookups each — so the whole
# operator is one narrow codegen'd projection + the final explode:
# ZERO joins, zero shuffles, exact under overlaps ("a b a b" matches
# "a b" at 0 AND 2, where replace()-counting devices undercount).
#
# Scale note: this is the SCAN shape (cost O(corpus tokens), perfectly
# parallel). For repeated interactive phrase queries build the
# positional index once instead — the same explode keyed by (term,
# doc_id, pos) — and join; for one-off batch filtering (the curation
# use: kill every doc carrying a banned phrase) the scan IS the right
# shape, and a cheap `contains` prefilter on the rarest phrase word
# keeps the window scan off non-candidate docs without changing
# results (token equality implies substring presence).


def phrase_match(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, match_pos): one row per occurrence of ``phrase`` as a
    consecutive token run (0-based start index in the doc's token
    array; overlapping occurrences all reported). Tokenization is the
    shared BM25 alnum-lowercase tokenizer; docs without a match emit
    nothing."""
    m = len(phrase)
    if m < 1:
        raise ValueError("phrase must have at least one word")
    words = [w.lower() for w in phrase]
    if any(not w for w in words):
        raise ValueError("phrase words must be non-empty")
    # semantics-preserving prefilter: a doc whose token array contains
    # the longest phrase word must contain it as a substring of the
    # lowercased text (the tokenizer only ever splits, never rewrites)
    rare = max(words, key=len)
    staged = df.filter(
        F.contains(F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(rare))
    ).select(
        F.col(id_col).alias("doc_id"),
        _tokens_col(F.coalesce(F.col(text_col), F.lit("")), True).alias("__toks"),
    )
    conds = " AND ".join(
        f"get(__toks, i + {j}) = '{w}'" for j, w in enumerate(words)
    )
    starts = F.expr(
        f"CASE WHEN size(__toks) >= {m} THEN "
        f"filter(sequence(0, size(__toks) - {m}), i -> {conds}) "
        "ELSE array() END"
    )
    return staged.select("doc_id", F.explode(starts).alias("__p")).select(
        "doc_id", F.col("__p").cast("long").alias("match_pos")
    )


def sql_phrase_match(
    phrase: list[str],
    rel: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`phrase_match` — same tokenizer fragment,
    same window-scan recursion (no prefilter: it is semantics-free, so
    the twin skips it and the results must still agree)."""
    words = [w.lower() for w in phrase]
    m = len(words)
    toks = _sql_tokens(f"coalesce({text_expr}, '')", True)
    conds = " AND ".join(
        "toks[i + {}] = '{}'".format(j + 1, w.replace("'", "''"))
        for j, w in enumerate(words)
    )
    return (
        f"WITH t AS (SELECT {id_expr} AS doc_id, {toks} AS toks FROM {rel}), "
        "s AS (SELECT doc_id, CASE WHEN len(toks) >= "
        f"{m} THEN list_filter(generate_series(0, len(toks) - {m}), "
        f"i -> {conds}) ELSE CAST([] AS BIGINT[]) END AS starts FROM t) "
        "SELECT doc_id, CAST(u.p AS BIGINT) AS match_pos "
        "FROM s, unnest(starts) AS u(p)"
    )
