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


# ---------------------------------------------------------------------------
# BM25F — field-weighted BM25 (Robertson, Zaragoza & Taylor, CIKM 2004)
# ---------------------------------------------------------------------------
#
# Web search never ranks on body text alone: title, URL and anchor
# fields carry disproportionate signal. BM25F is the published way to
# combine them WITHOUT the broken "sum of per-field BM25 scores"
# (which saturates each field separately and over-rewards a term that
# is mediocre everywhere). Instead term frequencies are combined
# FIRST — each field's tf is length-normalized by its own B_f =
# (1 − b_f) + b_f·dl_f/avgdl_f and weighted —
#     tfn(t, d) = Σ_f w_f · tf_f(t, d) / B_f(d)
# and saturation applies once to the combined frequency:
#     score(d)  = Σ_t idf(t) · tfn / (k1 + tfn)
# (the Zaragoza 2004 simplified form; idf is the engine's standard
# +1-floored Robertson/Sparck-Jones idf, df counted over "term appears
# in ANY field of the doc").
#
# Scale shape: per field one bounded explode (tokens filtered to the
# query's terms BEFORE exploding, the bm25_topk rule) + one
# (doc, term)-keyed combinable aggregate; field stats are 1-row
# broadcasts; top-k is TakeOrderedAndProject. Fields are a STATIC
# config list, so the per-(doc, term) combination is one fixed-order
# float expression — no fold needed — and the per-doc sum reuses the
# term-ordered fold device; scores are bit-identical cross-engine.


def bm25f_topk(
    docs: DataFrame,
    query_terms: list[str],
    fields: list[tuple[str, float, float]],
    k: int = 10,
    k1: float = BM25_K1,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25F top-k over ``fields`` = [(text_col, weight, b), ...].
    Returns (doc_id, bm25f) with the score rounded to 4 decimals,
    ordered by (score desc, doc_id)."""
    if not fields:
        raise ValueError("need at least one field")
    terms = sorted({t.lower() for t in query_terms})
    terms_arr = F.array(*[F.lit(t) for t in terms])

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        *[
            _tokens_col(F.coalesce(F.col(c), F.lit("")), lowercase=True).alias(
                f"ts_{i}"
            )
            for i, (c, _, _) in enumerate(fields)
        ],
    )
    for i in range(len(fields)):
        d = d.withColumn(f"dl_{i}", F.size(f"ts_{i}"))
    stats = d.agg(
        F.count("*").alias("n_docs"),
        *[F.avg(f"dl_{i}").alias(f"avgdl_{i}") for i in range(len(fields))],
    )

    # one bounded explode per field, tagged; combinable count
    tfs = None
    for i in range(len(fields)):
        t = (
            d.select(
                "doc_id",
                *[F.col(f"dl_{j}") for j in range(len(fields))],
                F.explode(
                    F.filter(f"ts_{i}", lambda x: F.array_contains(terms_arr, x))
                ).alias("term"),
            )
            .groupBy("doc_id", "term", *[f"dl_{j}" for j in range(len(fields))])
            .agg(F.count("*").alias("tf"))
            .select(
                "doc_id",
                "term",
                *[f"dl_{j}" for j in range(len(fields))],
                F.lit(i).alias("fld"),
                "tf",
            )
        )
        tfs = t if tfs is None else tfs.unionByName(t)
    wide = tfs.groupBy(
        "doc_id", "term", *[f"dl_{j}" for j in range(len(fields))]
    ).agg(
        *[
            F.sum(F.when(F.col("fld") == i, F.col("tf")).otherwise(0)).alias(
                f"tf_{i}"
            )
            for i in range(len(fields))
        ]
    )
    dfreq = wide.groupBy("term").agg(F.count("*").alias("df"))

    scored = wide.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    tfn = None
    for i, (_, w, b) in enumerate(fields):
        bf = F.lit(1.0 - b) + F.lit(b) * F.col(f"dl_{i}") / F.col(f"avgdl_{i}")
        contrib = F.lit(w) * F.col(f"tf_{i}") / bf
        tfn = contrib if tfn is None else tfn + contrib
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    s = idf * tfn / (F.lit(k1) + tfn)
    per_doc = (
        scored.select(
            "doc_id", F.struct(F.col("term"), s.alias("s")).alias("ts_s")
        )
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
        per_doc.select("doc_id", F.round("raw", 4).alias("bm25f"))
        .orderBy(F.desc("bm25f"), "doc_id")
        .limit(k)
    )


def sql_bm25f_topk(
    table: str,
    query_terms: list[str],
    fields: list[tuple[str, float, float]],
    k: int = 10,
    k1: float = BM25_K1,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bm25f_topk` — same tokenizer, same
    fixed-order field combination, same term-ordered fold."""
    if not fields:
        raise ValueError("need at least one field")
    terms = sorted({t.lower() for t in query_terms})
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    n = len(fields)
    ts = [
        _sql_tokens(f"coalesce({c}, '')", lowercase=True)
        for (c, _, _) in fields
    ]
    d_cols = ", ".join(
        f"{ts[i]} AS ts_{i}, len({ts[i]}) AS dl_{i}" for i in range(n)
    )
    stat_cols = ", ".join(f"avg(dl_{i}) AS avgdl_{i}" for i in range(n))
    tf_legs = " UNION ALL ".join(
        f"SELECT doc_id, u.term, "
        + ", ".join(f"dl_{j}" for j in range(n))
        + f", {i} AS fld, count(*) AS tf "
        f"FROM d, unnest(list_filter(ts_{i}, x -> list_contains([{tlist}], x))) AS u(term) "
        "GROUP BY ALL"
        for i in range(n)
    )
    wide_cols = ", ".join(
        f"sum(CASE WHEN fld = {i} THEN tf ELSE 0 END) AS tf_{i}"
        for i in range(n)
    )
    tfn = " + ".join(
        f"({w!r} * tf_{i} / ((1.0 - {b!r}) + {b!r} * dl_{i} / avgdl_{i}))"
        for i, (_, w, b) in enumerate(fields)
    )
    return f"""
WITH d AS (SELECT {id_col} AS doc_id, {d_cols} FROM {table}),
stats AS (SELECT count(*) AS n_docs, {stat_cols} FROM d),
tfs AS ({tf_legs}),
wide AS (SELECT doc_id, term, {", ".join(f"dl_{j}" for j in range(n))},
                {wide_cols}
         FROM tfs GROUP BY ALL),
dfreq AS (SELECT term, count(*) AS df FROM wide GROUP BY term),
scored AS (
  SELECT wide.doc_id, wide.term,
         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * ({tfn}) / ({k1!r} + ({tfn})) AS s
  FROM wide JOIN dfreq USING (term) CROSS JOIN stats
)
SELECT doc_id,
       round(list_reduce(list_prepend(0.0, list(s ORDER BY term)),
                         (acc, x) -> acc + x), 4) AS bm25f
FROM scored
GROUP BY doc_id
ORDER BY bm25f DESC, doc_id
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing (Zhai & Lafferty,
# SIGIR 2001 "A study of smoothing methods for language models applied
# to ad hoc information retrieval")
# ---------------------------------------------------------------------------
#
# The language-modeling leg of the retrieval stack (BM25 = probabilistic,
# embedding cosine = dense, this = LM): rank by p(q | θ_d) with the
# document LM Dirichlet-smoothed against the corpus LM,
#     p(t | θ_d) = (tf(t,d) + μ·p(t|C)) / (dl + μ).
# Scored in the standard rank-equivalent decomposition (Zhai eq. 6),
# which only touches matching (doc, term) pairs plus one per-doc length
# term:
#     score(d) = Σ_{t ∈ q∩d} ln(1 + tf / (μ·p(t|C)))
#              + n_q · ln(μ / (dl + μ))
# (n_q = query terms that exist in the corpus; an OOV query term adds
# the same -∞ mass to every document, so it is dropped — documented).
#
# Scale shape: identical to bm25_topk — bounded explode on query-term
# hits, (doc, term)-keyed combinable tf, corpus stats via 1-row
# broadcast joins, term-ordered float fold, TakeOrderedAndProject.
# Every document gets the length term (a narrow projection over the
# corpus — smoothing mass ranks even no-hit docs, the LM-retrieval
# contract).

QLM_MU = 2000.0


def qlm_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    mu: float = QLM_MU,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dirichlet query-likelihood top-k: (doc_id, n_hit, qlm) with the
    score rounded to 4 decimals, ordered by (qlm desc, doc_id)."""
    terms = sorted({t.lower() for t in query_terms})
    terms_arr = F.array(*[F.lit(t) for t in terms])

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        _tokens_col(F.coalesce(F.col(text_col), F.lit("")), lowercase=True).alias(
            "ts"
        ),
    ).withColumn("dl", F.size("ts"))

    all_toks = d.select("doc_id", F.explode("ts").alias("term"))
    corpus = all_toks.agg(F.count("*").alias("c_len"))
    cf = (
        all_toks.filter(F.array_contains(terms_arr, F.col("term")))
        .groupBy("term")
        .agg(F.count("*").alias("cf"))
    )

    tf = (
        d.select(
            "doc_id",
            F.explode(
                F.filter("ts", lambda x: F.array_contains(terms_arr, x))
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # ln(1 + tf / (mu * cf / c_len)) per matching pair; cf > 0 by
    # construction (the term occurred somewhere to be a hit)
    hit = tf.join(F.broadcast(cf), "term").crossJoin(F.broadcast(corpus))
    s = F.log(
        F.lit(1.0)
        + F.col("tf")
        / (F.lit(mu) * F.col("cf") / F.col("c_len"))
    )
    per_doc = (
        hit.select(
            "doc_id",
            F.struct(F.col("term"), s.alias("s")).alias("ts_s"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hit"),
            F.aggregate(
                F.array_sort(F.collect_list("ts_s")),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("hit_sum"),
        )
    )
    n_q = cf.agg(F.count("*").alias("n_q"))
    scored = (
        d.select("doc_id", "dl")
        .join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(n_q))
        .select(
            "doc_id",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            (
                F.coalesce(F.col("hit_sum"), F.lit(0.0))
                + F.col("n_q")
                * F.log(F.lit(mu) / (F.col("dl") + F.lit(mu)))
            ).alias("raw"),
        )
    )
    return (
        scored.select("doc_id", "n_hit", F.round("raw", 4).alias("qlm"))
        .orderBy(F.desc("qlm"), "doc_id")
        .limit(k)
    )


def sql_qlm_topk(
    table: str,
    query_terms: list[str],
    k: int = 10,
    mu: float = QLM_MU,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`qlm_topk`."""
    terms = sorted({t.lower() for t in query_terms})
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    toks = _sql_tokens(f"coalesce({text_col}, '')", lowercase=True)
    return f"""
WITH d AS (SELECT {id_col} AS doc_id, {toks} AS ts,
                  len({toks}) AS dl FROM {table}),
at AS (SELECT doc_id, unnest(ts) AS term FROM d),
corpus AS (SELECT count(*) AS c_len FROM at),
cf AS (SELECT term, count(*) AS cf FROM at
       WHERE list_contains([{tlist}], term) GROUP BY term),
tf AS (SELECT doc_id, u.term, count(*) AS tf
       FROM d, unnest(list_filter(ts, x -> list_contains([{tlist}], x))) AS u(term)
       GROUP BY doc_id, u.term),
hit AS (SELECT tf.doc_id, tf.term,
               ln(1.0 + tf / ({mu!r} * cf / c_len)) AS s
        FROM tf JOIN cf USING (term) CROSS JOIN corpus),
per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit,
                   list_reduce(list_prepend(0.0, list(s ORDER BY term)),
                               (acc, x) -> acc + x) AS hit_sum
            FROM hit GROUP BY doc_id),
nq AS (SELECT count(*) AS n_q FROM cf)
SELECT d.doc_id,
       CAST(coalesce(per_doc.n_hit, 0) AS BIGINT) AS n_hit,
       round(coalesce(per_doc.hit_sum, 0.0)
             + n_q * ln({mu!r} / (d.dl + {mu!r})), 4) AS qlm
FROM d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
CROSS JOIN nq
ORDER BY qlm DESC, d.doc_id
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback (Rocchio 1971; RM3-style weighted expansion)
# ---------------------------------------------------------------------------
#
# The classic two-pass retrieval improvement: run the query, assume the
# top-k_fb documents are relevant, mine their most distinctive terms,
# and re-score with the expanded weighted query. Expansion terms are
# ranked by the feedback set's TF-IDF (tf within the feedback docs ×
# the CORPUS idf — the engine's integer doc_keyterms device, so
# selection is exact int64 with (score desc, term asc) ties); original
# terms keep weight 1.0, expansion terms get ``beta`` (Rocchio's β,
# RM3's interpolation). The second pass is BM25 with per-term weights —
# the one structural delta from bm25_topk is that the query is a
# bounded FRAME (original ∪ expansion), joined broadcast instead of
# inlined as literals, so the expanded query never routes through the
# driver.
#
# Scale shape: pass 1 = bm25_topk (its pinned shape); term mining =
# one semi-join of the token stream against the k_fb-row top frame +
# vocabulary-keyed idf join + ONE feedback-vocabulary-sized window for
# the top-m cut; pass 2 = bm25's bounded-explode shape with a
# broadcast ≤(|q|+m)-row term frame. No driver round-trip between the
# passes — the whole thing is one lazy plan.

PRF_BETA = 0.5


def rocchio_bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k_fb: int = 5,
    m_exp: int = 5,
    beta: float = PRF_BETA,
    min_df: int = 2,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PRF-expanded BM25 top-k. Returns (doc_id, n_terms, bm25) —
    ``n_terms`` = expanded-query terms the doc matched; score = Σ over
    matched terms of weight·BM25(term), rounded to 4 decimals."""
    orig = sorted({t.lower() for t in query_terms})
    orig_arr = F.array(*[F.lit(t) for t in orig])

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        _tokens_col(F.coalesce(F.col(text_col), F.lit("")), lowercase=True).alias(
            "ts"
        ),
    ).withColumn("dl", F.size("ts"))
    d = d.persist()  # both passes + stats read it (released with the cache)
    stats = d.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))

    fb = bm25_topk(docs, orig, k=k_fb, k1=k1, b=b, id_col=id_col,
                   text_col=text_col).select("doc_id")

    # distinctive terms of the feedback set: tf within fb × corpus idf
    all_tf = (
        d.select("doc_id", F.explode("ts").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    ).persist()
    dfreq = all_tf.groupBy("term").agg(F.count("*").alias("df"))
    iln = lambda c: F.round(F.log(c.cast("double")) * F.lit(1e9)).cast("long")
    fb_terms = (
        all_tf.join(F.broadcast(fb), "doc_id")
        .groupBy("term")
        .agg(F.sum("tf").alias("fb_tf"))
        .join(dfreq.filter(F.col("df") >= min_df), "term")
        .filter(~F.array_contains(orig_arr, F.col("term")))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term",
            (F.col("fb_tf") * (iln(F.col("n_docs")) - iln(F.col("df")))).alias(
                "score_nano"
            ),
        )
        .orderBy(F.desc("score_nano"), "term")
        .limit(m_exp)
    )
    terms2 = fb_terms.select(
        "term", F.lit(float(beta)).alias("wt")
    ).unionByName(
        docs.sparkSession.createDataFrame(
            [(t,) for t in orig], "term string"
        ).select("term", F.lit(1.0).alias("wt"))
    )

    # pass 2: BM25 over the expanded weighted term frame
    tf2 = (
        d.select("doc_id", "dl", F.explode("ts").alias("term"))
        .join(F.broadcast(terms2), "term")
        .groupBy("doc_id", "dl", "term", "wt")
        .agg(F.count("*").alias("tf"))
    )
    dfreq2 = tf2.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf2.join(F.broadcast(dfreq2), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    s = (
        F.col("wt")
        * idf
        * (
            F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            )
        )
    )
    per_doc = (
        scored.select(
            "doc_id", F.struct(F.col("term"), s.alias("s")).alias("ts_s")
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.aggregate(
                F.array_sort(F.collect_list("ts_s")),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("raw"),
        )
    )
    return (
        per_doc.select("doc_id", "n_terms", F.round("raw", 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )


def sql_rocchio_bm25_topk(
    table: str,
    query_terms: list[str],
    k: int = 10,
    k_fb: int = 5,
    m_exp: int = 5,
    beta: float = PRF_BETA,
    min_df: int = 2,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`rocchio_bm25_topk`."""
    orig = sorted({t.lower() for t in query_terms})
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in orig)
    olist = " UNION ALL ".join(
        f"SELECT '" + t.replace("'", "''") + "' AS term, 1.0 AS wt"
        for t in orig
    )
    pass1 = sql_bm25_topk(
        table, orig, k=k_fb, k1=k1, b=b, id_col=id_col, text_col=text_col
    )
    toks = _sql_tokens(f"coalesce({text_col}, '')", lowercase=True)
    iln = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1e9) AS BIGINT)"
    return f"""
WITH d AS (SELECT {id_col} AS doc_id, {toks} AS ts,
                  len({toks}) AS dl FROM {table}),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
fb AS (SELECT doc_id FROM ({pass1})),
all_tf AS (SELECT doc_id, u.term, count(*) AS tf
           FROM d, unnest(ts) AS u(term) GROUP BY doc_id, u.term),
dfreq AS (SELECT term, count(*) AS df FROM all_tf GROUP BY term),
fb_terms AS (
  SELECT term,
         CAST(sum(tf) AS BIGINT)
           * ({iln.format(x="any_value(n_docs)")} - {iln.format(x="any_value(df)")})
           AS score_nano
  FROM all_tf
  JOIN fb USING (doc_id)
  JOIN dfreq USING (term)
  CROSS JOIN stats
  WHERE df >= {min_df} AND NOT list_contains([{tlist}], term)
  GROUP BY term
  ORDER BY score_nano DESC, term
  LIMIT {m_exp}),
terms2 AS (SELECT term, {float(beta)!r} AS wt FROM fb_terms
           UNION ALL {olist}),
tf2 AS (SELECT doc_id, dl, u.term, any_value(wt) AS wt, count(*) AS tf
        FROM d, unnest(ts) AS u(term)
        JOIN terms2 ON u.term = terms2.term
        GROUP BY doc_id, dl, u.term),
dfreq2 AS (SELECT term, count(*) AS df FROM tf2 GROUP BY term),
scored AS (
  SELECT tf2.doc_id, tf2.term,
         wt * ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            * (tf * ({k1!r} + 1.0)
               / (tf + {k1!r} * ((1.0 - {b!r}) + {b!r} * dl / avgdl))) AS s
  FROM tf2 JOIN dfreq2 USING (term) CROSS JOIN stats
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       round(list_reduce(list_prepend(0.0, list(s ORDER BY term)),
                         (acc, x) -> acc + x), 4) AS bm25
FROM scored
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# query-biased snippets (Tombros & Sanderson, SIGIR 1998; the Luhn-1958
# significant-window lineage)
# ---------------------------------------------------------------------------
#
# The display leg of the retrieval family: given query terms, pick the
# fixed-width token window with the most query-term hits in each
# document — the result-page snippet / RAG context-passage selector.
#
# All-integer: hits are 0/1, the window score is an int sum over a
# RANGE window keyed by token position (partition = document — the
# lm_score doc-bounded contract), the best window is picked by the
# exact struct order (hits DESC, start ASC), and the snippet text is
# rebuilt from the stored token array by position — no float anywhere,
# bit-identical cross-engine.
#
# Scale shape: one doc-keyed explode + two doc-bounded windows + one
# doc-keyed self-join to rebuild the winning window's text. Nothing
# corpus-wide; fan-out is token count, same as every tokenizing op.


def snippet_best_window(
    docs: DataFrame,
    query_terms: list[str],
    window: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, start_pos, n_hits, snippet): each matching document's
    best ``window``-token snippet by query-term hit count (ties to the
    earliest window); 0-hit documents emit nothing. Token positions are
    0-based over the shared BM25 tokenizer."""
    from pyspark.sql import Window as W

    terms = sorted({t.lower() for t in query_terms})
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            _tokens_col(F.coalesce(F.col(text_col), F.lit("")), True)
        ).alias("pos", "tok"),
    )
    scored = toks.withColumn(
        "hit", F.col("tok").isin(*terms).cast("long")
    ).withColumn(
        "sc",
        F.sum("hit").over(
            W.partitionBy("doc_id")
            .orderBy("pos")
            .rangeBetween(W.currentRow, window - 1)
        ),
    )
    best = (
        scored.groupBy("doc_id")
        .agg(
            F.max(
                F.struct(F.col("sc"), (-F.col("pos")).alias("negpos"))
            ).alias("b")
        )
        .select(
            "doc_id",
            (-F.col("b.negpos")).alias("start_pos"),
            F.col("b.sc").alias("n_hits"),
        )
        .filter(F.col("n_hits") >= 1)
    )
    return (
        toks.join(best, "doc_id")
        .filter(
            (F.col("pos") >= F.col("start_pos"))
            & (F.col("pos") < F.col("start_pos") + window)
        )
        .groupBy("doc_id", "start_pos", "n_hits")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("snippet")
        )
    )


def sql_snippet_best_window(
    rel: str = "documents",
    query_terms: list[str] | None = None,
    window: int = 12,
    text_expr: str = "text",
) -> str:
    """DuckDB twin of :func:`snippet_best_window` — identical
    tokenizer, RANGE window sum, (hits DESC, start ASC) pick and
    position-ordered rebuild."""
    terms = sorted({t.lower() for t in (query_terms or [])})
    inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    toks = _sql_tokens(f"coalesce({text_expr}, '')", True)
    return (
        f"WITH t AS (SELECT doc_id, {toks} AS toks FROM {rel}), "
        "tk AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok FROM ("
        "SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i "
        "FROM t)), "
        f"sc AS (SELECT doc_id, pos, tok, "
        f"CAST(sum(CASE WHEN tok IN ({inlist}) THEN 1 ELSE 0 END) OVER ("
        "PARTITION BY doc_id ORDER BY pos RANGE BETWEEN CURRENT ROW AND "
        f"{window - 1} FOLLOWING) AS BIGINT) AS sc FROM tk), "
        "best AS (SELECT doc_id, pos AS start_pos, sc AS n_hits FROM ("
        "SELECT doc_id, pos, sc, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY sc DESC, pos ASC) AS rn FROM sc) WHERE rn = 1 AND sc >= 1) "
        "SELECT best.doc_id, best.start_pos, best.n_hits, "
        "string_agg(tk.tok, ' ' ORDER BY tk.pos) AS snippet "
        "FROM best JOIN tk ON best.doc_id = tk.doc_id "
        f"AND tk.pos >= best.start_pos AND tk.pos < best.start_pos + {window} "
        "GROUP BY best.doc_id, best.start_pos, best.n_hits"
    )
