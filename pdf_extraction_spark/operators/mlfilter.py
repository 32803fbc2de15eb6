"""Model-based curation filters: hashed linear quality classifier and
bigram stupid-backoff LM scoring — the two standard "learned" web-corpus
filters (CCNet / LLaMA-style fasttext quality gate; KenLM-style fluency
gate), re-expressed as pure relational plans.

Spark-first design notes
------------------------
* **Scoring is exploded-join-aggregate, not a UDF.** A hashed
  bag-of-words linear model is `Σ w[h(tok)] / n_tokens + b`: explode
  tokens, map each to its hash bucket, broadcast-join the (tiny) weight
  table, one groupBy(doc) sum. Everything stays in whole-stage codegen;
  at 10^12 docs the explode is linear and the weight join is
  broadcast — no shuffle beyond the per-doc aggregation.
* **The hash bucket is an md5 *prefix string*, not an integer.** Both
  engines produce identical lowercase-hex `md5()`, so
  ``substr(md5(tok), 1, 3)`` is a 4096-bucket hash whose key needs no
  hex→int arithmetic and is bit-identical in Spark and DuckDB (the same
  device the line-dedup family uses for its 128-bit keys).
* **Training is the kmeans_lite pattern** (similarity.py): featurize
  distributedly, collect a *bounded* sample to the driver, fit with a
  deterministic pure-numpy loop, broadcast the weights back as a small
  DataFrame. At 100 TB the sample stays bounded (`sample_size`), the
  featurization cost is the corpus scan you were doing anyway.
* **The LM is trained relationally.** Unigram/bigram counts are two
  groupBys over the exploded token stream; scoring joins each document
  bigram against the count tables (shuffle join keyed on the bigram —
  bounded by vocabulary, not corpus size) and averages log-probs per
  doc. Stupid backoff (Brants et al. 2007): no normalization, score
  S(w2|w1) = B(w1,w2)/U(w1), else alpha * U(w2)/N.

Tokenization is the explicit Java ASCII whitespace class
(kernels.wsre.JAVA_WS_SPLIT) on both sides, lowercased — the same
contract as the n-gram dedup family.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


HASH_PREFIX_LEN = 3  # 3 hex chars -> 4096 buckets
LM_ALPHA = 0.4  # stupid-backoff discount
LM_FLOOR = 1e-9  # unseen-unigram floor so log() is total


# tokenization IS the n-gram dedup family's — imported, not re-spelled,
# so a future whitespace-class fix cannot desynchronize the two families
from .curation import _lower_words as _tokens
from .curation import _sql_lower_words as _sql_tokens


def bucket_col(tok: Column, prefix_len: int = HASH_PREFIX_LEN) -> Column:
    """Hash bucket of a token: first ``prefix_len`` hex chars of md5."""
    return F.substring(F.md5(tok), 1, prefix_len)


def sql_bucket(tok_expr: str, prefix_len: int = HASH_PREFIX_LEN) -> str:
    return f"substr(md5({tok_expr}), 1, {prefix_len})"


# ---------------------------------------------------------------------------
# hashed linear quality classifier
# ---------------------------------------------------------------------------

def doc_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = HASH_PREFIX_LEN,
    gram_fn=None,
) -> DataFrame:
    """(doc_id, bucket, cnt, n_tokens): the sparse hashed bag-of-words.
    One explode + one groupBy; at web scale this shuffles (doc, bucket)
    pairs — bounded by tokens, and the per-doc token total rides along
    via a window-free max() (every row of a doc carries it).

    ``gram_fn`` optionally maps the token array to the unit stream that
    is hashed (e.g. DSIR's unigram+bigram grams); default: the tokens
    themselves. ONE home for the featurize shape — explode_outer keeps
    gram-less docs as a (doc, NULL bucket, 0) row in every family."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        _tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("toks"),
    )
    units = gram_fn(F.col("toks")) if gram_fn is not None else F.col("toks")
    exploded = toks.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.explode_outer(units).alias("tok"),
    )
    return (
        exploded.withColumn("bucket", bucket_col(F.col("tok"), prefix_len))
        .groupBy("doc_id", "bucket")
        .agg(F.count("tok").alias("cnt"), F.max("n_tokens").alias("n_tokens"))
    )


def train_quality_weights(
    spark: SparkSession,
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    prefix_len: int = HASH_PREFIX_LEN,
    sample_size: int = 8192,
    lr: float = 0.5,
    n_iter: int = 200,
    seed: int = 7,
) -> tuple[DataFrame, float]:
    """Fit logistic weights over hashed mean-of-counts features.

    Distributed featurization → bounded driver-side sample → pure-numpy
    full-batch gradient descent (deterministic: fixed seed, fixed
    iteration count, no shuffling). Returns (weights_df(bucket, w),
    bias). At 100 TB pass a sampled ``labeled`` frame; the collect is
    capped at ``sample_size`` docs regardless.

    Exact-duplicate texts are collapsed to ONE training doc first
    (conflicting labels resolve to the max, i.e. positive wins) — the
    doc key is a text hash, so without the collapse a duplicated text
    would merge its bucket counts and then fan back out through the
    label join, silently inflating its features ~4× and making the
    ordered sample cut nondeterministic."""
    tagged = (
        labeled.select(
            F.col(text_col).alias("text"),
            F.col(label_col).cast("double").alias("y"),
        )
        .groupBy("text")
        .agg(F.max("y").alias("y"))
        .withColumn("doc_id", F.xxhash64(F.col("text")))
    )
    feats = doc_bucket_counts(tagged, "text", "doc_id", prefix_len)
    sample = (
        feats.join(tagged.select("doc_id", "y"), "doc_id")
        .groupBy("doc_id", "y")
        .agg(F.collect_list(F.struct("bucket", "cnt", "n_tokens")).alias("fs"))
        # orderBy before limit: a bare limit is plan-dependent — the
        # trained weights must not change across runs/cluster sizes
        .orderBy("doc_id")
        .limit(sample_size)
        .collect()
    )
    dim = 16 ** prefix_len
    X = np.zeros((len(sample), dim))
    y = np.zeros(len(sample))
    for i, row in enumerate(sample):
        y[i] = row.y
        for f in row.fs:
            if f.bucket is not None and f.n_tokens:
                X[i, int(f.bucket, 16)] += f.cnt / f.n_tokens
    rng = np.random.RandomState(seed)
    w = rng.normal(0.0, 0.01, dim)
    b = 0.0
    for _ in range(n_iter):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g) / len(y)
        b -= lr * float(g.mean())
    hexfmt = "%0" + str(prefix_len) + "x"
    rows = [(hexfmt % i, round(float(w[i]), 6)) for i in range(dim) if w[i] != 0.0]
    weights = spark.createDataFrame(rows, "bucket string, w double")
    return weights, round(float(b), 6)


def _ordered_fold_sum(terms_sorted: Column) -> Column:
    """Fold-left sum over an already-ordered double array. Double
    addition is not associative: a plain ``sum()`` over grouped rows is
    engine-order-dependent and flips the 6th decimal between Spark and
    DuckDB. A left fold over a deterministically-ordered term list is
    the same IEEE sequence everywhere (the twin folds with
    ``list_reduce`` over a ``list(... ORDER BY ...)``)."""
    return F.aggregate(terms_sorted, F.lit(0.0), lambda acc, x: acc + x)


def score_quality(
    df: DataFrame,
    weights: DataFrame,
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = HASH_PREFIX_LEN,
) -> DataFrame:
    """(doc_id, logit, prob): logit = b + Σ w[bucket]·cnt / n_tokens.
    Weight table broadcast; the per-doc sum is a bucket-ordered left
    fold (see :func:`_ordered_fold_sum`) so the result is bit-stable
    across engines, runs, and cluster sizes; probabilities rounded to
    6 digits (exp() last-ulp drift across engines is below that).
    Per-doc state is bounded by the bucket space (16^prefix_len)."""
    feats = doc_bucket_counts(df, text_col, id_col, prefix_len)
    # ONE pass over feats: a left join against the broadcast weights,
    # then a single per-doc aggregation producing both the token total
    # and the matched term list (collect_list drops the NULL entries of
    # unmatched buckets) — consuming feats from two aggregations would
    # run the corpus-sized explode+shuffle twice
    term = F.when(
        F.col("w").isNotNull(),
        F.struct("bucket", (F.col("cnt") * F.col("w")).alias("t")),
    )
    per_doc = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.array_sort(F.collect_list(term)).alias("terms"),
        )
    )
    scored = per_doc.select(
        "doc_id",
        (
            F.lit(bias)
            + F.coalesce(
                _ordered_fold_sum(F.transform("terms", lambda s: s["t"]))
                / F.nullif(F.col("n_tokens"), F.lit(0)),
                F.lit(0.0),
            )
        ).alias("raw"),
    )
    return scored.select(
        "doc_id",
        F.round("raw", 6).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("raw"))), 6).alias("prob"),
    )


def sql_score_quality(
    weights_values: str,
    bias: float,
    text_expr: str = "text",
    prefix_len: int = HASH_PREFIX_LEN,
) -> str:
    """DuckDB twin of :func:`score_quality` over the ``documents`` view.
    ``weights_values`` is an inline relation literal ``(VALUES ...) AS
    w(bucket, w)``."""
    tx = f"coalesce({text_expr}, '')"
    return (
        f"WITH t AS (SELECT doc_id, {_sql_tokens(tx)} AS toks FROM documents), "
        "e AS (SELECT doc_id, len(toks) AS n_tokens, unnest("
        "CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END) AS tok FROM t), "
        f"f AS (SELECT doc_id, {sql_bucket('tok', prefix_len)} AS bucket, "
        "count(tok) AS cnt, max(n_tokens) AS n_tokens FROM e GROUP BY doc_id, bucket), "
        # one pass like the Spark side: left join + a single per-doc
        # aggregation; bucket-ordered left fold == _ordered_fold_sum
        "m AS (SELECT f.doc_id, max(f.n_tokens) AS n_tokens, "
        "list_reduce(list_prepend(0.0, coalesce("
        "list(f.cnt * w.w ORDER BY f.bucket) FILTER (WHERE w.w IS NOT NULL), [])), "
        "(a, b) -> a + b) AS wsum "
        f"FROM f LEFT JOIN {weights_values} ON f.bucket = w.bucket GROUP BY f.doc_id), "
        f"s AS (SELECT doc_id, {bias} + coalesce(wsum / nullif(n_tokens, 0), 0.0) AS raw "
        "FROM m) "
        "SELECT doc_id, round(raw, 6) AS logit, "
        "round(1.0 / (1.0 + exp(-raw)), 6) AS prob FROM s"
    )


# ---------------------------------------------------------------------------
# bigram stupid-backoff LM scoring
# ---------------------------------------------------------------------------

def _positioned_tokens(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        _tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("toks"),
    )
    return toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )


def _with_prev(pt: DataFrame) -> DataFrame:
    """Attach the previous token per (doc, pos) with one window shuffle
    keyed on doc_id — documents are length-bounded, so no skew; a
    self-join on (doc_id, pos-1) would shuffle the stream twice."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    return pt.withColumn("prev", F.lag("tok").over(w))


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> dict:
    """Unigram + bigram count tables over the corpus — two groupBys on
    the exploded token stream. Returns {'uni': DF(tok, u_cnt),
    'bi': DF(prev, tok, b_cnt), 'total': long}. Count tables are
    vocabulary-sized, not corpus-sized; at 100 TB they are still
    join-able (shuffle keyed on token / token-pair), never collected."""
    pt = _positioned_tokens(df, text_col, id_col)
    uni = pt.groupBy("tok").agg(F.count("*").alias("u_cnt"))
    bi = (
        _with_prev(pt)
        .filter(F.col("prev").isNotNull())
        .groupBy("prev", "tok")
        .agg(F.count("*").alias("b_cnt"))
    )
    total = pt.count()
    return {"uni": uni, "bi": bi, "total": total}


def score_bigram_lm(
    df: DataFrame,
    lm: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = LM_ALPHA,
) -> DataFrame:
    """(doc_id, n_scored, avg_logprob): mean log10 stupid-backoff
    probability over positions ≥ 1 (position 0 scores its unigram).
    Shuffle joins on token / (prev, tok) keys — vocabulary-keyed, with
    the usual AQE skew handling for stop-word-heavy keys."""
    total = float(lm["total"])
    pairs = _with_prev(_positioned_tokens(df, text_col, id_col))
    # no broadcast hints: count tables are vocabulary-sized and can be
    # large on a real web corpus — AQE picks broadcast when they fit
    joined = (
        pairs.join(
            lm["uni"]
            .withColumnRenamed("tok", "prev")
            .withColumnRenamed("u_cnt", "prev_cnt"),
            "prev",
            "left",
        )
        .join(lm["uni"], "tok", "left")
        .join(lm["bi"], ["prev", "tok"], "left")
    )
    uni_p = F.coalesce(F.col("u_cnt").cast("double") / F.lit(total), F.lit(LM_FLOOR))
    prob = F.when(
        F.col("b_cnt").isNotNull() & F.col("prev_cnt").isNotNull(),
        F.col("b_cnt").cast("double") / F.col("prev_cnt").cast("double"),
    ).otherwise(
        F.when(F.col("prev").isNotNull(), F.lit(alpha) * uni_p).otherwise(uni_p)
    )
    # position-ordered fold, not avg(): float addition order must be
    # identical across engines/runs (see _ordered_fold_sum)
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_scored"),
            F.array_sort(
                F.collect_list(F.struct("pos", F.log10(prob).alias("lp")))
            ).alias("terms"),
        )
        .select(
            "doc_id",
            "n_scored",
            F.round(
                _ordered_fold_sum(F.transform("terms", lambda s: s["lp"]))
                / F.col("n_scored"),
                6,
            ).alias("avg_logprob"),
        )
    )


def sql_score_bigram_lm(
    text_expr: str = "text", alpha: float = LM_ALPHA
) -> str:
    """DuckDB twin: same count tables, same backoff, same log10/round.
    Note the broadcast hints above are physical-only — the logical plan
    here is identical."""
    tx = f"coalesce({text_expr}, '')"
    return (
        f"WITH t AS (SELECT doc_id, {_sql_tokens(tx)} AS toks FROM documents), "
        "pt AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok FROM ("
        "SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t)), "
        "uni AS (SELECT tok, count(*) AS u_cnt FROM pt GROUP BY tok), "
        "tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM pt), "
        "bi AS (SELECT a.tok AS prev, b.tok AS nxt, count(*) AS b_cnt "
        "FROM pt a JOIN pt b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
        "GROUP BY a.tok, b.tok), "
        "pairs AS (SELECT c.doc_id, c.pos, c.tok, p.tok AS prev "
        "FROM pt c LEFT JOIN pt p ON c.doc_id = p.doc_id AND p.pos = c.pos - 1), "
        "j AS (SELECT pr.doc_id, pr.pos, "
        "CASE WHEN bi.b_cnt IS NOT NULL AND up.u_cnt IS NOT NULL "
        "THEN CAST(bi.b_cnt AS DOUBLE) / up.u_cnt "
        f"WHEN pr.prev IS NOT NULL THEN {alpha} * coalesce(uc.u_cnt / tot.n, {LM_FLOOR}) "
        f"ELSE coalesce(uc.u_cnt / tot.n, {LM_FLOOR}) END AS prob "
        "FROM pairs pr "
        "LEFT JOIN uni up ON pr.prev = up.tok "
        "LEFT JOIN uni uc ON pr.tok = uc.tok "
        "LEFT JOIN bi ON pr.prev = bi.prev AND pr.tok = bi.nxt "
        "CROSS JOIN tot) "
        # position-ordered fold mirrors Spark's _ordered_fold_sum
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored, "
        "round(list_reduce(list_prepend(0.0, list(log10(prob) ORDER BY pos)), "
        "(a, b) -> a + b) / count(*), 6) AS avg_logprob FROM j GROUP BY doc_id"
    )


def _with_prev12(pt: DataFrame) -> DataFrame:
    """Attach the previous TWO tokens per (doc, pos) in ONE doc-keyed
    window shuffle (lag(1) and lag(2) share the frame) — the trigram
    sibling of :func:`_with_prev`."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    return pt.withColumn("prev", F.lag("tok", 1).over(w)).withColumn(
        "prev2", F.lag("tok", 2).over(w)
    )


def train_trigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> dict:
    """Unigram + bigram + trigram count tables — the Stupid Backoff
    estimation step of Brants et al. 2007 ("Large Language Models in
    Machine Translation" §3), THE published web-scale LM recipe: raw
    relative frequencies, no smoothing normalization, so estimation is
    nothing but distributed counting. Three map-side-combinable
    groupBys on the token stream; tables are vocabulary-/n-gram-keyed
    (≪ corpus at any scale that matters) and stay distributed — never
    collected, joined by key downstream."""
    pt = _positioned_tokens(df, text_col, id_col)
    wp = _with_prev12(pt)
    uni = pt.groupBy("tok").agg(F.count("*").alias("u_cnt"))
    bi = (
        wp.filter(F.col("prev").isNotNull())
        .groupBy("prev", "tok")
        .agg(F.count("*").alias("b_cnt"))
    )
    tri = (
        wp.filter(F.col("prev2").isNotNull())
        .groupBy("prev2", "prev", "tok")
        .agg(F.count("*").alias("t_cnt"))
    )
    total = pt.count()
    return {"uni": uni, "bi": bi, "tri": tri, "total": total}


def score_stupid_backoff(
    df: DataFrame,
    lm: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = LM_ALPHA,
) -> DataFrame:
    """(doc_id, n_scored, avg_logprob): mean log10 Stupid Backoff score
    (Brants et al. 2007 §3) per position —

      S(w|u,v) = f(uvw)/f(uv)      when the trigram was seen,
               = α·S(w|v)          otherwise,
      S(w|v)   = f(vw)/f(v)        when the bigram was seen,
               = α·S(w)            otherwise,
      S(w)     = f(w)/N            (floor for OOV)

    with α = 0.4 (the paper's value). Positions 0/1 score their
    unigram/bigram chains directly (no backoff penalty — there is no
    longer context to back off FROM). Probabilities are ratios of
    int64 counts (correctly-rounded doubles, bit-identical
    cross-engine); the per-doc sum is the position-ordered fold shared
    with the bigram scorer. Scale shape: the scored stream joins the
    count tables on token-tuple keys — vocabulary-keyed shuffles with
    AQE handling stop-word skew; no broadcast hints (the tables are
    corpus-derived and unbounded)."""
    total = float(lm["total"])
    alpha2 = alpha * alpha  # one Python double, shared with the twin
    pairs = _with_prev12(_positioned_tokens(df, text_col, id_col))
    ctx = (
        lm["bi"]
        .withColumnRenamed("prev", "prev2")
        .withColumnRenamed("tok", "prev")
        .withColumnRenamed("b_cnt", "ctx_cnt")
    )
    joined = (
        pairs.join(
            lm["uni"]
            .withColumnRenamed("tok", "prev")
            .withColumnRenamed("u_cnt", "prev_cnt"),
            "prev",
            "left",
        )
        .join(lm["uni"], "tok", "left")
        .join(lm["bi"], ["prev", "tok"], "left")
        .join(ctx, ["prev2", "prev"], "left")
        .join(lm["tri"], ["prev2", "prev", "tok"], "left")
    )
    uni_p = F.coalesce(F.col("u_cnt").cast("double") / F.lit(total), F.lit(LM_FLOOR))
    bi_p = F.col("b_cnt").cast("double") / F.col("prev_cnt").cast("double")
    has_bi = F.col("b_cnt").isNotNull() & F.col("prev_cnt").isNotNull()
    prob = (
        F.when(
            F.col("t_cnt").isNotNull() & F.col("ctx_cnt").isNotNull(),
            F.col("t_cnt").cast("double") / F.col("ctx_cnt").cast("double"),
        )
        .when(F.col("prev2").isNotNull() & has_bi, F.lit(alpha) * bi_p)
        .when(F.col("prev2").isNotNull(), F.lit(alpha2) * uni_p)
        .when(has_bi, bi_p)
        .when(F.col("prev").isNotNull(), F.lit(alpha) * uni_p)
        .otherwise(uni_p)
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_scored"),
            F.array_sort(
                F.collect_list(F.struct("pos", F.log10(prob).alias("lp")))
            ).alias("terms"),
        )
        .select(
            "doc_id",
            "n_scored",
            F.round(
                _ordered_fold_sum(F.transform("terms", lambda s: s["lp"]))
                / F.col("n_scored"),
                6,
            ).alias("avg_logprob"),
        )
    )


def sql_score_stupid_backoff(
    text_expr: str = "text", alpha: float = LM_ALPHA
) -> str:
    """DuckDB twin of :func:`score_stupid_backoff` — same count tables
    (self-joins at pos+1/pos+2), same backoff CASE ladder with the
    identical Python-formatted α/α² literals, same ordered fold."""
    tx = f"coalesce({text_expr}, '')"
    alpha2 = alpha * alpha
    return (
        f"WITH t AS (SELECT doc_id, {_sql_tokens(tx)} AS toks FROM documents), "
        "pt AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok FROM ("
        "SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t)), "
        "uni AS (SELECT tok, count(*) AS u_cnt FROM pt GROUP BY tok), "
        "tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM pt), "
        "bi AS (SELECT a.tok AS prev, b.tok AS nxt, count(*) AS b_cnt "
        "FROM pt a JOIN pt b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
        "GROUP BY a.tok, b.tok), "
        "tri AS (SELECT a.tok AS p2, b.tok AS prev, c.tok AS nxt, "
        "count(*) AS t_cnt "
        "FROM pt a JOIN pt b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
        "JOIN pt c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2 "
        "GROUP BY a.tok, b.tok, c.tok), "
        "pairs AS (SELECT c.doc_id, c.pos, c.tok, p.tok AS prev, p2.tok AS prev2 "
        "FROM pt c "
        "LEFT JOIN pt p ON c.doc_id = p.doc_id AND p.pos = c.pos - 1 "
        "LEFT JOIN pt p2 ON c.doc_id = p2.doc_id AND p2.pos = c.pos - 2), "
        "j AS (SELECT pr.doc_id, pr.pos, "
        "CASE "
        "WHEN tri.t_cnt IS NOT NULL AND cx.b_cnt IS NOT NULL "
        "THEN CAST(tri.t_cnt AS DOUBLE) / cx.b_cnt "
        "WHEN pr.prev2 IS NOT NULL AND bi.b_cnt IS NOT NULL "
        "AND up.u_cnt IS NOT NULL "
        f"THEN {alpha} * (CAST(bi.b_cnt AS DOUBLE) / up.u_cnt) "
        "WHEN pr.prev2 IS NOT NULL "
        f"THEN {alpha2} * coalesce(uc.u_cnt / tot.n, {LM_FLOOR}) "
        "WHEN bi.b_cnt IS NOT NULL AND up.u_cnt IS NOT NULL "
        "THEN CAST(bi.b_cnt AS DOUBLE) / up.u_cnt "
        f"WHEN pr.prev IS NOT NULL "
        f"THEN {alpha} * coalesce(uc.u_cnt / tot.n, {LM_FLOOR}) "
        f"ELSE coalesce(uc.u_cnt / tot.n, {LM_FLOOR}) END AS prob "
        "FROM pairs pr "
        "LEFT JOIN uni up ON pr.prev = up.tok "
        "LEFT JOIN uni uc ON pr.tok = uc.tok "
        "LEFT JOIN bi ON pr.prev = bi.prev AND pr.tok = bi.nxt "
        "LEFT JOIN bi cx ON pr.prev2 = cx.prev AND pr.prev = cx.nxt "
        "LEFT JOIN tri ON pr.prev2 = tri.p2 AND pr.prev = tri.prev "
        "AND pr.tok = tri.nxt "
        "CROSS JOIN tot) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored, "
        "round(list_reduce(list_prepend(0.0, list(log10(prob) ORDER BY pos)), "
        "(a, b) -> a + b) / count(*), 6) AS avg_logprob FROM j GROUP BY doc_id"
    )


def ppl_bucket_cutoffs(
    scored: DataFrame,
    score_col: str = "avg_logprob",
    group_col: str = "lang",
) -> DataFrame:
    """Per-group head/middle cutoff scores for CCNet-style perplexity
    bucketing (Wenzek et al. 2020 §4.4): split each language's score
    distribution into thirds.

    The cutoffs are DISCRETE quantiles — actual score values at ranks
    ceil(n/3) and ceil(2n/3) of the descending score order — not
    interpolated percentiles, so there is no float-interpolation
    convention to match cross-engine: the cutoff is one of the round-6
    scores whose bit-parity the lm_score twin already proves.

    Shape: the cumulative rank runs over the per-(group, score)
    HISTOGRAM (CCNet's own device), not the corpus — scores are round-6
    per-doc means, so the histogram is orders smaller than the corpus
    and the per-group window partition is bounded by distinct-score
    count. At 10^12 docs coarsen further by rounding the score before
    bucketing, or sample the histogram the way CCNet samples its
    training corpus; returns 2 values per group either way.
    """
    from pyspark.sql import Window

    # group totals come from the histogram itself (sum of counts over
    # the same window partition) — no second corpus scan, and NULL
    # groups need no join to find their total (window partitioning
    # groups NULLs together in both engines)
    hist = scored.groupBy(group_col, score_col).agg(F.count("*").alias("cnt"))
    j = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy(group_col).orderBy(F.desc(score_col))
        ),
    ).withColumn("n", F.sum("cnt").over(Window.partitionBy(group_col)))
    k1 = ((F.col("n") + F.lit(2)) / 3).cast("long")        # ceil(n/3)
    k2 = ((F.lit(2) * F.col("n") + F.lit(2)) / 3).cast("long")  # ceil(2n/3)
    return j.groupBy(group_col).agg(
        F.max(F.when(F.col("cum") >= k1, F.col(score_col))).alias("c1"),
        F.max(F.when(F.col("cum") >= k2, F.col(score_col))).alias("c2"),
    )


def bucket_by_lm_score(
    scored: DataFrame,
    score_col: str = "avg_logprob",
    group_col: str = "lang",
    cache: bool = True,
) -> DataFrame:
    """CCNet perplexity bucketing: label each doc head / middle / tail
    by where its LM score falls in its language's tercile cutoffs
    (higher avg_logprob = more fluent = head). Ties at a cutoff all land
    in the better bucket — the standard discrete-quantile tie rule, so
    buckets can exceed n/3 exactly when a score mass point straddles the
    boundary (deterministic in both engines).

    Docs with a NULL group (unidentified language) bucket among
    themselves — the cutoff lookup is null-safe, so no row silently
    disappears from the output.

    The cutoff table is 2 values per language — broadcast, so bucketing
    itself is a narrow map over the scored frame. ``cache``: the scored
    frame feeds both the cutoff histogram and the final join; caching
    stops the (often expensive — e.g. the whole LM-score pipeline)
    upstream from executing twice. Same hygiene contract as
    similarity.semantic_dedup."""
    if cache:
        scored = scored.persist()
    cuts = ppl_bucket_cutoffs(scored, score_col, group_col).withColumnRenamed(
        group_col, "__grp"
    )
    return scored.join(
        F.broadcast(cuts), F.col(group_col).eqNullSafe(F.col("__grp"))
    ).select(
        *[c for c in scored.columns],
        F.when(F.col(score_col) >= F.col("c1"), F.lit("head"))
        .when(F.col(score_col) >= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def sql_ppl_buckets(
    text_expr: str = "text", alpha: float = LM_ALPHA
) -> str:
    """DuckDB twin of lm-score → per-language discrete-tercile
    bucketing: same histogram/cumulative-rank cutoffs, same >= tie rule
    over the bit-parity round-6 scores."""
    return (
        "WITH scored AS (" + sql_score_bigram_lm(text_expr, alpha) + "), "
        "sl AS (SELECT s.doc_id, d.lang, s.avg_logprob "
        "FROM scored s JOIN documents d USING (doc_id)), "
        "hist AS (SELECT lang, avg_logprob AS s, count(*) AS cnt "
        "FROM sl GROUP BY lang, avg_logprob), "
        # group total via a window over the histogram — mirrors Spark:
        # no second corpus scan, NULL langs need no (null-unsafe) join
        "cum AS (SELECT lang, s, sum(cnt) OVER ("
        "PARTITION BY lang ORDER BY s DESC) AS cum, "
        "sum(cnt) OVER (PARTITION BY lang) AS n FROM hist), "
        "cuts AS (SELECT lang, "
        "max(CASE WHEN cum >= CAST(floor((n + 2) / 3) AS BIGINT) THEN s END) AS c1, "
        "max(CASE WHEN cum >= CAST(floor((2 * n + 2) / 3) AS BIGINT) THEN s END) AS c2 "
        "FROM cum GROUP BY lang) "
        "SELECT sl.doc_id, sl.lang, sl.avg_logprob, "
        "CASE WHEN sl.avg_logprob >= cuts.c1 THEN 'head' "
        "WHEN sl.avg_logprob >= cuts.c2 THEN 'middle' ELSE 'tail' END AS bucket "
        "FROM sl JOIN cuts ON sl.lang IS NOT DISTINCT FROM cuts.lang"
    )


# ---------------------------------------------------------------------------
# DSIR: Data Selection via Importance Resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------
#
# The published recipe for picking pretraining documents that *look like*
# a target domain: featurize every doc as hashed n-gram counts, fit two
# bag-of-words models (target vs raw), weight each raw doc by its
# log-likelihood ratio, and resample k docs ∝ weight without
# replacement via Gumbel-top-k.
#
# Spark-first shape (every stage relational, nothing reaches the driver):
#   * features  — one explode + one (doc, bucket) groupBy, exactly the
#     classifier's hashed-BoW plan above; buckets are md5-prefix strings
#     so the hash is bit-identical cross-engine.
#   * "training" — the two multinomials are bucket-keyed groupBys whose
#     output is bounded by the bucket space (16^prefix_len rows), NOT by
#     the corpus; the log-ratio table is therefore broadcastable by
#     construction at any corpus size.
#   * weights   — broadcast-join the ratio table, one bucket-ordered
#     left fold per doc (float addition order pinned, see
#     _ordered_fold_sum).
#   * sampling  — Gumbel-top-k (Vieira 2014): rank log w + g where g is
#     standard Gumbel noise derived from md5(doc_id‖salt) — seeded-hash
#     noise, not rand(), so the drawn subset is reproducible across
#     runs, engines and cluster sizes. orderBy(key).limit(k) compiles to
#     TakeOrderedAndProject — bounded state, no global sort.

DSIR_SMOOTH = 1.0  # Laplace smoothing pseudo-count per bucket
DSIR_GUMBEL_SALT = "dsir"
_TWO_52 = float(1 << 52)


def _dsir_grams(toks: Column) -> Column:
    """DSIR's hashed n-gram feature stream (§3.2 of the paper):
    unigrams plus space-joined bigrams over the shared lowercased
    word-token contract (same tokenizer as the n-gram dedup family)."""
    bi = F.transform(
        # first n-1 tokens; slice length clamps at 0 so 0/1-token docs
        # yield no bigram rather than erroring on a negative length
        F.slice(toks, 1, F.greatest(F.size(toks) - F.lit(1), F.lit(0))),
        lambda t, i: F.concat(t, F.lit(" "), F.element_at(toks, i + F.lit(2))),
    )
    return F.concat(toks, bi)


def _sql_dsir_grams(toks_expr: str) -> str:
    """DuckDB twin of :func:`_dsir_grams` (1-based list indexing;
    generate_series(1, 0) is empty, matching the clamped slice)."""
    return (
        f"list_concat({toks_expr}, list_transform("
        f"generate_series(1, len({toks_expr}) - 1), "
        f"i -> {toks_expr}[i] || ' ' || {toks_expr}[i + 1]))"
    )


def _round6z(c: Column) -> Column:
    """round(·, 6) then ``+ 0.0`` to collapse IEEE −0.0 to +0.0: Spark
    and DuckDB round() disagree on the sign of a zero result for tiny
    negative inputs, and the parity harness distinguishes '0' from
    '-0'. Adding +0.0 is exact for every other finite double."""
    return F.round(c, 6) + F.lit(0.0)


def _sql_round6z(expr: str) -> str:
    """DuckDB twin of :func:`_round6z`."""
    return f"(round({expr}, 6) + 0.0)"


def dsir_doc_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = HASH_PREFIX_LEN,
) -> DataFrame:
    """(doc_id, bucket, cnt): hashed unigram+bigram counts per doc —
    :func:`doc_bucket_counts` (the module's single featurize shape)
    with the DSIR gram transform. explode_outer keeps gram-less docs
    (empty/NULL text) as a (doc, NULL bucket, 0) row so they survive to
    the weight fold with log w = 0 instead of silently vanishing from
    the sample frame."""
    return doc_bucket_counts(
        df, text_col, id_col, prefix_len, gram_fn=_dsir_grams
    ).select("doc_id", "bucket", "cnt")


def dsir_log_ratio(
    raw_feats: DataFrame,
    target_feats: DataFrame,
    prefix_len: int = HASH_PREFIX_LEN,
    smooth: float = DSIR_SMOOTH,
) -> DataFrame:
    """(bucket, lr): log p̂_target(b) − log p̂_raw(b), Laplace-smoothed,
    over every bucket the RAW corpus realizes.

    Fully relational "training": two bucket-keyed sums, a full outer
    join, and corpus totals via a whole-frame window — legal here
    because the frame is bounded by the bucket space (≤ 2·16^prefix_len
    rows), never by the corpus. Buckets absent from the raw side are
    dropped (a doc scored against this table is a raw doc, so its
    grams are raw grams by construction); buckets absent from the
    target side get the smoothing mass. lr is rounded to 6 digits so
    the engine-local ln() ulp cannot leak into downstream folds."""
    from pyspark.sql import Window

    n_buckets = float(16**prefix_len)
    r = (
        raw_feats.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("rc"))
    )
    t = (
        target_feats.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("tc"))
    )
    w = Window.partitionBy()
    j = (
        r.join(t, "bucket", "full")
        .withColumn("nr", F.sum("rc").over(w))
        .withColumn("nt", F.sum("tc").over(w))
        .filter(F.col("rc").isNotNull())
    )
    lr = (
        F.log(F.coalesce(F.col("tc"), F.lit(0)).cast("double") + F.lit(smooth))
        - F.log(F.coalesce(F.col("nt"), F.lit(0)).cast("double") + F.lit(smooth * n_buckets))
        - F.log(F.col("rc").cast("double") + F.lit(smooth))
        + F.log(F.col("nr").cast("double") + F.lit(smooth * n_buckets))
    )
    return j.select("bucket", _round6z(lr).alias("lr"))


def dsir_log_weights(feats: DataFrame, log_ratio: DataFrame) -> DataFrame:
    """(doc_id, log_w): log importance weight Σ_b cnt·lr[b].

    The ratio table is broadcast — bounded by the bucket space, so the
    hint is safe at any corpus size (unlike a corpus-derived set). The
    per-doc sum is a bucket-ordered left fold for cross-engine
    bit-stability; gram-less docs fold an empty term list to 0.0."""
    term = F.when(
        F.col("lr").isNotNull(),
        F.struct("bucket", (F.col("cnt") * F.col("lr")).alias("t")),
    )
    return (
        feats.join(F.broadcast(log_ratio), "bucket", "left")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(term)).alias("terms"))
        .select(
            "doc_id",
            _round6z(
                _ordered_fold_sum(F.transform("terms", lambda s: s["t"]))
            ).alias("log_w"),
        )
    )


def gumbel_key_col(key: Column, salt: str = DSIR_GUMBEL_SALT) -> Column:
    """Deterministic standard-Gumbel noise from md5(key‖salt).

    13 hex chars = 52 uniform bits v; u = (v + 0.5) / 2^52 ∈ (0,1) is
    EXACTLY representable (the ulp anywhere below 2^52 is ≤ 0.5 and the
    divisor is a power of two), so both engines feed ln() the identical
    double; g = −ln(−ln(u)) is then rounded to 6 digits to absorb the
    engines' last-ulp ln() drift."""
    v = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 13), 16, 10
    ).cast("long")
    u = (v.cast("double") + F.lit(0.5)) / F.lit(_TWO_52)
    return _round6z(-F.log(-F.log(u)))


def sql_gumbel_key(key_expr: str, salt: str = DSIR_GUMBEL_SALT) -> str:
    """DuckDB twin of :func:`gumbel_key_col` — ONE home for the hash-
    Gumbel recipe (hex width, +0.5 offset, divisor, rounding) so the
    Column and SQL spellings cannot drift."""
    u = (
        f"(CAST('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '{salt}'), 1, 13) "
        f"AS BIGINT) + 0.5) / {_TWO_52!r}"
    )
    return _sql_round6z(f"-ln(-ln({u}))")


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = HASH_PREFIX_LEN,
    smooth: float = DSIR_SMOOTH,
    salt: str = DSIR_GUMBEL_SALT,
) -> DataFrame:
    """Importance-resample ``k`` docs from ``df`` toward ``target``:
    (doc_id, log_w, g, key) of the k largest key = log w + Gumbel(id),
    i.e. a without-replacement draw ∝ exp(log w) (Gumbel-top-k).

    ``target`` is typically a filtered view of the same corpus (the
    paper's "high-quality subset"); any frame with the same text column
    works — a missing id column is synthesized from the text hash (the
    target only contributes its gram DISTRIBUTION, whose totals are
    invariant to how rows are grouped into docs). Ties on the rounded
    key break on doc_id so the drawn set is total-order
    deterministic."""
    if id_col not in target.columns:
        target = target.withColumn(
            id_col, F.xxhash64(F.coalesce(F.col(text_col), F.lit("")))
        )
    raw_feats = dsir_doc_features(df, text_col, id_col, prefix_len)
    tgt_feats = dsir_doc_features(target, text_col, id_col, prefix_len)
    lrt = dsir_log_ratio(raw_feats, tgt_feats, prefix_len, smooth)
    w = dsir_log_weights(raw_feats, lrt)
    scored = w.select(
        "doc_id", "log_w", gumbel_key_col(F.col("doc_id"), salt).alias("g")
    ).withColumn("key", _round6z(F.col("log_w") + F.col("g")))
    # NULL placement pinned explicitly — Spark and DuckDB defaults
    # differ, and a NULL doc_id yields a NULL Gumbel key
    return scored.orderBy(
        F.desc_nulls_last("key"), F.asc_nulls_last("doc_id")
    ).limit(k)


def sql_dsir_select(
    k: int,
    target_where: str,
    text_expr: str = "text",
    prefix_len: int = HASH_PREFIX_LEN,
    smooth: float = DSIR_SMOOTH,
    salt: str = DSIR_GUMBEL_SALT,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`dsir_select` with target = ``table`` rows
    satisfying ``target_where`` (a row-subset of the scored corpus, as
    in the registered query) — same grams, same md5 buckets, same
    smoothing/rounding, same ordered fold, same hash-Gumbel keys.

    The doc universe is derived from the grouped FEATURE frame exactly
    as on the Spark side (explode_outer emulated with the
    empty-list→[NULL] device, fold over a LEFT join against the ratio
    table) — not re-joined from the base table — so duplicate doc_id
    rows collapse to one output row and a NULL doc_id keeps its true
    fold weight in both engines."""
    tx = f"coalesce({text_expr}, '')"
    n_buckets = float(16**prefix_len)
    grams = _sql_dsir_grams("toks")
    return (
        f"WITH t AS (SELECT doc_id, {_sql_tokens(tx)} AS toks FROM {table}), "
        # explode_outer twin: a gram-less doc yields one NULL gram row
        f"g AS (SELECT doc_id, unnest(CASE WHEN len({grams}) = 0 "
        f"THEN [NULL] ELSE {grams} END) AS gram FROM t), "
        f"f AS (SELECT doc_id, {sql_bucket('gram', prefix_len)} AS bucket, "
        "count(gram) AS cnt FROM g GROUP BY doc_id, bucket), "
        f"tgt AS (SELECT doc_id FROM {table} WHERE {target_where}), "
        "rdist AS (SELECT bucket, sum(cnt) AS rc FROM f "
        "WHERE bucket IS NOT NULL GROUP BY bucket), "
        "tdist AS (SELECT bucket, sum(cnt) AS tc FROM f JOIN tgt USING (doc_id) "
        "WHERE bucket IS NOT NULL GROUP BY bucket), "
        # full outer join + whole-frame window totals — mirrors the
        # Spark side exactly (frame bounded by the bucket space)
        f"lrt AS (SELECT bucket, {_sql_round6z(f'ln(coalesce(tc, 0) + {smooth}) - ln(coalesce(sum(tc) OVER (), 0) + {smooth * n_buckets}) - ln(rc + {smooth}) + ln(sum(rc) OVER () + {smooth * n_buckets})')} AS lr "
        "FROM rdist FULL OUTER JOIN tdist USING (bucket) "
        "QUALIFY rc IS NOT NULL), "
        # LEFT join + FILTER: unmatched/NULL buckets drop from the term
        # list but the doc row survives with an empty fold (= 0.0)
        f"w AS (SELECT f.doc_id, {_sql_round6z('list_reduce(list_prepend(0.0, coalesce(list(f.cnt * lrt.lr ORDER BY f.bucket) FILTER (WHERE lrt.lr IS NOT NULL), [])), (a, b) -> a + b)')} AS log_w "
        "FROM f LEFT JOIN lrt USING (bucket) GROUP BY f.doc_id), "
        "scored AS (SELECT doc_id, log_w, "
        f"{sql_gumbel_key('doc_id', salt)} AS g FROM w) "
        f"SELECT doc_id, log_w, g, {_sql_round6z('log_w + g')} AS key FROM scored "
        f"ORDER BY key DESC NULLS LAST, doc_id ASC NULLS LAST LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# Exact AUC (Mann-Whitney) — gate-evaluation infrastructure
# ---------------------------------------------------------------------------
#
# Every gate in this module ships a score; deciding its threshold (or
# comparing two gates) needs ROC-AUC over labeled rows. AUC is the
# Mann-Whitney U statistic, and with tie-midranks it has an EXACT
# integer evaluation: over the per-distinct-score histogram
# (pos_v, cnt_v, cumulative count cb_v below v),
#
#   2·R⁺  = Σ_v pos_v · (2·cb_v + cnt_v + 1)     (doubled midrank sum)
#   2·U   = 2·R⁺ − n⁺·(n⁺ + 1)
#   AUC   = U / (n⁺·n⁻)
#
# so auc_ppm = (10⁶·2U) div (2·n⁺·n⁻) is one integer division — no
# float rank interpolation convention to diverge cross-engine. The
# window runs over DISTINCT score values (the ppl_bucket_cutoffs
# device), never over corpus rows: a million-doc corpus with 10³
# distinct gate scores pays a 10³-row window. int64-exact while
# 10⁶·2U < 2⁶³, i.e. ~3·10⁶ labeled rows per call — evaluation sets,
# not corpora; shard larger ones.


def gate_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str = None,
) -> DataFrame:
    """(group?, n_pos, n_neg, auc_ppm): exact tie-aware ROC-AUC of
    ``score_col`` against boolean/int ``label_col``, optionally per
    ``group_col`` (per-language gate calibration). NULL scores/labels
    are dropped (unscorable rows are outside the ROC universe);
    degenerate groups (no positives or no negatives) emit NULL
    auc_ppm. Scale shape: one (group, score) histogram groupBy, a
    distinct-score-sized window, one group reduce."""
    from pyspark.sql import Window

    g = [group_col] if group_col else []
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        *g,
        F.col(score_col).alias("s"),
        F.col(label_col).cast("long").alias("y"),
    )
    hist = base.groupBy(*g, "s").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    w = (
        Window.partitionBy(*g).orderBy("s")
        if g
        else Window.partitionBy(F.lit(1)).orderBy("s")
    )
    cum = hist.withColumn(
        "cb", F.coalesce(F.sum("cnt").over(w) - F.col("cnt"), F.lit(0))
    )
    agg = cum.groupBy(*g).agg(
        F.sum("pos").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).alias("n_neg"),
        F.sum(
            F.col("pos") * (F.lit(2) * F.col("cb") + F.col("cnt") + F.lit(1))
        ).alias("r2"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        # exact integer division — the twin's // ; never float-rounded
        F.expr(
            "(1000000 * (r2 - n_pos * (n_pos + 1))) "
            "div (2 * n_pos * n_neg)"
        ),
    )
    cols = g + ["n_pos", "n_neg"]
    return agg.select(*cols, auc.cast("long").alias("auc_ppm"))


def sql_gate_auc(
    rel: str,
    score_expr: str,
    label_expr: str,
    group_expr: str = None,
) -> str:
    """DuckDB twin of :func:`gate_auc` — identical histogram window
    and integer midrank algebra (`//` == `div`: 2U ≥ 0 always)."""
    gsel = f"{group_expr} AS grp, " if group_expr else ""
    gcol = "grp, " if group_expr else ""
    gpart = "PARTITION BY grp " if group_expr else ""
    gby = "GROUP BY grp" if group_expr else ""
    gout = "grp, " if group_expr else ""
    return (
        f"WITH b AS (SELECT {gsel}{score_expr} AS s, "
        f"CAST({label_expr} AS BIGINT) AS y FROM {rel} "
        f"WHERE {score_expr} IS NOT NULL AND {label_expr} IS NOT NULL), "
        f"h AS (SELECT {gcol}s, count(*) AS cnt, "
        f"CAST(sum(y) AS BIGINT) AS pos FROM b GROUP BY {gcol}s), "
        f"c AS (SELECT *, CAST(coalesce(sum(cnt) OVER ({gpart}ORDER BY s "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt, 0) "
        "AS BIGINT) AS cb FROM h), "
        f"a AS (SELECT {gout}CAST(sum(pos) AS BIGINT) AS n_pos, "
        "CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_neg, "
        "CAST(sum(pos * (2 * cb + cnt + 1)) AS BIGINT) AS r2 "
        f"FROM c {gby}) "
        f"SELECT {gout}n_pos, n_neg, "
        "CASE WHEN n_pos > 0 AND n_neg > 0 THEN "
        "(1000000 * (r2 - n_pos * (n_pos + 1))) // (2 * n_pos * n_neg) "
        "END AS auc_ppm FROM a"
    )


def gate_pr_curve(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """(thr, tp, fp, fn, tn, precision_ppm, recall_ppm): the full
    operating-point sweep for a gate — one row per DISTINCT score,
    predicting positive at score ≥ thr. Same histogram-window device
    as :func:`gate_auc` (descending cumulative this time), so the
    curve costs one distinct-score-sized window regardless of corpus
    rows, and every cell is exact int64 (ppm via integer division —
    no float convention). Thresholds with tp+fp = 0 cannot occur
    (the threshold IS an observed score)."""
    from pyspark.sql import Window

    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("s"), F.col(label_col).cast("long").alias("y")
    )
    hist = base.groupBy("s").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    w = Window.partitionBy(F.lit(1)).orderBy(F.col("s").desc())
    cum = hist.select(
        F.col("s").alias("thr"),
        F.sum("pos").over(w).alias("tp"),
        (F.sum("cnt").over(w) - F.sum("pos").over(w)).alias("fp"),
    )
    tot = base.agg(
        F.sum("y").alias("n_pos"), (F.count("*") - F.sum("y")).alias("n_neg")
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "thr",
        "tp",
        "fp",
        (F.col("n_pos") - F.col("tp")).alias("fn"),
        (F.col("n_neg") - F.col("fp")).alias("tn"),
        F.expr("(1000000 * tp) div (tp + fp)").alias("precision_ppm"),
        F.when(
            F.col("n_pos") > 0, F.expr("(1000000 * tp) div n_pos")
        ).alias("recall_ppm"),
    )


def sql_gate_pr_curve(rel: str, score_expr: str, label_expr: str) -> str:
    """DuckDB twin of :func:`gate_pr_curve`."""
    return (
        f"WITH b AS (SELECT {score_expr} AS s, "
        f"CAST({label_expr} AS BIGINT) AS y FROM {rel} "
        f"WHERE {score_expr} IS NOT NULL AND {label_expr} IS NOT NULL), "
        "h AS (SELECT s, count(*) AS cnt, CAST(sum(y) AS BIGINT) AS pos "
        "FROM b GROUP BY s), "
        "c AS (SELECT s AS thr, "
        "CAST(sum(pos) OVER (ORDER BY s DESC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp, "
        "CAST(sum(cnt - pos) OVER (ORDER BY s DESC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp "
        "FROM h), "
        "t AS (SELECT CAST(sum(y) AS BIGINT) AS n_pos, "
        "CAST(count(*) - sum(y) AS BIGINT) AS n_neg FROM b) "
        "SELECT thr, tp, fp, n_pos - tp AS fn, n_neg - fp AS tn, "
        "(1000000 * tp) // (tp + fp) AS precision_ppm, "
        "CASE WHEN n_pos > 0 THEN (1000000 * tp) // n_pos END AS recall_ppm "
        "FROM c CROSS JOIN t"
    )


def rank_corr(
    df: DataFrame, x_col: str, y_col: str, group_col: str = None
) -> DataFrame:
    """(group?, n, rho): Spearman rank correlation with tie midranks —
    do two quality signals agree? Doubled midranks (2·cb + cnt + 1,
    the :func:`gate_auc` integer device, one histogram window per
    variable) make every regression sum exact int64; the single
    sqrt/division chain at the end is correctly rounded in both
    engines, rounded to 6 digits. int64-exact while 4n³ < 2⁶³
    (n ≤ ~1.3·10⁶ rows per group — evaluation sets; shard beyond).
    Groups with zero rank variance (all x or all y tied) emit NULL."""
    from pyspark.sql import Window

    g = [group_col] if group_col else []
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*g, F.col(x_col).alias("x"), F.col(y_col).alias("y"))

    def midranks(col):
        h = base.groupBy(*g, col).agg(F.count("*").alias("cnt"))
        w = (
            Window.partitionBy(*g).orderBy(col)
            if g
            else Window.partitionBy(F.lit(1)).orderBy(col)
        )
        return h.select(
            *g,
            col,
            (
                F.lit(2)
                * F.coalesce(F.sum("cnt").over(w) - F.col("cnt"), F.lit(0))
                + F.col("cnt")
                + F.lit(1)
            ).alias(f"r{col}"),
        )

    # NULL groups must rank among themselves — a column-name-list join
    # is null-UNSAFE on the group key and would drop them (the twin's
    # IS NOT DISTINCT FROM keeps them), so join on explicit eqNullSafe
    # conditions with renamed right-side keys
    hx = midranks("x").withColumnRenamed("x", "__x")
    hy = midranks("y").withColumnRenamed("y", "__y")
    if g:
        hx = hx.withColumnRenamed(group_col, "__gx")
        hy = hy.withColumnRenamed(group_col, "__gy")
        cond_x = (F.col("x") == F.col("__x")) & F.col(group_col).eqNullSafe(
            F.col("__gx")
        )
        cond_y = (F.col("y") == F.col("__y")) & F.col(group_col).eqNullSafe(
            F.col("__gy")
        )
    else:
        cond_x = F.col("x") == F.col("__x")
        cond_y = F.col("y") == F.col("__y")
    ranked = (
        base.join(hx, cond_x)
        .join(hy, cond_y)
        .drop("__x", "__y", "__gx", "__gy")
    )
    agg = ranked.groupBy(*g).agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    rho = F.round(
        num.cast("double")
        / F.sqrt(vx.cast("double") * vy.cast("double")),
        6,
    )
    cols = g + ["n"]
    return agg.select(
        *cols, F.when((vx > 0) & (vy > 0), rho).alias("rho")
    )


def sql_rank_corr(
    rel: str, x_expr: str, y_expr: str, group_expr: str = None
) -> str:
    """DuckDB twin of :func:`rank_corr` — same doubled-midrank tables,
    same pinned-order float tail."""
    gsel = f"{group_expr} AS grp, " if group_expr else ""
    gcol = "grp, " if group_expr else ""
    gpart = "PARTITION BY grp " if group_expr else ""
    gby = "GROUP BY grp" if group_expr else ""
    gout = "grp, " if group_expr else ""
    gjoin_x = "b.grp IS NOT DISTINCT FROM hx.grp AND " if group_expr else ""
    gjoin_y = "b.grp IS NOT DISTINCT FROM hy.grp AND " if group_expr else ""
    win = (
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    return (
        f"WITH b AS (SELECT {gsel}{x_expr} AS x, {y_expr} AS y FROM {rel} "
        f"WHERE {x_expr} IS NOT NULL AND {y_expr} IS NOT NULL), "
        f"hx AS (SELECT {gcol}x, CAST(2 * coalesce(sum(cnt) OVER "
        f"({gpart}ORDER BY x {win}) - cnt, 0) + cnt + 1 AS BIGINT) AS rx "
        f"FROM (SELECT {gcol}x, count(*) AS cnt FROM b GROUP BY {gcol}x)), "
        f"hy AS (SELECT {gcol}y, CAST(2 * coalesce(sum(cnt) OVER "
        f"({gpart}ORDER BY y {win}) - cnt, 0) + cnt + 1 AS BIGINT) AS ry "
        f"FROM (SELECT {gcol}y, count(*) AS cnt FROM b GROUP BY {gcol}y)), "
        f"r AS (SELECT b.*, hx.rx, hy.ry FROM b "
        f"JOIN hx ON {gjoin_x}b.x = hx.x "
        f"JOIN hy ON {gjoin_y}b.y = hy.y), "
        f"a AS (SELECT {gout}CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy, "
        "CAST(sum(rx * rx) AS BIGINT) AS sxx, "
        "CAST(sum(ry * ry) AS BIGINT) AS syy, "
        "CAST(sum(rx * ry) AS BIGINT) AS sxy "
        f"FROM r {gby}) "
        f"SELECT {gout}n, "
        "CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 "
        "THEN round(CAST(n * sxy - sx * sy AS DOUBLE) / "
        "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) "
        "* CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS rho FROM a"
    )


def gate_calibration(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """(bin, n, mean_pred_ppm, observed_ppm, gap_ppm): reliability
    diagram for a probabilistic gate — does score 0.8 mean 80%? Rows
    are quantized ONCE to ppm (floor(prob·10⁶), a deterministic
    float→int) and binned by floor(prob·n_bins) clamped to the top
    bin; after that everything is exact int64 sums and integer
    divisions, so the diagram is bit-identical cross-engine.
    ``gap_ppm`` = observed − mean_pred (signed: positive means the
    gate UNDER-claims). Probabilities outside [0, 1] are clamped into
    the edge bins (defensive: a miscalibrated upstream logit). One
    bin-keyed combinable groupBy; bins ≪ rows always."""
    base = df.filter(
        F.col(prob_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor(F.col(prob_col) * F.lit(n_bins)).cast("int"),
            ),
        ).alias("bin"),
        F.least(
            F.lit(10**6),
            F.greatest(
                F.lit(0),
                F.floor(F.col(prob_col) * F.lit(10**6)).cast("long"),
            ),
        ).alias("pred_ppm"),
        F.col(label_col).cast("long").alias("y"),
    )
    return (
        base.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("pred_ppm").alias("sp"),
            F.sum("y").alias("sy"),
        )
        .select(
            "bin",
            "n",
            F.expr("sp div n").alias("mean_pred_ppm"),
            F.expr("(1000000 * sy) div n").alias("observed_ppm"),
            F.expr("(1000000 * sy) div n - sp div n").alias("gap_ppm"),
        )
    )


def sql_gate_calibration(
    rel: str, prob_expr: str, label_expr: str, n_bins: int = 10
) -> str:
    """DuckDB twin of :func:`gate_calibration`."""
    return (
        f"WITH b AS (SELECT "
        f"CAST(least({n_bins - 1}, greatest(0, "
        f"floor({prob_expr} * {n_bins}))) AS INT) AS bin, "
        f"CAST(least(1000000, greatest(0, "
        f"floor({prob_expr} * 1000000))) AS BIGINT) AS pred_ppm, "
        f"CAST({label_expr} AS BIGINT) AS y FROM {rel} "
        f"WHERE {prob_expr} IS NOT NULL AND {label_expr} IS NOT NULL), "
        "a AS (SELECT bin, count(*) AS n, "
        "CAST(sum(pred_ppm) AS BIGINT) AS sp, "
        "CAST(sum(y) AS BIGINT) AS sy FROM b GROUP BY bin) "
        "SELECT bin, n, sp // n AS mean_pred_ppm, "
        "(1000000 * sy) // n AS observed_ppm, "
        "(1000000 * sy) // n - sp // n AS gap_ppm FROM a"
    )


# ---------------------------------------------------------------------------
# Moore-Lewis cross-entropy-difference data selection
# ---------------------------------------------------------------------------
#
# Moore & Lewis, ACL 2010 "Intelligent selection of language model
# training data" — THE classic contrastive selection recipe: score
# every pool document by the difference of its log-likelihood under an
# IN-DOMAIN LM and under a POOL LM, and keep the top-k. A document the
# target LM likes MORE than the generic pool LM does is
# target-domain-like; the subtraction cancels the document's intrinsic
# easiness (stop-word mass, length effects) that inflates a raw LM
# score. Both LMs here are the engine's bigram stupid-backoff model,
# so estimation stays pure distributed counting and both score legs
# reuse score_bigram_lm's position-ordered fold — the per-doc scores
# are the identical rounded doubles in both engines, hence their
# difference is too.
#
# Scale shape: two vocabulary-keyed count tables + two score joins
# over the pool (the lm_score shape, twice) + one doc-keyed join;
# selection is orderBy().limit(k) → TakeOrderedAndProject.


def moore_lewis_select(
    pool: DataFrame,
    target: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = LM_ALPHA,
) -> DataFrame:
    """Top-``k`` pool docs by cross-entropy difference: returns
    (doc_id, lp_target, lp_raw, ml_diff) ordered by
    (ml_diff desc, doc_id) — ml_diff = round(lp_target − lp_raw, 6),
    where lp_* are the mean log10 stupid-backoff scores of the pool
    doc under the target-trained and pool-trained bigram LMs."""
    lm_t = train_bigram_lm(target, text_col, id_col)
    lm_r = train_bigram_lm(pool, text_col, id_col)
    st = score_bigram_lm(pool, lm_t, text_col, id_col, alpha).select(
        "doc_id", F.col("avg_logprob").alias("lp_target")
    )
    sr = score_bigram_lm(pool, lm_r, text_col, id_col, alpha).select(
        "doc_id", F.col("avg_logprob").alias("lp_raw")
    )
    return (
        st.join(sr, "doc_id")
        .select(
            "doc_id",
            "lp_target",
            "lp_raw",
            F.round(F.col("lp_target") - F.col("lp_raw"), 6).alias("ml_diff"),
        )
        .orderBy(F.desc("ml_diff"), "doc_id")
        .limit(k)
    )


def _sql_lm_leg(
    train_rel: str,
    score_rel: str,
    text_expr: str = "text",
    alpha: float = LM_ALPHA,
) -> str:
    """The scoring chain of sql_score_bigram_lm with SEPARATE train and
    score relations (count tables from ``train_rel``, per-position
    scoring over ``score_rel``) — same CASE ladder, same
    position-ordered fold, same round."""
    tx = f"coalesce({text_expr}, '')"
    return (
        f"WITH tt AS (SELECT doc_id, {_sql_tokens(tx)} AS toks FROM {train_rel}), "
        "ptt AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok FROM ("
        "SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM tt)), "
        f"ts AS (SELECT doc_id, {_sql_tokens(tx)} AS toks FROM {score_rel}), "
        "pts AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok FROM ("
        "SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM ts)), "
        "uni AS (SELECT tok, count(*) AS u_cnt FROM ptt GROUP BY tok), "
        "tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ptt), "
        "bi AS (SELECT a.tok AS prev, b.tok AS nxt, count(*) AS b_cnt "
        "FROM ptt a JOIN ptt b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
        "GROUP BY a.tok, b.tok), "
        "pairs AS (SELECT c.doc_id, c.pos, c.tok, p.tok AS prev "
        "FROM pts c LEFT JOIN pts p ON c.doc_id = p.doc_id AND p.pos = c.pos - 1), "
        "j AS (SELECT pr.doc_id, pr.pos, "
        "CASE WHEN bi.b_cnt IS NOT NULL AND up.u_cnt IS NOT NULL "
        "THEN CAST(bi.b_cnt AS DOUBLE) / up.u_cnt "
        f"WHEN pr.prev IS NOT NULL THEN {alpha} * coalesce(uc.u_cnt / tot.n, {LM_FLOOR}) "
        f"ELSE coalesce(uc.u_cnt / tot.n, {LM_FLOOR}) END AS prob "
        "FROM pairs pr "
        "LEFT JOIN uni up ON pr.prev = up.tok "
        "LEFT JOIN uni uc ON pr.tok = uc.tok "
        "LEFT JOIN bi ON pr.prev = bi.prev AND pr.tok = bi.nxt "
        "CROSS JOIN tot) "
        "SELECT doc_id, "
        "round(list_reduce(list_prepend(0.0, list(log10(prob) ORDER BY pos)), "
        "(a, b) -> a + b) / count(*), 6) AS avg_logprob FROM j GROUP BY doc_id"
    )


def sql_moore_lewis(
    pool_rel: str,
    target_rel: str,
    k: int = 50,
    text_expr: str = "text",
    alpha: float = LM_ALPHA,
) -> str:
    """DuckDB twin of :func:`moore_lewis_select`."""
    t_leg = _sql_lm_leg(target_rel, pool_rel, text_expr, alpha)
    r_leg = _sql_lm_leg(pool_rel, pool_rel, text_expr, alpha)
    return f"""
SELECT st.doc_id, st.avg_logprob AS lp_target, sr.avg_logprob AS lp_raw,
       round(st.avg_logprob - sr.avg_logprob, 6) AS ml_diff
FROM ({t_leg}) st JOIN ({r_leg}) sr ON st.doc_id = sr.doc_id
ORDER BY ml_diff DESC, st.doc_id
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes source classifier (McCallum & Nigam 1998,
# "A Comparison of Event Models for Naive Bayes Text Classification")
# ---------------------------------------------------------------------------
#
# The classic generative text classifier as a pure relational plan —
# the provenance-attribution gate ("which stratum does this page read
# like?") beside the discriminative hashed-linear gate and the LM
# fluency gates. With Laplace(+1) smoothing the per-class score
#     log P(c) + sum_w tf_dw * log((c_wc + 1) / (c_c + V))
# decomposes as
#     [I(n_docs_c) - I(n_docs)]                (prior)
#   - n_d * I(c_c + V)                         (denominator, per class)
#   + sum_{w in d, seen in c} tf_dw * I(c_wc + 1)   (numerator hits)
# with I(x) = round(ln(x)*1e9) int64 — the engine's fixed-point ln
# device. Every term is exact int64, so scores, the argmax and the
# margin are bit-identical across engines, partitionings and cluster
# sizes. The decomposition matters at scale: only (word, class) pairs
# SEEN IN TRAINING produce join rows — unseen words ride entirely on
# the n_d * I(c_c + V) term, so the hits join is bounded by matching
# pairs, never |docs| x |vocab|.
#
# Scale shape: two vocabulary-keyed count tables (the LM-training
# contract), one tok-keyed hits join + (doc, class) groupBy, a
# #classes-row broadcast grid join, and a per-doc argmax window whose
# partitions hold exactly #classes rows. No Python, no corpus window.
# NULL training labels are dropped (unlabeled rows are not a class);
# scored docs always emit one row (empty/NULL text scores on priors
# alone). Overflow bound: n_d * I(c_c+V) <= n_d * 28e9 — exact for
# docs up to ~3e8 tokens (the unigram-entropy bound).


def naive_bayes_classify(
    df: DataFrame,
    train_df: DataFrame = None,
    label_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pred, score_nano, margin_nano): the argmax-class NB
    verdict for every row of ``df`` under a model fit on ``train_df``
    (default: ``df`` itself — the self-classification provenance
    report). ``margin_nano`` = best minus runner-up score (NULL with a
    single class); ties break to the lexicographically smallest label."""
    from pyspark.sql import Window

    train = df if train_df is None else train_df
    tr = train.filter(F.col(label_col).isNotNull())

    def iln(c):
        return F.round(F.log(c.cast("double")) * F.lit(1e9)).cast("long")

    tr_toks = tr.select(
        F.col(label_col).alias("lbl"),
        F.explode(_tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("tok"),
    )
    # ONE corpus-scale tokenize: cw is persisted (vocabulary x classes
    # rows) and every other training aggregate DERIVES from it or from
    # the doc-count table — the plan-audit fix for the naive form that
    # re-scanned the training corpus for each count table
    cw = (
        tr_toks.groupBy("lbl", "tok").agg(F.count("*").alias("c_wc")).persist()
    )
    ctok = cw.groupBy("lbl").agg(F.sum("c_wc").alias("c_c"))
    cdoc = tr.groupBy(F.col(label_col).alias("lbl")).agg(
        F.count("*").alias("n_docs_c")
    ).persist()
    vocab = cw.select("tok").distinct().groupBy().agg(F.count("*").alias("v"))
    ndocs = cdoc.groupBy().agg(F.sum("n_docs_c").alias("n_docs"))
    classes = (
        cdoc.join(ctok, "lbl", "left")
        .withColumn("c_c", F.coalesce("c_c", F.lit(0)))
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "lbl",
            (iln(F.col("n_docs_c")) - iln(F.col("n_docs"))).alias("prior_nano"),
            iln(F.greatest(F.col("c_c") + F.col("v"), F.lit(1))).alias(
                "denom_nano"
            ),
        )
    )

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("n_d"),
    )
    dw = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("tok"),
    ).groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    hits = (
        dw.join(cw, "tok")
        .groupBy("doc_id", "lbl")
        .agg(F.sum(F.col("tf") * iln(F.col("c_wc") + F.lit(1))).alias("hit_nano"))
    )
    grid = base.crossJoin(F.broadcast(classes))
    scored = grid.join(hits, ["doc_id", "lbl"], "left").select(
        "doc_id",
        "lbl",
        (
            F.col("prior_nano")
            - F.col("n_d").cast("long") * F.col("denom_nano")
            + F.coalesce(F.col("hit_nano"), F.lit(0))
        ).alias("score_nano"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_nano").desc(), F.col("lbl")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("nxt", F.lead("score_nano").over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("lbl").alias("pred"),
            "score_nano",
            (F.col("score_nano") - F.col("nxt")).alias("margin_nano"),
        )
    )


def sql_naive_bayes(
    rel: str = "documents",
    train_rel: str = None,
    label_expr: str = "source",
    text_expr: str = "text",
) -> str:
    """DuckDB twin of :func:`naive_bayes_classify` — identical count
    tables, fixed-point terms, grid/hits decomposition and argmax
    window."""
    train_rel = train_rel or rel
    toks = _sql_tokens(f"coalesce({text_expr}, '')")
    iln = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1e9) AS BIGINT)"
    return (
        f"WITH tr AS (SELECT {label_expr} AS lbl, {text_expr} AS text "
        f"FROM {train_rel} WHERE {label_expr} IS NOT NULL), "
        "trt AS (SELECT lbl, unnest("
        + _sql_tokens("coalesce(text, '')")
        + ") AS tok FROM tr), "
        "cw AS (SELECT lbl, tok, CAST(count(*) AS BIGINT) AS c_wc "
        "FROM trt GROUP BY lbl, tok), "
        "ctok AS (SELECT lbl, CAST(count(*) AS BIGINT) AS c_c FROM trt "
        "GROUP BY lbl), "
        "cdoc AS (SELECT lbl, CAST(count(*) AS BIGINT) AS n_docs_c "
        "FROM tr GROUP BY lbl), "
        "vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cw), "
        "nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM tr), "
        "classes AS (SELECT cdoc.lbl, "
        + iln.format(x="n_docs_c")
        + " - "
        + iln.format(x="n_docs")
        + " AS prior_nano, "
        + iln.format(x="greatest(coalesce(c_c, 0) + v, 1)")
        + " AS denom_nano FROM cdoc LEFT JOIN ctok ON cdoc.lbl = ctok.lbl "
        "CROSS JOIN vocab CROSS JOIN nd), "
        f"base AS (SELECT doc_id, CAST(len({toks}) AS BIGINT) AS n_d "
        f"FROM {rel}), "
        f"dw AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM "
        f"(SELECT doc_id, unnest({toks}) AS tok FROM {rel}) "
        "GROUP BY doc_id, tok), "
        "hits AS (SELECT dw.doc_id, cw.lbl, CAST(sum(dw.tf * ("
        + iln.format(x="cw.c_wc + 1")
        + ")) AS BIGINT) AS hit_nano FROM dw JOIN cw ON dw.tok = cw.tok "
        "GROUP BY dw.doc_id, cw.lbl), "
        "scored AS (SELECT base.doc_id, classes.lbl, "
        "classes.prior_nano - base.n_d * classes.denom_nano "
        "+ coalesce(hits.hit_nano, 0) AS score_nano "
        "FROM base CROSS JOIN classes LEFT JOIN hits "
        "ON hits.doc_id = base.doc_id AND hits.lbl = classes.lbl), "
        "rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY score_nano DESC, lbl) AS rn, "
        "lead(score_nano) OVER (PARTITION BY doc_id "
        "ORDER BY score_nano DESC, lbl) AS nxt FROM scored) "
        "SELECT doc_id, lbl AS pred, score_nano, "
        "CAST(score_nano - nxt AS BIGINT) AS margin_nano "
        "FROM rk WHERE rn = 1"
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test (Kolmogorov 1933; Smirnov
# 1948) — each group's score distribution against the rest of the corpus
# ---------------------------------------------------------------------------
#
# The distribution-drift companion to source_kl: for every group g,
# D_g = sup_x |F_g(x) - F_rest(x)| over the empirical CDFs — the
# nonparametric "does this stratum's score distribution differ"
# statistic that needs no binning convention. Exact integer form: the
# sup over all x is attained at a distinct observed value (both CDFs
# are right-continuous step functions, constant between points), and
# at each value the CDF difference is compared by cross-multiplication
#     |cum_g * n_rest - cum_rest * n_g|        (exact int64)
# so d_ppm = max_diff * 1e6 DIV (n_g * n_rest) carries no float
# convention at all. lambda_6 = D * sqrt(n_g*n_rest/(n_g+n_rest))
# (the asymptotic scaling callers compare against 1.358 for alpha =
# 0.05 / 1.628 for 0.01) is a fixed chain of correctly-rounded IEEE
# ops (mult/div/sqrt of exact-integer-valued doubles) — bit-identical
# cross-engine, then rounded to 6. No exp()-series p-value on purpose:
# exp is not correctly rounded and could flip a round6 boundary
# between engines; the lambda form is the strict-oracle-safe surface.
#
# Scale shape: one (group, value) histogram groupBy; the evaluation
# grid is distinct-values x groups (group-dimension-bounded expansion
# — the #groups factor is the report's own output dimension); per-group
# cumulative windows are distinct-value-sized and the global cum_all
# window is the gate_auc distinct-score acceptance. NULL group is a
# real stratum (eqNullSafe grid join — the host_quality rule); NULL
# values are outside the CDF universe. Overflow: cum * n products need
# n_g * n_rest < 2^63 — exact to ~3e9 rows per side (documented, the
# gate_auc midrank bound class).


def ks_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """(group, n_g, n_rest, d_num, d_ppm, lambda_6): per-group
    two-sample KS statistic of ``value_col`` against the pooled rest.
    Degenerate groups (empty rest or empty group) emit NULL d_ppm."""
    from pyspark.sql import Window

    vals = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).filter(F.col("v").isNotNull())
    # hist feeds groups / vall / the grid join — persisted once
    # ((group, distinct-value)-sized, the plan-audit reuse rule)
    hist = vals.groupBy("g", "v").agg(F.count("*").alias("c")).persist()
    groups = hist.groupBy("g").agg(F.sum("c").alias("n_g"))
    total = groups.groupBy().agg(F.sum("n_g").alias("n_all"))
    vall = hist.groupBy("v").agg(F.sum("c").alias("cv"))
    cum_all = vall.withColumn(
        "cum_all",
        F.sum("cv").over(
            Window.partitionBy(F.lit(1))
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).select("v", "cum_all")
    # derived frames get their OWN key names before the join back —
    # the ambiguous-self-join analyzer rule (the Hampel fix precedent)
    hist2 = hist.select(
        F.col("g").alias("hg"), F.col("v").alias("hv"), "c"
    )
    grid = (
        cum_all.crossJoin(F.broadcast(groups))
        .join(
            hist2,
            F.col("g").eqNullSafe(F.col("hg")) & (F.col("v") == F.col("hv")),
            "left",
        )
        .select(
            "v",
            "g",
            "n_g",
            "cum_all",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    cum = grid.withColumn(
        "cum_g",
        F.sum("c").over(
            Window.partitionBy("g")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).crossJoin(F.broadcast(total))
    diff = cum.select(
        "g",
        "n_g",
        (F.col("n_all") - F.col("n_g")).alias("n_rest"),
        F.abs(
            F.col("cum_g") * (F.col("n_all") - F.col("n_g"))
            - (F.col("cum_all") - F.col("cum_g")) * F.col("n_g")
        ).alias("dnum"),
    )
    agg = diff.groupBy("g", "n_g", "n_rest").agg(F.max("dnum").alias("d_num"))
    ok = (F.col("n_g") > 0) & (F.col("n_rest") > 0)
    lam = (
        F.col("d_num").cast("double")
        / (F.col("n_g").cast("double") * F.col("n_rest").cast("double"))
    ) * F.sqrt(
        (F.col("n_g").cast("double") * F.col("n_rest").cast("double"))
        / (F.col("n_g") + F.col("n_rest")).cast("double")
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_g",
        "n_rest",
        "d_num",
        F.when(ok, F.expr("d_num * 1000000L div (n_g * n_rest)")).alias(
            "d_ppm"
        ),
        F.when(ok, _round6z(lam)).alias("lambda_6"),
    )


def sql_ks_test(
    rel: str,
    value_expr: str,
    group_expr: str,
) -> str:
    """DuckDB twin of :func:`ks_test` — identical histogram, grid,
    cumulative windows, cross-multiplied sup and lambda op order."""
    return (
        f"WITH vals AS (SELECT {group_expr} AS g, {value_expr} AS v "
        f"FROM {rel} WHERE {value_expr} IS NOT NULL), "
        "hist AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM vals "
        "GROUP BY g, v), "
        "grps AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_g FROM hist "
        "GROUP BY g), "
        "tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_all FROM grps), "
        "vall AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM hist "
        "GROUP BY v), "
        "ca AS (SELECT v, CAST(sum(cv) OVER (ORDER BY v ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_all "
        "FROM vall), "
        "grid AS (SELECT ca.v, grps.g, grps.n_g, ca.cum_all, "
        "coalesce(hist.c, 0) AS c FROM ca CROSS JOIN grps "
        "LEFT JOIN hist ON hist.g IS NOT DISTINCT FROM grps.g "
        "AND hist.v = ca.v), "
        "cum AS (SELECT *, CAST(sum(c) OVER (PARTITION BY g ORDER BY v "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS cum_g FROM grid), "
        "diff AS (SELECT g, n_g, n_all - n_g AS n_rest, "
        "abs(cum_g * (n_all - n_g) - (cum_all - cum_g) * n_g) AS dnum "
        "FROM cum CROSS JOIN tot), "
        "agg AS (SELECT g, n_g, n_rest, CAST(max(dnum) AS BIGINT) AS d_num "
        "FROM diff GROUP BY g, n_g, n_rest) "
        f"SELECT g AS {group_expr}, n_g, n_rest, d_num, "
        "CASE WHEN n_g > 0 AND n_rest > 0 THEN "
        "CAST(d_num * 1000000 // (n_g * n_rest) AS BIGINT) END AS d_ppm, "
        "CASE WHEN n_g > 0 AND n_rest > 0 THEN "
        + _sql_round6z(
            "(CAST(d_num AS DOUBLE) / (CAST(n_g AS DOUBLE) "
            "* CAST(n_rest AS DOUBLE))) * sqrt((CAST(n_g AS DOUBLE) "
            "* CAST(n_rest AS DOUBLE)) / CAST(n_g + n_rest AS DOUBLE))"
        )
        + " END AS lambda_6 FROM agg"
    )


# ---------------------------------------------------------------------------
# Cramer's V categorical association (Cramer 1946, "Mathematical
# Methods of Statistics" §21.9)
# ---------------------------------------------------------------------------
#
# "Are these two metadata columns related at all, and how strongly?" —
# the [0, 1]-normalized chi-square for an r x c contingency table
# (language x source, MIME x host class, label x split): V =
# sqrt(chi2 / (N * (min(r,c) - 1))). The corpus-card companion to the
# per-group drift tests: ks_drift/js_sources ask which stratum
# differs, Cramer's V asks whether the stratification matters.
#
# Cross-engine discipline: observed counts and margins are exact
# int64; each cell's (O - E)^2 / E term is ONE fixed chain of
# correctly-rounded IEEE ops over exact-integer-valued doubles, and
# the cell terms fold in a TOTAL ORDER over the (is_null, value)
# sort key (the _ordered_fold_sum device — NULL categories are real
# rows, the keyness convention, and the flag keeps them from
# colliding with the '' category in the sort). chi2 includes
# zero-observed cells (their E > 0 contributes E) via the full
# margins grid — r x c bounded. One row; everything after the one
# corpus groupBy is category-dimension-sized.


def cramers_v(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """One row (n, r, c, chi2, v6): Cramer's V between two categorical
    columns (NULL is a category). NULL v6 when min(r, c) < 2."""
    ct = (
        df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("o"))
        .persist()
    )
    ra = ct.groupBy("a").agg(F.sum("o").alias("ra"))
    cb = ct.groupBy("b").agg(F.sum("o").alias("cb"))
    tot = ct.groupBy().agg(
        F.sum("o").alias("n"),
        F.count("*").alias("n_cells"),
    )
    grid = (
        ra.crossJoin(cb)
        .join(
            ct.select(
                F.col("a").alias("ga"), F.col("b").alias("gb"), "o"
            ),
            F.col("a").eqNullSafe(F.col("ga"))
            & F.col("b").eqNullSafe(F.col("gb")),
            "left",
        )
        .select(
            "a", "b", "ra", "cb", F.coalesce("o", F.lit(0)).alias("o")
        )
        .crossJoin(F.broadcast(tot.select("n")))
    )
    term = (
        (
            F.col("o").cast("double")
            - F.col("ra").cast("double")
            * F.col("cb").cast("double")
            / F.col("n").cast("double")
        )
        * (
            F.col("o").cast("double")
            - F.col("ra").cast("double")
            * F.col("cb").cast("double")
            / F.col("n").cast("double")
        )
        / (
            F.col("ra").cast("double")
            * F.col("cb").cast("double")
            / F.col("n").cast("double")
        )
    )
    cells = grid.select(
        F.struct(
            F.col("a").isNull().cast("int").alias("an"),
            F.coalesce(F.col("a"), F.lit("")).alias("av"),
            F.col("b").isNull().cast("int").alias("bn"),
            F.coalesce(F.col("b"), F.lit("")).alias("bv"),
            term.alias("t"),
        ).alias("s")
    )
    agg = cells.groupBy().agg(
        _ordered_fold_sum(
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s["t"])
        ).alias("chi2")
    )
    dims = ra.groupBy().agg(F.count("*").alias("r")).crossJoin(
        cb.groupBy().agg(F.count("*").alias("c"))
    )
    out = agg.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(dims))
    v = F.sqrt(
        F.col("chi2")
        / (
            F.col("n").cast("double")
            * (F.least("r", "c") - F.lit(1)).cast("double")
        )
    )
    return out.select(
        "n",
        "r",
        "c",
        (F.round(F.col("chi2"), 6) + F.lit(0.0)).alias("chi2"),
        F.when(F.least("r", "c") >= 2, F.round(v, 6) + F.lit(0.0)).alias(
            "v6"
        ),
    )


def sql_cramers_v(rel: str, a_expr: str, b_expr: str) -> str:
    """DuckDB twin of :func:`cramers_v` — identical grid, term op
    order, total-order fold and rounding."""
    return (
        f"WITH ct AS (SELECT {a_expr} AS a, {b_expr} AS b, "
        f"CAST(count(*) AS BIGINT) AS o FROM {rel} GROUP BY 1, 2), "
        "ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM ct GROUP BY a), "
        "cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM ct GROUP BY b), "
        "tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM ct), "
        "grid AS (SELECT ra.a, cb.b, ra.ra, cb.cb, "
        "coalesce(ct.o, 0) AS o, tot.n FROM ra CROSS JOIN cb "
        "LEFT JOIN ct ON ct.a IS NOT DISTINCT FROM ra.a "
        "AND ct.b IS NOT DISTINCT FROM cb.b CROSS JOIN tot), "
        "cells AS (SELECT CASE WHEN a IS NULL THEN 1 ELSE 0 END AS an, "
        "coalesce(a, '') AS av, CASE WHEN b IS NULL THEN 1 ELSE 0 END "
        "AS bn, coalesce(b, '') AS bv, "
        "(CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) "
        "/ CAST(n AS DOUBLE)) * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) "
        "* CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(ra AS DOUBLE) "
        "* CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) AS t FROM grid), "
        "f AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list(t ORDER BY an, av, bn, bv)), (acc, x) -> acc + x) AS chi2 "
        "FROM cells), "
        "dims AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ra) AS r, "
        "(SELECT CAST(count(*) AS BIGINT) FROM cb) AS c) "
        "SELECT tot.n, dims.r, dims.c, "
        "round(f.chi2, 6) + 0.0 AS chi2, "
        "CASE WHEN least(dims.r, dims.c) >= 2 THEN "
        "round(sqrt(f.chi2 / (CAST(tot.n AS DOUBLE) "
        "* CAST(least(dims.r, dims.c) - 1 AS DOUBLE))), 6) + 0.0 END AS v6 "
        "FROM f CROSS JOIN tot CROSS JOIN dims"
    )
