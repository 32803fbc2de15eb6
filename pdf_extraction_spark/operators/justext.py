"""jusText-style context-sensitive boilerplate classification
(Pomikálek 2011, "Removing boilerplate and duplicate content from web
corpora", ch. 5; the corpus.tools jusText algorithm).

The engine's primary boilerplate stripper (kernels/htmlio.py) is a
Boilerpipe/Readability-style text-density classifier running inside the
single extraction mapInPandas crossing. jusText is the OTHER published
family — stopword-density based with a context-sensitive second pass —
and this implementation is fully RELATIONAL: block features are native
column expressions and the context pass is window functions partitioned
by document (partitions are doc-sized — bounded by blocks per page —
never corpus-sized), so it scales embarrassingly and carries a strict
DuckDB twin, which the in-kernel classifier cannot.

Algorithm (context-free pass, published defaults):

* link density > 0.2                          → bad
* contains the copyright sign (or "&copy")    → bad
* length < length_low (70): any link word → bad, else → short
* stopword density ≥ stopwords_high (0.32):
  length > length_high (200) → good, else → near-good
* stopword density ≥ stopwords_low (0.30)     → near-good
* otherwise                                   → bad

Context-sensitive pass: good/bad are final. For each short/near-good
block, pre/post = class of the nearest preceding/following context-free
good-or-bad block (document edges count as bad):

* near-good: bad iff pre = post = bad, else good
* short: good+good → good; bad+bad → bad; mixed → good iff a
  near-good block lies strictly between the short block and its
  bad-side neighbor, else bad.

Determinism deviations (documented): every threshold is compared by
integer cross-multiplication (100·n_link > 20·n_words etc.) so no
float convention exists to diverge; "words" are the engine's shared
whitespace tokenization (curation._lower_words — one home for the
tokenizer across all text operators); a "link word" is a token starting
with http(s):// or www. (the plain-text proxy for markup anchors —
this operator runs AFTER extraction, where tags are gone); stopword
membership compares the token with leading/trailing non-alphanumerics
stripped; the stopword list is a compact high-frequency English subset
(parameterize per language, as jusText does).

Scale shape: one projection pass for features (the interpreted HOF
token scans are staged so they evaluate once per block), then ONE
window family over (doc_id, block_idx) — one Exchange + one Sort,
frames vary. No Python stage, no corpus-sized window partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .curation import _lower_words, _sql_lower_words

__all__ = [
    "DEFAULT_STOPWORDS",
    "blocks_from_text",
    "justext_classify",
    "justext_strip",
    "sql_blocks_from_text",
    "sql_justext_classify",
]

# compact high-frequency English subset of jusText's stoplist — one
# tuple, embedded verbatim in the SQL twin so the lists cannot drift
DEFAULT_STOPWORDS = (
    "a", "about", "after", "all", "also", "an", "and", "any", "are",
    "as", "at", "be", "because", "been", "but", "by", "can", "could",
    "did", "do", "does", "for", "from", "had", "has", "have", "he",
    "her", "him", "his", "how", "i", "if", "in", "into", "is", "it",
    "its", "just", "like", "make", "many", "may", "me", "more", "most",
    "my", "no", "not", "now", "of", "on", "one", "only", "or", "other",
    "our", "out", "over", "she", "so", "some", "such", "than", "that",
    "the", "their", "them", "then", "there", "these", "they", "this",
    "time", "to", "two", "up", "us", "use", "was", "we", "well", "were",
    "what", "when", "which", "who", "will", "with", "would", "you",
    "your",
)

_LINK_RE = r"^(https?://|www\.)"          # RE2 ∩ Java safe
_STRIP_RE = r"^[^a-z0-9]+|[^a-z0-9]+$"    # RE2 ∩ Java safe


def blocks_from_text(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, block_idx, block): one row per non-blank line of the
    extracted text, ``block_idx`` = ORIGINAL line number (gaps where
    blank lines fell out keep the context order intact)."""
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
            ).alias("block_idx", "block"),
        )
        .filter(F.trim(F.col("block")) != "")
    )


def sql_blocks_from_text(
    docs_select: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`blocks_from_text` — parallel unnest of the
    split list and its 1-based ordinal (the established twin device for
    posexplode), same blank-line filter, same original-position idx."""
    sp = f"string_split(coalesce({text_col}, ''), chr(10))"
    return (
        f"SELECT doc_id, i - 1 AS block_idx, b AS block FROM "
        f"(SELECT {id_col} AS doc_id, unnest({sp}) AS b, "
        f"unnest(generate_series(1, len({sp}))) AS i "
        f"FROM ({docs_select})) WHERE trim(b) <> ''"
    )


def justext_classify(
    blocks: DataFrame,
    id_col: str = "doc_id",
    idx_col: str = "block_idx",
    text_col: str = "block",
    stopwords: tuple = DEFAULT_STOPWORDS,
    length_low: int = 70,
    length_high: int = 200,
    max_link_density_pct: int = 20,
    stopwords_low_pct: int = 30,
    stopwords_high_pct: int = 32,
) -> DataFrame:
    """(id, block_idx, block, cf_class, final_class): the two jusText
    passes. Thresholds are integer percentages (the published 0.2 /
    0.30 / 0.32 defaults) compared by cross-multiplication."""
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    t = F.trim(F.col(text_col))
    # staged projections: each interpreted HOF scan evaluates once
    feats = blocks.select(
        F.col(id_col).alias("doc_id"),
        F.col(idx_col).alias("block_idx"),
        F.col(text_col).alias("block"),
        F.char_length(t).alias("n_chars"),
        _lower_words(t).alias("ws"),
        t.contains("©").alias("has_c1"),
        F.lower(t).contains("&copy").alias("has_c2"),
    ).select(
        "doc_id",
        "block_idx",
        "block",
        "n_chars",
        "has_c1",
        "has_c2",
        F.size("ws").alias("n_words"),
        F.size(F.filter("ws", lambda w: w.rlike(_LINK_RE))).alias("n_link"),
        F.size(
            F.filter(
                "ws",
                lambda w: F.array_contains(
                    stop_arr, F.regexp_replace(w, _STRIP_RE, "")
                ),
            )
        ).alias("n_stop"),
    )
    cf = feats.select(
        "doc_id",
        "block_idx",
        "block",
        F.expr(
            f"CASE WHEN 100 * n_link > {max_link_density_pct} * n_words "
            "  OR has_c1 OR has_c2 THEN 'bad' "
            f"WHEN n_chars < {length_low} THEN "
            "  CASE WHEN n_link > 0 THEN 'bad' ELSE 'short' END "
            f"WHEN 100 * n_stop >= {stopwords_high_pct} * n_words THEN "
            f"  CASE WHEN n_chars > {length_high} THEN 'good' "
            "       ELSE 'neargood' END "
            f"WHEN 100 * n_stop >= {stopwords_low_pct} * n_words "
            "  THEN 'neargood' "
            "ELSE 'bad' END"
        ).alias("cf_class"),
    )
    w = Window.partitionBy("doc_id").orderBy("block_idx")
    prev_f = w.rowsBetween(Window.unboundedPreceding, -1)
    next_f = w.rowsBetween(1, Window.unboundedFollowing)
    run_b = w.rowsBetween(Window.unboundedPreceding, 0)
    run_a = w.rowsBetween(0, Window.unboundedFollowing)
    is_ng = F.when(F.col("cf_class") == "neargood", 1).otherwise(0)
    gb_cls = F.when(
        F.col("cf_class").isin("good", "bad"), F.col("cf_class")
    )
    # two window stages — a running sum cannot nest inside the
    # last/first_value scan, so s_b/s_a materialize as columns first
    runs = cf.select(
        "doc_id",
        "block_idx",
        "block",
        "cf_class",
        F.sum(is_ng).over(run_b).alias("s_b"),   # near-good count ≤ me
        F.sum(is_ng).over(run_a).alias("s_a"),   # near-good count ≥ me
    )
    ctx = runs.select(
        "doc_id",
        "block_idx",
        "block",
        "cf_class",
        "s_b",
        "s_a",
        F.coalesce(
            F.last(gb_cls, ignorenulls=True).over(prev_f), F.lit("bad")
        ).alias("prev_cls"),
        F.coalesce(
            F.first(gb_cls, ignorenulls=True).over(next_f), F.lit("bad")
        ).alias("next_cls"),
        F.coalesce(
            F.last(
                F.when(F.col("cf_class").isin("good", "bad"), F.col("s_b")),
                ignorenulls=True,
            ).over(prev_f),
            F.lit(0),
        ).alias("prev_s"),
        F.coalesce(
            F.first(
                F.when(F.col("cf_class").isin("good", "bad"), F.col("s_a")),
                ignorenulls=True,
            ).over(next_f),
            F.lit(0),
        ).alias("next_s"),
    )
    # near-good strictly between me and my prev/next good-or-bad
    # neighbor (running counts at the two endpoints; a good/bad row
    # contributes 0 to the count, a short row too, so inclusive
    # endpoint counts cancel exactly)
    ng_before = F.col("s_b") - F.when(
        F.col("cf_class") == "neargood", 1
    ).otherwise(0) - F.col("prev_s") > 0
    ng_after = F.col("s_a") - F.when(
        F.col("cf_class") == "neargood", 1
    ).otherwise(0) - F.col("next_s") > 0
    return ctx.select(
        "doc_id",
        "block_idx",
        "block",
        "cf_class",
        F.when(F.col("cf_class").isin("good", "bad"), F.col("cf_class"))
        .when(
            F.col("cf_class") == "neargood",
            F.when(
                (F.col("prev_cls") == "bad") & (F.col("next_cls") == "bad"),
                F.lit("bad"),
            ).otherwise(F.lit("good")),
        )
        .otherwise(  # short
            F.when(
                (F.col("prev_cls") == "good") & (F.col("next_cls") == "good"),
                F.lit("good"),
            )
            .when(
                (F.col("prev_cls") == "bad") & (F.col("next_cls") == "bad"),
                F.lit("bad"),
            )
            .when(
                F.col("prev_cls") == "bad",  # mixed, bad side precedes
                F.when(ng_before, F.lit("good")).otherwise(F.lit("bad")),
            )
            .otherwise(  # mixed, bad side follows
                F.when(ng_after, F.lit("good")).otherwise(F.lit("bad"))
            )
        )
        .alias("final_class"),
    )


def sql_justext_classify(
    blocks_select: str,
    stopwords: tuple = DEFAULT_STOPWORDS,
    length_low: int = 70,
    length_high: int = 200,
    max_link_density_pct: int = 20,
    stopwords_low_pct: int = 30,
    stopwords_high_pct: int = 32,
) -> str:
    """DuckDB twin of :func:`justext_classify` over a
    ``(doc_id, block_idx, block)`` SELECT — same shared tokenizer
    fragment, same integer cross-multiplied thresholds, same window
    recursion (last_value/first_value IGNORE NULLS over the identical
    frames)."""
    stop_list = ", ".join("'" + s + "'" for s in stopwords)
    return f"""
WITH blk AS ({blocks_select}),
feats AS (
  SELECT doc_id, block_idx, block,
         length(trim(block)) AS n_chars,
         {_sql_lower_words("trim(block)")} AS ws,
         contains(trim(block), '©') AS has_c1,
         contains(lower(trim(block)), '&copy') AS has_c2
  FROM blk
),
cnt AS (
  SELECT doc_id, block_idx, block, n_chars, has_c1, has_c2,
         len(ws) AS n_words,
         len(list_filter(ws, w -> regexp_matches(w, '{_LINK_RE}')))
           AS n_link,
         len(list_filter(ws, w -> list_contains([{stop_list}],
             regexp_replace(w, '{_STRIP_RE}', '', 'g')))) AS n_stop
  FROM feats
),
cf AS (
  SELECT doc_id, block_idx, block,
         CASE WHEN 100 * n_link > {max_link_density_pct} * n_words
                OR has_c1 OR has_c2 THEN 'bad'
              WHEN n_chars < {length_low} THEN
                CASE WHEN n_link > 0 THEN 'bad' ELSE 'short' END
              WHEN 100 * n_stop >= {stopwords_high_pct} * n_words THEN
                CASE WHEN n_chars > {length_high} THEN 'good'
                     ELSE 'neargood' END
              WHEN 100 * n_stop >= {stopwords_low_pct} * n_words
                THEN 'neargood'
              ELSE 'bad' END AS cf_class
  FROM cnt
),
runs AS (
  SELECT doc_id, block_idx, block, cf_class,
         sum(CASE WHEN cf_class = 'neargood' THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY block_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_b,
         sum(CASE WHEN cf_class = 'neargood' THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY block_idx
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS s_a
  FROM cf
),
ctx AS (
  SELECT doc_id, block_idx, block, cf_class, s_b, s_a,
         coalesce(last_value(CASE WHEN cf_class IN ('good', 'bad')
                                  THEN cf_class END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY block_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           'bad') AS prev_cls,
         coalesce(first_value(CASE WHEN cf_class IN ('good', 'bad')
                                   THEN cf_class END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY block_idx
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
           'bad') AS next_cls,
         coalesce(last_value(CASE WHEN cf_class IN ('good', 'bad')
                                  THEN s_b END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY block_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS prev_s,
         coalesce(first_value(CASE WHEN cf_class IN ('good', 'bad')
                                   THEN s_a END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY block_idx
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
           0) AS next_s
  FROM runs
)
SELECT doc_id, block_idx, block, cf_class,
       CASE WHEN cf_class IN ('good', 'bad') THEN cf_class
            WHEN cf_class = 'neargood' THEN
              CASE WHEN prev_cls = 'bad' AND next_cls = 'bad'
                   THEN 'bad' ELSE 'good' END
            WHEN prev_cls = 'good' AND next_cls = 'good' THEN 'good'
            WHEN prev_cls = 'bad' AND next_cls = 'bad' THEN 'bad'
            WHEN prev_cls = 'bad' THEN
              CASE WHEN s_b - CASE WHEN cf_class = 'neargood'
                                   THEN 1 ELSE 0 END - prev_s > 0
                   THEN 'good' ELSE 'bad' END
            ELSE
              CASE WHEN s_a - CASE WHEN cf_class = 'neargood'
                                   THEN 1 ELSE 0 END - next_s > 0
                   THEN 'good' ELSE 'bad' END
       END AS final_class
FROM ctx
"""


def justext_strip(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """Docs with ``text_col`` replaced by the concatenation of their
    final-GOOD blocks in original order (the jusText keep rule); docs
    whose every block classifies bad disappear — a page with no main
    content has nothing to contribute. The rebuild is the engine's
    ordered-rebuild device (array_sort(collect_list(struct)) — map-side
    combinable, no window), so the only shuffle beyond the classifier's
    doc-keyed window Exchange is the doc-keyed rebuild aggregation that
    reuses the same key."""
    cls = justext_classify(
        blocks_from_text(docs, text_col, id_col), **thresholds
    )
    rebuilt = (
        cls.filter(F.col("final_class") == "good")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("block_idx", "block"))
                    ),
                    lambda x: x["block"],
                ),
                "\n",
            ).alias("_jt_text")
        )
    )
    return (
        docs.drop(text_col)
        .join(rebuilt.withColumnRenamed("doc_id", id_col), id_col, "inner")
        .withColumnRenamed("_jt_text", text_col)
    )
