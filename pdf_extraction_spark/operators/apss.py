"""All-Pairs Similarity Search with lossless prefix filtering
(Bayardo, Ma & Srikant, WWW 2007 "Scaling up all pairs similarity
search"; prefix filtering after Chaudhuri, Ganti & Kaushik, ICDE 2006).

Find EVERY document pair whose binary-feature cosine meets a threshold
τ — exactly, without the all-pairs join. Features are distinct word
bigrams (Bayardo's own experiments run on binary vectors of web data);
a document is the set of its bigrams, and

    cos(d1, d2) = |d1 ∩ d2| / sqrt(|d1|·|d2|).

The prefix filter: fix ONE global feature order (df ascending — rare
features first — ties by term; the Chaudhuri canonicalization). For a
document d with |d| = ss features, the feature at 1-based position p
has suffix size ss − p + 1, and by Cauchy-Schwarz any pair whose
EARLIEST shared feature sits at position p in d satisfies

    cos(d1, d2) ≤ sqrt(suffix(d1,p)) / sqrt(|d1|).

So only features with suffix_size·SCALE ≥ floor(τ²·SCALE)·ss need to
be indexed (a PREFIX in the global order — floor makes the bound
conservative: the indexed set can only widen). A pair with cos ≥ τ
must share a feature indexed by BOTH sides — candidate generation
joins indexed postings only, and an exact verification join recomputes
the full intersection, so the emitted set equals the brute-force
answer bit-for-bit. The DuckDB twin IS the brute-force inverted-index
join — every strict-oracle run re-proves losslessness of the filter.

Scale shape (100 TB):
- features with df > ``max_df`` (stopword bigrams — the hot-shingle
  anti-prune device) are dropped up front: they dominate join fan-out
  and carry no signal at any realistic τ;
- the suffix-position window is PER-DOCUMENT (partition size = doc
  feature count, never corpus-sized — the sentence_chunks device);
- candidate postings shrink with τ (at τ=0 everything is indexed; at
  τ=0.9 only ~19% of each doc's features are): join fan-out is
  τ-controlled, not corpus-controlled;
- verification touches candidate pairs only; dot products are exact
  int64 counts; the one float step is the shared
  ``round(dot / (sqrt(ss_a)·sqrt(ss_b)), 6)`` chain (the dimsum
  device), bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

APSS_SCALE = 1_000_000_000  # τ² fixed point for the integer prefix bound


def _bigrams(words: Column) -> Column:
    """Adjacent word bigrams of a tokenized array ('' when < 2 words
    never arises: sequence is empty)."""
    return F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term): DISTINCT word bigrams per document over the
    shared corpus tokenizer. Narrow map + explode + one distinct."""
    from .curation import _lower_words

    words = _lower_words(F.coalesce(F.col(text_col), F.lit("")))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_bigrams(words)).alias("term"),
        )
        .distinct()
    )


def sql_doc_features(text_expr: str = "text", table: str = "documents") -> str:
    """DuckDB twin of :func:`doc_features`."""
    from .curation import _sql_lower_words

    ws = _sql_lower_words(f"coalesce({text_expr}, '')")
    return (
        f"SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] AS term "
        f"FROM (SELECT doc_id, {ws} AS ws FROM {table}), "
        "unnest(range(1, greatest(len(ws), 1))) AS t(i)"
    )


def apss_pairs(
    docs: DataFrame,
    tau: float = 0.4,
    max_df: int = 250,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Every doc pair with bigram-set cosine ≥ ``tau``, found via the
    prefix-filtered index. Returns
    (doc_a, doc_b, dot, ss_a, ss_b, cos) with doc_a < doc_b —
    EXACTLY the brute-force answer (the filter is lossless).
    """
    if not 0.0 < tau <= 1.0:
        raise ValueError("tau must be in (0, 1]")
    t2 = int(tau * tau * APSS_SCALE)  # floor → conservative bound

    feats = doc_features(docs, text_col=text_col, id_col=id_col)
    dfreq = feats.groupBy("term").agg(F.count("*").alias("df"))
    # kept feeds the position window, both verification join legs and
    # the norms; ss feeds the window and both norm attachments — each
    # persisted once so the tokenize+distinct+df-join pipeline runs
    # once, not five times (caches returned for release)
    kept = (
        feats.join(dfreq.filter(F.col("df") <= max_df), "term")
        .select("doc_id", "term", "df")
        .persist()
    )
    ss = kept.groupBy("doc_id").agg(F.count("*").alias("ss")).persist()

    # per-doc position in the global (df asc, term asc) order; the
    # window partition is ONE document's feature list, never the corpus
    w = Window.partitionBy("doc_id").orderBy("df", "term")
    pos = kept.select(
        "doc_id", "term", F.row_number().over(w).cast("long").alias("pos")
    ).join(ss, "doc_id")
    index = pos.filter(
        (F.col("ss") - F.col("pos") + 1) * APSS_SCALE >= F.lit(t2) * F.col("ss")
    ).select("doc_id", "term")

    ia = index.select(F.col("doc_id").alias("doc_a"), "term")
    ib = index.select(F.col("doc_id").alias("doc_b"), "term")
    cands = (
        ia.join(ib, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    fa = kept.select(F.col("doc_id").alias("doc_a"), "term")
    fb = kept.select(F.col("doc_id").alias("doc_b"), "term")
    dots = (
        cands.join(fa, "doc_a")
        .join(fb, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("dot"))
    )
    sa = ss.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a"))
    sb = ss.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b"))
    cos = F.round(
        F.col("dot").cast("double")
        / (
            F.sqrt(F.col("ss_a").cast("double"))
            * F.sqrt(F.col("ss_b").cast("double"))
        ),
        6,
    )
    return (
        dots.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "dot", "ss_a", "ss_b", cos.alias("cos"))
        .filter(F.col("cos") >= F.lit(float(tau)))
    )


def apss_pairs_brute(
    docs: DataFrame,
    tau: float = 0.4,
    max_df: int = 250,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Brute-force inverted-index all-pairs (no prefix filter) — the
    in-engine losslessness check for :func:`apss_pairs`."""
    feats = doc_features(docs, text_col=text_col, id_col=id_col)
    dfreq = feats.groupBy("term").agg(F.count("*").alias("df"))
    kept = feats.join(dfreq.filter(F.col("df") <= max_df), "term").select(
        "doc_id", "term"
    )
    ss = kept.groupBy("doc_id").agg(F.count("*").alias("ss"))
    fa = kept.select(F.col("doc_id").alias("doc_a"), "term")
    fb = kept.select(F.col("doc_id").alias("doc_b"), "term")
    dots = (
        fa.join(fb, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("dot"))
    )
    sa = ss.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a"))
    sb = ss.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b"))
    cos = F.round(
        F.col("dot").cast("double")
        / (
            F.sqrt(F.col("ss_a").cast("double"))
            * F.sqrt(F.col("ss_b").cast("double"))
        ),
        6,
    )
    return (
        dots.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "dot", "ss_a", "ss_b", cos.alias("cos"))
        .filter(F.col("cos") >= F.lit(float(tau)))
    )


def sql_apss_pairs(
    tau: float = 0.4,
    max_df: int = 250,
    text_expr: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`apss_pairs` — deliberately the BRUTE
    inverted-index join (no prefix filter), so every oracle run
    re-proves the filter lossless."""
    return f"""
WITH feats AS ({sql_doc_features(text_expr, table)}),
     dfreq AS (SELECT term, count(*) AS df FROM feats GROUP BY term),
     kept AS (SELECT doc_id, feats.term FROM feats JOIN dfreq USING (term)
              WHERE df <= {max_df}),
     ss AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ss FROM kept GROUP BY doc_id),
     dots AS (
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(count(*) AS BIGINT) AS dot
       FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
SELECT doc_a, doc_b, dot, sa.ss AS ss_a, sb.ss AS ss_b,
       round(dot / (sqrt(CAST(sa.ss AS DOUBLE)) * sqrt(CAST(sb.ss AS DOUBLE))), 6)
         AS cos
FROM dots
JOIN ss sa ON doc_a = sa.doc_id
JOIN ss sb ON doc_b = sb.doc_id
WHERE round(dot / (sqrt(CAST(sa.ss AS DOUBLE)) * sqrt(CAST(sb.ss AS DOUBLE))), 6)
      >= {float(tau)!r}
"""
