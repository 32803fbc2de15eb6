"""Corpus data card — the one-page dataset datasheet a training-data
release ships with (Datasheets for Datasets, Gebru et al. 2018; Dolma /
FineWeb-style data cards).

Composes the existing native operators into three small aggregation
jobs (no driver-side row loops; every distribution collected is
bounded-cardinality by construction):

1. one full-scan aggregate: doc/token/char counts, quality-ratio means,
   Gopher pass rate, PII density, exact-dup rate (countDistinct over
   the 128-bit normalized-text key);
2. language distribution (≤ #languages rows);
3. top-k source/host distribution (TakeOrderedAndProject).
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.curation import scrub_pii, with_gopher_flags
from ..operators.textanalysis import langid_udf, token_count_col, with_quality_ratios


def corpus_card(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = "source",
    top_k_groups: int = 10,
) -> dict:
    """Returns the card as a plain dict (JSON-ready)."""
    enriched = (
        with_quality_ratios(docs, text_col)
        .withColumn("token_count", token_count_col(F.col(text_col)))
        .withColumn("detected_lang", langid_udf(F.col(text_col)))
    )
    enriched = with_gopher_flags(enriched, text_col)
    # scrub_pii aliases its id column to 'doc_id' — alias it back so the
    # join works for any id_col
    pii = scrub_pii(docs, text_col, id_col).select(
        F.col("doc_id").alias(id_col),
        (F.col("n_emails") + F.col("n_ips") + F.col("n_phones")).alias("n_pii"),
    )
    enriched = enriched.join(pii, id_col)

    row = enriched.agg(
        F.count("*").alias("n_docs"),
        F.sum("token_count").alias("total_tokens"),
        F.sum(F.length(text_col)).alias("total_chars"),
        F.round(F.avg("token_count"), 2).alias("mean_tokens"),
        F.round(F.avg("stopword_ratio"), 4).alias("mean_stopword_ratio"),
        F.round(F.avg("punct_ratio"), 4).alias("mean_punct_ratio"),
        F.round(F.avg(F.col("gopher_pass").cast("double")), 4).alias("gopher_pass_rate"),
        F.sum("n_pii").alias("n_pii_hits"),
        F.countDistinct(
            F.md5(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))))
        ).alias("n_distinct_texts"),
    ).first()

    langs = {
        r["detected_lang"]: r["n"]
        for r in enriched.groupBy("detected_lang").agg(F.count("*").alias("n")).collect()
    }
    card = {
        "n_docs": row["n_docs"],
        "total_tokens": row["total_tokens"],
        "total_chars": row["total_chars"],
        "mean_tokens": row["mean_tokens"],
        "mean_stopword_ratio": row["mean_stopword_ratio"],
        "mean_punct_ratio": row["mean_punct_ratio"],
        "gopher_pass_rate": row["gopher_pass_rate"],
        "pii_hits_per_doc": round(row["n_pii_hits"] / max(row["n_docs"], 1), 4),
        "exact_dup_rate": round(1 - row["n_distinct_texts"] / max(row["n_docs"], 1), 4),
        "languages": dict(sorted(langs.items())),
    }
    if group_col and group_col in docs.columns:
        top = (
            enriched.groupBy(group_col)
            .agg(F.count("*").alias("n"), F.sum("token_count").alias("tokens"))
            .orderBy(F.desc("n"), group_col)
            .limit(top_k_groups)
            .collect()
        )
        card["top_groups"] = [
            {"group": r[group_col], "n_docs": r["n"], "tokens": r["tokens"]} for r in top
        ]
    return card
