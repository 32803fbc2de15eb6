"""Aggregations (A1–A8) and ranking windows (W1/W6).

All native groupBy/agg/window — partial aggregation (map-side combine)
and AQE-coalesced shuffles come free from Catalyst. ``collect_set``
results are ``array_sort``-ed so outputs are deterministic and
oracle-comparable.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def category_rollup(chunks: DataFrame, group_cols=("company", "category")) -> DataFrame:
    """A1–A3: per-group doc count, date range, distinct speakers/files."""
    return chunks.groupBy(*group_cols).agg(
        F.count("*").alias("total_documents"),
        F.min("date").alias("earliest"),
        F.max("date").alias("latest"),
        F.size(F.collect_set("speaker")).alias("n_speakers"),
        F.size(F.collect_set("source_file")).alias("n_source_files"),
    )


def summary_counts(chunks: DataFrame, group_cols=("category",)) -> DataFrame:
    """A4/A7: counts per group."""
    return chunks.groupBy(*group_cols).agg(F.count("*").alias("n_docs"))


def top_k_per_group(
    df: DataFrame, partition_cols, order_col, k: int = 3, desc: bool = True,
    tie_break_cols=(),
) -> DataFrame:
    """W6/A5: row_number ≤ k per partition (TakeOrdered per group).

    Pass ``tie_break_cols`` naming columns that vary WITHIN the
    partition — partition columns are constant there and cannot break
    ties, which makes results at a tied k-boundary nondeterministic."""
    ordering = F.desc(order_col) if desc else F.asc(order_col)
    w = Window.partitionBy(*partition_cols).orderBy(ordering, *tie_break_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pass_rate(df: DataFrame, keep_pred, group_cols=()) -> DataFrame:
    """A6: kept/total counters as one aggregate (the metrics the
    reference prints at filter.py:81-113)."""
    agg = [
        F.count("*").alias("total"),
        F.sum(F.when(keep_pred, 1).otherwise(0)).alias("kept"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*agg)
    return df.agg(*agg)


def keep_last_by(df: DataFrame, key_cols, order_col) -> DataFrame:
    """D2: later record wins per key (executive roster merge —
    ``dict.update`` keep-last semantics, executive_extractor.py:125)."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
