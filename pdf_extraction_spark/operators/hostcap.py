"""Per-host document caps — the crawl-hygiene rule that no single
domain may dominate the corpus (C4 and RefinedWeb both cap per-host
contribution).

Spark-first shape: per-host top-K is usually written as a
``row_number() OVER (PARTITION BY host ...)`` window — but a window
funnels every row of a host through one task, and crawl host
distributions are power-law (one host can hold 10^9 docs at web
scale). Instead the cap is computed as a **combinable bounded top-K**:

1. salt each row into ``salt_buckets`` sub-groups of its host and take
   the top-K of every ``(host, salt)`` group with
   ``slice(array_sort(collect_list(struct(-score, id))), 1, k)`` — a
   partial aggregation with map-side combine, each group emitting at
   most K rows;
2. re-aggregate the ≤ ``salt_buckets × K`` survivors per host the same
   way — the merge input per host is bounded by a constant, so the
   mega-host never meets a single reducer at full size.

Top-K order: score descending (struct field is the negated score —
double negation is exact), id ascending as the deterministic
tie-break. The DuckDB twin is the plain window formulation — same
result, different physical plan.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NEG_INF = float("-inf")


def _topk_structs(key: Column, k: int) -> Column:
    return F.slice(F.array_sort(F.collect_list(key)), 1, k)


def host_cap(
    df: DataFrame,
    score: Column,
    host_col: str = "source",
    id_col: str = "doc_id",
    k: int = 5,
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep the best ``k`` docs per host: (host, host_rank, doc_id,
    score). Null scores sort last (coalesced to -inf)."""
    key = F.struct(
        (-F.coalesce(score, F.lit(NEG_INF))).alias("ns"),
        F.col(id_col).alias("id"),
    )
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    partial = (
        df.groupBy(F.col(host_col).alias("host"), salt.alias("__salt"))
        .agg(_topk_structs(key, k).alias("top"))
        .select("host", F.explode("top").alias("e"))
    )
    final = partial.groupBy("host").agg(
        F.slice(F.array_sort(F.collect_list("e")), 1, k).alias("top")
    )
    return final.select(
        "host", F.posexplode("top").alias("pos", "e")
    ).select(
        F.col("host").alias(host_col),
        (F.col("pos") + 1).cast("int").alias("host_rank"),
        F.col("e.id").alias(id_col),
        (-F.col("e.ns")).alias("score"),
    )


def sql_host_cap(
    score_expr: str,
    host_expr: str = "source",
    id_expr: str = "doc_id",
    k: int = 5,
    table: str = "documents",
) -> str:
    """DuckDB window twin of :func:`host_cap`."""
    return (
        f"SELECT {host_expr} AS source, CAST(rn AS INT) AS host_rank, "
        f"{id_expr} AS doc_id, score FROM ("
        f"SELECT {host_expr}, {id_expr}, "
        f"coalesce({score_expr}, CAST('-inf' AS DOUBLE)) AS score, "
        f"row_number() OVER (PARTITION BY {host_expr} "
        f"ORDER BY coalesce({score_expr}, CAST('-inf' AS DOUBLE)) DESC, {id_expr}) AS rn "
        f"FROM {table}) WHERE rn <= {k}"
    )
