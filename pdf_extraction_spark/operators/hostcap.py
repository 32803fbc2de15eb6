"""Per-host document caps — the crawl-hygiene rule that no single
domain may dominate the corpus (C4 and RefinedWeb both cap per-host
contribution).

Spark-first shape: per-host top-K is usually written as a
``row_number() OVER (PARTITION BY host ...)`` window — but a window
funnels every row of a host through one task, and crawl host
distributions are power-law (one host can hold 10^9 docs at web
scale). ``collect_list``-based "combinable" top-K has the same problem
one level down: its aggregation buffer holds the whole group before
the slice. The cap here is a **tree of bounded top-K reductions** in
which every aggregation buffer has a hard size bound:

1. group by ``(host, spark_partition_id())`` — each group lives inside
   ONE input partition, so every aggregation buffer is bounded by
   partition size (the memory the task already holds). The stage-1
   shuffle still ships each group's struct array once (16-byte
   (score, id) structs only — the corpus-sized shuffle any grouped
   aggregation pays, same bytes the window formulation ships); what
   the slice bounds is every buffer and every stage OUTPUT, so no
   reducer ever materializes a mega-host;
2. group the ≤ P×K survivors by ``(host, hash-salt)`` with ``fan_in``
   buckets — buffer ≤ ~P×K/fan_in;
3. final group by host over ≤ fan_in×K rows — buffer bounded by a
   constant.

Top-K order: score descending (struct field is the negated score —
double negation is exact), id ascending as the deterministic
tie-break; the result is invariant to partitioning because bounded
top-K is associative and commutative. NaN scores are normalized to
-inf alongside NULLs (engines order NaN at opposite extremes). The
DuckDB twin is the plain window formulation — same result, different
physical plan.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NEG_INF = float("-inf")


def _topk_merge(df: DataFrame, group_cols, k: int, key_col: str = "e") -> DataFrame:
    """One bounded reduction: top-K structs per group, exploded back."""
    return (
        df.groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_list(key_col)), 1, k).alias("top"))
        .select(*[c for c in group_cols if c == "host"], F.explode("top").alias(key_col))
    )


def host_cap(
    df: DataFrame,
    score: Column,
    host_col: str = "source",
    id_col: str = "doc_id",
    k: int = 5,
    fan_in: int = 64,
) -> DataFrame:
    """Keep the best ``k`` docs per host: (host, host_rank, doc_id,
    score). NULL and NaN scores sort last (normalized to -inf)."""
    clean = F.coalesce(F.nanvl(score, F.lit(NEG_INF)), F.lit(NEG_INF))
    key = F.struct((-clean).alias("ns"), F.col(id_col).alias("id"))
    base = df.select(
        F.col(host_col).alias("host"),
        F.spark_partition_id().alias("__pid"),
        key.alias("e"),
    )
    local = _topk_merge(base, ["host", "__pid"], k)  # map-side complete
    salted = local.withColumn("__salt", F.pmod(F.xxhash64(F.col("e.id")), F.lit(fan_in)))
    mid = _topk_merge(salted, ["host", "__salt"], k)
    final = mid.groupBy("host").agg(
        F.slice(F.array_sort(F.collect_list("e")), 1, k).alias("top")
    )
    return final.select("host", F.posexplode("top").alias("pos", "e")).select(
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
    """DuckDB window twin of :func:`host_cap` (NaN → -inf like Spark:
    DuckDB ORDER BY ranks NaN above +inf, Spark's struct sort ranks it
    below everything after negation)."""
    clean = (
        f"coalesce(CASE WHEN isnan({score_expr}) THEN CAST('-inf' AS DOUBLE) "
        f"ELSE {score_expr} END, CAST('-inf' AS DOUBLE))"
    )
    return (
        f"SELECT {host_expr} AS source, CAST(rn AS INT) AS host_rank, "
        f"{id_expr} AS doc_id, score FROM ("
        f"SELECT {host_expr}, {id_expr}, {clean} AS score, "
        f"row_number() OVER (PARTITION BY {host_expr} "
        f"ORDER BY {clean} DESC, {id_expr}) AS rn "
        f"FROM {table}) WHERE rn <= {k}"
    )
