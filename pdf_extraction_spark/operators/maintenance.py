"""Table-maintenance planning: small-file compaction and
budget-constrained mixture allocation.

Both operators plan over METADATA- or SOURCE-sized tables — the file
listing of a 100 TB / 512 MB-file corpus is ~200k rows and the source
dimension of a training mixture is tens of rows — so "one window over
everything" is a bounded-state operation here, not a corpus-sized
funnel (documented per operator below).

Compaction (the Iceberg ``rewrite_data_files`` binpack shape): a
10^12-doc table accretes small files from incremental commits; the
planner assigns files to target-sized output bins so a rewrite job can
run one task per bin. Mixture planning (the LLaMA/GPT-3-style sampling
table): given per-source token inventories, integer per-mille target
weights, and a token budget, compute per-source allocations with
WATER-FILLING — a capped source's unused share re-distributes to the
uncapped sources — then hand the resulting rates to the existing
``weighted_mix`` sampler. All arithmetic is exact int64 (budgets in
tokens, weights in per-mille, rates in parts-per-million), so both
planners are bit-identical across engines and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "compaction_plan",
    "sql_compaction_plan",
    "mixture_plan",
    "sql_mixture_plan",
]


# ---------------------------------------------------------------------------
# Small-file compaction planning (Iceberg rewrite_data_files binpack shape)
# ---------------------------------------------------------------------------
#
# Deterministic NEXT-FIT by cumulative size in file-id order:
#   bin = (cumulative bytes BEFORE this file) div target_bytes
# Every bin holds ≥ 1 file; a bin's total exceeds target only by its
# last file's overflow (the streaming-shelf guarantee), and oversized
# files land alone in their own bin(s) of the sequence. The window runs
# over the FILE LISTING — metadata-sized by construction (~2·10^5 rows
# at 100 TB with 512 MB files), the one place a global window is the
# honest plan; partition by the table's partition key to bound it
# further on a real deployment (``part_col``).


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    file_col: str = "file_id",
    bytes_col: str = "bytes",
    part_col: str = None,
) -> DataFrame:
    """(file_id, bytes, bin, bin_files, bin_bytes): next-fit bin
    assignment in ``file_col`` order plus per-bin rollups. Bins with
    ``bin_files`` > 1 are the merge candidates; single-file bins at or
    above target are already well-sized and the rewrite skips them."""
    part = [part_col] if part_col else []
    w = Window.partitionBy(*part).orderBy(file_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    binned = files.select(
        *part,
        F.col(file_col).alias("file_id"),
        F.col(bytes_col).alias("bytes"),
        (
            F.coalesce(F.sum(bytes_col).over(w), F.lit(0))
            / F.lit(target_bytes)
        ).cast("long").alias("bin"),
    )
    roll = Window.partitionBy(*part, "bin")
    return binned.select(
        *part,
        "file_id",
        "bytes",
        "bin",
        F.count("*").over(roll).alias("bin_files"),
        F.sum("bytes").over(roll).alias("bin_bytes"),
    )


def sql_compaction_plan(
    files_select: str,
    target_bytes: int,
    part_col: str = None,
) -> str:
    """DuckDB twin of :func:`compaction_plan` — same next-fit cumsum
    (integer ``//`` on non-negative values ≡ Spark's floor cast), same
    per-bin rollup windows."""
    p = f"{part_col}, " if part_col else ""
    pb = f"PARTITION BY {part_col}" if part_col else ""
    pbin = f"PARTITION BY {p[:-2]}, bin" if part_col else "PARTITION BY bin"
    return f"""
WITH f AS ({files_select}),
binned AS (
  SELECT {p}file_id, bytes,
         coalesce(sum(bytes) OVER ({pb + ' ' if pb else ''}ORDER BY file_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {target_bytes} AS bin
  FROM f
)
SELECT {p}file_id, bytes, bin,
       count(*) OVER ({pbin}) AS bin_files,
       sum(bytes) OVER ({pbin}) AS bin_bytes
FROM binned
"""


# ---------------------------------------------------------------------------
# Budget-constrained mixture allocation (water-filling)
# ---------------------------------------------------------------------------
#
# Inputs: per-source available tokens, integer PER-MILLE target weights
# (the published mixture tables — LLaMA's 67%/15%/... — are exactly
# this), a total token budget. Round: pool = budget − Σ(capped
# inventories); each still-uncapped source's candidate is
# pool · w_i div Σ(uncapped w); a candidate at or above the source's
# inventory CAPS the source at exactly its inventory and leaves the
# open set; everyone else holds the candidate. Every round either caps
# a new source or reproduces the previous state, so ``n_rounds`` =
# (#cap waves + 1) reaches the fixed point — 4 covers any realistic
# mixture table (raise it for adversarial cap cascades). Integer
# division throughout — conservative by < 1 token per source, never
# over budget.


def mixture_plan(
    docs: DataFrame,
    weights_pm: dict,
    budget_tokens: int,
    source_col: str = "source",
    tokens_col: str = "token_count",
    n_rounds: int = 4,
) -> DataFrame:
    """(source, avail_tokens, alloc_tokens, rate_ppm): water-filled
    token allocation per source. ``weights_pm`` maps source → integer
    per-mille weight; sources absent from the map get weight 0 (and
    alloc 0), sources in the map but absent from the corpus contribute
    nothing. ``rate_ppm`` = alloc·10^6 div avail is the sampling rate
    the ``weighted_mix`` sampler consumes."""
    wmap = F.create_map(
        *[F.lit(x) for kv in weights_pm.items() for x in kv]
    )
    avail = (
        docs.filter(F.col(source_col).isNotNull())
        .groupBy(F.col(source_col).alias("source"))
        .agg(F.sum(F.coalesce(F.col(tokens_col), F.lit(0))).alias("avail"))
        .select(
            "source",
            "avail",
            F.coalesce(wmap[F.col("source")], F.lit(0))
            .cast("long")
            .alias("w"),
        )
    )
    # the source table is tens of rows — the fixed-point loop runs as
    # n_rounds narrow recomputations over it, driver-free
    alloc = avail.select(
        "source", "avail", "w", F.lit(0).cast("long").alias("alloc"),
        F.lit(False).alias("capped"),
    )
    for _ in range(n_rounds):
        tot = alloc.agg(
            F.coalesce(
                F.sum(F.when(~F.col("capped"), F.col("w"))), F.lit(0)
            ).alias("w_open"),
            F.coalesce(
                F.sum(F.when(F.col("capped"), F.col("alloc"))), F.lit(0)
            ).alias("spent_capped"),
        )
        cand = (
            "CASE WHEN w_open = 0 THEN 0L "
            f"ELSE ({budget_tokens}L - spent_capped) * w div w_open END"
        )
        alloc = (
            alloc.crossJoin(F.broadcast(tot))
            .select(
                "source",
                "avail",
                "w",
                F.expr(
                    "CASE WHEN capped THEN alloc "
                    f"WHEN {cand} >= avail THEN avail "
                    f"ELSE {cand} END"
                ).alias("alloc"),
                F.expr(f"capped OR {cand} >= avail").alias("capped"),
            )
        )
        alloc = alloc.localCheckpoint()  # read twice next round; plan doubles
    return alloc.select(
        "source",
        F.col("avail").alias("avail_tokens"),
        F.col("alloc").alias("alloc_tokens"),
        F.expr("CASE WHEN avail > 0 THEN alloc * 1000000 div avail "
               "ELSE 0 END").alias("rate_ppm"),
    ).orderBy("source")


def sql_mixture_plan(
    docs_select: str,
    weights_pm: dict,
    budget_tokens: int,
    n_rounds: int = 4,
) -> str:
    """DuckDB twin of :func:`mixture_plan` — the identical integer
    water-filling recursion unrolled one MATERIALIZED CTE per round
    over a ``(source, token_count)`` SELECT."""
    wcase = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in weights_pm.items()
    )
    parts = [
        f"d AS MATERIALIZED ({docs_select})",
        "a0 AS MATERIALIZED (SELECT source, "
        "sum(coalesce(token_count, 0)) AS avail, "
        f"(CASE source {wcase} ELSE 0 END) AS w, "
        "CAST(0 AS BIGINT) AS alloc, FALSE AS capped "
        "FROM d WHERE source IS NOT NULL GROUP BY source)",
    ]
    for i in range(n_rounds):
        parts.append(
            f"t{i} AS MATERIALIZED (SELECT "
            f"coalesce(sum(CASE WHEN NOT capped THEN w END), 0) AS w_open, "
            "coalesce(sum(CASE WHEN capped THEN alloc END), 0) "
            f"AS spent_capped FROM a{i})"
        )
        cand = (
            f"(CASE WHEN (SELECT w_open FROM t{i}) = 0 THEN 0 "
            f"ELSE ({budget_tokens} - (SELECT spent_capped FROM t{i})) "
            f"* w // (SELECT w_open FROM t{i}) END)"
        )
        parts.append(
            f"a{i + 1} AS MATERIALIZED (SELECT source, avail, w, "
            "CASE WHEN capped THEN alloc "
            f"WHEN {cand} >= avail THEN avail "
            f"ELSE {cand} END AS alloc, "
            f"capped OR {cand} >= avail AS capped "
            f"FROM a{i})"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT source, avail AS avail_tokens, alloc AS alloc_tokens, "
        "CASE WHEN avail > 0 THEN alloc * 1000000 // avail ELSE 0 END "
        f"AS rate_ppm FROM a{n_rounds} ORDER BY source"
    )
