"""Executive roster extraction (T3) + fuzzy name-match join (J1).

The reference does a nested loop over every (chunk, executive) pair with
a three-rule predicate and first-match-wins
(executive_extractor.py:43-105). Relationally: every match rule implies
*last-token equality*, so the theta-join collapses to a broadcast
equi-join on ``last_name_key`` + ordered post-filter + first-roster-wins
dedup — no cross product, no shuffle of the big side beyond the join
itself (roster is tiny → broadcast).
"""

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels.executives import extract_roster

ROSTER_TYPE = T.ArrayType(
    T.StructType(
        [T.StructField("name", T.StringType()), T.StructField("role", T.StringType())]
    )
)


@pandas_udf(ROSTER_TYPE)
def roster_udf(contents: pd.Series) -> pd.Series:
    return contents.map(lambda c: list(extract_roster(c or "").items()))


def extract_executives(chunks: DataFrame, order_col: str = "url") -> DataFrame:
    """MANAGEMENT turns → executives dim (name, role); later files
    override earlier roles (D2 keep-last)."""
    rosters = (
        chunks.filter(F.col("speaker") == "MANAGEMENT")
        .withColumn("roster", roster_udf(F.col("content")))
        .select(F.col(order_col).alias("__src"), F.explode("roster").alias("e"))
        .select("__src", F.col("e.name").alias("executive"), F.col("e.role").alias("role"))
    )
    w = Window.partitionBy("executive").orderBy(F.desc("__src"))
    return (
        rosters.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("executive", "role")
    )


def norm_name_col(c) -> F.Column:
    """UPPER + strip non-word/space (kernels.executives.normalize_name)."""
    return F.regexp_replace(F.upper(c), r"[^\w\s]", "")


def last_token_col(c) -> F.Column:
    return F.element_at(F.split(F.trim(norm_name_col(c)), r"\s+"), -1)


def match_executives(
    chunks: DataFrame,
    roster: DataFrame,
    speaker_col: str = "speaker",
    roster_order_col: str = None,
) -> DataFrame:
    """J1: chunks ⋈ roster on last-name key, reference match predicate
    (full-name ∨ last-token ∨ first+last), first roster entry wins.

    ``roster`` needs columns (executive, role) and optionally
    ``roster_pos`` for deterministic first-match order; without it,
    roster order = executive name order."""
    spk = F.col(speaker_col)
    exec_name = F.col("executive")

    r = roster
    if "roster_pos" not in r.columns:
        w = Window.orderBy("executive")
        r = r.withColumn("roster_pos", F.row_number().over(w))
    r = r.withColumn("exec_key", last_token_col(exec_name))

    # per-ROW identity for the first-match dedup: partitioning by chunk
    # column values would collapse fully-duplicate rows into one match,
    # unlike the reference's per-row loop
    c = (
        chunks.filter(spk != "MANAGEMENT")
        .withColumn("spk_key", last_token_col(spk))
        .withColumn("__rid", F.monotonically_increasing_id())
    )

    joined = c.join(F.broadcast(r), c["spk_key"] == r["exec_key"], "inner")

    # last-token equality already holds from the join key; the reference's
    # three rules are therefore all satisfied — the post-filter is kept
    # for fidelity with non-key variants of the matcher
    clean_spk = F.regexp_replace(F.trim(norm_name_col(spk)), r"\s+", " ")
    clean_exec = F.regexp_replace(F.trim(norm_name_col(exec_name)), r"\s+", " ")
    full_eq = clean_spk == clean_exec
    last_eq = F.lit(True)
    first_last_eq = (
        (F.size(F.split(clean_spk, " ")) >= 2)
        & (F.size(F.split(clean_exec, " ")) >= 2)
        & (F.element_at(F.split(clean_spk, " "), 1) == F.element_at(F.split(clean_exec, " "), 1))
    )
    matched = joined.filter(full_eq | last_eq | first_last_eq)

    # first-match-wins: the reference breaks at the first roster entry
    # (dict order) that matches (executive_extractor.py:59-77)
    chunk_cols = list(chunks.columns)
    w = Window.partitionBy("__rid").orderBy("roster_pos")
    return (
        matched.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*chunk_cols, "executive", "role", "roster_pos")
        .withColumnRenamed("role", "executive_role")
    )
