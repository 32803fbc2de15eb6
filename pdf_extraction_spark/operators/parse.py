"""Transcript segmentation operator (T1/T2): text → dialogue turns.

A Series→Series Arrow-batched pandas UDF wraps the pure segmentation
kernel and returns ``array<struct<speaker,text>>`` per document; turns
then fan out with ``posexplode`` (position = turn order). Stateful
*within* a document, embarrassingly parallel *across* documents — the
canonical pandas-UDF shape (SURVEY.md §2.3 T1).
"""

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels.transcript import parse_transcript

TURNS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("speaker", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
)


@pandas_udf(TURNS_TYPE)
def parse_turns_udf(texts: pd.Series) -> pd.Series:
    return texts.map(
        lambda t: [
            (d["speaker"], d["text"]) for d in parse_transcript(t or "")[1]
        ]
    )


def with_turns(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a ``turns`` array column."""
    return docs.withColumn("turns", parse_turns_udf(F.col(text_col)))


def explode_turns(docs: DataFrame, keep_cols=("url", "warc_ts", "lang")) -> DataFrame:
    """docs with ``turns`` → one row per dialogue turn.

    Output: keep_cols + (turn_pos int, speaker string, content string).
    ``content`` matches the reference chunk naming (filter.py:58)."""
    cols = [F.col(c) for c in keep_cols]
    return (
        docs.select(*cols, F.posexplode("turns").alias("turn_pos", "turn"))
        .select(
            *cols,
            "turn_pos",
            F.col("turn.speaker").alias("speaker"),
            F.col("turn.text").alias("content"),
        )
    )


def speakers_of(docs: DataFrame) -> DataFrame:
    """Distinct sorted speaker list per document (T2/W2) — a native
    higher-order-function expression, no UDF."""
    return docs.withColumn(
        "speakers",
        F.array_sort(F.array_distinct(F.transform("turns", lambda t: t["speaker"]))),
    )
