"""Compression-ratio quality gate (operators/compressgate.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# compression-ratio quality gate (the zlib repetition proxy — cf. Lee
# et al. 2022 "Deduplicating training data makes language models
# better" §4's compressibility analyses and Gopher's repetition family)
# ---------------------------------------------------------------------------
#
# ratio = deflate(utf8(text)) / len(utf8(text)): template/boilerplate
# floods compress far below organic prose, so a low ratio is a cheap
# page-level repetition tripwire that catches patterns the n-gram rules
# miss (long-period repeats, interleaved templates).
#
# Contract: zlib.compress(data, 6) — the zlib library's output is
# deterministic for a fixed level/strategy, and only LENGTHS enter the
# result. The per-doc work is one Arrow-batched UDF crossing (this is
# genuinely non-relational — DuckDB cannot deflate — so the oracle is
# the committed-fixture device: expected column = this same pure
# contract, proving the distributed path reproduces it).
#
# ratio_ppm is integer fixed point: compressed_len·10⁶ DIV byte_len —
# no float anywhere.


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ratio_ppm: int | None = None,
) -> DataFrame:
    """(doc_id, n_bytes, n_compressed, ratio_ppm[, keep]): per-doc
    zlib-level-6 compression ratio in ppm; empty/NULL docs emit ratio
    NULL. With ``max_ratio_ppm`` set, adds the gate column ``keep`` =
    ratio_ppm IS NULL OR ratio_ppm >= threshold (repetition floods
    compress BELOW the threshold)."""

    @pandas_udf("long")
    def _clen(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
            if t is not None
            else None
        )

    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        _clen(F.col(text_col)).alias("n_compressed"),
    ).select(
        "doc_id",
        F.coalesce("n_bytes", F.lit(0)).alias("n_bytes"),
        F.coalesce("n_compressed", F.lit(0)).alias("n_compressed"),
        F.expr(
            "CASE WHEN coalesce(n_bytes, 0) > 0 "
            "THEN n_compressed * 1000000L DIV n_bytes END"
        ).alias("ratio_ppm"),
    )
    if max_ratio_ppm is not None:
        out = out.withColumn(
            "keep",
            F.col("ratio_ppm").isNull()
            | (F.col("ratio_ppm") >= F.lit(max_ratio_ppm)),
        )
    return out

