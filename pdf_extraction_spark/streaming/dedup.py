"""Streaming ingest dedup — the on-arrival arm of the corpus dedup
suite (operators/dedup.py handles the at-rest corpus).

A continuously-crawled pages stream re-delivers documents: the same url
re-fetched, and byte-identical content mirrored on different urls. On
ingest this is exactly-once semantics work, not a batch job:

- :func:`dedup_stream_by_url` — drop re-deliveries of a url within a
  watermark horizon (``dropDuplicatesWithinWatermark`` — state is
  bounded by the watermark, so it runs forever; plain
  ``dropDuplicates`` on a stream grows state without bound).
- :func:`dedup_stream_by_content` — same, keyed on a 128-bit content
  hash (mirror detection; 64-bit keys collide at 10^12 docs).

Both are stateful exactly-once-per-key-per-horizon operators: state
lives in the checkpoint, shuffles on the dedup key, and scales with
keys-per-horizon, not corpus size.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_ltz(df: DataFrame, ts_col: str) -> DataFrame:
    # parquet via pyarrow carries NTZ; watermarks need TIMESTAMP (LTZ).
    # value-preserving under the session's pinned UTC timezone.
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def dedup_stream_by_url(
    pages: DataFrame, watermark: str = "1 hour", ts_col: str = "warc_ts"
) -> DataFrame:
    """First delivery of each url within the watermark horizon wins."""
    return (
        _with_ltz(pages, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["url"])
    )


def dedup_stream_by_content(
    pages: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> DataFrame:
    """First delivery of each distinct payload wins (mirror/alias urls
    collapse); the key is md5 of the raw bytes."""
    keyed = _with_ltz(pages, ts_col).withColumn(
        "__content_key", F.md5(F.coalesce(F.col(payload_col), F.lit(b"")))
    )
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__content_key"])
        .drop("__content_key")
    )
