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


def dedup_stream_against_history(
    stream_docs: DataFrame,
    history_sigs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    n: int = 3,
) -> DataFrame:
    """Drop in-flight documents whose MinHash signature already exists
    in the historical store — the streaming arm of
    ``operators.dedup.minhash_incremental_drops`` (exact-signature
    phase only; near-dup banding needs the batch job, which also
    refreshes the store via ``append_history``).

    Implementation is a stream-static LEFT ANTI join on the signature:
    the static side is re-evaluated per micro-batch, so a store updated
    by the nightly batch job takes effect on the next micro-batch with
    no restart — PROVIDED ``history_sigs`` is an un-cached file-backed
    read of the store (``spark.read.parquet(store_path)``). A persisted
    frame (e.g. the output of ``minhash_signatures``, which self-caches)
    pins every micro-batch to the cached snapshot instead. The
    signature UDF is the same Arrow-batched kernel as the batch path,
    so stream and batch agree bit-exactly on what "already seen" means.

    State: none beyond the join (the store is at-rest data, not
    streaming state) — this scales with micro-batch size, not corpus
    size, and complements the within-horizon operators above."""
    from ..operators.dedup import make_minhash_udf

    mh = make_minhash_udf(num_hashes, n)
    keyed = stream_docs.withColumn("__sig", mh(F.col(text_col)))
    hist = history_sigs.select(F.col("sig").alias("__sig")).distinct()
    return keyed.join(hist, "__sig", "left_anti").drop("__sig")
