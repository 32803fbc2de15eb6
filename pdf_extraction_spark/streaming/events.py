"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.11); the streaming wrapper
covers the target table's event/append shape: watermarked tumbling-
window aggregation over an events stream, and a streaming variant of the
extraction pipeline for continuously arriving pages.

Batch/stream parity: the same ``windowed_counts`` logic runs in
``__spark_entry__`` as a batch query with a DuckDB oracle; the streaming
test asserts stream results == batch results on the same data.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_parse


def read_events_stream(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """File-source stream (each new parquet file = one micro-batch)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark."""
    # watermarks need TIMESTAMP (LTZ); parquet written by pyarrow carries
    # NTZ — cast is value-preserving under the session's UTC timezone
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_extraction(pages_stream: DataFrame) -> DataFrame:
    """The extraction pipeline applied to a pages stream — mapInPandas
    works unchanged under Structured Streaming (stateless narrow map)."""
    return extract_parse(pages_stream)


def run_stream_to_memory(stream_df: DataFrame, query_name: str, mode: str = "append"):
    """Drain a stream into an in-memory table (test/debug sink);
    returns the query handle — caller awaits termination/processing."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
