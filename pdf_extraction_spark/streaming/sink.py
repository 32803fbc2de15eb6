"""Exactly-once streaming extraction sink.

plans/lineage.py gives batch extraction its snapshot-bucket commit
protocol; this is the same protocol for continuously arriving pages:
``foreachBatch`` + idempotent per-batch dynamic partition overwrite +
lineage-row-as-commit-marker.

Failure contract (mirrors plans/lineage.py):
- a batch's docs land under ``batch_id=<n>`` via dynamic partition
  overwrite → a retried batch REPLACES its half-written output instead
  of appending duplicates;
- the lineage row (snapshot_id = batch_id) is written only after the
  docs commit — it is the marker; a batch whose lineage row exists is
  skipped outright on redelivery;
- the stream's own checkpoint handles source progress, so a restarted
  query re-reads nothing already processed; the lineage guard covers
  the foreachBatch-retry window the checkpoint cannot.
"""

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.lineage import extract_with_lineage, lineage_of


def committed_batches(spark: SparkSession, lineage_path: str) -> set:
    if not os.path.exists(lineage_path):
        return set()
    try:
        rows = (
            spark.read.parquet(lineage_path).select("snapshot_id").distinct().collect()
        )
        return {r.snapshot_id for r in rows}
    except Exception:
        return set()


def make_extraction_sink(out_dir: str):
    """foreachBatch callback: pages micro-batch → extracted docs
    partitioned by batch_id (idempotent) → lineage commit marker."""
    docs_path = os.path.join(out_dir, "docs")
    lineage_path = os.path.join(out_dir, "lineage")

    def sink(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        if batch_id in committed_batches(spark, lineage_path):
            return  # redelivered after a successful commit — drop
        if not os.path.exists(docs_path) and batch_df.isEmpty():
            # an empty FIRST-EVER batch would write a schema-less docs
            # dir that the lineage read-back below cannot infer — skip.
            # Once docs exist the hazard is gone, so steady-state batches
            # never pay the extra isEmpty() job (the dir check is free)
            return
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        extracted = extract_with_lineage(batch_df).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        (
            extracted.write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(docs_path)
        )
        committed = spark.read.parquet(docs_path).filter(
            F.col("batch_id") == batch_id
        )
        lineage_of(committed, snapshot_id=batch_id).write.mode("append").parquet(
            lineage_path
        )

    return sink


def run_streaming_extraction_to_parquet(
    spark: SparkSession, pages_dir: str, out_dir: str, schema, available_now: bool = True
):
    """Wire a file-source pages stream through the exactly-once sink.
    ``available_now=True`` drains everything currently present and stops
    (the batch-shaped test/run mode); False runs continuously."""
    stream = spark.readStream.schema(schema).parquet(pages_dir)
    writer = (
        stream.writeStream.foreachBatch(make_extraction_sink(out_dir))
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
