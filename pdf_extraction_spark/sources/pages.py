"""Pages-table IO.

At the 100 TB design point the pages table is an Iceberg table
(``spark.read.format("iceberg").load("warehouse.pages")``) whose
snapshots drive checkpointing (plans/lineage.py). The sandbox has no
Iceberg runtime jar, so the engine reads/writes parquet with the same
schema; the format is a single option switch, nothing else in the engine
depends on it. A ``binaryFile`` reader is also provided for raw crawls.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Read a pages table (parquet path or iceberg table name)."""
    if "/" in path or path.endswith(".parquet"):
        return spark.read.schema(PAGES_SCHEMA).parquet(path)
    return spark.read.format("iceberg").load(path)


def read_raw_crawl(spark: SparkSession, glob: str) -> DataFrame:
    """Raw files → pages shape via the binaryFile source (path → url,
    modificationTime → warc_ts); the filename-derived date/quarter columns
    come later from operators.financial.with_url_date."""
    raw = spark.read.format("binaryFile").load(glob)
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def synth_pages_df(spark: SparkSession, n_rows: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic synthesis: spark.range → mapInPandas,
    each task generates its own row span (no driver-side materialization,
    scales to any n_rows)."""
    import pandas as pd

    from .synth import synth_page_row

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = [synth_page_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )
