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


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Web corpora commonly ship as JSONL (one doc per line — Dolma/
    RedPajama/FineWeb layout): url, timestamp (ISO-8601), html
    (base64-encoded when binary), text, lang. Normalized to the pages
    schema; missing fields become NULLs. Spark's json source splits
    .jsonl/.jsonl.gz files line-parallel, so the read scales like any
    text scan."""
    raw = spark.read.schema(
        "url string, timestamp string, html string, text string, lang string"
    ).json(path)
    return raw.select(
        "url",
        F.to_timestamp("timestamp").alias("warc_ts"),
        F.unbase64("html").alias("html"),
        "text",
        "lang",
    )


def write_pages_jsonl(pages: DataFrame, path: str):
    """Inverse of read_pages_jsonl (binary html → base64 string)."""
    (
        pages.select(
            "url",
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
            F.base64("html").alias("html"),
            "text",
            "lang",
        ).write.mode("overwrite").json(path)
    )


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
