"""Skew-aware aggregation: salted two-stage groupBy (SURVEY.md §4.2.2).

The synthetic corpus gives one host ~30% of all rows (sources/synth.py
SKEW_HOST_SHARE) — the stand-in for a dominant domain in a real crawl.
A naive ``groupBy(host)`` sends every row of that host to one reducer;
salting splits each hot key across S sub-keys (stage 1) and merges the
S partials (stage 2, S rows per host — trivially small).

Results are exactly equal to the naive plan (oracle-checked in
__spark_entry__), the shuffle is balanced. AQE's skew-join handling
covers *joins*; salting is the aggregation-side tool.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_col(url: Column) -> Column:
    return F.parse_url(url, F.lit("HOST"))


def salted_agg(
    df: DataFrame,
    key_col: Column,
    agg_exprs: dict,
    salt_buckets: int = 16,
    salt_source: str = "url",
) -> DataFrame:
    """Two-stage aggregation over a skewed key.

    ``agg_exprs``: {output_name: (stage1_agg_fn, stage2_merge_fn)} where
    each fn maps a column name → aggregate Column. Supported out of the
    box via :func:`salted_counts` for count/sum shapes."""
    stage1 = df.withColumn("__key", key_col).withColumn(
        "__salt", F.pmod(F.xxhash64(salt_source), F.lit(salt_buckets))
    )
    partials = stage1.groupBy("__key", "__salt").agg(
        *[fn1.alias(f"__p_{name}") for name, (fn1, _fn2) in agg_exprs.items()]
    )
    merged = partials.groupBy("__key").agg(
        *[fn2(f"__p_{name}").alias(name) for name, (_fn1, fn2) in agg_exprs.items()]
    )
    return merged.withColumnRenamed("__key", "key")


def salted_host_stats(pages: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Per-host doc count + payload bytes, salt-balanced."""
    return salted_agg(
        pages,
        host_col(F.col("url")),
        {
            "n_docs": (F.count("*"), F.sum),
            "total_bytes": (F.sum(F.length("html")), F.sum),
        },
        salt_buckets=salt_buckets,
    ).withColumnRenamed("key", "host")


def naive_host_stats(pages: DataFrame) -> DataFrame:
    """The single-stage plan (skewed shuffle) — equivalence oracle for
    the salted variant."""
    return pages.groupBy(host_col(F.col("url")).alias("host")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("html")).alias("total_bytes"),
    )
