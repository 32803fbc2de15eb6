"""md5-register sketches (HLL / Count-Min): accuracy bounds,
mergeability, determinism, degenerate inputs. Cross-engine twin parity
lives in the strict oracle sweep (hll_words / cms_topwords) and the
adversarial hostile-input sweep."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.sketches import (
    cms_estimate,
    cms_heavy_hitters,
    cms_sketch,
    hll_distinct,
    hll_estimate,
    hll_sketch,
)


def test_hll_accuracy_raw_branch(spark):
    """100k distinct values saturate the 4096 registers (raw-estimate
    branch); HLL std error at m=4096 is ~1.6%, so 5% is a safe pin."""
    df = spark.range(100_000).select(F.concat(F.lit("v"), "id").alias("v"))
    est = hll_distinct(df, F.col("v")).first().est_distinct
    assert abs(est - 100_000) / 100_000 < 0.05


def test_hll_accuracy_linear_branch(spark):
    """Small cardinalities take the linear-counting branch and land
    much tighter."""
    df = spark.range(200).select(F.concat(F.lit("x"), "id").alias("v"))
    est = hll_distinct(df, F.col("v")).first().est_distinct
    assert abs(est - 200) / 200 < 0.05


def test_hll_duplicates_do_not_move_the_sketch(spark):
    uniq = spark.range(5_000).select(F.concat(F.lit("d"), "id").alias("v"))
    dup = uniq.unionAll(uniq).unionAll(uniq)
    a = hll_distinct(uniq, F.col("v")).first().est_distinct
    b = hll_distinct(dup, F.col("v")).first().est_distinct
    assert a == b


def test_hll_merge_equals_union(spark):
    """Sketch mergeability: max-merge of two shard sketches must equal
    the sketch of the union — the property that lets 1000 executors
    sketch independently and combine."""
    a = spark.range(0, 30_000).select(F.concat(F.lit("m"), "id").alias("v"))
    b = spark.range(20_000, 60_000).select(
        F.concat(F.lit("m"), "id").alias("v")
    )
    merged = (
        hll_sketch(a, F.col("v"))
        .unionAll(hll_sketch(b, F.col("v")))
        .groupBy("register")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    direct = hll_sketch(a.unionAll(b), F.col("v"))
    assert (
        hll_estimate(merged).first() == hll_estimate(direct).first()
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_partition_invariance_and_nulls(spark):
    df = spark.createDataFrame(
        [(None,), ("a",), ("b",), ("a",), (None,)], "v string"
    )
    r1 = hll_distinct(df, F.col("v")).first()
    r2 = hll_distinct(df.repartition(7), F.col("v")).first()
    assert r1 == r2
    assert r1.n_registers == 2  # NULLs skipped, duplicates collapse


def test_hll_empty_input(spark):
    df = spark.createDataFrame([], "v string")
    r = hll_estimate(hll_sketch(df, F.col("v"))).first()
    assert r.n_registers == 0 and r.est_distinct == 0.0


def test_cms_never_undercounts_and_is_exact_when_sparse(spark):
    rows = [("w%d" % (i % 50),) for i in range(5_000)]
    df = spark.createDataFrame(rows, "v string")
    hh = cms_heavy_hitters(df, F.col("v"), k=50).collect()
    assert len(hh) == 50
    for r in hh:
        assert r.est >= r.exact  # CMS point queries never under-count
        assert r.exact == 100
    # 50 keys in a 4x1024 table: collisions essentially impossible
    assert all(r.est == r.exact for r in hh)


def test_cms_overcount_bounded_under_load(spark):
    """20k distinct keys >> 1024 columns force collisions: estimates
    over-count but the min-over-4-rows keeps the top key's error far
    below a single-row sketch's."""
    rows = [("hot",)] * 2_000 + [
        ("k%d" % i,) for i in range(20_000)
    ]
    df = spark.createDataFrame(rows, "v string")
    hot = (
        cms_heavy_hitters(df, F.col("v"), k=1)
        .filter(F.col("key") == "hot")
        .first()
    )
    assert hot is not None and hot.exact == 2_000
    assert hot.est >= 2_000
    assert hot.est <= 2_000 + 200  # ~20k extra mass / 1024 cols per row, min over 4


def test_cms_merge_equals_union(spark):
    a = spark.createDataFrame([("x",)] * 30 + [("y",)] * 5, "v string")
    b = spark.createDataFrame([("x",)] * 10 + [("z",)] * 7, "v string")
    merged = (
        cms_sketch(a, F.col("v"))
        .unionAll(cms_sketch(b, F.col("v")))
        .groupBy("row", "col")
        .agg(F.sum("c").alias("c"))
    )
    union_sk = cms_sketch(a.unionAll(b), F.col("v"))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, union_sk.collect())
    )
    est = {
        r.key: r.est
        for r in cms_estimate(
            merged, a.unionAll(b).select(F.col("v").alias("key"))
        ).collect()
    }
    assert est["x"] == 40 and est["y"] == 5 and est["z"] == 7
