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


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

from pdf_extraction_spark.operators.sketches import (  # noqa: E402
    bloom_dedup_flags,
    bloom_probe,
    bloom_sketch,
)


def test_bloom_no_false_negatives(spark):
    """Every member key must probe true — the guarantee the dedup gate
    rests on. Tiny table (m=256) to make collisions abundant."""
    members = spark.range(500).select(F.concat(F.lit("k"), "id").alias("key"))
    sk = bloom_sketch(members, F.col("key"), m_bits=256)
    probed = bloom_probe(sk, members, m_bits=256)
    assert probed.filter(~F.col("maybe")).count() == 0


def test_bloom_fp_rate_bounded(spark):
    """Non-members over a loaded filter: the FP rate must land near the
    analytic (1 − e^{−kn/m})^k — and must be nonzero here, so the
    interesting branch (maybe=true, exact=false) is actually exercised."""
    import math

    n, m, k = 400, 1024, 4
    members = spark.range(n).select(F.concat(F.lit("in"), "id").alias("key"))
    sk = bloom_sketch(members, F.col("key"), n_hashes=k, m_bits=m)
    outsiders = spark.range(5_000).select(
        F.concat(F.lit("out"), "id").alias("key")
    )
    fp = (
        bloom_probe(sk, outsiders, n_hashes=k, m_bits=m)
        .filter(F.col("maybe"))
        .count()
    )
    expected = (1 - math.exp(-k * n / m)) ** k
    assert 0 < fp < 3 * expected * 5_000


def test_bloom_merge_equals_union(spark):
    """Bit-OR of shard filters == filter of the union: union+distinct
    of sketch frames, the property that lets every executor sketch its
    partition independently."""
    a = spark.range(0, 300).select(F.concat(F.lit("m"), "id").alias("key"))
    b = spark.range(200, 600).select(F.concat(F.lit("m"), "id").alias("key"))
    merged = (
        bloom_sketch(a, F.col("key"), m_bits=512)
        .unionAll(bloom_sketch(b, F.col("key"), m_bits=512))
        .distinct()
    )
    direct = bloom_sketch(a.unionAll(b), F.col("key"), m_bits=512)
    assert sorted(r.pos for r in merged.collect()) == sorted(
        r.pos for r in direct.collect()
    )


def test_bloom_dedup_flags_exact_and_null_safe(spark):
    """The gate's verdict must be EXACT (bloom FPs rechecked away) and
    NULL text must never count as a duplicate."""
    history = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None)], "doc_id int, text string"
    )
    incoming = spark.createDataFrame(
        [
            (10, "alpha"),  # true dup
            (11, "gamma"),  # fresh
            (12, None),  # NULL: both flags false
            (13, "beta"),  # true dup
            (14, "beta"),  # duplicate incoming key, still a dup
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: (r.maybe_dup, r.is_dup)
        for r in bloom_dedup_flags(incoming, history, m_bits=64).collect()
    }
    assert len(out) == 5
    assert out[10] == (True, True)
    assert out[13] == (True, True)
    assert out[14] == (True, True)
    assert out[12] == (False, False)
    # 11 may be a bloom FP at m=64, but the exact verdict must be false
    assert out[11][1] is False
    # no false negatives: is_dup implies maybe_dup
    assert all(maybe or not dup for maybe, dup in out.values())


def test_bloom_partition_invariance(spark):
    df = spark.range(1_000).select(F.concat(F.lit("p"), "id").alias("key"))
    s1 = bloom_sketch(df, F.col("key"))
    s2 = bloom_sketch(df.repartition(13), F.col("key"))
    assert sorted(r.pos for r in s1.collect()) == sorted(
        r.pos for r in s2.collect()
    )


# ---------------------------------------------------------------------------
# HDR histogram quantile sketch
# ---------------------------------------------------------------------------

from pdf_extraction_spark.operators.sketches import (  # noqa: E402
    histogram_quantiles,
    histogram_sketch,
    merge_histograms,
    sql_histogram_quantiles,
)


def test_hist_exact_below_64(spark):
    """Values < 64 land in exact bins, so every per-mille estimate of a
    small-value column is the TRUE order statistic, not an approximation."""
    vals = [(v % 50,) for v in range(1_000)]
    df = spark.createDataFrame(vals, "v long")
    sk = histogram_sketch(df, "v")
    out = {
        r.q_mille: r.est
        for r in histogram_quantiles(sk, [100, 500, 900, 1000]).collect()
    }
    import math

    flat = sorted(v for (v,) in vals)
    for q, est in out.items():
        exact = flat[math.ceil(q * len(flat) / 1000) - 1]
        assert est == exact, (q, est, exact)


def test_hist_relative_error_bounded(spark):
    """Above 64 the bin width is ≤ lower_bound/32, so every estimate's
    true quantile lies in [est, est·(1+1/32)) — pinned against the
    exact order statistic on a log-spread sample."""
    import math

    vals = [(int(1.37**k) + j,) for k in range(10, 40) for j in range(7)]
    df = spark.createDataFrame(vals, "v long")
    flat = sorted(v for (v,) in vals)
    sk = histogram_sketch(df, "v")
    rows = histogram_quantiles(sk, [250, 500, 750, 990]).collect()
    assert rows and all(r.n_total == len(flat) for r in rows)
    for r in rows:
        exact = flat[math.ceil(r.q_mille * len(flat) / 1000) - 1]
        assert r.est <= exact < r.est + max(1, r.est // 32), (r, exact)


def test_hist_merge_equals_union(spark):
    """Sketch of the union == bin-keyed sum of shard sketches, exactly —
    the property that lets every executor sketch its partition and a
    metadata-sized reduce combine them."""
    a = spark.range(0, 3_000).select((F.col("id") * 7 % 5_000).alias("v"))
    b = spark.range(0, 2_000).select((F.col("id") * 13 + 40).alias("v"))
    merged = merge_histograms(
        histogram_sketch(a, "v"), histogram_sketch(b, "v")
    )
    direct = histogram_sketch(a.unionAll(b), "v")
    assert sorted((r.bin, r.n) for r in merged.collect()) == sorted(
        (r.bin, r.n) for r in direct.collect()
    )


def test_hist_partition_invariance(spark):
    df = spark.range(10_000).select((F.col("id") * 31 % 99_991).alias("v"))
    q = [500, 900, 999]
    one = histogram_quantiles(histogram_sketch(df, "v"), q).collect()
    two = histogram_quantiles(
        histogram_sketch(df.repartition(17), "v"), q
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))


def test_hist_null_and_negative_excluded(spark):
    df = spark.createDataFrame(
        [(None,), (-5,), (10,), (10,), (100,)], "v long"
    )
    sk = histogram_sketch(df, "v")
    assert sk.agg(F.sum("n")).first()[0] == 3
    rows = histogram_quantiles(sk, [1000]).collect()
    assert rows[0].n_total == 3


def test_hist_duckdb_twin_bit_parity(spark, tmp_path):
    """The full pipeline (bin ids, lower bounds, ceil-division ranks)
    is bit-identical between Spark and the DuckDB twin on a value set
    engineered to sit ON bin boundaries (powers of two, ±1)."""
    import duckdb

    vals = []
    for k in range(6, 20):
        vals += [(2**k - 1,), (2**k,), (2**k + 1,)]
    vals += [(0,), (1,), (63,), (64,)]
    df = spark.createDataFrame(vals * 3, "v long")
    df.write.parquet(str(tmp_path / "t.parquet"), mode="overwrite")
    q = [1, 125, 375, 625, 875, 999, 1000]
    got = sorted(
        tuple(r)
        for r in histogram_quantiles(histogram_sketch(df, "v"), q).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM '{tmp_path}/t.parquet/*.parquet'"
    )
    want = sorted(
        (int(a), int(b), int(c))
        for a, b, c in con.execute(
            sql_histogram_quantiles("v", "t", q)
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Grouped HLL (per-key distinct estimation)
# ---------------------------------------------------------------------------

from pdf_extraction_spark.operators.sketches import (  # noqa: E402
    hll_distinct_by,
    hll_estimate_by,
    hll_sketch_by,
)


def test_hll_by_accuracy_both_branches(spark):
    """Per-key estimates within the m=256 error envelope, with one key
    small enough for the linear branch and one large enough for the
    raw branch — both must land within 10%."""
    small = spark.range(150).select(
        F.lit("s").alias("k"), F.concat(F.lit("a"), "id").alias("v")
    )
    big = spark.range(5_000).select(
        F.lit("b").alias("k"), F.concat(F.lit("z"), "id").alias("v")
    )
    out = {
        r.k: r.est_distinct
        for r in hll_distinct_by(small.unionAll(big), "k", F.col("v")).collect()
    }
    assert abs(out["s"] - 150) / 150 < 0.10
    assert abs(out["b"] - 5_000) / 5_000 < 0.10


def test_hll_by_keys_are_independent(spark):
    """A key's estimate is a pure function of ITS values: adding a huge
    other key must not move it by a single bit."""
    alone = spark.range(800).select(
        F.lit("x").alias("k"), F.concat(F.lit("w"), "id").alias("v")
    )
    noisy = alone.unionAll(
        spark.range(50_000).select(
            F.lit("y").alias("k"), F.concat(F.lit("n"), "id").alias("v")
        )
    )
    a = {r.k: r.est_distinct for r in hll_distinct_by(alone, "k", F.col("v")).collect()}
    b = {r.k: r.est_distinct for r in hll_distinct_by(noisy, "k", F.col("v")).collect()}
    assert a["x"] == b["x"]


def test_hll_by_merge_equals_union(spark):
    """Shard sketches max-merged per (key, register) == union sketch —
    the property that lets every executor sketch its partition of every
    key independently."""
    a = spark.range(1_000).select(
        (F.col("id") % 3).cast("string").alias("k"),
        F.concat(F.lit("u"), "id").alias("v"),
    )
    b = spark.range(500, 2_000).select(
        (F.col("id") % 3).cast("string").alias("k"),
        F.concat(F.lit("u"), "id").alias("v"),
    )
    merged = (
        hll_sketch_by(a, "k", F.col("v"))
        .unionAll(hll_sketch_by(b, "k", F.col("v")))
        .groupBy("k", "register")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    direct = hll_sketch_by(a.unionAll(b), "k", F.col("v"))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    est_m = sorted(map(tuple, hll_estimate_by(merged, "k").collect()))
    est_d = sorted(map(tuple, hll_estimate_by(direct, "k").collect()))
    assert est_m == est_d


def test_hll_by_null_key_and_null_values(spark):
    """NULL values are skipped; a NULL key is one ordinary group (the
    twin's GROUP BY rule)."""
    df = spark.createDataFrame(
        [("a", "1"), ("a", None), (None, "2"), (None, "3"), ("b", None)],
        "k string, v string",
    )
    rows = hll_distinct_by(df, "k", F.col("v")).collect()
    out = {r.k: round(r.est_distinct) for r in rows}
    assert out == {"a": 1, None: 2}  # "b" had only NULL values -> no row


def test_hll_by_partition_invariance(spark):
    df = spark.range(20_000).select(
        (F.col("id") % 7).cast("string").alias("k"),
        F.concat(F.lit("p"), (F.col("id") % 4_000)).alias("v"),
    )
    one = sorted(map(tuple, hll_distinct_by(df, "k", F.col("v")).collect()))
    two = sorted(
        map(tuple, hll_distinct_by(df.repartition(23), "k", F.col("v")).collect())
    )
    assert one == two


# ---------------------------------------------------------------------------
# streaming sketches (state-store parity with the batch bodies)
# ---------------------------------------------------------------------------


def test_streaming_hll_sketch_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.sketches import hll_estimate, hll_sketch
    from pdf_extraction_spark.streaming.events import run_stream_to_memory
    from pdf_extraction_spark.streaming.sketches import streaming_hll_sketch

    docs = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("url-"), (F.col("id") % 997).cast("string")).alias("url"),
    )
    stream_dir = str(tmp_path / "urls_stream")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(stream_dir)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(stream_dir)
    stream = spark.readStream.schema(docs.schema).parquet(stream_dir)
    q = run_stream_to_memory(
        streaming_hll_sketch(stream, F.col("url")), "stream_hll", mode="complete"
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM stream_hll").collect()
    )
    want = sorted(tuple(r) for r in hll_sketch(docs, F.col("url")).collect())
    assert got == want
    # the estimate over the streamed sketch == the batch estimate
    est_stream = hll_estimate(spark.sql("SELECT * FROM stream_hll")).collect()[0]
    est_batch = hll_estimate(hll_sketch(docs, F.col("url"))).collect()[0]
    assert tuple(est_stream) == tuple(est_batch)


def test_streaming_cms_sketch_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.sketches import cms_sketch
    from pdf_extraction_spark.streaming.events import run_stream_to_memory
    from pdf_extraction_spark.streaming.sketches import streaming_cms_sketch

    docs = spark.range(0, 2000).select(
        (F.col("id") % 37).cast("string").alias("word"),
        F.col("id").alias("doc_id"),
    )
    stream_dir = str(tmp_path / "words_stream")
    docs.filter(F.col("doc_id") % 3 == 0).write.parquet(stream_dir)
    docs.filter(F.col("doc_id") % 3 != 0).write.mode("append").parquet(stream_dir)
    stream = spark.readStream.schema(docs.schema).parquet(stream_dir)
    q = run_stream_to_memory(
        streaming_cms_sketch(stream, F.col("word"), depth=3, width=64),
        "stream_cms",
        mode="complete",
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM stream_cms").collect())
    want = sorted(
        tuple(r)
        for r in cms_sketch(docs, F.col("word"), depth=3, width=64).collect()
    )
    assert got == want
    # state is sketch-bounded: never more than depth*width rows
    assert len(got) <= 3 * 64


# --- AMS F2 sketch ---------------------------------------------------------


def _ams_words(spark, rows):
    return spark.createDataFrame([(w,) for w in rows], "word string")


def test_ams_exact_replay_and_twin_parity(spark):
    import duckdb

    from pdf_extraction_spark.operators.sketches import ams_f2, sql_ams_f2

    words = ["alpha"] * 10 + ["beta"] * 5 + ["gamma"] * 3 + ["d", "e", "f"]
    df = _ams_words(spark, words)
    [r] = ams_f2(df, F.col("word"), depth=5, width=32).collect()
    assert r.f2_exact == 10 * 10 + 5 * 5 + 3 * 3 + 3
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    [o] = con.execute(
        sql_ams_f2(f"SELECT key FROM (VALUES {vals}) t(key)", depth=5, width=32)
    ).fetchall()
    assert tuple(r) == o


def test_ams_accuracy_bounded(spark):
    from pdf_extraction_spark.operators.sketches import ams_f2

    # 200 distinct words, zipf-ish counts: F2 concentrated enough to
    # matter, spread enough that the variance bound bites
    words = [f"w{i}" for i in range(200) for _ in range(1 + (200 - i) // 20)]
    [r] = ams_f2(_ams_words(spark, words), F.col("word")).collect()
    assert r.f2_est is not None and r.f2_est >= 0
    # median-of-5 at width 64: std ~ sqrt(2/64)*F2 ~ 18% — assert 60%
    assert abs(r.f2_est - r.f2_exact) <= 0.6 * r.f2_exact


def test_ams_merge_equals_union(spark):
    from pdf_extraction_spark.operators.sketches import ams_sketch

    a = _ams_words(spark, ["x"] * 5 + ["y"] * 2 + ["z"])
    b = _ams_words(spark, ["x"] * 3 + ["q"] * 4)
    union = ams_sketch(a.union(b), F.col("word"), depth=3, width=16)
    sa = ams_sketch(a, F.col("word"), depth=3, width=16)
    sb = ams_sketch(b, F.col("word"), depth=3, width=16)
    merged = (
        sa.union(sb)
        .groupBy("row", "bucket")
        .agg(F.sum("s").alias("s"))
        .filter(F.col("s") != 0)
    )
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in union.collect() if r.s != 0)
    assert got == want


def test_ams_empty_and_null_input(spark):
    from pdf_extraction_spark.operators.sketches import ams_f2

    df = spark.createDataFrame([(None,), (None,)], "word string")
    [r] = ams_f2(df, F.col("word")).collect()
    assert r.f2_est is None and r.f2_exact is None and r.rel_err_ppm is None


def test_ams_partition_invariance(spark):
    from pdf_extraction_spark.operators.sketches import ams_f2

    words = [f"w{i % 37}" for i in range(500)]
    df = _ams_words(spark, words)
    [a] = ams_f2(df, F.col("word")).collect()
    [b] = ams_f2(df.repartition(11), F.col("word")).collect()
    assert tuple(a) == tuple(b)


# --- KMV k-minimum-values sketch -------------------------------------------


def _kmv_df(spark, pairs):
    return spark.createDataFrame(pairs, "grp string, v string")


def test_kmv_exact_branch_and_twin_parity(spark):
    import duckdb

    from pdf_extraction_spark.operators.sketches import (
        kmv_source_overlap,
        sql_kmv_overlap,
    )

    # small disjoint + overlapping sets: every estimate takes the
    # exact branch (all groups < k distinct)
    pairs = (
        [("a", f"x{i}") for i in range(10)]
        + [("b", f"x{i}") for i in range(5, 15)]
        + [("c", f"y{i}") for i in range(8)]
    )
    df = _kmv_df(spark, pairs)
    got = {
        (r.src_a, r.src_b): r
        for r in kmv_source_overlap(df, F.col("v"), "grp", k=64).collect()
    }
    ab = got[("a", "b")]
    assert (ab.est_a, ab.est_b, ab.union_est, ab.inter_est) == (10, 10, 15, 5)
    ac = got[("a", "c")]
    assert (ac.union_est, ac.inter_est) == (18, 0)
    con = duckdb.connect()
    vals = ", ".join(f"('{g}', '{v}')" for g, v in pairs)
    want = {
        (r[0], r[1]): tuple(r)
        for r in con.execute(
            sql_kmv_overlap(f"SELECT * FROM (VALUES {vals}) t(grp, v)", k=64)
        ).fetchall()
    }
    assert {k: tuple(v) for k, v in got.items()} == want


def test_kmv_estimate_accuracy(spark):
    from pdf_extraction_spark.operators.sketches import kmv_source_overlap

    # two big half-overlapping sets: estimator branch, k=64 -> ~13% std
    pairs = [("a", f"v{i}") for i in range(2000)] + [
        ("b", f"v{i}") for i in range(1000, 3000)
    ]
    [r] = kmv_source_overlap(_kmv_df(spark, pairs), F.col("v"), "grp", k=64).collect()
    assert abs(r.est_a - 2000) < 1000 and abs(r.est_b - 2000) < 1000
    assert abs(r.union_est - 3000) < 1500
    assert abs(r.inter_est - 1000) < 800


def test_kmv_sketch_merge_equals_union_sketch(spark):
    from pdf_extraction_spark.operators.sketches import kmv_group_sketches

    k = 16
    a = _kmv_df(spark, [("g", f"v{i}") for i in range(200)])
    b = _kmv_df(spark, [("g", f"v{i}") for i in range(150, 400)])
    [ua] = kmv_group_sketches(a.union(b), F.col("v"), "grp", k).collect()
    [sa] = kmv_group_sketches(a, F.col("v"), "grp", k).collect()
    [sb] = kmv_group_sketches(b, F.col("v"), "grp", k).collect()
    merged = sorted(set(sa.arr) | set(sb.arr))[:k]
    assert list(ua.arr) == merged


def test_kmv_partition_invariance(spark):
    from pdf_extraction_spark.operators.sketches import kmv_source_overlap

    pairs = [(f"g{i % 4}", f"v{i % 97}") for i in range(800)]
    df = _kmv_df(spark, pairs)
    a = sorted(map(tuple, kmv_source_overlap(df, F.col("v"), "grp", 32).collect()))
    b = sorted(
        map(
            tuple,
            kmv_source_overlap(df.repartition(13), F.col("v"), "grp", 32).collect(),
        )
    )
    assert a == b
