"""Banded random-hyperplane LSH for embedding near-dup (the scale path
that replaced the single-sketch Catalyst-literal formulation) + the
reworked IVF training.

Quality gates demanded by the round-2 verdict:
- sketch kernel bit-identity (Spark pandas UDF ≡ pure numpy — the same
  kernel the oracle fixture generator uses),
- LSH output ⊆ brute force (the exact-cosine filter makes precision 1),
- recall ≥ 0.9 vs brute at τ=0.95 with the default 64-plane/8-band
  sketch on a clustered corpus,
- mega-cluster bucket cap: a dense duplicate cluster cannot create an
  n² candidate explosion,
- shared-sketch reuse (``sketches=``) is plan-equivalent.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_extraction_spark.operators.dedup import (
    embedding_near_dups,
    embedding_sketches,
    hyperplanes,
    sign_sketch_bands,
)

SF = "/root/testdata/sf0.01"

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def _clustered_vectors(n_clusters=40, per_cluster=4, dim=32, noise=0.02, seed=7):
    """Clusters of perturbed copies — intra-cluster cosine ≥ ~0.99,
    inter-cluster ~0 (random directions in dim=32)."""
    rng = np.random.RandomState(seed)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        base = rng.randn(dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            v = base + noise * rng.randn(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def test_sketch_kernel_bit_identity(spark, emb):
    """The Spark pandas-UDF sketch must be bit-identical to the pure
    numpy kernel the oracle fixture generator runs."""
    got = {
        r["vec_id"]: r["bands"]
        for r in embedding_sketches(emb, n_planes=16, n_bands=8).collect()
    }
    rows = sorted(
        emb.filter(F.col("embedding").isNotNull()).collect(), key=lambda r: r["vec_id"]
    )
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ref = sign_sketch_bands(mat, hyperplanes(64, 16, seed=42), 8)
    assert all(list(ref[i]) == got[rows[i]["vec_id"]] for i in range(len(rows)))


def test_lsh_subset_of_brute(spark, emb):
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(emb, threshold=0.35, brute_force=True).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(
            emb, threshold=0.35, n_planes=16, n_bands=8
        ).collect()
    }
    assert lsh <= brute
    assert len(lsh) / max(len(brute), 1) >= 0.9


def test_recall_at_095(spark):
    """Default sketch (64 planes / 8 bands of 8 bits): analytic recall at
    τ=0.95 is 1-(1-(1-θ/π)^8)^8 ≈ 0.99; assert ≥ 0.9 measured."""
    df = spark.createDataFrame(_clustered_vectors(), VEC_SCHEMA)
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(df, threshold=0.95, brute_force=True).collect()
    }
    assert len(brute) >= 100  # the fixture really contains near-dup pairs
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(df, threshold=0.95).collect()
    }
    assert lsh <= brute
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.9, f"recall@0.95 = {recall}"


def test_mega_cluster_bucket_cap(spark):
    """2,000 near-identical vectors all land in the same buckets in every
    band; with max_bucket=100 those buckets are dropped, so the candidate
    set stays bounded instead of ~2M pairs. (At τ≥0.9 such clusters are
    caught upstream by exact/minhash dedup — the cap is the backstop.)"""
    rng = np.random.RandomState(3)
    base = rng.randn(16)
    base /= np.linalg.norm(base)
    rows = [
        (i, [float(x) for x in base + 1e-4 * rng.randn(16)]) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, VEC_SCHEMA).repartition(8)
    out = embedding_near_dups(df, threshold=0.95, max_bucket=100)
    # the ~2M-pair mega-bucket is capped away; only the rare noise-flipped
    # vectors landing in small side buckets survive as candidates
    assert out.count() < 8 * (100 * 99) // 2  # << C(2000,2) = 1.999M


def test_cache_sketches_opt_out(spark, emb):
    """cache_sketches=False: identical output, zero new cached frames
    (the one-shot-pipeline hygiene contract)."""
    jsc = spark.sparkContext._jsc
    emb.count()  # materialize the fixture's own persist() pre-baseline

    def cached_ids():
        # id sets, not counts: the async ContextCleaner may release
        # OTHER tests' stale entries mid-test
        return {k for k in jsc.getPersistentRDDs().keySet().toArray()}

    baseline = cached_ids()
    out = embedding_near_dups(
        emb, threshold=0.35, n_planes=16, n_bands=8, cache_sketches=False
    )
    rows = sorted(map(tuple, out.collect()))
    assert not (cached_ids() - baseline)
    cached = embedding_near_dups(emb, threshold=0.35, n_planes=16, n_bands=8)
    assert rows == sorted(map(tuple, cached.collect()))


def test_shared_sketches_param(spark, emb):
    sk = embedding_sketches(emb, n_planes=16, n_bands=8)
    direct = embedding_near_dups(emb, threshold=0.35, n_planes=16, n_bands=8)
    shared = embedding_near_dups(
        emb, threshold=0.35, n_planes=16, n_bands=8, sketches=sk
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, shared.collect()))


def test_empty_input_lsh_path(spark):
    df = spark.createDataFrame([], VEC_SCHEMA)
    assert embedding_near_dups(df, threshold=0.9).count() == 0


def test_ragged_dims_do_not_kill_the_stage(spark):
    """A wrong-dimension vector in the column (corrupt upstream write)
    must not crash the batch: correct-dim rows sketch/assign normally,
    the bad row is excluded (null bands / null cell). The corrupt row
    goes FIRST — dim inference must use the majority length, not the
    first row (a first()-based inference would null-sketch the whole
    corpus and silently no-op the dedup)."""
    rows = [(9999, [0.5] * 7)]  # corrupt row at the head of the table
    rows += _clustered_vectors(n_clusters=6, per_cluster=3, dim=16)
    rows.append((9998, None))
    df = spark.createDataFrame(rows, VEC_SCHEMA).coalesce(1)

    sk = {r["vec_id"]: r["bands"] for r in embedding_sketches(df, n_planes=16, n_bands=8).collect()}
    assert sk[9999] is None
    assert 9998 not in sk  # null vector filtered before the UDF
    assert sum(v is not None for v in sk.values()) == 18

    pairs = embedding_near_dups(df, threshold=0.95, n_planes=16, n_bands=8)
    ids = {i for r in pairs.collect() for i in (r["id_a"], r["id_b"])}
    assert 9999 not in ids and 9998 not in ids
    assert len(ids) >= 12  # real clusters still found


def test_ragged_dims_assign_cells(spark):
    rows = _clustered_vectors(n_clusters=4, per_cluster=2, dim=16)
    rows.append((9999, [0.5] * 7))
    df = spark.createDataFrame(rows, VEC_SCHEMA)

    from pdf_extraction_spark.operators.similarity import assign_cells, kmeans_lite

    cents = kmeans_lite(np.array([r[1] for r in rows[:8]], dtype=np.float64), 4)
    got = {r["vec_id"]: r["cell"] for r in assign_cells(df, cents).collect()}
    assert got[9999] is None
    assert all(v is not None for k, v in got.items() if k != 9999)


def test_ragged_dims_topk_batch(spark):
    from pyspark.sql import types as T2

    from pdf_extraction_spark.operators.similarity import brute_force_topk_batch

    rows = _clustered_vectors(n_clusters=4, per_cluster=2, dim=16)
    rows.append((9999, [0.5] * 7))
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    q_schema = T2.StructType(
        [
            T2.StructField("q_id", T2.LongType()),
            T2.StructField("q_vec", T2.ArrayType(T2.DoubleType())),
        ]
    )
    queries = spark.createDataFrame([(1, rows[0][1])], q_schema)
    top = brute_force_topk_batch(df, queries, k=3)
    got = {r["vec_id"] for r in top.collect()}
    assert rows[0][0] in got  # the query's own vector ranks
    assert 9999 not in got


def test_plane_count_validation(spark, emb):
    with pytest.raises(ValueError):
        embedding_sketches(emb, n_planes=10, n_bands=8)


class TestIvfTraining:
    def test_kmeans_lite_deterministic(self):
        from pdf_extraction_spark.operators.similarity import kmeans_lite

        rng = np.random.RandomState(0)
        m = rng.randn(300, 8)
        a = kmeans_lite(m, 6, seed=42)
        b = kmeans_lite(m, 6, seed=42)
        assert np.array_equal(a, b)
        assert a.shape == (6, 8)
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0)

    def test_default_n_cells_sqrt_rule(self):
        from pdf_extraction_spark.operators.similarity import default_n_cells

        assert default_n_cells(1_000_000) == 1000
        assert default_n_cells(100) == 10
        assert default_n_cells(4) == 4  # floor
        assert default_n_cells(10**13) == 65536  # broadcast-model ceiling

    def test_train_centroids_distributed_sample(self, spark, emb):
        """Sampling is df.sample (per-partition Bernoulli), bounded by
        sample_size, deterministic given seed; n_cells defaults to √N."""
        from pdf_extraction_spark.operators.similarity import train_centroids

        a = train_centroids(emb, sample_size=256, total_count=500)
        b = train_centroids(emb, sample_size=256, total_count=500)
        assert np.array_equal(a, b)
        assert a.shape[0] == 22  # isqrt(500)
        explicit = train_centroids(emb, n_cells=8, iters=3)
        assert explicit.shape[0] == 8

    def test_n_cells_beyond_sample_ceiling_achieved(self, spark):
        """The driver-sample path can express at most sample_size cells;
        n_cells > sample_size must dispatch to the distributed Lloyd
        path and achieve EXACTLY the requested cell count (the √N rule
        crosses 4,096 around N ≈ 1.7×10^7 vectors)."""
        from pdf_extraction_spark.operators.similarity import train_centroids

        emb = spark.range(10_000).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[F.sin((F.col("id") + 1) * float(j + 1)).cast("double") for j in range(8)]
            ).alias("embedding"),
        )
        cents = train_centroids(emb, n_cells=4_100, iters=1, total_count=10_000)
        assert cents.shape == (4_100, 8)
        assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)

    def test_train_centroids_distributed_deterministic(self, spark, emb):
        """Distributed Lloyd: executor-side assignment + native per-dim
        SUM recompute; only the n_cells×dim model reaches the driver.
        Deterministic given seed + input layout, unit-norm output, and
        the assignment it induces covers every requested cell id range."""
        from pdf_extraction_spark.operators.similarity import (
            assign_cells,
            train_centroids_distributed,
        )

        a = train_centroids_distributed(emb, n_cells=16, iters=2, total_count=500)
        b = train_centroids_distributed(emb, n_cells=16, iters=2, total_count=500)
        assert np.array_equal(a, b)
        assert a.shape[0] == 16
        cells = {r["cell"] for r in assign_cells(emb, a).select("cell").distinct().collect()}
        assert cells <= set(range(16))

    def test_corrupt_vector_does_not_collapse_centroids(self, spark):
        """REGRESSION: assign_cells emits cell=NULL for wrong-dim
        vectors; a NULL cell group reaching the numpy update loop as
        ``nxt[None] = mean`` is newaxis indexing — it silently
        overwrites EVERY centroid with that group's mean. One corrupt
        row must leave training equal to the clean run."""
        from pdf_extraction_spark.operators.similarity import (
            train_centroids_distributed,
        )

        clean_rows = _clustered_vectors(n_clusters=6, per_cluster=20, dim=16)
        clean = spark.createDataFrame(clean_rows, VEC_SCHEMA)
        dirty = spark.createDataFrame(
            clean_rows + [(9999, [0.5] * 7)], VEC_SCHEMA
        )
        a = train_centroids_distributed(clean, n_cells=6, iters=2, total_count=120)
        b = train_centroids_distributed(dirty, n_cells=6, iters=2, total_count=120)
        # centroids must be distinct points, not one collapsed mean
        assert len({tuple(np.round(c, 9)) for c in b}) == 6
        assert np.allclose(a, b)
