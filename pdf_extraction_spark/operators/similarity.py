"""Approximate nearest-neighbor search over an embedding column.

- :func:`brute_force_topk` — exact cosine top-k (baseline; native HOF
  dot product, TakeOrderedAndProject).
- :func:`ivf_topk` — IVF-style scale path: k-means-lite centroids
  (deterministically seeded sample), every vector assigned to its
  nearest centroid partition; a query probes only ``n_probe`` cells.
  At 100 TB the assignment is a narrow map + the probe prunes ~
  (1 - n_probe/n_cells) of the scan; centroids are broadcast.
- batch variant :func:`brute_force_topk_batch` — many queries at once
  via a vectorized pandas UDF (numpy matmul over Arrow batches).
"""

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .topk import cosine_col, cosine_topk

brute_force_topk = cosine_topk


def _np_normalize(m):
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def kmeans_lite(sample: np.ndarray, n_cells: int, iters: int = 5, seed: int = 42) -> np.ndarray:
    """Deterministic spherical Lloyd iterations — pure-numpy kernel shared
    by :func:`train_centroids` (over a distributed Spark sample) and the
    oracle fixture generator (over the full sorted table), so the
    fixed-centroid assignment step can be oracled exactly."""
    sample = _np_normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _np_normalize(centroids)
    return centroids


def _matrixize(vec_lists) -> np.ndarray:
    """Collected sample rows → float64 matrix, dropping wrong-dimension
    rows (corrupt upstream writes) by majority length — a single ragged
    row would otherwise raise in ``np.array`` and kill training. Mirrors
    the executor-side ``apply_masked`` contract (bad rows excluded)."""
    lens = [len(v) for v in vec_lists if v is not None]
    if not lens:
        return np.zeros((0, 0))
    dim = max(set(lens), key=lens.count)
    return np.array(
        [v for v in vec_lists if v is not None and len(v) == dim],
        dtype=np.float64,
    )


def default_n_cells(total_count: int) -> int:
    """IVF rule of thumb: n_cells ∝ √N keeps (cells probed × vectors per
    cell) balanced at fixed n_probe. Clamped so tiny tables still get a
    few cells and huge tables don't blow up the broadcast model."""
    return max(4, min(int(math.isqrt(max(total_count, 1))), 65536))


def train_centroids(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = None,
    iters: int = 5,
    seed: int = 42,
    sample_size: int = 4096,
    total_count: int = None,
):
    """Centroids from a *distributed* Bernoulli sample (``df.sample``),
    not ``limit()`` — limit takes rows from the first partitions only,
    which at 100 TB means the model sees one shard of the keyspace.
    The sample (≤ ``sample_size`` rows) is the only data gathered to the
    driver; centroids are tiny model state.

    ``total_count`` may be passed from table metadata to skip the count
    job; ``n_cells`` defaults to the √N rule (:func:`default_n_cells`).
    Lloyd iterations run in :func:`kmeans_lite` (deterministic given
    seed + sample).

    Ceiling: the driver sample holds ≤ ``sample_size`` rows, so this
    path can achieve at most ``sample_size`` distinct cells. When
    ``n_cells > sample_size`` (the √N rule crosses 4,096 around
    N ≈ 1.7×10^7 vectors) training dispatches to
    :func:`train_centroids_distributed`, whose Lloyd iterations run on
    the EXECUTORS and whose driver footprint is the model itself."""
    nn = emb.select(vec_col).filter(F.col(vec_col).isNotNull())
    if total_count is None:
        total_count = nn.count()
    if total_count == 0:
        raise ValueError("train_centroids: no non-null vectors")
    if n_cells is None:
        n_cells = default_n_cells(total_count)
    if n_cells > sample_size:
        return train_centroids_distributed(
            emb, vec_col=vec_col, n_cells=n_cells, iters=iters, seed=seed,
            total_count=total_count,
        )
    frac = min(1.0, (sample_size * 1.25) / total_count)
    sampled = nn if frac >= 1.0 else nn.sample(False, frac, seed)
    # collect the WHOLE Bernoulli sample (expected 1.25×sample_size rows,
    # tightly concentrated) and trim with a seeded driver-side choice —
    # sampled.limit() would read only the FIRST partitions of the sample,
    # i.e. the head of the keyspace on a sorted/partitioned table
    sample = _matrixize(sampled.toPandas()[vec_col].tolist())
    if len(sample) > sample_size:
        rng = np.random.default_rng(seed)
        sample = sample[rng.choice(len(sample), size=sample_size, replace=False)]
    return kmeans_lite(sample, n_cells, iters=iters, seed=seed)


def train_centroids_distributed(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = None,
    iters: int = 5,
    seed: int = 42,
    total_count: int = None,
):
    """Distributed spherical Lloyd for ``n_cells`` beyond the driver
    sample ceiling (IVF at 10^9+ vectors wants √N ≈ 10^4–10^5 cells).

    Shape per iteration: assignment is the :func:`assign_cells`
    pandas-UDF matmul (one matmul per Arrow batch, centroids shipped in
    the task closure — the same broadcast cost ``ivf_topk`` itself
    pays); the centroid update is a NATIVE per-dimension ``SUM``
    aggregation over L2-normalized vectors (``groupBy(cell).agg(count,
    sum(v[0]), …, sum(v[d-1]))``) — one shuffle of n_cells·(dim+1)
    partial sums per executor, map-side combined. The only data that
    ever reaches the driver is the n_cells×dim update matrix, i.e. the
    model itself, which any IVF design must hold to broadcast.

    Initialization takes ``n_cells`` rows from a seeded distributed
    Bernoulli sample (deterministic for a fixed input layout). Empty
    cells keep their previous centroid; zero vectors contribute their
    raw components (norm clamped to 1), mirroring :func:`kmeans_lite`'s
    rules so small-scale behavior matches the driver path."""
    nn = emb.select(vec_col).filter(F.col(vec_col).isNotNull())
    if total_count is None:
        total_count = nn.count()
    if total_count == 0:
        raise ValueError("train_centroids_distributed: no non-null vectors")
    if n_cells is None:
        n_cells = default_n_cells(total_count)
    n_cells = min(n_cells, total_count)

    # whole-sample collect + seeded trim for the same reason as in
    # train_centroids: limit() reads the head of the keyspace only. On
    # an undershoot (rare — the sample concentrates around 1.25×n_cells
    # + 64), retry with a doubled fraction rather than falling back to
    # limit(), which would seed every centroid from the first shard.
    frac = min(1.0, (n_cells * 1.25 + 64) / total_count)
    init = np.zeros((0, 0))
    for attempt in range(3):
        sampled = nn if frac >= 1.0 else nn.sample(False, frac, seed + attempt)
        init = _matrixize(sampled.toPandas()[vec_col].tolist())
        if len(init) >= n_cells or frac >= 1.0:
            break
        frac = min(1.0, frac * 2)
    n_cells = min(n_cells, len(init))
    if len(init) > n_cells:
        rng = np.random.default_rng(seed)
        init = init[rng.choice(len(init), size=n_cells, replace=False)]
    centroids = _np_normalize(init)
    dim = centroids.shape[1]

    # L2-normalize natively (zero norm clamps to 1, kmeans_lite's rule)
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x))
    unit = F.transform(F.col(vec_col), lambda x: x / F.when(norm == 0.0, 1.0).otherwise(norm))
    unit_df = nn.select(unit.alias("u"))

    for _ in range(iters):
        assigned = assign_cells(unit_df, centroids, vec_col="u")
        stats = (
            # wrong-dim vectors carry cell=NULL (assign_cells contract);
            # a NULL group must not reach the update loop — numpy would
            # treat nxt[None] as newaxis indexing and overwrite EVERY
            # centroid with that group's mean
            assigned.filter(F.col("cell").isNotNull())
            .groupBy("cell")
            .agg(
                F.count("*").alias("n"),
                *[F.sum(F.col("u")[i]).alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        nxt = centroids.copy()
        for row in stats:
            c = row["cell"]
            if c is not None and row["n"]:
                nxt[c] = np.array([row[f"s{i}"] for i in range(dim)]) / row["n"]
        centroids = _np_normalize(nxt)
    return centroids


def assign_cells(emb: DataFrame, centroids, vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid cell id per vector — vectorized pandas UDF
    (one matmul per Arrow batch)."""
    cents = _np_normalize(np.asarray(centroids, dtype=np.float64))
    bc = cents  # captured in closure, shipped once per task

    dim = bc.shape[1]

    @F.pandas_udf(T.IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        from .batchutil import apply_masked

        # wrong-dim vectors get a null cell (excluded by any cell filter
        # downstream); the good rows assign in ONE matmul per batch
        res = apply_masked(
            vecs.tolist(),
            dim,
            lambda m: np.argmax(_np_normalize(m) @ bc.T, axis=1)
            .astype(np.int32)
            .tolist(),
        )
        return pd.Series(res, dtype="Int32")

    return emb.filter(F.col(vec_col).isNotNull()).withColumn("cell", cell_udf(F.col(vec_col)))


def ivf_topk(
    emb_with_cells: DataFrame,
    centroids,
    query_vec,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_cols=("vec_id",),
) -> DataFrame:
    """Probe the n_probe nearest cells only, exact cosine within."""
    cents = _np_normalize(np.asarray(centroids, dtype=np.float64))
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(cents @ qn))[:n_probe].tolist()
    return cosine_topk(
        emb_with_cells.filter(F.col("cell").isin(probe)),
        query_vec,
        k=k,
        vec_col=vec_col,
        id_cols=id_cols,
    )


def brute_force_topk_batch(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_vec_col: str = "q_vec",
    q_id_col: str = "q_id",
    fan_in: int = 64,
) -> DataFrame:
    """Top-k per query for a batch of queries: broadcast the query matrix,
    score each embedding batch against all queries in one numpy matmul,
    then rank per query with a **tree of bounded top-k reductions**
    (the hostcap.py shape) instead of a global window.

    A ``row_number() OVER (PARTITION BY q_id)`` window shuffles all
    N·Q scored rows and funnels each query's N rows through ONE task —
    at 10^9 docs that is a single-partition-per-query exchange where
    only k rows survive. Here stage 1 groups by (q_id,
    spark_partition_id()) so every aggregation buffer is bounded by
    partition size and map-side combining reduces the shuffle to
    ≤ P·Q·k struct rows; stage 2 salts into ``fan_in`` buckets; the
    final per-query merge sees ≤ fan_in·k rows. Order: similarity
    descending (negated in the sort struct — double negation is
    exact), id ascending as the deterministic tie-break. NaN/NULL
    similarities normalize to -inf (sorted last), matching the
    SQL-window twin."""
    qrows = queries.select(q_id_col, q_vec_col).collect()
    q_ids = [r[0] for r in qrows]
    q_mat = _np_normalize(np.array([r[1] for r in qrows], dtype=np.float64))

    out_type = T.ArrayType(
        T.StructType(
            [T.StructField("q_id", T.LongType()), T.StructField("sim", T.DoubleType())]
        )
    )

    q_dim = q_mat.shape[1]

    @F.pandas_udf(out_type)
    def sims_udf(vecs: pd.Series) -> pd.Series:
        from .batchutil import apply_masked

        def kern(m):
            s = _np_normalize(m) @ q_mat.T  # (n_good, n_queries)
            return [
                [(int(q_ids[j]), float(round(row[j], 6))) for j in range(len(q_ids))]
                for row in s
            ]

        # wrong-dim rows score null (dropped by the explode); the good
        # rows score in ONE matmul per batch
        return pd.Series(apply_masked(vecs.tolist(), q_dim, kern))

    scored = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), F.explode(sims_udf(F.col(vec_col))).alias("qs"))
        .select(id_col, F.col("qs.q_id").alias("q_id"), F.col("qs.sim").alias("similarity"))
    )
    neg_inf = F.lit(float("-inf"))
    clean = F.coalesce(F.nanvl(F.col("similarity"), neg_inf), neg_inf)
    base = scored.select(
        "q_id",
        F.spark_partition_id().alias("__pid"),
        F.struct((-clean).alias("ns"), F.col(id_col).alias("id")).alias("e"),
    )

    def _merge(df, group_cols):
        return (
            df.groupBy(*group_cols)
            .agg(F.slice(F.array_sort(F.collect_list("e")), 1, k).alias("top"))
            .select("q_id", F.explode("top").alias("e"))
        )

    local = _merge(base, ["q_id", "__pid"])  # buffer ≤ partition, map-side complete
    salted = local.withColumn("__salt", F.pmod(F.xxhash64(F.col("e.id")), F.lit(fan_in)))
    mid = _merge(salted, ["q_id", "__salt"])  # buffer ≤ P·k/fan_in
    final = mid.groupBy("q_id").agg(
        F.slice(F.array_sort(F.collect_list("e")), 1, k).alias("top")
    )
    return final.select("q_id", F.explode("top").alias("e")).select(
        F.col("e.id").alias(id_col), "q_id", (-F.col("e.ns")).alias("similarity")
    )
