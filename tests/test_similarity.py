"""IVF ANN tests: full-probe exactness and partial-probe recall.

The driver's ivf_* queries run over COMMITTED fixture centroids so the
whole path gets strict SQL twins; the sampled-TRAINING variant
(train_centroids → assign → probe) is approximate by design and its
quality gate lives here instead: probing every cell must reproduce
brute force exactly, and the default partial probe must keep recall@k
high on the real embeddings table.
"""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.similarity import (
    assign_cells,
    brute_force_topk,
    ivf_topk,
    train_centroids,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def _query_vec():
    import __spark_entry__ as e

    return e._query_vec()


def test_full_probe_equals_brute_force(spark, emb):
    cents = train_centroids(emb, n_cells=8, iters=3)
    cells = assign_cells(emb, cents)
    full = ivf_topk(cells, cents, _query_vec(), k=10, n_probe=8).select(
        "vec_id", "similarity"
    )
    brute = brute_force_topk(emb, _query_vec(), k=10).select("vec_id", "similarity")
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, brute.collect()))


def test_partial_probe_recall(spark, emb):
    cents = train_centroids(emb, n_cells=8, iters=3)
    cells = assign_cells(emb, cents).persist()
    brute_ids = {r["vec_id"] for r in brute_force_topk(emb, _query_vec(), k=10).collect()}
    ivf_ids = {
        r["vec_id"]
        for r in ivf_topk(cells, cents, _query_vec(), k=10, n_probe=3).collect()
    }
    recall = len(brute_ids & ivf_ids) / len(brute_ids)
    assert recall >= 0.6, f"recall@10 with 3/8 probes = {recall}"
    # probing more cells can only improve recall
    ivf5 = {
        r["vec_id"]
        for r in ivf_topk(cells, cents, _query_vec(), k=10, n_probe=5).collect()
    }
    assert len(brute_ids & ivf5) >= len(brute_ids & ivf_ids)
    cells.unpersist()


def test_scan_pruning(spark, emb):
    """The probe must filter cells BELOW the cosine work — the point of
    IVF at scale is scanning ~n_probe/n_cells of the data."""
    cents = train_centroids(emb, n_cells=8, iters=3)
    cells = assign_cells(emb, cents)
    n_all = cells.count()
    probed = ivf_topk(cells, cents, _query_vec(), k=5, n_probe=2)
    # count rows surviving the cell filter (pre-topk) via the same predicate
    import numpy as np

    from pdf_extraction_spark.operators.similarity import _np_normalize

    cn = _np_normalize(np.asarray(cents))
    q = np.asarray(_query_vec(), dtype=float)
    probe = np.argsort(-(cn @ (q / np.linalg.norm(q))))[:2].tolist()
    n_probed = cells.filter(F.col("cell").isin(probe)).count()
    assert n_probed < n_all
    assert probed.count() == 5
