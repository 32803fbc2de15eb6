"""DSIR importance resampling (Xie et al. 2023) — operator tests.

Cross-engine twin parity is covered by the strict oracle sweep and the
adversarial hostile-input sweep (tests/test_adversarial_twins.py); this
module pins the statistical contract (selection actually enriches
toward the target distribution), determinism / partition-layout
invariance, degenerate inputs, and the bounded physical plan.
"""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.mlfilter import (
    dsir_doc_features,
    dsir_log_ratio,
    dsir_log_weights,
    dsir_select,
    gumbel_key_col,
)


def _corpus(spark):
    """60 'science' docs + 60 'spam' docs with disjoint vocabularies;
    doc length ~24 tokens so the log-likelihood-ratio gap dwarfs the
    Gumbel noise (sd ≈ 1.28)."""
    sci = "enzyme protein genome neuron quantum tensor orbit isotope"
    spam = "buy cheap click now winner prize offer deal"
    rows = [(i, (f"{sci} sample {i % 7} " * 3).strip()) for i in range(60)]
    rows += [(100 + i, (f"{spam} sample {i % 7} " * 3).strip()) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_selection_enriches_toward_target(spark):
    docs = _corpus(spark)
    target = docs.filter((F.col("doc_id") < 20))  # science-only exemplar set
    picked = dsir_select(docs, target, k=40)
    ids = [r.doc_id for r in picked.collect()]
    assert len(ids) == 40
    n_sci = sum(1 for i in ids if i < 100)
    # ∝-weight sampling with a vocabulary-sized LLR gap: spam docs have
    # essentially zero chance against 40 science slots
    assert n_sci >= 38, f"only {n_sci}/40 selected docs are target-like"


def test_log_weights_order_science_above_spam(spark):
    docs = _corpus(spark)
    feats = dsir_doc_features(docs)
    lrt = dsir_log_ratio(feats, dsir_doc_features(docs.filter(F.col("doc_id") < 20)))
    w = {r.doc_id: r.log_w for r in dsir_log_weights(feats, lrt).collect()}
    assert min(w[i] for i in range(60)) > max(w[100 + i] for i in range(60))


def test_deterministic_and_partition_invariant(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") % 5 == 0)
    a = sorted(map(tuple, dsir_select(docs, target, k=25).collect()))
    b = sorted(map(tuple, dsir_select(docs.repartition(7), target, k=25).collect()))
    c = sorted(map(tuple, dsir_select(docs.coalesce(1), target, k=25).collect()))
    assert a == b == c


def test_degenerate_texts_survive_with_zero_weight(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   \n\t  "), (4, "real words here")],
        "doc_id long, text string",
    )
    out = dsir_select(docs, docs.filter(F.col("doc_id") == 4), k=10).collect()
    assert sorted(r.doc_id for r in out) == [1, 2, 3, 4]
    w = {r.doc_id: r.log_w for r in out}
    assert w[1] == 0.0 and w[2] == 0.0 and w[3] == 0.0
    assert all(r.key is not None for r in out)


def test_gumbel_keys_finite_and_spread(spark):
    g = (
        spark.range(2000)
        .select(gumbel_key_col(F.col("id")).alias("g"))
        .agg(
            F.min("g").alias("lo"),
            F.max("g").alias("hi"),
            F.avg("g").alias("mu"),
            F.count(F.when(F.isnan("g") | F.col("g").isNull(), 1)).alias("bad"),
        )
        .first()
    )
    assert g.bad == 0
    # standard Gumbel: mean ≈ 0.5772, support spreads both sides of 0
    assert g.lo < -1.0 < 1.0 < g.hi
    assert abs(g.mu - 0.5772) < 0.15


def test_plan_is_bounded_topk_no_python(spark):
    docs = _corpus(spark)
    df = dsir_select(docs, docs.filter(F.col("doc_id") < 10), k=5)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p, "top-k must not global-sort"
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in p, f"unexpected Python stage: {marker}"
    assert "CartesianProduct" not in p


def test_twin_parity_on_duplicate_and_null_doc_ids(spark, tmp_path):
    """The review-found hole: the twin must derive the doc universe from
    the grouped feature frame (like Spark), so duplicate doc_id rows
    collapse to one output row and a NULL doc_id keeps its fold weight."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extraction_spark.operators.mlfilter import sql_dsir_select

    rows = [
        (7, "enzyme protein genome neuron quantum tensor"),
        (7, "buy cheap click now winner prize"),  # duplicate id
        (None, "enzyme protein genome neuron quantum tensor"),  # NULL id
        (1, "enzyme protein genome neuron"),
        (2, "buy cheap click now"),
        (3, None),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    sdf = dsir_select(docs, docs.filter(F.col("doc_id") == 1), k=10)
    srows = sorted(
        [tuple(r) for r in sdf.collect()],
        key=lambda t: (t[0] is None, t[0]),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path / 'documents.parquet'}'"
    )
    orows = sorted(
        con.execute(sql_dsir_select(10, "doc_id = 1")).fetchall(),
        key=lambda t: (t[0] is None, t[0]),
    )
    assert len(srows) == 5  # 4 distinct ids + the NULL group, 7 once
    assert srows == orows
