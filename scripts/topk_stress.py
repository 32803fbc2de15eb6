#!/usr/bin/env python
"""Linearity bench for the bounded-tree batch top-k (verdict r3 item 3).

``brute_force_topk_batch`` used to rank with a global
``row_number() OVER (PARTITION BY q_id)`` window: all N·Q scored rows
shuffled, each query's N rows funneled through ONE task. The reworked
path is a tree of bounded top-k reductions (the host_cap shape), so
wall time must stay linear in N at fixed Q — including under
adversarial PARTITION skew (one partition holding half the corpus,
the layout a crawl dump with one mega-file produces), which the tree
absorbs because stage-1 groups are map-side complete within whatever
partition they live in.

Doubling ladder over doc count at fixed Q=16 queries, skewed layout;
quadratic (or single-task-funnel) behavior would trend the per-doubling
wall ratio toward 4; linear ⇒ ≈2 (below 2 at small N where fixed
overheads dominate).

Writes BENCH/topk_stress.json. Run:
  python scripts/topk_stress.py [--sizes 25000,50000,100000,200000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 32
N_QUERIES = 16


def skewed_vectors(spark, n: int):
    """Deterministic unit-ish vectors with a power-law partition layout:
    half the rows land in one partition (repartitionByRange on a key
    that is 0 for half the corpus), the rest spread evenly."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[F.sin((F.col("id") + 1) * float(j + 1)).cast("double") for j in range(DIM)]
        ).alias("embedding"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(31)) + 1)
        .alias("skew_key"),
    )
    return base.repartition(32, "skew_key").drop("skew_key")


def queries_df(spark):
    import math

    from pyspark.sql import functions as F  # noqa: F401

    rows = [
        (q, [math.sin((q + 1) * (j + 1) * 0.7) for j in range(DIM)])
        for q in range(N_QUERIES)
    ]
    return spark.createDataFrame(rows, "q_id long, q_vec array<double>")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="25000,50000,100000,200000")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "topk_stress.json"
    ))
    ns = ap.parse_args(argv)
    sizes = [int(s) for s in ns.sizes.split(",")]

    from pdf_extraction_spark.operators.similarity import brute_force_topk_batch
    from pdf_extraction_spark.session import get_spark

    spark = get_spark(
        app_name="topk_stress",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qdf = queries_df(spark)

    # warm JVM + Arrow + codegen outside any timed window
    brute_force_topk_batch(skewed_vectors(spark, 2000), qdf, k=10).count()

    levels = []
    for n in sizes:
        vecs = skewed_vectors(spark, n).persist()
        vecs.count()
        t0 = time.time()
        n_rows = brute_force_topk_batch(vecs, qdf, k=10).count()
        wall = time.time() - t0
        vecs.unpersist()
        assert n_rows == N_QUERIES * 10, n_rows
        levels.append({"n": n, "wall_s": round(wall, 3), "rows": n_rows})
        print(f"n={n}: {wall:.2f}s")

    ratios = [
        round(levels[i + 1]["wall_s"] / levels[i]["wall_s"], 3)
        for i in range(len(levels) - 1)
    ]
    linear = all(r <= 3.0 for r in ratios)
    result = {
        "queries": N_QUERIES,
        "dim": DIM,
        "skew": "half the corpus in one partition",
        "levels": levels,
        "ratios": ratios,
        "linear": linear,
    }
    with open(ns.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()
    return 0 if linear else 1


if __name__ == "__main__":
    raise SystemExit(main())
