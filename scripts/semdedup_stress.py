#!/usr/bin/env python
"""Linearity bench for cluster-local SemDeDup (round 4).

``semantic_dedup``'s pair work is quadratic ONLY within a cell — the
whole point of the SemDeDup design (Abbas et al. 2023) is that the
all-pairs comparison is replaced by Σ c_i² over cell sizes c_i. The
operating regime at scale is therefore FIXED cell size: n_cells grows
with the corpus (the paper runs 50k clusters on LAION), so doubling the
corpus at constant cell size must double the wall, not quadruple it.

This ladder doubles N while scaling n_cells = N / CELL_TARGET, over
clustered synthetic vectors with a deliberate hot cluster (4× the
average membership) so the cell equi-join sees skew. Quadratic
(all-pairs) behavior would trend the per-doubling wall ratio toward 4;
linear ⇒ ≈2.

Writes BENCH/semdedup_stress.json. Run:
  python scripts/semdedup_stress.py [--sizes 25000,50000,100000,200000]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 32
CELL_TARGET = 500  # expected members per cell at every ladder rung
HOT_SHARE = 4      # the hot cluster gets ~4x the average membership


def _centers(n_cells: int):
    """Deterministic well-separated unit centers (pure python — the
    same list feeds vector synthesis AND the centroids argument)."""
    cents = []
    for c in range(n_cells):
        v = [math.sin((c + 1) * (j + 1) * 0.37) + (3.0 if j == c % DIM else 0.0)
             for j in range(DIM)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        cents.append([x / n for x in v])
    return cents


def clustered_vectors(spark, n: int, n_cells: int):
    """Rows land near center (id mod n_cells), except a hot slice that
    all lands near center 0 — membership of cell 0 is ~HOT_SHARE× the
    average. Noise is small enough that tight in-cluster near-dup pairs
    exist at τ=0.9 (the drop path does real work)."""
    from pyspark.sql import functions as F

    cents = _centers(n_cells)
    cent_lit = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c])
            for c in cents
        ]
    )
    # hot slice: the first (HOT_SHARE-1)/HOT_SHARE-th of ids that would
    # have gone to cells 1..HOT_SHARE-1 are redirected to cell 0
    cell = F.when(
        F.pmod(F.col("id"), F.lit(n_cells)) < HOT_SHARE, F.lit(0)
    ).otherwise(F.pmod(F.col("id"), F.lit(n_cells)).cast("int"))
    noise = F.array(
        *[
            (F.sin((F.col("id") + 7) * float(j + 13)) * 0.28).cast("double")
            for j in range(DIM)
        ]
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.zip_with(
            F.element_at(cent_lit, cell + 1), noise, lambda a, b: a + b
        ).alias("embedding"),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="25000,50000,100000,200000")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "semdedup_stress.json",
    ))
    ns = ap.parse_args(argv)
    sizes = [int(s) for s in ns.sizes.split(",")]

    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.similarity import semantic_dedup
    from pdf_extraction_spark.session import get_spark

    spark = get_spark(
        app_name="semdedup_stress",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # warm JVM + Arrow + codegen outside any timed window (n_cells must
    # exceed HOT_SHARE or the hot redirect collapses every row into one
    # cell and the warmup runs a degenerate single-cell pair join)
    semantic_dedup(
        clustered_vectors(spark, 2000, 8), _centers(8), threshold=0.9
    ).count()

    levels = []
    for n in sizes:
        n_cells = max(4, n // CELL_TARGET)
        cents = _centers(n_cells)
        vecs = clustered_vectors(spark, n, n_cells).persist()
        vecs.count()
        t0 = time.time()
        out = semantic_dedup(vecs, cents, threshold=0.9, cache=True)
        # ONE action: a second count would re-execute the whole pair
        # join (only the assignment frame is cached) and double wall_s
        total, kept = out.agg(
            F.count("*"), F.sum(F.col("kept").cast("long"))
        ).first()
        wall = time.time() - t0
        vecs.unpersist()
        spark.catalog.clearCache()  # drop the operator's assignment cache
        assert total == n, (total, n)
        assert 0 < kept < n, kept  # drops really happened
        levels.append(
            {"n": n, "n_cells": n_cells, "wall_s": round(wall, 3),
             "kept": kept, "dropped": n - kept}
        )
        print(f"n={n} cells={n_cells}: {wall:.2f}s kept={kept}")

    # mega-cell guard: ALL rows in one cell (n_cells=1 — the worst
    # case the max_cell LSH path exists for). Exact would be n² pairs;
    # the guard must finish in seconds and still drop the near-dup mass.
    mega_n = sizes[-1]
    vecs = clustered_vectors(spark, mega_n, 1).persist()
    vecs.count()
    t0 = time.time()
    out = semantic_dedup(
        vecs, _centers(1), threshold=0.9, cache=True, max_cell=CELL_TARGET
    )
    m_total, m_kept = out.agg(
        F.count("*"), F.sum(F.col("kept").cast("long"))
    ).first()
    mega_wall = time.time() - t0
    vecs.unpersist()
    spark.catalog.clearCache()
    assert m_total == mega_n and 0 < m_kept < mega_n
    mega = {
        "n": mega_n, "n_cells": 1, "max_cell": CELL_TARGET,
        "wall_s": round(mega_wall, 3), "kept": m_kept,
        "dropped": mega_n - m_kept,
    }
    print(f"mega-cell n={mega_n}: {mega_wall:.2f}s kept={m_kept}")

    ratios = [
        round(levels[i + 1]["wall_s"] / levels[i]["wall_s"], 3)
        for i in range(len(levels) - 1)
    ]
    # linear ⇒ wall ratio ≈ size ratio; allow 1.5x headroom for noise.
    # Scaled by the ACTUAL step so non-doubling --sizes grade correctly
    size_ratios = [
        levels[i + 1]["n"] / levels[i]["n"] for i in range(len(levels) - 1)
    ]
    linear = all(r <= 1.5 * sr for r, sr in zip(ratios, size_ratios))
    result = {
        "cell_target": CELL_TARGET,
        "dim": DIM,
        "skew": f"hot cluster with ~{HOT_SHARE}x average membership",
        "levels": levels,
        "ratios": ratios,
        "linear": linear,
        "mega_cell_guard": mega,
    }
    with open(ns.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()
    return 0 if linear else 1


if __name__ == "__main__":
    raise SystemExit(main())
