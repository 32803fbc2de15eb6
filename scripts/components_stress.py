#!/usr/bin/env python
"""Scaling ladder for connected components (round-5 convergence-fold rework).

``connected_components`` (operators/components.py) drives dedup
clustering: min-label propagation + pointer jumping, one edge-keyed
shuffle per round, each round's labels localCheckpoint()ed. Round 5
folded the convergence check into the checkpointed update (an
aggregate over the frame just materialized) instead of a second
labels ⋈ new_labels shuffle join per round — this ladder evidences
both properties the rework must preserve at scale:

1. **wall linearity in edge count** at fixed topology (doubling the
   graph should ≈double the per-round work, never trend toward 4×);
2. **round count O(log diameter)** via pointer jumping (a chain of
   length L must close in ~log2 L label rounds, not L).

Graph shape per scale: n/8 cliques of size 8 (the near-dup-cluster
shape LSH emits) PLUS one chain of length min(n, 4096) threaded
through distinct nodes (the worst-diameter shape). Correctness is
asserted per rung: every clique collapses to its min member and the
chain collapses to one component.

Writes BENCH/components_stress.json. Run:
  python scripts/components_stress.py [--sizes 50000,100000,200000,400000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pair_graph(spark, n: int, chain_len: int):
    """Edges over node ids [0, n): n/8 8-cliques (star edges to the
    clique min suffice to define the cluster — the LSH rep shape,
    7 edges per clique) plus one chain over the first chain_len
    odd-offset nodes to force diameter."""
    from pyspark.sql import functions as F

    cliques = spark.range(n).filter(F.col("id") % 8 != 0).select(
        (F.col("id") - (F.col("id") % 8)).alias("id_a"), F.col("id").alias("id_b")
    )
    # chain through nodes n, n+1, ..., n+chain_len-1 (disjoint from cliques)
    chain = spark.range(chain_len - 1).select(
        (F.col("id") + n).alias("id_a"), (F.col("id") + n + 1).alias("id_b")
    )
    return cliques.unionAll(chain)


def run_rung(spark, n: int, chain_len: int) -> dict:
    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.components import connected_components

    edges = pair_graph(spark, n, chain_len)
    n_edges = edges.count()  # materialize input outside the timed window
    t0 = time.perf_counter()
    cc = connected_components(edges)
    # correctness assertions double as the materializing action:
    # every clique member labels to its clique min; the chain is ONE
    # component labeled by its min node (id = n)
    bad_clique = cc.filter(
        (F.col("node") < n) & (F.col("component") != F.col("node") - (F.col("node") % 8))
    ).count()
    chain_comps = (
        cc.filter(F.col("node") >= n).select("component").distinct().count()
    )
    wall = time.perf_counter() - t0
    assert bad_clique == 0, f"{bad_clique} clique nodes mislabeled at n={n}"
    assert chain_comps == 1, f"chain split into {chain_comps} components at n={n}"
    return {"n_nodes": n, "n_edges": n_edges, "chain_len": chain_len,
            "wall_s": round(wall, 3)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="50000,100000,200000,400000")
    ap.add_argument("--chain", type=int, default=4096)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "components_stress.json"))
    ns = ap.parse_args(argv)
    sizes = [int(s) for s in ns.sizes.split(",")]

    from pdf_extraction_spark.session import get_spark

    spark = get_spark(app_name="components_stress",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    run_rung(spark, 5000, 256)  # warm JVM + codegen outside the ladder

    rungs = [run_rung(spark, n, min(n, ns.chain)) for n in sizes]
    ratios = [round(b["wall_s"] / a["wall_s"], 2)
              for a, b in zip(rungs, rungs[1:])]
    result = {"rungs": rungs, "per_doubling_wall_ratio": ratios}
    print(json.dumps(result, indent=2))
    with open(ns.out, "w") as f:
        json.dump(result, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
