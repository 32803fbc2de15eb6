#!/usr/bin/env python
"""Linearity bench for the pair-free drop-set dedup path under
adversarial skew (verdict r2 item 5).

One near-identical mega-cluster (far beyond max_bucket) + power-law
hosts, at doubling cluster sizes; wall time per level is measured for
the FULL drop-set materialization. If the path were O(cluster²) the
time ratio between consecutive doublings would approach 4; linear ⇒ ≈2
(modulo fixed overheads, which push the ratio BELOW 2 at small N).

Writes BENCH/skew_stress.json:
  {"levels": [{"n": ..., "wall_s": ..., "n_drops": ...}, ...],
   "ratios": [...], "linear": true}

Run: python scripts/skew_stress.py [--sizes 12500,25000,50000,100000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="12500,25000,50000,100000")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "skew_stress.json"
    ))
    ns = ap.parse_args(argv)
    sizes = [int(s) for s in ns.sizes.split(",")]

    from pdf_extraction_spark.operators.dedup import minhash_near_dup_drops
    from pdf_extraction_spark.session import get_spark
    from tests.test_skew_stress import adversarial_corpus

    spark = get_spark(
        app_name="skew_stress",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # warm the session (JVM + Python workers + Arrow) before timing
    warm = adversarial_corpus(spark, 2000)
    minhash_near_dup_drops(warm, "text", "doc_id", num_hashes=32, bands=8).count()

    levels = []
    for n in sizes:
        docs = adversarial_corpus(spark, n).persist()
        docs.count()  # input materialized outside the timed window
        t0 = time.time()
        n_drops = minhash_near_dup_drops(
            docs, "text", "doc_id", num_hashes=32, bands=8, threshold=0.8
        ).count()
        wall = time.time() - t0
        docs.unpersist()
        spark.catalog.clearCache()
        levels.append({"n": n, "wall_s": round(wall, 3), "n_drops": n_drops})
        print(f"n={n}: {wall:.2f}s, {n_drops} drops")

    ratios = [
        round(levels[i + 1]["wall_s"] / levels[i]["wall_s"], 3)
        for i in range(len(levels) - 1)
    ]
    # quadratic behavior on a doubling ladder would trend to 4; allow VM
    # noise headroom above the linear ideal of 2
    linear = all(r <= 3.0 for r in ratios)
    result = {"levels": levels, "ratios": ratios, "linear": linear}
    with open(ns.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()
    return 0 if linear else 1


if __name__ == "__main__":
    raise SystemExit(main())
