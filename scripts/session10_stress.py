#!/usr/bin/env python
"""Doubling-ladder linearity bench for the session-10 operators:
prefix-filtered APSS (corpus-scaled with bounded near-dup groups),
host set-overlap similarity (fingerprint-scaled), triangle counting
(edge-scaled with power-law degrees), funnel depths (event-scaled),
TextRank keyterms (corpus-scaled) and Moore-Lewis selection
(corpus-scaled, trains two LMs per level).

Each level doubles the driven dimension; wall time is one full
materialization per level. Linear ⇒ consecutive ratios ≈ 2 (fixed
overheads push small-N ratios below 2); a quadratic path (the failure
mode each operator's prune is supposed to prevent) trends toward 4.

Writes BENCH/session10_stress.json:
  {"ops": {"<op>": {"levels": [{"n":..., "wall_s":...}], "ratios": [...]}}}

Run: python scripts/session10_stress.py [--scale 1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn):
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH",
            "session10_stress.json",
        ),
    )
    ns = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.apss import apss_pairs
    from pdf_extraction_spark.operators.funnel import funnel_depths
    from pdf_extraction_spark.operators.graphstats import triangle_stats
    from pdf_extraction_spark.operators.hostsim import pair_overlap
    from pdf_extraction_spark.operators.mlfilter import moore_lewis_select
    from pdf_extraction_spark.operators.terms import textrank_terms
    from pdf_extraction_spark.session import get_spark

    spark = get_spark(
        app_name="session10_stress",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = 25_000 * ns.scale
    sizes = [base, base * 2, base * 4]
    report = {"ops": {}}

    def ladder(name, run):
        levels = []
        # untimed warmup at the smallest level: JVM codegen + page-cache
        # effects otherwise dominate level 1 and invert the ratios
        run(sizes[0])
        for n in sizes:
            reps = []
            for _ in range(2):  # min of 2 — GC/AQE noise swamps 1-shot
                spark.catalog.clearCache()
                reps.append(_timed(lambda: run(n)))
            wall = min(reps)
            levels.append({"n": n, "wall_s": wall, "reps": reps})
            print(f"{name} n={n}: {wall}s {reps}", flush=True)
        ratios = [
            round(levels[i + 1]["wall_s"] / max(levels[i]["wall_s"], 1e-9), 2)
            for i in range(len(levels) - 1)
        ]
        report["ops"][name] = {"levels": levels, "ratios": ratios}

    def synth_docs(n):
        # near-dup groups of ~8 (template id DIV 8) with per-doc tails:
        # APSS pairs stay bounded per group while the corpus doubles
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("shared base text block t"),
                (F.col("id") / 8).cast("long").cast("string"),
                F.lit(" body w"),
                (F.col("id") % 211).cast("string"),
                F.lit(" x"),
                (F.col("id") % 7).cast("string"),
                F.lit(" y"),
                (F.col("id") % 13).cast("string"),
                F.lit(" tail"),
                F.col("id").cast("string"),
            ).alias("text"),
        )

    ladder(
        "apss_pairs_docs",
        lambda n: apss_pairs(synth_docs(n), tau=0.5, max_df=64).count(),
    )

    ladder(
        # fingerprints replicated onto ≤ 5 hosts each (mirror shape);
        # hot fingerprints capped by max_degree
        "host_overlap_fps",
        lambda n: pair_overlap(
            spark.range(n).select(
                (F.col("id") % (n // 10)).cast("string").alias("key"),
                F.concat(
                    F.lit("h"), ((F.col("id") * 13) % 500).cast("string")
                ).alias("item"),
            ),
            max_degree=64,
            min_shared=2,
            k=50,
        ).count(),
    )

    ladder(
        # power-law-ish host graph: dst concentrates on low ids
        "triangles_edges",
        lambda n: triangle_stats(
            spark.range(n).select(
                F.concat(
                    F.lit("h"), (F.col("id") % (n // 25)).cast("string")
                ).alias("src_host"),
                F.concat(
                    F.lit("h"),
                    ((F.col("id") * F.col("id") + 7) % (n // 50)).cast("string"),
                ).alias("dst_host"),
            )
        ).count(),
    )

    ladder(
        "funnel_events",
        lambda n: funnel_depths(
            spark.range(n).select(
                (F.col("id") % (n // 20)).alias("user_id"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + (F.col("id") * 37) % 864_000
                ).alias("ts"),
                F.element_at(
                    F.array(
                        F.lit("view"), F.lit("click"), F.lit("buy"),
                        F.lit("noise"),
                    ),
                    ((F.col("id") * 11) % 4 + 1).cast("int"),
                ).alias("event_type"),
            ),
            ["view", "click", "buy"],
            window_s=86_400.0,
        ).count(),
    )

    ladder(
        "textrank_docs",
        lambda n: textrank_terms(synth_docs(n), k=3, n_iter=4).count(),
    )

    ladder(
        "moore_lewis_docs",
        lambda n: moore_lewis_select(
            synth_docs(n).filter(F.col("doc_id") % 5 != 0),
            synth_docs(n).filter(F.col("doc_id") % 5 == 0),
            k=100,
        ).count(),
    )

    ladder(
        "hyperball_edges",
        lambda n: __import__(
            "pdf_extraction_spark.operators.graphstats",
            fromlist=["hyperball_r2"],
        ).hyperball_r2(
            spark.range(n).select(
                F.concat(
                    F.lit("h"), (F.col("id") % (n // 25)).cast("string")
                ).alias("src_host"),
                F.concat(
                    F.lit("h"), ((F.col("id") * 7 + 3) % (n // 25)).cast("string")
                ).alias("dst_host"),
            )
        ).count(),
    )

    ladder(
        "prf_bm25_docs",
        lambda n: __import__(
            "pdf_extraction_spark.operators.retrieval",
            fromlist=["rocchio_bm25_topk"],
        ).rocchio_bm25_topk(
            synth_docs(n), ["shared", "body"], k=20, k_fb=5, m_exp=5
        ).count(),
    )

    with open(ns.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
