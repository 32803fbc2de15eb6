#!/usr/bin/env python
"""Doubling-ladder linearity bench for the session-11 operators:
RAKE keyphrases (corpus-scaled), k-core peeling + assortativity +
harmonic centrality (edge-scaled, power-law-ish degrees), SALSA
(edge-scaled: components + degree shares), Kleinberg bursts
(event-scaled), query-biased snippets and TextTiling (corpus-scaled).

Each level doubles the driven dimension; wall time is one full
materialization per level. Linear ⇒ consecutive ratios ≈ 2 (fixed
overheads push small-N ratios below 2); a quadratic path trends
toward 4.

Writes BENCH/session11_stress.json:
  {"ops": {"<op>": {"levels": [{"n":..., "wall_s":...}], "ratios": [...]}}}

Run: python scripts/session11_stress.py [--scale 1]
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
            "session11_stress.json",
        ),
    )
    ns = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.components import salsa
    from pdf_extraction_spark.operators.forensics import kleinberg_bursts
    from pdf_extraction_spark.operators.graphstats import (
        assortativity,
        harmonic_centrality,
        kcore,
    )
    from pdf_extraction_spark.operators.retrieval import snippet_best_window
    from pdf_extraction_spark.operators.terms import rake_phrases
    from pdf_extraction_spark.operators.texttiling import texttile
    from pdf_extraction_spark.session import get_spark

    spark = get_spark(
        app_name="session11_stress",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = 25_000 * ns.scale
    sizes = [base * 4, base * 8, base * 16]
    report = {"ops": {}}

    def ladder(name, run):
        levels = []
        run(sizes[0])  # untimed warmup (JVM codegen / page cache)
        for n in sizes:
            reps = []
            for _ in range(2):
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
        # ~40-token docs with a vocabulary shift mid-doc so TextTiling
        # and RAKE exercise their full paths; snippet terms present in
        # roughly 1/3 of docs
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("alpha beta gamma table delta join epsilon w"),
                (F.col("id") % 97).cast("string"),
                F.lit(" kappa theta table sigma w"),
                (F.col("id") % 13).cast("string"),
                F.lit(". "),
                F.lit("star orbit galaxy window comet q"),
                (F.col("id") % 29).cast("string"),
                F.lit(" nebula lunar solar cosmic planet w"),
                (F.col("id") % 7).cast("string"),
            ).alias("text"),
        )

    def synth_edges(n):
        # power-law-ish host graph: n links over n/25 hosts; quadratic-
        # residue targets differentiate degrees, plus a hot hub
        hosts = n // 25
        return spark.range(n).select(
            F.concat(
                F.lit("h"), (F.col("id") % hosts).cast("string")
            ).alias("src_host"),
            F.concat(
                F.lit("h"),
                F.when(F.col("id") % 17 == 0, F.lit(0)).otherwise(
                    (F.col("id") * F.col("id") * 7 + F.col("id")) % hosts
                ).cast("string"),
            ).alias("dst_host"),
        )

    def synth_events(n):
        # n events over n/200 users; every 5th user gets a mid-stream
        # burst (gap drops from 60s to 1s for 20 events)
        users = n // 200
        return spark.range(n).select(
            F.concat(F.lit("u"), (F.col("id") % users).cast("string")).alias(
                "user_id"
            ),
            (
                F.lit(1700000000.0)
                + (F.col("id") / users).cast("long")
                * F.when(
                    ((F.col("id") % users) % 5 == 0)
                    & ((F.col("id") / users).cast("long") % 50 < 20),
                    F.lit(1),
                ).otherwise(F.lit(60))
            ).cast("timestamp").alias("ts"),
        )

    ladder("rake_docs", lambda n: rake_phrases(synth_docs(n), k=3).count())
    ladder(
        "kcore_edges",
        lambda n: kcore(synth_edges(n), k=3, n_rounds=4).count(),
    )
    ladder("assort_edges", lambda n: assortativity(synth_edges(n)).count())
    ladder(
        "harmonic_edges",
        lambda n: harmonic_centrality(synth_edges(n), r_max=3).count(),
    )
    ladder(
        "salsa_edges",
        lambda n: salsa(
            synth_edges(n), src="src_host", dst="dst_host"
        ).count(),
    )
    ladder(
        "bursts_events",
        lambda n: kleinberg_bursts(synth_events(n), min_events=5).count(),
    )
    ladder(
        "snippet_docs",
        lambda n: snippet_best_window(
            synth_docs(n), ["table", "join", "window"], window=12
        ).count(),
    )
    ladder(
        "texttile_docs",
        lambda n: texttile(synth_docs(n), w=10, k=3).count(),
    )

    from pdf_extraction_spark.operators.graphstats import adamic_adar, bowtie
    from pdf_extraction_spark.operators.textanalysis import with_yule_k

    ladder(
        "linkpred_edges",
        lambda n: adamic_adar(synth_edges(n), max_degree=64, k=20).count(),
    )
    ladder("bowtie_edges", lambda n: bowtie(synth_edges(n)).count())
    ladder("yule_docs", lambda n: with_yule_k(synth_docs(n)).count())

    with open(ns.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
