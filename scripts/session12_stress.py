#!/usr/bin/env python
"""Doubling-ladder linearity bench for the session-12 operators:
keyness / NB classification / AMS F2 / JS divergence / BLEU pair /
KS drift (corpus-scaled), Katz centrality (edge-scaled), CUSUM
(event-scaled).

Each level doubles the driven dimension; wall time is one full
materialization per level (min of 2 reps after an untimed warmup).
Linear => consecutive ratios ~ 2; a quadratic path trends toward 4.

Writes BENCH/session12_stress.json. Run:
    python scripts/session12_stress.py [--scale 1]
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
            "session12_stress.json",
        ),
    )
    ns = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.components import katz_centrality
    from pdf_extraction_spark.operators.forensics import cusum
    from pdf_extraction_spark.operators.mlfilter import (
        ks_test,
        naive_bayes_classify,
    )
    from pdf_extraction_spark.operators.sketches import ams_f2
    from pdf_extraction_spark.operators.terms import keyness
    from pdf_extraction_spark.operators.textanalysis import (
        bleu_pair,
        js_divergence,
    )
    from pdf_extraction_spark.session import get_spark

    spark = get_spark(
        app_name="session12_stress",
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
        # ~25-token docs over 20 sources with a stratum-specific slice
        # of vocabulary so keyness / NB / JS have real signal
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("s"), (F.col("id") % 20).cast("string")
            ).alias("source"),
            F.concat(
                F.lit("alpha beta gamma shared filler words here kappa "),
                F.lit("srcword"), (F.col("id") % 20).cast("string"),
                F.lit(" topic"), (F.col("id") % 97).cast("string"),
                F.lit(" body text runs on with detail w"),
                (F.col("id") % 13).cast("string"),
            ).alias("text"),
            (F.col("id") % 400).alias("n_chars"),
        )

    def synth_pairs(n):
        # candidate = reference with the tail clause dropped on half
        # the docs — both BLEU branches and the BP term fire
        d = synth_docs(n)
        return d.select(
            "doc_id",
            F.col("text").alias("ref"),
            F.when(
                F.col("doc_id") % 2 == 0, F.col("text")
            ).otherwise(
                F.regexp_replace(F.col("text"), r" body text.*$", "")
            ).alias("cand"),
        )

    def synth_edges(n):
        hosts = n // 25
        return spark.range(n).select(
            F.concat(F.lit("h"), (F.col("id") % hosts).cast("string")).alias(
                "src"
            ),
            F.concat(
                F.lit("h"),
                F.when(F.col("id") % 17 == 0, F.lit(0)).otherwise(
                    (F.col("id") * F.col("id") * 7 + F.col("id")) % hosts
                ).cast("string"),
            ).alias("dst"),
        )

    def synth_events(n):
        users = n // 200
        return spark.range(n).select(
            F.col("id").alias("event_id"),
            (F.col("id") % users).alias("user_id"),
            (F.lit(1700000000.0) + F.col("id") * 3).cast("timestamp").alias(
                "ts"
            ),
            # every 4th user's stream shifts level mid-way
            F.when(
                ((F.col("id") % users) % 4 == 0)
                & (F.col("id") > n / 2),
                F.lit(150),
            ).otherwise((F.col("id") % 100)).cast("long").alias("v"),
        )

    ladder(
        "keyness_docs",
        lambda n: keyness(synth_docs(n), min_count=5, k=8).count(),
    )
    ladder(
        "nb_docs",
        lambda n: naive_bayes_classify(synth_docs(n)).count(),
    )
    ladder(
        "ams_docs",
        lambda n: ams_f2(
            synth_docs(n).select(
                F.explode(F.split(F.col("text"), " ")).alias("word")
            ),
            F.col("word"),
        ).count(),
    )
    ladder("js_docs", lambda n: js_divergence(synth_docs(n)).count())
    ladder(
        "bleu_docs",
        lambda n: bleu_pair(synth_pairs(n), "cand", "ref").count(),
    )
    ladder(
        "ks_docs",
        lambda n: ks_test(synth_docs(n), "n_chars", "source").count(),
    )
    ladder(
        "katz_edges",
        lambda n: katz_centrality(synth_edges(n), n_iter=4).count(),
    )
    ladder(
        "cusum_events",
        lambda n: cusum(
            synth_events(n), "v", "user_id", "ts", "event_id",
            target=50, allowance=10, threshold=500,
        ).count(),
    )

    from pdf_extraction_spark.operators.forensics import runs_test
    from pdf_extraction_spark.operators.graphstats import (
        graph_summary,
        powerlaw_fit,
    )
    from pdf_extraction_spark.operators.mlfilter import cramers_v
    from pdf_extraction_spark.operators.profile import table_checks, table_profile
    from pdf_extraction_spark.operators.sketches import kmv_source_overlap
    from pdf_extraction_spark.operators.textanalysis import (
        bigram_cond_entropy,
        burrows_delta,
        ct_langid,
    )

    ladder(
        "kmv_docs",
        lambda n: kmv_source_overlap(
            synth_docs(n).select(
                "source", F.explode(F.split(F.col("text"), " ")).alias("v")
            ),
            F.col("v"),
            "source",
            k=64,
        ).count(),
    )
    ladder(
        "runs_events",
        lambda n: runs_test(
            synth_events(n), "v", "user_id", "ts", "event_id", threshold=50
        ).count(),
    )
    ladder(
        "cramers_docs",
        lambda n: cramers_v(synth_docs(n), "source", "n_chars").count(),
    )
    ladder(
        "profile_docs",
        lambda n: table_profile(
            synth_docs(n), ["doc_id", "source", "n_chars"]
        ).count(),
    )
    ladder(
        "checks_docs",
        lambda n: table_checks(
            synth_docs(n),
            [
                {"type": "completeness", "column": "text", "min_ppm": 900000},
                {"type": "uniqueness", "column": "doc_id"},
                {"type": "non_negative", "column": "n_chars"},
            ],
        ).count(),
    )
    ladder(
        "powerlaw_edges",
        lambda n: powerlaw_fit(synth_edges(n), k_mins=(1, 2)).count(),
    )
    ladder("gsummary_edges", lambda n: graph_summary(synth_edges(n)).count())
    ladder(
        "bigram_h_docs",
        lambda n: bigram_cond_entropy(synth_docs(n)).count(),
    )
    ladder(
        "burrows_docs",
        lambda n: burrows_delta(synth_docs(n), k=20).count(),
    )
    ladder(
        "ctlang_docs",
        lambda n: ct_langid(
            synth_docs(n).withColumn(
                "lang",
                F.concat(F.lit("l"), (F.col("doc_id") % 5).cast("string")),
            ),
            k=30,
        ).count(),
    )

    with open(ns.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
