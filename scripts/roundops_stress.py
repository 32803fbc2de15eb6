#!/usr/bin/env python
"""Doubling-ladder linearity bench for the round-4 continuation
operators: BPE induction (vocabulary-scaled), host PageRank
(edge-scaled), DSIR selection (corpus-scaled), and the two md5
sketches (corpus-scaled).

Each level doubles the driven dimension; wall time is one full
materialization per level (single action — count() or collect() of the
bounded result). Linear ⇒ consecutive ratios ≈ 2 (fixed overheads push
small-N ratios below 2); a quadratic path would trend toward 4.

Writes BENCH/roundops_stress.json:
  {"ops": {"<op>": {"levels": [{"n":..., "wall_s":...}], "ratios": [...]}},
   "linear": true}

Run: python scripts/roundops_stress.py [--scale 1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 3), out


def synth_docs(spark, n):
    """n docs over a growing vocabulary (ids appear in the text so the
    vocab scales with n — the dimension BPE/DSIR/sketches care about)."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma w"),
            (F.col("id") % (1 + F.col("id") / 4).cast("long")).cast("string"),
            F.lit(" tok"),
            F.col("id").cast("string"),
            F.lit(" tail"),
            (F.col("id") % 97).cast("string"),
        ).alias("text"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH",
            "roundops_stress.json",
        ),
    )
    ns = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.bpe import bpe_merges, word_counts
    from pdf_extraction_spark.operators.components import pagerank
    from pdf_extraction_spark.operators.mlfilter import dsir_select
    from pdf_extraction_spark.operators.sketches import (
        cms_heavy_hitters,
        hll_distinct,
    )
    from pdf_extraction_spark.session import get_spark

    spark = get_spark(
        app_name="roundops_stress",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = 25_000 * ns.scale
    sizes = [base, base * 2, base * 4]
    report = {"ops": {}}

    def ladder(name, run):
        levels = []
        for n in sizes:
            spark.catalog.clearCache()
            wall, _ = _timed(lambda: run(n))
            levels.append({"n": n, "wall_s": wall})
            print(f"{name} n={n}: {wall}s", flush=True)
        ratios = [
            round(levels[i + 1]["wall_s"] / max(levels[i]["wall_s"], 1e-9), 2)
            for i in range(len(levels) - 1)
        ]
        report["ops"][name] = {"levels": levels, "ratios": ratios}

    ladder(
        "bpe_merges_vocab",
        lambda n: bpe_merges(word_counts(synth_docs(spark, n)), n_merges=8).count(),
    )
    ladder(
        "host_pagerank_edges",
        lambda n: pagerank(
            spark.range(n).select(
                F.concat(F.lit("h"), (F.col("id") % (n // 50)).cast("string")).alias("src"),
                F.concat(F.lit("h"), ((F.col("id") * 7) % (n // 40)).cast("string")).alias("dst"),
            ),
            n_iter=5,
        ).count(),
    )
    ladder(
        "dsir_select_docs",
        lambda n: dsir_select(
            synth_docs(spark, n),
            synth_docs(spark, n).filter(F.col("lang") == "0"),
            k=100,
        ).count(),
    )
    ladder(
        "hll_distinct_docs",
        lambda n: hll_distinct(synth_docs(spark, n), F.col("text")).count(),
    )
    ladder(
        "cms_topwords_docs",
        lambda n: cms_heavy_hitters(
            synth_docs(spark, n), F.col("lang"), k=10
        ).count(),
    )

    # -- session-7 continuation ops (all corpus-scaled) ------------------
    from pdf_extraction_spark.operators.agg import with_robust_outliers
    from pdf_extraction_spark.operators.dedup import source_overlap
    from pdf_extraction_spark.operators.textanalysis import (
        source_divergence,
        zipf_slope,
    )

    def _sourced(n):
        # a source dimension that stays bounded (16) while docs scale —
        # the shape source_overlap/zipf/source_kl promise S²/S·k outputs on
        return synth_docs(spark, n).withColumn(
            "source", (F.col("doc_id") % 16).cast("string")
        )

    ladder(
        "source_overlap_docs",
        lambda n: source_overlap(_sourced(n)).count(),
    )
    ladder(
        "zipf_slope_docs",
        lambda n: zipf_slope(_sourced(n), k=100).count(),
    )
    ladder(
        "source_kl_docs",
        lambda n: source_divergence(_sourced(n)).count(),
    )
    ladder(
        "robust_outliers_docs",
        lambda n: with_robust_outliers(
            _sourced(n).withColumn("v", F.length("text")), "source", "v"
        ).count(),
    )

    # -- session-8 continuation ops (corpus-scaled) -----------------------
    from pdf_extraction_spark.operators.mlfilter import (
        score_stupid_backoff,
        train_trigram_lm,
    )
    from pdf_extraction_spark.operators.similarity import dimsum_cosine

    def _sb(n):
        docs = synth_docs(spark, n)
        return score_stupid_backoff(docs, train_trigram_lm(docs)).count()

    ladder("sb_trigram_docs", _sb)
    ladder(
        "dimsum_docs",
        lambda n: dimsum_cosine(
            synth_docs(spark, n), sqrt_gamma=8.0, min_sim=0.1
        ).count(),
    )

    # linear iff no doubling more than ~2.8x (allowing shuffle jitter)
    report["linear"] = all(
        r <= 2.8 for op in report["ops"].values() for r in op["ratios"]
    )
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
