#!/usr/bin/env python
"""Doubling-ladder linearity bench for the crawl-loop continuation
operators: shingle containment (doc-scaled, clustered overlap so TRUE
pair work is linear and the hot-shingle anti-prune carries the
corpus-wide grams), HITS (edge-scaled), robots admission (url-scaled
against a fixed per-host rule set), snapshot change tracking
(url-scaled at fixed snapshots/url), and frontier waves (candidate-
scaled at fixed host fan-out).

Each level doubles the driven dimension; wall is one full
materialization (count()). Linear ⇒ consecutive ratios ≈ 2; a
quadratic path (e.g. containment without the hot-shingle cap) trends
toward 4.

Writes BENCH/crawlops_stress.json in the roundops_stress.json shape.

Run: python scripts/crawlops_stress.py [--scale 1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _checksum(df):
    """Materialize EVERY column: a bare count() lets Catalyst prune the
    operator under test (e.g. the wave window disappears when nothing
    reads `wave`)."""
    from pyspark.sql import functions as F

    # bit_xor, not sum: summing 64-bit hashes overflows under ANSI
    return df.select(
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("ck")
    ).collect()[0]["ck"]


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
            "crawlops_stress.json",
        ),
    )
    ns = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.components import hits
    from pdf_extraction_spark.operators.crawl import (
        frontier_schedule,
        snapshot_changes,
    )
    from pdf_extraction_spark.operators.dedup import containment_pairs
    from pdf_extraction_spark.operators.robotstxt import (
        parse_robots,
        robots_allowed,
    )
    from pdf_extraction_spark.session import get_spark

    spark = get_spark(
        app_name="crawlops_stress",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = 25_000 * ns.scale
    sizes = [base, base * 2, base * 4]
    report = {"ops": {}}

    # warmup: absorb JVM/codegen/Arrow first-use cost so level-1 walls
    # measure the operator, not JIT
    spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit("warm up body text").alias("text")
    ).groupBy("text").count().count()

    def ladder(name, run):
        levels = []
        for n in sizes:
            spark.catalog.clearCache()
            wall = _timed(lambda: run(n))
            levels.append({"n": n, "wall_s": wall})
            print(f"{name} n={n}: {wall}s", flush=True)
        ratios = [
            round(levels[i + 1]["wall_s"] / max(levels[i]["wall_s"], 1e-9), 2)
            for i in range(len(levels) - 1)
        ]
        report["ops"][name] = {"levels": levels, "ratios": ratios}

    # containment: 6-doc clusters share a cluster-keyed passage; the
    # cluster-free prefix grams are CORPUS-WIDE (freq = n) and must be
    # eaten by the hot-shingle anti-prune, leaving within-cluster pair
    # work only — the shape that keeps containment linear at scale.
    def contain_docs(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("shared passage tokens for cluster "),
                (F.col("id") / 6).cast("long").cast("string"),
                F.lit(" unique tail "),
                F.col("id").cast("string"),
                F.lit(" filler"),
                (F.col("id") % 13).cast("string"),
                F.lit(" endtok"),
                (F.col("id") % 7).cast("string"),
            ).alias("text"),
        )

    ladder(
        "containment_docs",
        lambda n: _checksum(
            containment_pairs(contain_docs(n), threshold_pct=30, max_shingle_freq=1000)
        ),
    )

    ladder(
        "host_hits_edges",
        lambda n: _checksum(hits(
            spark.range(n).select(
                F.concat(F.lit("h"), (F.col("id") % (n // 50)).cast("string")).alias(
                    "src"
                ),
                F.concat(
                    F.lit("h"), ((F.col("id") * 7) % (n // 40)).cast("string")
                ).alias("dst"),
            ),
            n_iter=5,
        )),
    )

    # robots: 200 hosts with a fixed rule file each; n candidate urls
    def robots_rules_df():
        hosts = spark.range(200).select(
            F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
            F.lit(
                "User-agent: *\nDisallow: /p/1\nAllow: /p/12\n"
                "User-agent: bot\nDisallow: /q/\nAllow: /q/7\n"
            ).alias("robots_txt"),
        )
        return parse_robots(hosts)

    def robots_urls(n):
        return spark.range(n).select(
            F.concat(
                F.lit("https://h"),
                (F.col("id") % 200).cast("string"),
                F.lit("/p/"),
                F.col("id").cast("string"),
            ).alias("url"),
            F.concat(F.lit("h"), (F.col("id") % 200).cast("string")).alias("host"),
        )

    rules = robots_rules_df().persist()
    rules.count()
    ladder(
        "robots_allow_urls",
        lambda n: _checksum(robots_allowed(robots_urls(n), rules, agent="bot")),
    )

    # snapshots: n urls x 4 snapshots, quarter of urls change each step
    ladder(
        "snapshot_changes_urls",
        lambda n: _checksum(snapshot_changes(
            spark.range(n)
            .select(
                F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
                F.col("id"),
                F.explode(F.expr("sequence(1, 4)")).alias("j"),
            )
            .select(
                "url",
                F.col("j").cast("long").alias("warc_ts"),
                F.expr(
                    "CASE WHEN id % 4 = 0 THEN 'body rev ' || j "
                    "ELSE 'static body' END"
                ).alias("text"),
            )
        )),
    )

    # frontier: n candidates over n/50 hosts (fixed per-host fan-out)
    ladder(
        "frontier_waves",
        lambda n: _checksum(frontier_schedule(
            spark.range(n).select(
                F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
                F.concat(F.lit("h"), (F.col("id") % (n // 50)).cast("string")).alias(
                    "host"
                ),
                (F.col("id") % 97).alias("priority"),
            )
        )),
    )

    rules.unpersist()
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
