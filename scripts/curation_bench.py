#!/usr/bin/env python
"""Curation-suite bench at sf1.0-equivalent scale (1.2M pages).

The headline bench (bench.py) is extraction-centric; this measures the
shuffle-heavy dedup/curation family — ``curate_corpus`` end-to-end,
``minhash_lsh``, ``dedup_lines``, ``flag_contaminated`` — at two input
scales (default 120k and 1.2M synthetic pages, the sf0.1 → sf1.0 step)
with per-stage wall time AND shuffle read/write bytes from the Spark
REST status API. Super-linearity check: a 10× input must not grow any
stage's wall time or shuffle volume by more than ~10× (headroom for VM
noise is reported, not hidden).

Writes BENCH/curation_sf1.json. Run:
  python scripts/curation_bench.py [--scales 120000,1200000]
"""

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shuffle_totals(spark):
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all
    completed stages so far — deltas around a job isolate its shuffle."""
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=COMPLETE"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
    except Exception:
        return (0, 0)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def timed(spark, fn):
    r0, w0 = shuffle_totals(spark)
    t0 = time.time()
    rows = fn()
    wall = time.time() - t0
    r1, w1 = shuffle_totals(spark)
    return {
        "wall_s": round(wall, 2),
        "rows": rows,
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
    }


def run_suite(spark, n_pages: int) -> dict:
    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.curation import dedup_lines, flag_contaminated
    from pdf_extraction_spark.operators.dedup import minhash_lsh_pairs
    from pdf_extraction_spark.operators.extract import extract_parse
    from pdf_extraction_spark.plans.curate import curate_corpus
    from pdf_extraction_spark.sources.pages import synth_pages_df

    pages = synth_pages_df(spark, n_pages)
    out = {}

    # the timed window must INCLUDE curate_corpus() itself — its eager
    # MinHash signature pass (and the extract/analyze/exact-dedup
    # lineage that pass forces) is a real part of the stage's cost
    holder = {}

    def run_curate():
        res = curate_corpus(pages, min_tokens=10, languages=("en",))
        holder["res"] = res
        return res["docs"].count() + res["stats"].count()

    out["curate_corpus"] = timed(spark, run_curate)
    holder["res"]["sigs"].unpersist(blocking=True)

    # isolated stages share one materialized docs frame (extraction cost
    # is the headline bench's subject, not this one's)
    docs = (
        extract_parse(pages).withColumn("doc_id", F.xxhash64("url")).persist()
    )
    docs.count()

    out["minhash_lsh"] = timed(
        spark,
        lambda: minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=32, bands=8
        ).filter(F.col("est_jaccard") >= 0.8).count(),
    )
    spark.catalog.clearCache()  # signature cache from the pairs call
    docs.persist().count()

    # count() alone lets Catalyst eliminate the outer join (unique join
    # keys) — aggregate over the rebuilt text to force the full compute
    out["dedup_lines"] = timed(
        spark,
        lambda: dedup_lines(docs, "text", "doc_id")
        .agg(F.sum(F.length("clean_text")), F.sum("n_lines_kept"), F.count("*"))
        .first()[2],
    )

    eval_df = docs.limit(200).select(F.col("text")).cache()
    eval_df.count()
    out["decontaminate"] = timed(
        spark,
        lambda: flag_contaminated(docs, eval_df, "text", "doc_id")
        .filter(F.col("contaminated"))
        .count(),
    )
    docs.unpersist()
    eval_df.unpersist()
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="120000,480000,1200000")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "curation_sf1.json"
    ))
    ns = ap.parse_args(argv)
    scales = [int(s) for s in ns.scales.split(",")]

    # 1.2M pages needs real heap (box has 128 GiB; the library default
    # of 8g OOMs around 1M persisted docs); the UI must be on for the
    # REST status API that reports shuffle bytes
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

    from pdf_extraction_spark.session import get_spark

    spark = get_spark(
        app_name="curation_bench",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.ui.port": "4050",
        },
    )
    # warm JVM + Python workers before any timed window
    run_suite(spark, 5000)

    result = {"scales": {}}
    for n in scales:
        print(f"--- {n} pages ---")
        result["scales"][str(n)] = run_suite(spark, n)
        for stage, m in result["scales"][str(n)].items():
            print(f"  {stage}: {m['wall_s']}s, {m['rows']} rows, "
                  f"shuffle r/w {m['shuffle_read_mb']}/{m['shuffle_write_mb']} MB")

    if len(scales) >= 2:
        # pairwise growth between consecutive rungs (a middle rung
        # separates fixed-overhead amortization at the small rung from
        # genuine super-linearity at the top)
        result["growth"] = {}
        for a, b in zip(scales, scales[1:]):
            lo, hi = str(a), str(b)
            factor = b / a
            result["growth"][f"{lo}->{hi}"] = {
                "scale_factor": factor,
                **{
                    stage: {
                        "wall": round(
                            result["scales"][hi][stage]["wall_s"]
                            / max(result["scales"][lo][stage]["wall_s"], 1e-9), 2
                        ),
                        "shuffle_write": round(
                            result["scales"][hi][stage]["shuffle_write_mb"]
                            / max(result["scales"][lo][stage]["shuffle_write_mb"], 1e-3), 2
                        ),
                    }
                    for stage in result["scales"][lo]
                },
            }
        # linear = every consecutive wall growth ≤ scale factor × 1.3
        # noise headroom (ignoring the smallest rung's fixed overhead
        # would only make this easier — keep it strict)
        result["no_stage_super_linear"] = all(
            m["wall"] <= g["scale_factor"] * 1.3
            for g in result["growth"].values()
            for k, m in g.items()
            if k != "scale_factor"
        )

    with open(ns.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
