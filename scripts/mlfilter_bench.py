"""Input-scaling ladder for the model-based curation gates.

Runs lm_score / qual_classify / host_cap / fix_mojibake over the sf0.1
documents table replicated 1×/4×/16× (distinct doc_ids, same text
distribution) and reports wall time per rung plus per-quadrupling
ratios. A linear operator should trend ≈4× per rung (minus fixed
overheads); a quadratic stage would trend ≈16×. Writes one JSON line
and BENCH/mlfilter_scale.json.

Run: python scripts/mlfilter_bench.py  [base_sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def replicated_docs(spark, sf_dir, factor):
    """factor copies with distinct doc_ids (id-space partitioned)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if factor == 1:
        return docs.select("doc_id", "text", "n_chars", "source")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
        "text",
        "n_chars",
        # spread replicas across hosts so host_cap sees more hosts, not
        # deeper ones (hosts also deepen: same text, more docs per host)
        F.concat(F.col("source"), F.lit("_r"), F.col("rep") % 4).alias("source"),
    )


def run_ladder(spark, sf_dir, factors=(1, 4, 16)):
    from pdf_extraction_spark.operators.hostcap import host_cap
    from pdf_extraction_spark.operators.mlfilter import (
        score_bigram_lm,
        score_quality,
        train_bigram_lm,
    )
    from pdf_extraction_spark.operators.textanalysis import fix_mojibake_col

    weights = spark.range(4096).select(
        F.format_string("%03x", F.col("id")).alias("bucket"),
        (((F.col("id") * 2654435761) % 2001 - 1000) / 1000.0).alias("w"),
    )
    out = {}
    for factor in factors:
        docs = replicated_docs(spark, sf_dir, factor).persist()
        n = docs.count()
        rung = {"n_docs": n}

        t0 = time.perf_counter()
        score_bigram_lm(docs, train_bigram_lm(docs)).agg(
            F.sum("n_scored"), F.min("avg_logprob")
        ).collect()
        rung["lm_score"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        score_quality(docs, weights, bias=0.1).agg(F.sum("logit")).collect()
        rung["qual_classify"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        host_cap(docs, F.col("n_chars").cast("double"), k=5).count()
        rung["host_cap"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        docs.select(fix_mojibake_col(F.col("text"), passes=2).alias("f")).agg(
            F.sum(F.length("f"))
        ).collect()
        rung["fix_mojibake"] = round(time.perf_counter() - t0, 3)

        docs.unpersist()
        out[str(factor)] = rung

    ratios = {}
    fs = [str(f) for f in factors]
    for q in ("lm_score", "qual_classify", "host_cap", "fix_mojibake"):
        ratios[q] = [
            round(out[b][q] / max(out[a][q], 1e-9), 2)
            for a, b in zip(fs, fs[1:])
        ]
    # linear ≈ input ratio (4), quadratic ≈ 16; allow generous overhead slack
    sup = {q: any(r > 8.0 for r in rs) for q, rs in ratios.items()}
    return {"rungs": out, "ratios_per_4x": ratios, "super_linear": sup}


def main():
    from pdf_extraction_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    res = run_ladder(spark, sf_dir)
    line = json.dumps(res)
    print("MLBENCH " + line)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/mlfilter_scale.json", "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
