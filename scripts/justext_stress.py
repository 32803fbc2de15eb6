#!/usr/bin/env python
"""Doubling-ladder linearity bench for the jusText block classifier
and the release shard manifest.

jusText's only shuffle is the doc-keyed window Exchange and its window
partitions are doc-sized (the ladder keeps blocks-per-doc constant at
20 while doubling the doc count), so wall time must scale with the
block count — a corpus-sized window would blow past the linear bound.
The manifest is one combinable aggregation bounded by n_shards output
rows; its ladder doubles the doc count directly.

Each level doubles the driven dimension; wall = one full
materialization (count() of the classified frame / collect() of the
16-row manifest). Linear ⇒ consecutive ratios ≈ 2 (fixed overheads
push small-N ratios under 2); quadratic would trend toward 4.

Writes BENCH/justext_stress.json. Run: python scripts/justext_stress.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn):
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def synth_blocks_docs(spark, n_docs, blocks_per_doc=20):
    """n_docs docs of blocks_per_doc lines mixing all four classes —
    stopword-rich long/medium lines, short lines, link lines — so the
    classifier's every branch pays its real cost at every level."""
    from pyspark.sql import functions as F

    line = (
        "CASE id % 5 "
        "WHEN 0 THEN repeat('it was the best of times and the worst of all ', 6) "
        "WHEN 1 THEN 'it was a day like any other day in there with all of them' "
        "WHEN 2 THEN 'short line ' || CAST(id AS STRING) "
        "WHEN 3 THEN 'nav www.example.com/' || CAST(id % 50 AS STRING) "
        "ELSE 'plain filler words without stop density ' || CAST(id AS STRING) "
        "END"
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(1, "
            f"{blocks_per_doc}), i -> {line.replace('id', '(id * 31 + i)')}"
            "), '\\n')"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.lit(0).alias("n_chars"),
    )


def main():
    from pdf_extraction_spark.operators.justext import (
        blocks_from_text,
        justext_classify,
    )
    from pdf_extraction_spark.operators.release import shard_manifest
    from pdf_extraction_spark.session import get_spark

    spark = get_spark(
        master="local[8]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out = {"ops": {}}
    # the action must consume final_class — a bare count() lets the
    # optimizer prune the whole classification (observed: walls FELL
    # as n doubled because only explode+filter survived pruning)
    for op, fn in {
        "justext_classify": lambda df: justext_classify(blocks_from_text(df))
        .groupBy("final_class")
        .count()
        .collect(),
        "shard_manifest": lambda df: shard_manifest(df, 16).collect(),
    }.items():
        levels, prev = [], None
        for n in (100_000, 200_000, 400_000):
            df = synth_blocks_docs(spark, n)
            fn(df)  # warm the level once (JIT/codegen)
            wall = min(_timed(lambda: fn(df)) for _ in range(2))
            levels.append({"n_docs": n, "wall_s": wall})
        ratios = [
            round(levels[i + 1]["wall_s"] / levels[i]["wall_s"], 2)
            for i in range(len(levels) - 1)
        ]
        out["ops"][op] = {"levels": levels, "ratios": ratios}
        print(op, levels, ratios)
    out["linear"] = all(
        r <= 2.5 for o in out["ops"].values() for r in o["ratios"]
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "justext_stress.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("linear:", out["linear"], "->", path)
    spark.stop()


if __name__ == "__main__":
    main()
