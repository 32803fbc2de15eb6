#!/usr/bin/env python
"""Scaling decomposition: how much of the single-box efficiency loss is
hardware (shared memory bandwidth) vs engine (Spark/JVM overhead)?

The north rule's two-cluster-size criterion (≥0.8 efficiency from N to
4N executors) cannot use a real cluster in this sandbox. The bench
proxy runs the same job at two pinned core budgets — but above ~8 cores
this box itself stops scaling: a pure-Python ``multiprocessing`` run of
the *same kernel work* (no Spark, no JVM, no Arrow) hits the same wall.
This script measures both curves back-to-back on identical inputs and
reports, per N→4N pair:

    eff_spark      pinned Spark extraction efficiency
    eff_mp         pinned no-Spark calibration efficiency (the ceiling
                   the hardware imposes on ANY 4×-parallelism gain)
    normalized     eff_spark / eff_mp — the engine's own scaling loss;
                   ≥ ~0.95 means Spark adds no loss beyond hardware,
                   which is the component that exists on a real cluster
                   where each of the 4N executors brings its own memory
                   controllers.

Pinning uses ``os.sched_setaffinity`` (calibration) and ``taskset``
(Spark bench worker, via bench.bench_extraction_at) so each level owns
exactly its core budget, like an executor.

Usage: python scripts/scaling_calibration.py [--pages 30000]
       [--levels 2,4,8,16,32] [--reps 3] [--spark-pages 120000]
Writes one JSON line to stdout (and BENCH/scaling_calibration.json).
"""

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_rows(n_pages: int):
    """Deterministic (url, payload) rows — the same synth corpus the
    Spark bench extracts (materialized pure-Python, no Spark)."""
    from pdf_extraction_spark.sources.synth import synth_page_row

    return [(r["url"], r["html"]) for r in (synth_page_row(i) for i in range(n_pages))]


def _worker(rows, lo, hi, out_q):
    from pdf_extraction_spark.kernels.extract import extract_document
    from pdf_extraction_spark.kernels.transcript import parse_transcript

    chars = 0
    for url, payload in rows[lo:hi]:
        _, text = extract_document(url, payload)
        for turn in parse_transcript(text)[1]:
            chars += len(turn["text"])
    out_q.put(chars)


def calibrate_mp(rows, cores: int, reps: int) -> dict:
    """No-Spark kernel throughput with ``cores`` pinned processes."""
    os.sched_setaffinity(0, set(range(cores)))
    try:
        n = len(rows)
        best = 1e9
        for _ in range(reps):
            q = mp.Queue()
            bounds = [round(i * n / cores) for i in range(cores + 1)]
            procs = [
                mp.Process(target=_worker, args=(rows, bounds[i], bounds[i + 1], q))
                for i in range(cores)
            ]
            t0 = time.perf_counter()
            for p in procs:
                p.start()
            for _ in procs:
                q.get()
            for p in procs:
                p.join()
            best = min(best, time.perf_counter() - t0)
        return {"cores": cores, "sec": round(best, 3), "docs": n,
                "docs_per_sec": round(n / best, 2)}
    finally:
        os.sched_setaffinity(0, set(range(os.cpu_count())))


_LC_WORKER_SRC = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pdf_extraction_spark.session import get_spark, ship_package
from pyspark.sql import functions as F
n_exec, cores_per, pages_path, reps = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
spark = get_spark(master=f'local-cluster[{{n_exec}},{{cores_per}},3072]', extra_conf={{
    'spark.ui.showConsoleProgress': 'false',
    'spark.executor.memory': '2g'}})
ship_package(spark)
from pdf_extraction_spark.operators.extract import extract_parse
pages = spark.read.parquet(pages_path)
n_docs = pages.count()
total_cores = n_exec * cores_per
extract_parse(pages.limit(64 * total_cores).repartition(total_cores)).count()
best = 1e9
for _ in range(reps):
    t0 = time.perf_counter()
    extract_parse(pages).agg(
        F.sum(F.aggregate(F.transform('turns', lambda t: F.length(t['text'])),
                          F.lit(0), lambda a, x: a + x)).alias('turn_chars'),
        F.sum(F.size('turns')).alias('n_turns'),
        F.sum(F.length('text')).alias('text_chars'),
        F.count('*').alias('n_docs')).collect()
    best = min(best, time.perf_counter() - t0)
print('BENCHJSON ' + json.dumps({{'executors': n_exec, 'cores_per': cores_per,
    'sec': round(best, 3), 'docs': n_docs, 'docs_per_sec': round(n_docs / best, 2)}}))
spark.stop()
"""


def _median(vals):
    """True median — averages the two middle values on even counts
    (upper-middle alone would bias a 2-round headline upward)."""
    s = sorted(vals)
    m = len(s) // 2
    return round(s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2, 3)


def run_lc_rounds(cores_per: int, pages_path: str, rounds: int = 3,
                  reps: int = 2, log=None) -> dict:
    """Interleaved local-cluster[1,c] vs local-cluster[4,c] rounds —
    the N→4N-executor pair. Shared by this script's committed artifact
    and bench.py's live headline so the methodology cannot diverge."""
    lo_k, hi_k = f"1x{cores_per}", f"4x{cores_per}"
    out_rounds = []
    for r in range(rounds):
        lo = bench_local_cluster(1, cores_per, pages_path, reps=reps)
        hi = bench_local_cluster(4, cores_per, pages_path, reps=reps)
        e = round(hi["docs_per_sec"] / lo["docs_per_sec"] / 4, 3)
        out_rounds.append({lo_k: lo, hi_k: hi, "efficiency": e})
        if log:
            log(f"local-cluster[{cores_per}c] round {r}: eff={e} "
                f"({lo_k}={lo['docs_per_sec']}, {hi_k}={hi['docs_per_sec']})")
    best_lo = max(r[lo_k]["docs_per_sec"] for r in out_rounds)
    best_hi = max(r[hi_k]["docs_per_sec"] for r in out_rounds)
    return {
        "rounds": out_rounds,
        lo_k: max((r[lo_k] for r in out_rounds), key=lambda d: d["docs_per_sec"]),
        hi_k: max((r[hi_k] for r in out_rounds), key=lambda d: d["docs_per_sec"]),
        "efficiency_per_round": [r["efficiency"] for r in out_rounds],
        "efficiency_median_round": _median([r["efficiency"] for r in out_rounds]),
        "efficiency_best_per_level": round(best_hi / best_lo / 4, 3),
    }


def bench_local_cluster(n_exec: int, cores_per: int, pages_path: str, reps: int = 3) -> dict:
    """Run extraction on ``local-cluster[n_exec,cores_per,mem]`` —
    SEPARATE executor JVMs (the spark-submit shape), package shipped via
    addPyFile — pinned to n_exec*cores_per cores."""
    import shutil
    import subprocess
    import tempfile

    src = _LC_WORKER_SRC.format(repo=REPO)
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(src)
        worker = f.name
    cmd = [sys.executable, worker, str(n_exec), str(cores_per), pages_path, str(reps)]
    total = n_exec * cores_per
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{total - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    os.unlink(worker)
    for line in out.stdout.splitlines():
        if line.startswith("BENCHJSON "):
            return json.loads(line[len("BENCHJSON "):])
    raise RuntimeError(f"local-cluster worker failed: {out.stderr[-3000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=30000)
    ap.add_argument("--spark-pages", type=int, default=120000)
    ap.add_argument("--levels", default="2,4,8,16,32")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-spark", action="store_true")
    ap.add_argument(
        "--local-cluster",
        action="store_true",
        help="also run local-cluster[1,c] vs local-cluster[4,c] (separate "
        "executor JVMs — the N vs 4N executor shape) for each c in --lc-cores",
    )
    ap.add_argument(
        "--lc-cores",
        default="2,4",
        help="comma list of per-executor core counts for the local-cluster "
        "pairs. 2-core executors (2→8 total cores) stay inside this box's "
        "memory-bandwidth knee — the regime a real cluster always runs in, "
        "since each of the 4N executors brings its own memory controllers; "
        "4-core executors (4→16 total) additionally measure the shared-"
        "bandwidth wall, decomposed by the mp ceiling above.",
    )
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    print(f"synthesizing {args.pages} pages for calibration...", file=sys.stderr)
    rows = _load_rows(args.pages)

    mp_curve = {}
    for c in levels:
        mp_curve[str(c)] = calibrate_mp(rows, c, args.reps)
        print(f"mp[{c}]: {mp_curve[str(c)]}", file=sys.stderr)

    spark_curve = {}
    if not args.skip_spark:
        import bench

        pages_path = bench.ensure_pages(args.spark_pages)
        for c in levels:
            spark_curve[str(c)] = bench.bench_extraction_at(c, pages_path, reps=args.reps)
            print(f"spark[{c}]: {spark_curve[str(c)]}", file=sys.stderr)

    def eff(curve, lo, hi):
        if str(lo) not in curve or str(hi) not in curve:
            return None
        return round(
            curve[str(hi)]["docs_per_sec"] / curve[str(lo)]["docs_per_sec"] / (hi / lo), 3
        )

    pairs = {}
    for lo, hi in [(2, 8), (4, 16), (8, 32)]:
        e_mp, e_sp = eff(mp_curve, lo, hi), eff(spark_curve, lo, hi)
        pairs[f"{lo}_to_{hi}"] = {
            "eff_mp_hardware_ceiling": e_mp,
            "eff_spark_pinned": e_sp,
            "normalized_engine_eff": round(e_sp / e_mp, 3) if e_mp and e_sp else None,
        }

    local_cluster = {}
    if args.local_cluster and not args.skip_spark:
        import bench

        pages_path = bench.ensure_pages(args.spark_pages)
        # Interleave levels A,B,A,B,... (fresh JVMs each round) so both
        # legs of every per-round pair share one weather window; report
        # per-round efficiencies AND the best-per-level pair.  This is
        # the headline N→4N-executor proxy (separate executor JVMs,
        # package shipped via addPyFile == the spark-submit shape).
        for cores_per in [int(x) for x in args.lc_cores.split(",")]:
            local_cluster[f"1x{cores_per}_to_4x{cores_per}"] = run_lc_rounds(
                cores_per, pages_path, rounds=args.reps, reps=2,
                log=lambda m: print(m, file=sys.stderr),
            )

    result = {
        "mp_curve": mp_curve,
        "spark_curve": spark_curve,
        "pairs": pairs,
        "local_cluster": local_cluster,
    }
    out_path = os.path.join(REPO, "BENCH", "scaling_calibration.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
