#!/usr/bin/env python
"""sf1 end-to-end proof run — 1.2M pages under real spark-submit, with a
mid-run SIGKILL and lineage resume (round-4 verdict item #5).

Orchestrates the production two-stage pipeline:

  stage 1  spark-submit scripts/run_extraction.py --synth 1200000
           (bucket-checkpointed; this orchestrator KILLS the JVM once
           >= --kill-after buckets have committed, then reruns the same
           command and verifies the completed buckets are skipped)
  stage 2  spark-submit scripts/run_release.py
           (analyze → exact dedup → MinHash near-dup drop → lang/token/
           Gopher gates → sharded corpus + integrity manifest)

Writes BENCH/sf1_endtoend.json: per-stage walls, the kill point, the
resume proof (buckets skipped vs recomputed), and the release summary.

Run:  python scripts/sf1_endtoend.py [--pages 1200000] [--buckets 16]
      [--kill-after 6] [--cores 32]
"""

import argparse
import glob
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _spark_submit():
    for cand in (
        "/opt/spark/bin/spark-submit",
        os.path.join(os.path.dirname(sys.executable), "spark-submit"),
    ):
        if os.path.exists(cand):
            return cand
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _lineage_buckets(lineage_path: str) -> set:
    """Committed bucket ids, read without a Spark session (pyarrow)."""
    files = glob.glob(os.path.join(lineage_path, "*.parquet"))
    if not files:
        return set()
    import pyarrow.parquet as pq

    out = set()
    for f in files:
        try:
            out |= set(pq.read_table(f, columns=["snapshot_id"])["snapshot_id"].to_pylist())
        except Exception:
            pass  # half-written file from the in-flight job
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_200_000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--kill-after", type=int, default=6,
                    help="SIGKILL stage 1 once this many buckets committed")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--work", default="/tmp/sf1_endtoend")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "sf1_endtoend.json"))
    ns = ap.parse_args(argv)

    from pdf_extraction_spark.session import package_zip

    os.makedirs(ns.work, exist_ok=True)
    zip_path = package_zip(os.path.join(ns.work, "zip"))
    extract_out = os.path.join(ns.work, "extract")
    release_out = os.path.join(ns.work, "release")
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    submit = [
        _spark_submit(),
        "--master", f"local[{ns.cores}]",
        "--driver-memory", "48g",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
    ]
    extract_cmd = submit + [
        os.path.join(REPO, "scripts", "run_extraction.py"),
        "--synth", str(ns.pages), "--output", extract_out,
        "--buckets", str(ns.buckets), "--repartition", str(ns.cores * 4),
    ]
    result = {"pages": ns.pages, "buckets": ns.buckets, "cores": ns.cores}

    # ---- stage 1a: launch, then SIGKILL mid-run --------------------------
    lineage = os.path.join(extract_out, "lineage")
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        extract_cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env=env, cwd=ns.work, start_new_session=True,
    )
    killed_at = None
    while proc.poll() is None:
        done = _lineage_buckets(lineage)
        if len(done) >= ns.kill_after:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            killed_at = sorted(done)
            break
        time.sleep(2.0)
    t_killed = time.perf_counter() - t0
    if killed_at is None:
        raise SystemExit(
            f"stage 1 finished (rc={proc.returncode}) before reaching "
            f"{ns.kill_after} committed buckets — raise --pages or lower --kill-after"
        )
    result["stage1_killed"] = {
        "wall_s": round(t_killed, 2),
        "sigkill_after_buckets": killed_at,
        "n_committed_at_kill": len(killed_at),
    }
    print(f"KILLED stage 1 at {t_killed:.1f}s with buckets {killed_at} committed")

    # ---- stage 1b: rerun the SAME command — must resume ------------------
    t0 = time.perf_counter()
    r = subprocess.run(
        extract_cmd, capture_output=True, text=True, env=env, cwd=ns.work,
        timeout=7200,
    )
    t_resume = time.perf_counter() - t0
    assert r.returncode == 0, r.stderr[-3000:]
    m = re.search(
        r"done: (\d+) docs; processed buckets \[([0-9, ]*)\], resumed past \[([0-9, ]*)\]",
        r.stdout,
    )
    assert m, r.stdout[-2000:]
    docs_total = int(m.group(1))
    processed = [int(x) for x in m.group(2).split(",") if x.strip()]
    skipped = [int(x) for x in m.group(3).split(",") if x.strip()]
    assert set(skipped) >= set(killed_at), (
        f"resume must skip every bucket committed before the kill: "
        f"skipped={skipped} vs killed_at={killed_at}"
    )
    assert not (set(processed) & set(killed_at)), "a committed bucket was recomputed"
    result["stage1_resume"] = {
        "wall_s": round(t_resume, 2),
        "docs": docs_total,
        "recomputed_buckets": processed,
        "resumed_past_buckets": skipped,
    }
    print(
        f"RESUMED in {t_resume:.1f}s: {docs_total} docs; skipped {len(skipped)} "
        f"committed buckets, recomputed {len(processed)}"
    )

    # ---- stage 2: release (curate → dedup → gate → manifest) -------------
    t0 = time.perf_counter()
    r2 = subprocess.run(
        submit + [
            os.path.join(REPO, "scripts", "run_release.py"),
            "--docs", os.path.join(extract_out, "docs"),
            "--output", release_out, "--shards", str(ns.shards),
        ],
        capture_output=True, text=True, env=env, cwd=ns.work, timeout=7200,
    )
    t_rel = time.perf_counter() - t0
    assert r2.returncode == 0, r2.stderr[-3000:]
    with open(os.path.join(release_out, "summary.json")) as f:
        result["stage2_release"] = json.load(f)
    result["stage2_release"]["submit_wall_s"] = round(t_rel, 2)
    result["total_wall_s"] = round(
        result["stage1_killed"]["wall_s"] + t_resume + t_rel, 2
    )

    with open(ns.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
