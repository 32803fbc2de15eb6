"""SparkSession factory with the engine's scale-oriented defaults.

Defaults chosen for the 100 TB design point and safe locally:
- AQE on (runtime coalescing, skew-join splitting)
- Arrow enabled for pandas-UDF exchange; small Arrow batches because the
  extract UDF carries MB-scale binary payloads per row
- shuffle partitions sized from parallelism (overridable)
"""

import os
import zipfile

from pyspark.sql import SparkSession

# binary payloads are MB-scale; keep Arrow batches small so a batch of
# html blobs fits comfortably in the Python worker (SURVEY.md §4.2.4)
ARROW_BATCH_ROWS = 256


def get_spark(
    app_name: str = "pdf_extraction_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local: ~1 shuffle partition per core; on a real cluster this is
        # sized to keep post-shuffle partitions in the 64–256 MB range
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        if n == "*":
            shuffle_partitions = cpus
        elif "," in n:  # local-cluster[n_exec, cores_per_exec, mem_mb]
            n_exec, cores_per = n.split(",")[:2]
            shuffle_partitions = max(int(n_exec) * int(cores_per), 1)
        else:
            shuffle_partitions = max(int(n), 1)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def shuffle_conf_for(
    input_bytes: int,
    executors: int,
    cores_per_executor: int = 4,
    target_partition_bytes: int = 192 * 1024 * 1024,
) -> dict:
    """Cluster-sizing arithmetic for a given corpus size — the knobs the
    100 TB deployment actually turns, as a pure function so the math is
    testable and the reasoning reviewable:

    - ``spark.sql.shuffle.partitions``: input ÷ target post-shuffle
      partition size (192 MB default — the 64–256 MB band keeps a
      partition comfortably in executor memory during sort/agg spill
      while amortizing per-task overhead), floored at 2× total cores so
      every core gets work even on small inputs. At 100 TB this lands
      at ~550k partitions — far above the 32 used locally, which is the
      point: the number is data-derived, not hardcoded.
    - ``spark.sql.files.maxPartitionBytes``: scan-side split size, kept
      at 128 MB (matches typical parquet row-group packing; larger
      values starve parallelism on the initial scan).
    - AQE remains on: these are *initial* values; runtime coalescing
      and skew splitting adjust per-stage (the skew-join test pins that
      behavior).
    """
    total_cores = max(executors * cores_per_executor, 1)
    by_size = -(-input_bytes // target_partition_bytes)  # ceil
    return {
        "spark.sql.shuffle.partitions": str(max(by_size, 2 * total_cores)),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    }


def package_zip(dest_dir: str | None = None) -> str:
    """Zip the pdf_extraction_spark package for spark-submit --py-files /
    SparkContext.addPyFile (multi-executor shipping)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    dest_dir = dest_dir or os.path.join(root, ".bench_cache")
    os.makedirs(dest_dir, exist_ok=True)
    zip_path = os.path.join(dest_dir, "pdf_extraction_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, root)
                zf.write(full, rel)
    return zip_path


def ship_package(spark: SparkSession) -> str:
    """Make the engine importable on remote executors (the sandbox
    equivalent of ``spark-submit --py-files pdf_extraction_spark.zip``)."""
    zip_path = package_zip()
    spark.sparkContext.addPyFile(zip_path)
    return zip_path
