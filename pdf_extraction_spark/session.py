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
