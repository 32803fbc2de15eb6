"""End-to-end `spark-submit --py-files` on a multi-executor master —
the north rule's submission shape, run for real: the package zip ships
to 2 separate executor JVMs (local-cluster[2,4,2048]), the job runs the
bucket-checkpointed extraction, and a rerun resumes past every
completed bucket without recomputation."""

import os
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit():
    for cand in (
        "/opt/spark/bin/spark-submit",
        os.path.join(os.path.dirname(sys.executable), "spark-submit"),
    ):
        if os.path.exists(cand):
            return cand
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


@pytest.mark.slow
def test_spark_submit_pyfiles_multi_executor_resume(tmp_path):
    from pdf_extraction_spark.session import package_zip

    zip_path = package_zip(str(tmp_path / "zip"))
    out = str(tmp_path / "out")
    cmd = [
        _spark_submit(),
        "--master", "local-cluster[2,4,2048]",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "run_extraction.py"),
        "--synth", "400", "--output", out, "--buckets", "4",
    ]
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}

    r1 = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path)
    )
    assert r1.returncode == 0, r1.stderr[-3000:]
    assert "done: 400 docs" in r1.stdout
    assert "processed buckets [0, 1, 2, 3]" in r1.stdout

    # rerun the same command: every bucket must resume, none recompute
    r2 = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path)
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "done: 400 docs" in r2.stdout
    assert "processed buckets []" in r2.stdout
    assert "resumed past [0, 1, 2, 3]" in r2.stdout
