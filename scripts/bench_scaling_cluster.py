"""TRUE multi-executor scaling evidence: a local Spark STANDALONE
cluster (real master + worker JVMs, separate executor processes, the
package shipped via --py-files semantics) run at N and 4N executors.

This is the closest sandbox realization of the north_rule's "multi-
executor cluster at two cluster sizes": unlike local[K], each executor
is its own JVM with its own Python workers, the package travels as a
zip (addPyFile), and results cross real executor boundaries.

Usage: python scripts/bench_scaling_cluster.py
Writes SCALING_CLUSTER.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MASTER_URL = "spark://127.0.0.1:7077"
EXECUTOR_CORES = 4
# 360k (was 120k): see bench_scaling.py — keep work-per-cell constant
# after the round-6 per-doc cost cuts so the fixed session floor does
# not masquerade as anti-scaling
PAGES = int(os.environ.get("SPARK_BENCH_PAGES", "360000"))


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(pyspark.__file__)


def _build_zip() -> str:
    path = "/tmp/vlm_ocr_pipeline_spark.zip"
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "vlm_ocr_pipeline_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def _spawn(cls: str, *args: str) -> subprocess.Popen:
    home = _spark_home()
    env = dict(os.environ, SPARK_HOME=home)
    return subprocess.Popen(
        [os.path.join(home, "bin", "spark-class"), cls, *args],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


def _run_level(n_workers: int, pages_dir: str, pkg_zip: str) -> float:
    """Start master + n_workers, run the extraction job, return docs/s."""
    procs = [
        _spawn(
            "org.apache.spark.deploy.master.Master",
            "--host", "127.0.0.1", "--port", "7077", "--webui-port", "0",
        )
    ]
    time.sleep(6)
    for _ in range(n_workers):
        procs.append(
            _spawn(
                "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                "--cores", str(EXECUTOR_CORES), "--memory", "5g",
                "--host", "127.0.0.1", "--webui-port", "0",
            )
        )
    time.sleep(8)
    try:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(MASTER_URL)
            .appName(f"cluster-scale-{n_workers}w")
            .config("spark.executor.cores", str(EXECUTOR_CORES))
            .config("spark.executor.memory", "4g")
            .config("spark.cores.max", str(EXECUTOR_CORES * n_workers))
            .config("spark.sql.shuffle.partitions", str(EXECUTOR_CORES * n_workers))
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
            .config("spark.sql.files.maxPartitionBytes", "64m")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.addPyFile(pkg_zip)  # the --py-files contract
        sys.path.insert(0, REPO)
        from vlm_ocr_pipeline_spark.plans.pipeline import extract
        from vlm_ocr_pipeline_spark.sources.datagen import synth_pages

        if not os.path.isdir(pages_dir):
            synth_pages(spark, PAGES, partitions=32).write.parquet(pages_dir)
        src = spark.read.parquet(pages_dir)
        # warm every executor's python workers: a sample that touches
        # ALL partitions (limit() would warm only the first few)
        extract(src.sample(0.03, seed=1), renderer="markdown").count()
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            extract(src, renderer="markdown").count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        dt = best
        n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
        spark.stop()
        return PAGES / dt, n_exec
    finally:
        for p in reversed(procs):
            p.terminate()
        time.sleep(3)
        for p in procs:
            if p.poll() is None:
                p.kill()


def main() -> None:
    pkg_zip = _build_zip()
    pages_dir = tempfile.mkdtemp() + "/pages"
    try:
        lo_tput, lo_exec = _run_level(1, pages_dir, pkg_zip)
        time.sleep(4)
        hi_tput, hi_exec = _run_level(4, pages_dir, pkg_zip)
        eff = (hi_tput / lo_tput) / 4
        result = {
            "mode": "standalone-cluster",
            "pages": PAGES,
            "executors_n": lo_exec,
            "executors_4n": hi_exec,
            "executor_cores": EXECUTOR_CORES,
            "docs_per_sec_n": round(lo_tput, 1),
            "docs_per_sec_4n": round(hi_tput, 1),
            "speedup": round(hi_tput / lo_tput, 3),
            "scaling_efficiency": round(eff, 3),
            "target": 0.8,
            "pass": eff >= 0.8,
        }
        with open(os.path.join(REPO, "SCALING_CLUSTER.json"), "w") as f:
            json.dump(result, f)
        print(json.dumps(result))
    finally:
        shutil.rmtree(os.path.dirname(pages_dir), ignore_errors=True)


if __name__ == "__main__":
    main()
