"""SparkSession builder tuned for the extraction workload.

Sandbox runs on local[N]; the same configs are what we'd submit with
``spark-submit --py-files`` on a real cluster (SURVEY §7.2 m7):

- AQE on (runtime coalesce + skew-join splitting, SURVEY §4.4)
- Arrow batch size bounds Python-worker memory per stage batch — the
  analog of the reference's GPU batch-size calibration (SURVEY §4.5)
- shuffle partitions sized to cores in local mode; on a cluster this
  should be ~2-3x total executor cores (AQE coalesces down)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# docs per Arrow batch entering pandas stages: small batches stream —
# the JVM writer thread feeds batch k+1 while Python parses batch k,
# overlapping scan/Arrow with parse inside one task.  256 measured best
# at local[16] in round 2; re-swept at local[32] in round 6 on the
# 200k-page extract noop: 256 -> ~12.4s, 512 -> ~10.0s, 1024/2048 flat
# within noise of 512 (more workers amortize per-batch overhead, so the
# streaming sweet spot moved up one notch)
ARROW_BATCH_ROWS = 512


def get_spark(
    app: str = "vlm-ocr-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = int(master[master.index("[") + 1 : -1]) if "[" in master else cpus
        shuffle_partitions = max(n, 8)
    builder = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # zstd output parquet: measured on the 200k-page extract sink —
        # snappy 16.5s/205MB, zstd 10.8s/141MB vs a 10.7s noop sink,
        # i.e. the write fully overlaps compute (smaller I/O wins over
        # codec CPU on every stage sink; also the guide-§6 default)
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS)
        )
        # one scan task per input file up to 64 MB: per-task handshake
        # costs dominated multi-wave layouts; intra-task streaming (see
        # ARROW_BATCH_ROWS) provides the overlap instead
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
