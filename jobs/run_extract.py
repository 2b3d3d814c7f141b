"""spark-submit entry point for the extraction pipeline.

Cluster usage (the north_rule contract):

    cd /root/repo && zip -qr /tmp/vlm_ocr_pipeline_spark.zip vlm_ocr_pipeline_spark
    spark-submit --master <cluster> \\
        --py-files /tmp/vlm_ocr_pipeline_spark.zip \\
        jobs/run_extract.py \\
        --input  <pages parquet/iceberg dir> \\
        --workdir <checkpoint dir> \\
        --mode staged --resume

Local sandbox example (what scripts/submit_local.sh runs):

    spark-submit --master local[8] --py-files /tmp/pkg.zip \\
        jobs/run_extract.py --input /tmp/pages --workdir /tmp/wd \\
        --synthesize 2000
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages table directory")
    ap.add_argument("--workdir", required=True, help="checkpoint/output dir")
    ap.add_argument("--mode", choices=["fused", "staged"], default="staged")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--repartition", type=int, default=None,
                    help="salted repartition width for skewed inputs")
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate N synthetic pages into --input first")
    ap.add_argument("--renderer", default="both",
                    choices=["both", "markdown", "plaintext"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # under spark-submit the session/master comes from the launcher
    spark = SparkSession.builder.appName("vlm-ocr-pipeline-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from vlm_ocr_pipeline_spark.plans.pipeline import CheckpointedRun, extract

    if args.synthesize:
        from vlm_ocr_pipeline_spark.sources.datagen import synth_pages

        synth_pages(spark, args.synthesize).write.mode("overwrite").parquet(args.input)

    pages = spark.read.parquet(args.input)
    t0 = time.monotonic()
    if args.mode == "staged":
        run = CheckpointedRun(spark, args.workdir, run_id=args.run_id)
        text = run.run(pages, repartition_to=args.repartition)
        n = text.count()
        summary = {r["status"]: r["n_pages"] for r in
                   run.status_summary(text).collect()}
    else:
        out = extract(pages, repartition_to=args.repartition,
                      renderer=args.renderer)
        path = f"{args.workdir}/stage_text_fused"
        out.write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
        n = df.count()
        summary = {r["status"]: r["count"] for r in
                   df.groupBy("status").count().collect()}
    dt = time.monotonic() - t0
    print(json.dumps({
        "mode": args.mode, "docs": n, "sec": round(dt, 2),
        "docs_per_sec": round(n / dt, 1), "status_summary": summary,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
