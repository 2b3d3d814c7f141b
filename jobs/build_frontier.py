"""spark-submit entry point: build the next crawl-fetch frontier.

Composes the discovery / capture / checkpoint surfaces into the
"what do we fetch next" table a continuous crawl runs on:

    robots.txt fetches --Sitemap:--> sitemap trees -> DECLARED urls
    CDXJ capture index                             -> already CAPTURED
    extraction output / checkpoint                 -> already DONE
    robots Allow/Disallow groups                   -> DISALLOWED

    frontier = declared - captured - done - disallowed,
               mirror-deduplicated (canonical_url),
               per-host politeness slots (+ optional hard cap)

Usage:

    spark-submit --py-files vlm_ocr_pipeline_spark.zip \\
        jobs/build_frontier.py \\
        --robots robots.parquet         # (host, body) fetched robots
        [--sitemap-mirror DIR]          # fetched sitemap files, named
                                        #   by url basename
        [--declared extra.parquet]      # extra candidate urls (url[,
                                        #   lastmod])
        [--cdxj index_dir]              # capture index (already held)
        [--done extracted.parquet]      # url column = already handled
        [--per-host-cap N] [--user-agent token]
        --output frontier_dir

Outputs: ``frontier/`` parquet (url, host, lastmod, priority, slot)
and ``report.json`` row counts per stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None, spark=None) -> dict:
    """Run the job; tests pass an arg list + their session fixture to
    run in-process (no per-run JVM boot).  Returns the report."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", required=True,
                    help="parquet of (host, body) robots.txt fetches")
    ap.add_argument("--sitemap-mirror", default="",
                    help="dir of fetched sitemap files named by URL "
                         "basename; enables Sitemap: discovery")
    ap.add_argument("--declared", default="",
                    help="extra candidates parquet (url[, lastmod])")
    ap.add_argument("--cdxj", default="", help="capture-index dir")
    ap.add_argument("--done", default="",
                    help="parquet with a url column of handled pages")
    ap.add_argument("--per-host-cap", type=int, default=0)
    ap.add_argument("--user-agent", default="",
                    help="crawler product token for robots group "
                         "selection (default '*' groups)")
    ap.add_argument("--default-crawl-delay", type=float, default=0.0,
                    help="politeness seconds between fetches for hosts "
                         "without a robots Crawl-delay; any positive "
                         "value (or any robots Crawl-delay) adds a "
                         "not_before_s schedule column")
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from vlm_ocr_pipeline_spark.operators.frontier import build_fetch_frontier
    from vlm_ocr_pipeline_spark.operators.urls import (
        parse_robots_crawl_delay,
        parse_robots_rules,
    )
    from vlm_ocr_pipeline_spark.plans.session import get_spark
    from vlm_ocr_pipeline_spark.sources.sitemap import discover_sitemaps

    owns_session = spark is None
    if owns_session:
        spark = get_spark(app="build-frontier")
    report: dict = {}

    robots = spark.read.parquet(args.robots)
    rules = parse_robots_rules(robots, user_agent=args.user_agent or None)

    declared = None
    if args.sitemap_mirror:
        mirror = args.sitemap_mirror

        def resolve(u: str):
            p = os.path.join(mirror, u.rsplit("/", 1)[-1])
            return p if os.path.exists(p) else None

        declared = discover_sitemaps(robots, resolve).select("url", "lastmod")
        report["declared_from_sitemaps"] = declared.count()
    if args.declared:
        extra = spark.read.parquet(args.declared)
        if "lastmod" not in extra.columns:
            extra = extra.withColumn("lastmod", F.lit(None).cast("string"))
        extra = extra.select("url", "lastmod")
        declared = extra if declared is None else declared.unionByName(extra)
    if declared is None:
        raise SystemExit("no candidates: pass --sitemap-mirror and/or "
                         "--declared")

    captured = None
    if args.cdxj:
        from vlm_ocr_pipeline_spark.sources.cdxj import read_cdxj

        captured = read_cdxj(spark, args.cdxj).select("url")
        report["captured_rows"] = captured.count()
    done = spark.read.parquet(args.done).select("url") if args.done else None

    delays = parse_robots_crawl_delay(
        robots, user_agent=args.user_agent or None
    )
    frontier = build_fetch_frontier(
        declared,
        captured=captured,
        done=done,
        robots_rules=rules,
        per_host_cap=args.per_host_cap or None,
        crawl_delays=delays,
        default_delay_s=args.default_crawl_delay or None,
    )
    out = os.path.join(args.output, "frontier")
    frontier.write.mode("overwrite").parquet(out)
    final = spark.read.parquet(out)
    report["frontier_rows"] = final.count()
    report["hosts"] = final.select("host").distinct().count()
    report["max_slot"] = (final.agg(F.max("slot")).collect()[0][0]
                          if report["frontier_rows"] else None)
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    if owns_session:
        spark.stop()
    return report


if __name__ == "__main__":
    main()
