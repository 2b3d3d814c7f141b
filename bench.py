"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extract_docs_per_sec": ...}

Extra env:
  SPARK_BENCH_ONLY=extract   run only the extraction bench (scaling runs)
  SPARK_BENCH_PAGES=N        override synthetic page count
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _steal_sample() -> tuple[int, int]:
    """(steal jiffies, total jiffies) from /proc/stat — the visible
    footprint of hypervisor co-tenants.  On a 32-way stage barrier a
    stolen vCPU stalls the WHOLE stage, so even single-digit steal%
    amplifies into multi-x wall-clock swings; recording it per query
    lets a slow number be attributed to interference, not code."""
    try:
        parts = open("/proc/stat").readline().split()
        vals = [int(x) for x in parts[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:
        return 0, 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = os.environ.get("SPARK_BENCH_ONLY", "")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = 0.1
    n_pages = int(os.environ.get("SPARK_BENCH_PAGES", str(int(200_000 * sf_num))))
    n_pages = max(n_pages, 1000)

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from vlm_ocr_pipeline_spark.plans.pipeline import extract
    from vlm_ocr_pipeline_spark.plans.session import get_spark
    from vlm_ocr_pipeline_spark.sources.datagen import synth_pages

    spark = get_spark(app=f"bench-{cpus}", master=f"local[{cpus}]")
    timings: dict[str, float] = {}

    # ---- flagship: fused extraction over n_pages synthetic pages ----
    # two input files per core: 256-row Arrow batches stream inside
    # each task (JVM scan/Arrow overlaps Python parse) and the second
    # wave absorbs cold-worker startup on one-shot runs; single-wave is
    # marginally faster only when workers are already warm
    pages = synth_pages(spark, n_pages, partitions=cpus * 2)
    pages.write.mode("overwrite").parquet(tmp := tempfile.mkdtemp() + "/pages")
    src = spark.read.parquet(tmp)  # bench reads from parquet like a real table

    # no repartition: the parse stage is embarrassingly parallel — scan
    # splits (maxPartitionBytes) already spread it; a shuffle of the
    # payload bytes would only add cost.  salted_repartition is for
    # skew-sensitive keyed stages (see plans/pipeline.py).
    sink = os.environ.get("SPARK_BENCH_SINK", "parquet")
    out_dir = tempfile.mkdtemp() + "/stage_text"
    t0 = time.monotonic()
    # single-renderer run (the reference's RenderingStage config): one
    # rendered column instead of two near-copies
    if sink == "count":
        extract(src, renderer="markdown").count()
    else:
        extract(src, renderer="markdown").write.mode("overwrite").parquet(out_dir)
    t_extract = time.monotonic() - t0
    timings["extract"] = round(t_extract, 3)
    docs_per_sec = round(n_pages / t_extract, 1)

    if only != "extract":
        qs = entrymod.queries()
        bench_queries = [
            "extract_render",         # documents-table end-to-end extraction
            "figure_crops",
            "group_join_agg",
            "reading_order_window",
            "rate_window",
            "median_quantity",
            "conf_filter",
            "top_k_orders",
            "token_fingerprints",
            "quality_lang",
            "repetition_quality",
            "exact_dedup",
            "minhash_lsh",
            "ngram_jaccard",
            "dup_spans",
            "simhash",
            "simhash64_neardup",
            "neardup_clusters",
            "dedup_apply",
            "derive_coarser",
            "pdf_markdown_fonts",
            "token_shards",
            "tfidf_top3",
            "ann_topk",
            "decontaminate",
            "embedding_neardup",
            "asof_last_error",
            "range_join_windows",
            "hypertable_rollup",
        ]
        # best-of-2 per query: the first execution of a distinct plan
        # shape pays whole-stage-codegen compilation + JIT (measured
        # 9.9 s -> 1.9 s on an identical rerun of minhash_lsh) — pure
        # per-plan fixed cost that amortizes to zero on real inputs, so
        # steady-state is the honest number for cross-round comparison.
        # The shuffle-heavy dedup family showed ±15% cross-invocation
        # drift on this 16/32-core box (round-3 adjudication), so those
        # report the MEDIAN OF 3 steady-state runs (4 total, first
        # discarded as codegen warmup) instead of best-of-2.
        median_of_3 = {
            "minhash_lsh",
            "simhash64_neardup",
            "dup_spans",
            "neardup_clusters",
            "ngram_jaccard",
        }
        steal_by_query: dict[str, float] = {}
        for name in bench_queries:
            fn = qs[name]
            runs: list[float] = []
            s_start, t_start = _steal_sample()
            n_runs = 4 if name in median_of_3 else 2
            for _ in range(n_runs):
                spark.catalog.clearCache()  # no cross-run cache reuse
                entrymod._EXTRACT_CACHE.clear()
                t0 = time.monotonic()
                fn(spark, sf_dir).count()
                runs.append(time.monotonic() - t0)
            s_end, t_end = _steal_sample()
            steal_by_query[name] = round(
                100.0 * (s_end - s_start) / max(t_end - t_start, 1), 1
            )
            if name in median_of_3:
                steady = sorted(runs[1:])[len(runs[1:]) // 2]
            else:
                steady = min(runs)
            timings[name] = round(steady, 3)
            # per-run diagnostics on STDERR only (the stdout contract
            # is ONE compact JSON line, last) — lets a slow recorded
            # number be attributed to codegen warmup vs steady state
            print(
                f"[bench] {name}: runs="
                + ",".join(f"{r:.2f}" for r in runs)
                + f" -> {steady:.2f}",
                file=sys.stderr,
                flush=True,
            )

    total = round(sum(timings.values()), 3)
    # COMPACT result only — the scaling evidence lives in SCALING.json /
    # SCALING_CLUSTER.json / SCALING_DEDUP.json at the repo root.  Round 3
    # embedded those blobs here and the line outgrew the driver's stdout
    # tail capture, leaving BENCH_r03 unparseable (parsed: null).  The
    # compact JSON line MUST be the LAST stdout line.
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "timing": "best_of_2_steady_state (dedup family: median_of_3)",
        "queries": timings,
        "sf": sf_num,
        "cpus": cpus,
        "extract_pages": n_pages,
        "extract_docs_per_sec": docs_per_sec,
        "scaling_files": "SCALING.json SCALING_CLUSTER.json SCALING_DEDUP.json",
    }
    if only != "extract":
        # hypervisor-interference context: steal% while each query ran,
        # reported only where it was material (keeps the line compact)
        noisy = {k: v for k, v in steal_by_query.items() if v >= 1.0}
        if noisy:
            result["steal_pct"] = noisy
    shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)
    shutil.rmtree(os.path.dirname(out_dir), ignore_errors=True)
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
