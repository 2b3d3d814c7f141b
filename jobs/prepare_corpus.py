"""spark-submit entry point: raw crawl pages -> training-ready corpus.

The full post-extraction preparation chain a training-data pipeline
runs, composed from this package's operators:

    1. extract           fused detect -> order -> correct -> render
    2. quality/lang      token counts, quality ratios, language ID,
                         Gopher-style repetition gate
    3. exact dedup       keep one doc per distinct content
    4. near-dup dedup    MinHash-LSH pairs -> connected components ->
                         keep cluster representatives
    5. split             deterministic train/test assignment
    6. shard packing     fixed-token-budget shards for the tokenizer

Cluster usage:

    cd /root/repo && zip -qr /tmp/vlm_ocr_pipeline_spark.zip vlm_ocr_pipeline_spark
    spark-submit --master <cluster> \\
        --py-files /tmp/vlm_ocr_pipeline_spark.zip \\
        jobs/prepare_corpus.py --input <pages dir> --output <corpus dir> \\
        [--input-format parquet|warc] [--synthesize 5000] \\
        [--tokens-per-shard 1000000] [--test-fraction 0.01]

Outputs under --output:
    corpus/        one row per kept doc: url, text, split, shard_id,
                   n_tokens, predicted_lang + quality columns
    report.json    row counts per stage (the run summary)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python jobs/prepare_corpus.py` runs; under spark-submit the
# package arrives via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--input-format", choices=["parquet", "warc"],
                    default="parquet",
                    help="pages table (parquet) or raw .warc/.warc.gz files")
    ap.add_argument("--output", required=True)
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate N synthetic pages into --input first")
    ap.add_argument("--tokens-per-shard", type=int, default=1_000_000)
    ap.add_argument("--test-fraction", type=float, default=0.01)
    ap.add_argument("--min-words", type=int, default=20)
    ap.add_argument("--lsh-hashes", type=int, default=8)
    ap.add_argument("--lsh-bands", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from vlm_ocr_pipeline_spark.operators.corpus import (
        deterministic_split,
        pack_token_shards,
    )
    from vlm_ocr_pipeline_spark.operators.text_dedup import (
        dedup_keep_representatives,
        neardup_clusters,
    )
    from vlm_ocr_pipeline_spark.operators.textstats import (
        quality_lang,
        repetition_quality,
    )
    from vlm_ocr_pipeline_spark.plans.pipeline import extract
    from vlm_ocr_pipeline_spark.plans.session import get_spark

    spark = get_spark(app="prepare-corpus")
    report: dict[str, int] = {}

    if args.synthesize:
        from vlm_ocr_pipeline_spark.sources.datagen import synth_pages

        synth_pages(spark, args.synthesize).write.mode("overwrite").parquet(
            args.input
        )

    if args.input_format == "warc":
        from vlm_ocr_pipeline_spark.sources.warc import read_warc

        pages = read_warc(spark, args.input)
    else:
        pages = spark.read.parquet(args.input)

    # 1. extraction (plaintext is the training text).  doc_id keys on
    # the FULL (url, warc_ts) identity — recrawls of one url are
    # distinct docs (the checkpoint-key semantics), and a url-only hash
    # would collide them into multiplicative self-joins downstream.
    # Cache BEFORE deriving the gate tables: keep_ids and langs both
    # branch off docs, and an uncached plan would re-run the mapInPandas
    # extraction once per branch.  pages_in is counted off the CACHED
    # extraction output (one row per page, pre-status-filter), never
    # off the raw pages frame — for WARC input a pages.count() would
    # decompress and record-walk every archive a second time.
    ext = extract(pages, renderer="plaintext").cache()
    report["pages_in"] = ext.count()
    docs = ext.filter(F.col("status") == "complete").select(
        "url",
        F.xxhash64("url", "warc_ts").alias("doc_id"),
        F.col("rendered").alias("text"),
    )

    # 2. quality + language + repetition gates (quality_lang = one
    # projection for both signal families; repetition_quality drops
    # machine-looped pages)
    ql = quality_lang(docs.select("doc_id", "text")).select(
        "doc_id", "n_words", "predicted_lang"
    )
    docs = docs.join(ql.filter(F.col("n_words") >= args.min_words), "doc_id")
    rq = repetition_quality(docs.select("doc_id", "text"))
    docs = (
        docs.join(rq.filter(F.col("quality_pass")).select("doc_id"), "doc_id")
        .drop("n_words")
        .cache()
    )
    report["after_quality_gate"] = docs.count()

    # 3. exact dedup
    docs = dedup_keep_representatives(docs).cache()
    report["after_exact_dedup"] = docs.count()

    # 4. near-dup dedup: keep each LSH cluster's representative
    clusters = neardup_clusters(
        docs, num_hashes=args.lsh_hashes, bands=args.lsh_bands
    )
    reps = clusters.filter(F.col("doc_id") == F.col("representative")).select(
        "doc_id"
    )
    docs = docs.join(reps, "doc_id").cache()
    report["after_neardup_dedup"] = docs.count()

    # 5 + 6. split and shard
    split = deterministic_split(docs, args.test_fraction)
    shards = pack_token_shards(docs, args.tokens_per_shard)
    corpus = docs.join(split, "doc_id").join(shards, "doc_id")

    out = os.path.join(args.output, "corpus")
    corpus.write.mode("overwrite").parquet(out)
    final = spark.read.parquet(out)
    report["corpus_rows"] = final.count()
    report["n_shards"] = final.select("shard_id").distinct().count()
    report["n_test"] = final.filter(F.col("split") == "test").count()

    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
