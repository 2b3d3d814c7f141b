"""Streaming ingest: extraction over a file-source stream + windowed
rate metrics.

- :func:`stream_extract` — readStream(pages parquet dir) -> the SAME
  fused extraction transform as batch (mapInPandas is a stateless
  streaming-compatible operator) -> parquet sink with
  checkpointLocation.  Incremental semantics: each new file is
  processed exactly once; a restart resumes from the checkpoint — the
  streaming twin of CheckpointedRun's anti-join resume.
- :func:`windowed_event_rates` — the reference's 60 s sliding rate
  limiter (pipeline/recognition/api/ratelimit.py:24-140,
  REQUEST_WINDOW_SECONDS=60) as a watermarked window aggregation with
  late-data tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schema
from ..plans.pipeline import extract


def read_pages_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(schema.PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and by default drain) the streaming extraction query.

    With ``available_now`` the query processes everything currently in
    ``input_dir`` and stops — call again after new files land and only
    those are processed (exactly-once via the checkpoint).
    """
    pages = read_pages_stream(spark, input_dir)
    out = extract(pages, run_id="stream")
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()


def stream_dedup_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
):
    """Streaming extraction that parses each DISTINCT payload once —
    the streaming twin of ``extract_dedup_aware``.

    ``dropDuplicatesWithinWatermark`` keeps per-hash state only for the
    watermark horizon, so state is bounded (a crawl re-fetching a page
    weeks later re-extracts it — the desired recrawl semantics), unlike
    an unbounded ``dropDuplicates`` whose state grows with the corpus.
    Exactly-once across restarts via the checkpoint.
    """
    pages = read_pages_stream(spark, input_dir)
    deduped = (
        pages.withColumn("content_hash", F.md5("html"))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .drop("content_hash")
    )
    out = extract(deduped, run_id="stream-dedup")
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_incremental_dedup_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    num_hashes: int = 8,
    bands: int = 4,
    min_bands: int = 1,
    min_jaccard: float | None = None,
):
    """Streaming extraction where every micro-batch near-dedups against
    the PERSISTENT corpus-lifetime bucket store and appends its delta —
    the streaming twin of ``prepare_corpus --dedup-store``.

    vs :func:`stream_dedup_extract`: that keeps exact-hash state only
    for the watermark horizon inside the engine's state store (recrawl
    semantics, bounded state); this remembers every batch FOREVER at
    8 bytes per (doc, band) by moving the state OUT of the streaming
    engine into plain parquet — the only shape that survives when the
    dedup state outgrows any state store (10^12 docs).

    foreachBatch + per-batch-directory writes give idempotent replays:
    batch N's kept docs land in ``output_dir/batch_id=N`` and its
    bucket delta in ``store_dir/batch_id=N``, both mode=overwrite, so a
    retried batch overwrites itself instead of duplicating.  Batch N's
    delta is visible to batch N+1 (micro-batches run sequentially).
    Readers take ``spark.read.parquet(output_dir)`` (batch_id becomes a
    partition column).
    """
    from ..operators.text_dedup import ensure_dedup_meta, incremental_neardup

    # the sidecar pins the LSH params the store's buckets were built
    # with — same guard as prepare_corpus --dedup-store (the two share
    # the store format): verified before the stream starts, backfilled
    # on pre-guard stores, hard-fail on mismatch (mismatched buckets
    # never collide, so the stream would silently dedup nothing)
    verified = min_bands > 1 or min_jaccard is not None
    meta = {"num_hashes": num_hashes, "bands": bands, "n": 3,
            "hash_family": "md5", "signatures": verified}
    ensure_dedup_meta(store_dir, meta, legacy_defaults={"signatures": False})

    pages = read_pages_stream(spark, input_dir)

    def handle(batch_df, batch_id: int) -> None:
        from ..operators.text_dedup import (
            dedup_store_exists,
            lsh_bucket_store,
            lsh_signature_store,
        )

        sess = batch_df.sparkSession
        ext = extract(
            batch_df, run_id=f"stream-incdedup-{batch_id}", renderer="plaintext"
        )
        docs = ext.filter(F.col("status") == "complete").select(
            "url",
            F.xxhash64("url", "warc_ts").alias("doc_id"),
            F.col("rendered").alias("text"),
        )
        # explicit first-batch detection (no parquet files yet) — a
        # read error against an EXISTING store must propagate, not be
        # silently treated as an empty store (which would re-admit
        # every historical duplicate for this batch)
        store_cols = "bk long, sig array<string>" if verified else "bk long"
        if dedup_store_exists(store_dir):
            store = sess.read.parquet(store_dir)
        else:
            store = sess.createDataFrame([], store_cols)
        kept, _ = incremental_neardup(
            docs, store, num_hashes=num_hashes, bands=bands,
            min_bands=min_bands, min_jaccard=min_jaccard,
        )
        # pin kept once: the write below and the delta both consume it,
        # and a recompute would re-run extraction + both dedup joins
        kept = kept.localCheckpoint(eager=True)
        kept.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")
        maker = lsh_signature_store if verified else lsh_bucket_store
        maker(kept, num_hashes, bands).write.mode("overwrite").parquet(
            f"{store_dir}/batch_id={batch_id}"
        )

    q = (
        pages.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def windowed_event_rates(
    events: DataFrame,
    window: str = "60 seconds",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Requests + value totals per (window, event_type) with late-data
    watermarking — works on both streaming and batch DataFrames."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_requests"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_requests",
            "total_value",
        )
    )


def stream_warc_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming WARC ingestion: new .warc/.warc.gz files landing in
    ``input_dir`` are record-walked (sources/warc.py) and extracted
    incrementally, exactly-once via the checkpoint — the end-to-end
    crawl-tail pipeline (archives arrive -> pages -> main content)
    with no batch scheduler.

    binaryFile is a streaming-capable file source (one row per new
    archive); the record walk and extraction are both stateless
    mapInPandas stages, so the whole plan is streaming-legal with no
    state store.
    """
    import pandas as pd

    from ..sources.warc import pages_from_warc_bytes

    files = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; binaryFile's is
        # fixed (path, modificationTime, length, content)
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
        .load(input_dir)
        .select("content")
    )

    def gen(batches):
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for b in batches:
            rows = []
            for data in b["content"]:
                rows.extend(pages_from_warc_bytes(bytes(data)))
            yield pd.DataFrame(rows, columns=cols)

    pages = files.mapInPandas(gen, schema=schema.PAGES_SCHEMA)
    out = extract(pages, run_id="stream-warc")
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()
