"""Streaming tier: incremental file-source extraction with exactly-once
checkpointing + watermarked window rates."""

import shutil
import tempfile

import pyspark.sql.functions as F

from vlm_ocr_pipeline_spark.sources import datagen
from vlm_ocr_pipeline_spark.streaming.ingest import (
    stream_extract,
    windowed_event_rates,
)


def test_stream_extract_incremental_exactly_once(spark):
    base = tempfile.mkdtemp(prefix="stream_")
    inp, out, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    try:
        pages = datagen.synth_pages(spark, 60, partitions=2).cache()
        first = pages.filter(F.xxhash64("url") % 2 == 0)
        n_first = first.count()
        first.write.mode("append").parquet(inp)
        stream_extract(spark, inp, out, ckpt)
        assert spark.read.parquet(out).count() == n_first

        # second batch of files: only the delta is processed
        pages.filter(F.xxhash64("url") % 2 != 0).write.mode("append").parquet(inp)
        stream_extract(spark, inp, out, ckpt)
        got = spark.read.parquet(out)
        assert got.count() == 60  # no duplicates from batch 1

        # byte-identity holds through the streaming path too
        joined = got.join(pages.select("url", F.col("text").alias("e")), "url")
        assert joined.filter(F.col("rendered_plaintext") != F.col("e")).count() == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_windowed_event_rates_batch_equivalence(spark):
    rows = [
        ("2024-01-01 00:00:10", "click", 1.0),
        ("2024-01-01 00:00:50", "click", 2.0),
        ("2024-01-01 00:01:10", "click", 4.0),
        ("2024-01-01 00:00:30", "error", 8.0),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "event_type", "value"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
    )
    out = windowed_event_rates(df).toPandas().set_index(
        ["window_start", "event_type"]
    )
    import pandas as pd

    w0 = pd.Timestamp("2024-01-01 00:00:00")
    w1 = pd.Timestamp("2024-01-01 00:01:00")
    assert out.loc[(w0, "click"), "n_requests"] == 2
    assert out.loc[(w1, "click"), "n_requests"] == 1
    assert out.loc[(w0, "error"), "total_value"] == 8.0


def test_windowed_rates_on_stream(spark):
    """Same aggregation through an actual streaming query (memory sink)."""
    base = tempfile.mkdtemp(prefix="streamev_")
    try:
        rows = [("2024-01-01 00:00:10", "click", 1.0),
                ("2024-01-01 00:01:10", "view", 2.0)]
        df = spark.createDataFrame(rows, ["ts_s", "event_type", "value"]).select(
            F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
        )
        df.write.mode("overwrite").parquet(f"{base}/ev")
        stream = spark.readStream.schema(df.schema).parquet(f"{base}/ev")
        agg = windowed_event_rates(stream)
        q = (
            agg.writeStream.format("memory")
            .queryName("rates")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.sql("select * from rates").toPandas()
        assert len(got) == 2
        assert set(got["event_type"]) == {"click", "view"}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_incremental_dedup_extract_remembers_forever(spark):
    """foreachBatch + external parquet bucket state: content seen in
    ANY earlier file batch is dropped in later ones — corpus-lifetime
    memory, unlike the watermark-bounded stream_dedup_extract — and
    the store grows by exactly the kept docs' buckets per batch."""
    from vlm_ocr_pipeline_spark.streaming.ingest import (
        stream_incremental_dedup_extract,
    )

    base = tempfile.mkdtemp(prefix="stream_incdedup_")
    inp, out, ckpt, store = (
        f"{base}/in", f"{base}/out", f"{base}/ckpt", f"{base}/store"
    )
    try:
        pages = datagen.synth_pages(spark, 24, partitions=2).cache()
        half = pages.filter(F.xxhash64("url") % 2 == 0).cache()
        half.write.mode("append").parquet(inp)
        stream_incremental_dedup_extract(spark, inp, out, ckpt, store)
        n1 = spark.read.parquet(out).count()
        assert 0 < n1
        store1 = spark.read.parquet(store).count()
        assert store1 > 0

        # batch 2: everything (the other half + full re-ingestion of
        # batch 1's content under the same urls/timestamps)
        pages.write.mode("append").parquet(inp)
        stream_incremental_dedup_extract(spark, inp, out, ckpt, store)
        got = spark.read.parquet(out)
        urls = [r["url"] for r in got.select("url").collect()]
        assert len(urls) == len(set(urls))       # nothing extracted twice
        n2 = got.count()
        assert n1 < n2                           # the new half came through
        # batch 3: a third full replay of the same content -> nothing new
        pages.write.mode("append").parquet(inp)
        stream_incremental_dedup_extract(spark, inp, out, ckpt, store)
        assert spark.read.parquet(out).count() == n2
        assert spark.read.parquet(store).count() > store1
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stream_dedup_extract_parses_distinct_payloads_once(spark):
    """Stateful streaming dedup: duplicate payloads re-ingested in a
    LATER micro-batch (and a later file batch across restarts) are
    dropped by the checkpointed dropDuplicatesWithinWatermark state —
    each distinct payload is extracted exactly once."""
    from vlm_ocr_pipeline_spark.streaming.ingest import stream_dedup_extract

    base = tempfile.mkdtemp(prefix="stream_dedup_")
    inp, out, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    try:
        pages = datagen.synth_pages(spark, 30, partitions=2).cache()
        pages.filter(F.xxhash64("url") % 2 == 0).write.mode("append").parquet(inp)
        stream_dedup_extract(spark, inp, out, ckpt)
        n1 = spark.read.parquet(out).count()

        # second file batch: the other half PLUS a full re-ingestion of
        # everything (duplicate payloads, same urls/timestamps)
        pages.write.mode("append").parquet(inp)
        stream_dedup_extract(spark, inp, out, ckpt)
        got = spark.read.parquet(out)
        assert n1 < 30
        assert got.count() == 30            # dups dropped, nothing lost
        assert got.select("url").distinct().count() == 30
    finally:
        shutil.rmtree(base, ignore_errors=True)
