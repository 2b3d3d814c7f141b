"""Stateful streaming rate limiter (applyInPandasWithState)."""

import shutil
import tempfile

import pyspark.sql.functions as F

from vlm_ocr_pipeline_spark.streaming.ratelimit import rate_limit_stream


def _events_df(spark, rows):
    df = spark.createDataFrame(rows, ["event_id", "ts_s", "event_type"])
    return df.select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )


def test_rate_limit_throttles_over_budget(spark):
    base = tempfile.mkdtemp(prefix="rl_")
    try:
        # 20 events for one key in the same minute; budget 15
        rows = [(i, f"2024-01-01 00:00:{i:02d}", "click") for i in range(20)]
        # second key stays under budget
        rows += [(100 + i, f"2024-01-01 00:00:{i:02d}", "view") for i in range(3)]
        _events_df(spark, rows).write.mode("overwrite").parquet(f"{base}/ev")
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, event_type string"
        ).parquet(f"{base}/ev")
        out = rate_limit_stream(stream, max_per_window=15)
        q = (
            out.writeStream.format("memory")
            .queryName("rl")
            .outputMode("append")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.sql("select * from rl").toPandas()
        clicks = got[got.key == "click"].sort_values("event_id")
        assert clicks["allowed"].sum() == 15
        assert not clicks["allowed"].tail(5).any()  # 16th..20th throttled
        assert got[got.key == "view"]["allowed"].all()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_rate_limit_window_slides(spark):
    base = tempfile.mkdtemp(prefix="rl2_")
    try:
        # 15 events at minute 0 exhaust the budget; at minute 2 the
        # window has slid -> allowed again
        rows = [(i, f"2024-01-01 00:00:{i:02d}", "click") for i in range(15)]
        rows += [(50, "2024-01-01 00:00:59", "click")]       # throttled
        rows += [(60, "2024-01-01 00:02:00", "click")]       # allowed again
        _events_df(spark, rows).write.mode("overwrite").parquet(f"{base}/ev")
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, event_type string"
        ).parquet(f"{base}/ev")
        out = rate_limit_stream(stream, max_per_window=15)
        q = (
            out.writeStream.format("memory")
            .queryName("rl2")
            .outputMode("append")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.sql("select * from rl2").toPandas().set_index("event_id")
        assert not got.loc[50, "allowed"]
        assert got.loc[60, "allowed"]
        assert got.loc[60, "in_window_before"] == 0  # old buckets evicted
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_state_persists_across_restarts(spark):
    base = tempfile.mkdtemp(prefix="rl3_")
    try:
        schema = "event_id long, ts timestamp, event_type string"
        batch1 = [(i, f"2024-01-01 00:00:{i:02d}", "click") for i in range(10)]
        _events_df(spark, batch1).write.mode("append").parquet(f"{base}/ev")
        for _ in range(1):
            stream = spark.readStream.schema(schema).parquet(f"{base}/ev")
            q = (
                rate_limit_stream(stream, max_per_window=15)
                .writeStream.format("parquet")
                .option("path", f"{base}/out")
                .option("checkpointLocation", f"{base}/ckpt")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        # second run adds 10 more in the same minute: only 5 fit
        batch2 = [(100 + i, f"2024-01-01 00:00:3{i}", "click") for i in range(10)]
        _events_df(spark, batch2).write.mode("append").parquet(f"{base}/ev")
        stream = spark.readStream.schema(schema).parquet(f"{base}/ev")
        q = (
            rate_limit_stream(stream, max_per_window=15)
            .writeStream.format("parquet")
            .option("path", f"{base}/out")
            .option("checkpointLocation", f"{base}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.read.parquet(f"{base}/out").toPandas()
        second = got[got.event_id >= 100]
        assert len(second) == 10
        assert second["allowed"].sum() == 5  # state carried the first 10
    finally:
        shutil.rmtree(base, ignore_errors=True)
