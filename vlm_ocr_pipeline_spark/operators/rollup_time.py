"""Hypertable-style multi-resolution time rollup (the continuous-
aggregate pattern): one pass per resolution, each a plain windowed
aggregation, unioned with a resolution label.

At scale each resolution is an independent shuffle on its own window
key; coarse resolutions can also be DERIVED from the finest rollup
(sum of sums) when re-scanning the raw table is the bottleneck —
:func:`derive_coarser` does that re-aggregation.

Money-typed values aggregate via integer cents (repo float rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RESOLUTIONS = ("1 minute", "1 hour", "1 day")


def _cents(col):
    return F.round(col * 100).cast("long")


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    resolutions: tuple[str, ...] = RESOLUTIONS,
) -> DataFrame:
    """(resolution, bucket_start, key, n_events, total_value) at every
    requested resolution.  Buckets are epoch-aligned (minute/hour/day
    all share the midnight-UTC grid with DuckDB's time_bucket)."""
    outs = []
    for res in resolutions:
        outs.append(
            events.groupBy(
                F.window(ts_col, res).alias("w"), F.col(key_col).alias("key")
            )
            .agg(
                F.count("*").alias("n_events"),
                (F.sum(_cents(F.col(value_col))) / 100.0).alias("total_value"),
            )
            .select(
                F.lit(res).alias("resolution"),
                F.col("w.start").alias("bucket_start"),
                "key",
                "n_events",
                "total_value",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def derive_coarser(
    fine: DataFrame, fine_resolution: str, coarse_resolution: str
) -> DataFrame:
    """Re-aggregate an existing fine rollup into a coarser one (sums of
    sums / counts of counts) without touching the raw table — the
    continuous-aggregate refresh path."""
    src = fine.filter(F.col("resolution") == fine_resolution)
    return (
        src.groupBy(
            F.window("bucket_start", coarse_resolution).alias("w"), "key"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            (F.sum(_cents(F.col("total_value"))) / 100.0).alias("total_value"),
        )
        .select(
            F.lit(coarse_resolution).alias("resolution"),
            F.col("w.start").alias("bucket_start"),
            "key",
            "n_events",
            "total_value",
        )
    )
