"""Partitioning helpers shared by sources and operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_narrow(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input before a compute-heavy or
    row-exploding stage.

    Small parquet files are single row groups (unsplittable), so a
    stage over one synthetic file would otherwise run at file-count
    parallelism — measured: the sf0.1 shingle explode and the
    documents->pages wrap each ran as ONE task.  A no-op when the input
    is already wide (the 100 TB case, where inputs arrive in thousands
    of splits and this must NOT add a shuffle).

    Plans containing an Exchange are left untouched WITHOUT consulting
    .rdd: converting an adaptive (AQE) plan to an RDD materializes its
    shuffle stages, which would silently execute the upstream job once
    during operator CONSTRUCTION and again at the real action.  A
    post-shuffle DataFrame is already at spark.sql.shuffle.partitions
    parallelism, so spreading it is pointless anyway; .rdd is only
    touched for exchange-free (pure scan) plans, where it is lazy.
    """
    import re

    sess = df.sparkSession
    target = min_partitions or sess.sparkContext.defaultParallelism
    # executedPlan().toString() under AQE renders the INITIAL physical
    # plan (exchanges included, post-EnsureRequirements) without
    # running anything — unlike .rdd, which materializes shuffle stages.
    # Word-boundary match: a SHUFFLE exchange means the plan is already
    # at shuffle.partitions parallelism, but a BroadcastExchange does
    # NOT widen the probe side — a narrow scan broadcast-joined to a
    # tiny dim must still be spread (\bExchange\b skips the substring
    # inside 'BroadcastExchange').
    plan = df._jdf.queryExecution().executedPlan().toString()
    if re.search(r"\bExchange\b", plan):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
