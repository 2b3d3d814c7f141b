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
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
