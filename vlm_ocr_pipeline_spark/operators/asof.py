"""As-of (most-recent-at-or-before) join — an operator Spark's built-in
join set lacks, composed from union + window instead of a Python path:

    for each left row, attach the right row with the greatest
    right_time <= left_time within the same key.

Plan shape: tag both sides, unionByName, ONE window over (key) ordered
by (time, side) carrying last(right_payload, ignorenulls) forward, then
keep the left rows.  A sort-based window over the union is the
canonical distributed as-of: one shuffle on the key, no range
explosion, no per-row Python.  (DuckDB has ASOF JOIN natively, which is
what the oracle uses.)

Contract: rows with equal left/right time DO match (inclusive, the
standard >= semantics).  Right rows sharing one (key, time) are legal —
the one with the greatest ``value_cols`` struct wins deterministically
(see :func:`asof_join`); because that tie-break ORDERS BY the value
struct, every ``value_cols`` type must be orderable (no maps; arrays
and structs of orderable fields are fine).  Pre-aggregate ties away
first if a value column is non-orderable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _guard_columns(names: tuple[str, ...], *frames: DataFrame) -> None:
    """Each operator stages its plumbing in temporary columns; an input
    frame already carrying one of THAT OPERATOR'S names would silently
    shadow the plumbing (wrong selects or analysis errors), so those
    collisions fail fast.  Names other operators use stay legal."""
    for df in frames:
        hit = sorted(set(df.columns) & set(names))
        if hit:
            raise ValueError(
                f"input columns {hit} collide with reserved internal "
                f"names {names}; rename them before the join"
            )


_ASOF_COLS = ("_k", "_t", "_side", "_r", "_l", "_m")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join.  Output: every left row + ``prefix``-prefixed
    ``value_cols`` from the matched right row (null when no right row
    at or before the left time).

    Ties: when several right rows share the matched timestamp, the one
    with the greatest ``value_cols`` struct (field order, Spark struct
    comparison) wins — deterministic, and identical to the carry-in
    rule in :func:`asof_join_sliced` (``max(struct(_t, _r))``), so the
    two variants agree even with duplicate right timestamps.  This
    tie-break puts the value struct in the window ORDER BY, so every
    value column must be an ORDERABLE type (MapType is not); order by
    an orderable projection (e.g. ``map_entries``) or pre-aggregate
    ties away when it isn't.

    Hot-key constraint: the window partitions by ``on`` alone, so ONE
    pathological key (a single user with 10^8 events) serializes
    through one task at scale.  For inputs with such keys use
    :func:`asof_join_sliced`, which adds a time-slice to the partition
    key and carries values across slice boundaries with a second
    (tiny, one-row-per-slice) window — same results, bounded tasks.
    """
    _guard_columns(_ASOF_COLS, left, right)
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rt.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    rt = rt.withColumn("_l", F.lit(None).cast(lt.schema["_l"].dataType))
    u = lt.unionByName(rt)
    # right (side 0) sorts before left (side 1) at equal time ->
    # inclusive >= match semantics; trailing _r makes equal-timestamp
    # right rows deterministic (last = max value, the sliced carry-in
    # rule) instead of leaving the tie to shuffle order
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", "_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1)
    cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in value_cols]
    return out.select(*cols)


def asof_join_sliced(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    prefix: str = "asof_",
    slice_seconds: int = 86400,
) -> DataFrame:
    """:func:`asof_join` with bounded tasks under hot keys.

    The big window partitions by (key, time-slice) instead of key, so
    a hot key's rows spread over (span / slice_seconds) tasks.  Rows
    whose slice has no earlier right row take the carry-in value: the
    last right row of ANY previous slice, computed by a second window
    over one row per (key, slice) — negligible data, and the only
    cross-slice communication.  Results are identical to asof_join,
    including timestamp ties (both resolve to the max ``value_cols``
    struct — see :func:`asof_join`).
    """
    _guard_columns(_ASOF_COLS + ("_slice",), left, right)
    sl = lambda t: F.floor(F.unix_timestamp(F.col(t)) / int(slice_seconds))  # noqa: E731
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        sl(right_time).alias("_slice"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        sl(left_time).alias("_slice"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rt.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    rt = rt.withColumn("_l", F.lit(None).cast(lt.schema["_l"].dataType))
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy("_k", "_slice")
        .orderBy("_t", "_side", "_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    # carry-in per (key, slice): the time-max right value of each slice
    # that HAS rights, carried forward over strictly-previous slices.
    # One row per (key, slice) — the windows here are tiny by design.
    rlast = rt.groupBy("_k", "_slice").agg(
        F.max(F.struct(F.col("_t"), F.col("_r"))).alias("_x")
    )
    slices = u.select("_k", "_slice").distinct()
    wprev = (
        Window.partitionBy("_k")
        .orderBy("_slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        slices.join(rlast, ["_k", "_slice"], "left")
        .withColumn("_m0", F.last("_x", ignorenulls=True).over(wprev))
        .select("_k", "_slice", F.col("_m0._r").alias("_m0r"))
    )
    out = (
        filled.filter(F.col("_side") == 1)
        .join(carry, ["_k", "_slice"], "left")
        .withColumn("_m", F.coalesce("_m", "_m0r"))
    )
    cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in value_cols]
    return out.select(*cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    time_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join (inclusive bounds) without the
    nested-loop trap.

    A naive ``ts BETWEEN start AND end`` join on a low-cardinality key
    degenerates into a per-key cartesian.  The scale path bucketizes
    time: each point carries its bucket, each interval EXPLODES over
    the buckets it covers, the join becomes an equi-join on
    (key, bucket) and the exact range predicate refines it.  A point's
    single bucket appears at most once per covering interval, so no
    dedup pass is needed.  Shuffle key (key, bucket) also spreads a hot
    key across reducers in proportion to its time span.

    Output: matching (point columns + interval columns) pairs.
    """
    _guard_columns(("_b", "_bs", "_be"), points, intervals)
    w = int(bucket_seconds)
    pb = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(time_col)) / w)
    )
    ib = (
        intervals.withColumn(
            "_bs", F.floor(F.unix_timestamp(F.col(start_col)) / w)
        )
        .withColumn("_be", F.floor(F.unix_timestamp(F.col(end_col)) / w))
        .withColumn("_b", F.explode(F.sequence(F.col("_bs"), F.col("_be"))))
        .drop("_bs", "_be")
    )
    return (
        pb.join(ib, [on, "_b"])
        .filter(
            (F.col(time_col) >= F.col(start_col))
            & (F.col(time_col) <= F.col(end_col))
        )
        .drop("_b")
    )
