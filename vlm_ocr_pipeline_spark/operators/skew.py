"""Explicit skew handling for keyed stages (north_rule requirement).

The extraction map stage needs no shuffle, but domain-keyed
aggregations and joins DO — and Common-Crawl domain distributions are
zipfian (the synthetic corpus intentionally puts ~30% of pages on one
host).  Two mechanisms:

- :func:`salted_two_phase_agg` — generic two-phase aggregation: partial
  aggregate on (key, salt) spreads a hot key over ``salt_buckets``
  reducers, then a cheap final aggregate on the key combines the
  partials.  Spark's own hash aggregate already does map-side partial
  combine for algebraic functions; the explicit salt matters for
  aggregations that funnel through few reducers or for
  ``collect_list``-style holistic aggregates where map-side combine
  can't shrink the hot key.
- :func:`broadcast_hot_keys_join` — skew-join pattern: split the fact
  side on hot keys (found with a cheap count), broadcast-join the hot
  slice, shuffle-join the long tail, union.  AQE's skew-join split
  covers sort-merge joins automatically; this explicit variant is for
  when the planner can't see the skew (e.g. after a UDF stage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def domain_of(url: Column) -> Column:
    """Host domain from a url column (JVM-side regex)."""
    return F.regexp_extract(url, r"^[a-z]+://([^/]+)/", 1)


def salted_two_phase_agg(
    df: DataFrame,
    key: Column,
    agg_exprs: dict[str, Column],
    salt_buckets: int = 16,
    row_id_col: str | None = None,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt on the hot key.

    ``agg_exprs`` maps output column name -> partial aggregation
    expression; supported combiners are sum-like (the final phase
    re-sums partials) — count must be expressed as ``F.count(...)``
    whose partials sum correctly.

    The salt is derived from row CONTENT (xxhash64 over every input
    column), never from a nondeterministic expression such as
    monotonically_increasing_id: a nondeterministic salt feeding a
    shuffle can re-salt rows into different (key, salt) groups when a
    task is retried or a stage recomputed after a fetch failure,
    duplicating/losing partial aggregates.  Content hashing makes
    re-executed tasks reproduce identical partials.

    Limitation: byte-identical rows hash to the SAME salt bucket, so a
    hot key made of exact duplicates (a common crawl shape before
    dedup) is NOT spread by content salting alone.  Pass
    ``row_id_col`` naming a pre-existing unique id column (crawl
    record id, offset, (url, warc_ts) digest...) to restore spreading
    for duplicate payloads — it is simply mixed into the hash, so
    determinism under task retry is preserved.
    """
    id_cols = [F.col(row_id_col)] if row_id_col else []
    salt = F.pmod(
        F.xxhash64(*id_cols, *[F.col(c) for c in df.columns]),
        F.lit(salt_buckets),
    )
    partial = (
        df.withColumn("_k", key)
        .withColumn("_salt", salt)
        .groupBy("_k", "_salt")
        .agg(*[expr.alias(name) for name, expr in agg_exprs.items()])
    )
    final = partial.groupBy("_k").agg(
        *[F.sum(name).alias(name) for name in agg_exprs]
    )
    return final.withColumnRenamed("_k", "key")


def find_hot_keys(df: DataFrame, key: Column, top_n: int = 8) -> list:
    """Cheap driver-side hot-key probe (top-n by count) — the only
    intentional collect in the module, bounded at top_n rows."""
    rows = (
        df.groupBy(key.alias("_k")).count().orderBy(F.desc("count")).limit(top_n)
    ).collect()
    return [r["_k"] for r in rows]


def broadcast_hot_keys_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    hot_keys: list,
) -> DataFrame:
    """Skew join: broadcast the dim rows for hot keys against the hot
    fact slice; shuffle-join the tail; union the results."""
    hot = fact.filter(F.col(on).isin(hot_keys)).join(
        F.broadcast(dim.filter(F.col(on).isin(hot_keys))), on
    )
    tail = fact.filter(~F.col(on).isin(hot_keys)).join(
        dim.filter(~F.col(on).isin(hot_keys)), on
    )
    return hot.unionByName(tail)


def domain_stats(pages: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Per-domain page stats over a (possibly hot-domain-skewed) pages
    table via the salted two-phase aggregation."""
    return salted_two_phase_agg(
        pages.select("url", F.length("html").alias("n_bytes")),
        domain_of(F.col("url")),
        {
            "n_pages": F.count("*"),
            "total_bytes": F.sum("n_bytes"),
        },
        salt_buckets=salt_buckets,
    ).withColumnRenamed("key", "domain")
