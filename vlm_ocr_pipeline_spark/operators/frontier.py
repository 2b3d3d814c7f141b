"""Crawl-frontier builder: what to fetch NEXT, given what sites
declare, what the archive already holds, what extraction already
processed, and what robots.txt forbids.

Closes the continuous-crawl loop this package's sources feed:

    robots.txt --Sitemap:--> sitemap tree --> DECLARED urls
    CDXJ capture index                    --> CAPTURED urls
    extraction checkpoint table           --> DONE urls
    robots rules                          --> DISALLOWED urls

    frontier = declared - captured - done - disallowed,
               mirror-deduplicated, politeness-scheduled per host

Scale shape (billions of declared urls):
- mirror dedup keys on ``urls.canonical_url`` (one hash-agg shuffle);
- captured/done subtract as ANTI-JOINS on the same canonical key —
  never a collect, never a broadcast of the big sides;
- robots rules broadcast as one array row per host (the
  ``robots_disallow_filter`` shape — the frontier side never groups);
- per-host politeness slots need a per-host sequence, which is a
  window — so a HOT host (10^7 declared urls) is first capped
  APPROXIMATELY by a deterministic hash threshold (keep probability
  ~2x cap/n, exact expectation, zero extra shuffle beyond the count
  join) and only the survivors flow through the exact
  ``row_number`` window that assigns slots and enforces the hard cap.
  No host ever serializes more than ~2x its cap through one task.

Priority: fresher ``lastmod`` first (nulls last), then xxhash64 —
deterministic across runs, no rand().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .urls import canonical_url, robots_disallow_filter

_RESERVED = ("_canon", "_host", "_h", "_n_host", "_keep_p", "_rn")


def _host(url_col):
    return F.lower(F.regexp_extract(url_col, r"^[A-Za-z]+://([^/?#:]+)", 1))


def build_fetch_frontier(
    declared: DataFrame,
    captured: DataFrame | None = None,
    done: DataFrame | None = None,
    robots_rules: DataFrame | None = None,
    per_host_cap: int | None = None,
    url_col: str = "url",
    crawl_delays: DataFrame | None = None,
    default_delay_s: float | None = None,
) -> DataFrame:
    """The fetch frontier from discovery/capture/checkpoint tables.

    ``declared``: candidate urls, optionally with a ``lastmod`` string
    column (sitemap output shape).  ``captured`` / ``done``: any frame
    with a ``url`` column — rows whose CANONICAL url already appears
    there are excluded.  ``robots_rules``:
    :func:`~vlm_ocr_pipeline_spark.operators.urls.parse_robots_rules`
    output.  ``per_host_cap``: hard per-host bound per frontier build
    (politeness / budget).

    Output: (url, host, lastmod, priority, slot) — ``slot`` is the
    0-based per-host fetch round (a fetcher draining slot 0 across all
    hosts, then slot 1, ... never hits one host twice per round);
    ``priority`` orders within a slot build (fresher lastmod first).

    With ``crawl_delays`` (a
    :func:`~vlm_ocr_pipeline_spark.operators.urls.parse_robots_crawl_delay`
    table) and/or ``default_delay_s``, the output adds
    ``not_before_s = slot * delay`` — the earliest offset (seconds
    from frontier start) a Crawl-delay-honoring fetcher may request
    the url, with the host's declared delay taking precedence over
    the default.  The delays table is one row per host and joins as a
    broadcast; the frontier side's plan shape is unchanged.
    """
    for c in _RESERVED:
        if c in declared.columns:
            raise ValueError(
                f"declared frame column {c!r} collides with a reserved "
                "frontier internal name; rename it first"
            )
    has_lastmod = "lastmod" in declared.columns
    lastmod = F.col("lastmod") if has_lastmod else F.lit(None).cast("string")
    cand = declared.select(
        F.col(url_col).alias("url"), lastmod.alias("lastmod")
    ).withColumn("_canon", canonical_url(F.col("url")))
    # mirror dedup: one candidate per canonical resource (min url, max
    # lastmod — the freshest declaration wins the priority)
    cand = cand.groupBy("_canon").agg(
        F.min("url").alias("url"), F.max("lastmod").alias("lastmod")
    )
    for other in (captured, done):
        if other is not None:
            keys = other.select(
                canonical_url(F.col("url")).alias("_canon")
            ).distinct()
            cand = cand.join(keys, "_canon", "left_anti")
    if robots_rules is not None:
        cand = robots_disallow_filter(cand, robots_rules)
    cand = cand.withColumn("_host", _host(F.col("url"))).withColumn(
        "_h", F.xxhash64("url")
    )
    if per_host_cap is not None:
        if per_host_cap < 1:
            raise ValueError("per_host_cap must be >= 1")
        counts = cand.groupBy("_host").agg(F.count("*").alias("_n_host"))
        cand = cand.join(counts, "_host")
        # approximate pre-cap: keep with probability ~2x cap/n via the
        # deterministic hash — a hot host funnels ~2x cap rows into the
        # window below instead of its full url set; the row_number
        # then enforces the EXACT cap.  Hosts under the cap skip the
        # filter entirely (threshold saturates).
        frac = F.least(
            F.lit(1.0), F.lit(2.0 * per_host_cap) / F.col("_n_host")
        )
        bucket = (F.pmod(F.col("_h"), F.lit(1_000_000))) / 1_000_000.0
        cand = cand.filter(bucket < frac).drop("_n_host")
    w = Window.partitionBy("_host").orderBy(
        F.col("lastmod").desc_nulls_last(), F.col("_h"), F.col("url")
    )
    out = cand.withColumn("_rn", F.row_number().over(w))
    if per_host_cap is not None:
        out = out.filter(F.col("_rn") <= per_host_cap)
    out = out.select(
        "url",
        F.col("_host").alias("host"),
        "lastmod",
        F.col("_h").alias("priority"),
        (F.col("_rn") - 1).cast("long").alias("slot"),
    )
    if crawl_delays is not None or default_delay_s is not None:
        default = F.lit(
            float(default_delay_s) if default_delay_s is not None else 0.0
        )
        if crawl_delays is not None:
            delays = crawl_delays.select(
                F.lower(F.col("host")).alias("host"),
                F.col("crawl_delay_s").cast("double").alias("_delay"),
            )
            out = out.join(F.broadcast(delays), "host", "left")
            delay = F.coalesce(F.col("_delay"), default)
        else:
            delay = default
        out = out.withColumn(
            "not_before_s", (F.col("slot") * delay).cast("double")
        )
        if crawl_delays is not None:
            out = out.drop("_delay")
    return out
