"""URL canonicalization for crawl-level deduplication.

Mirror-detection dedup keys on the CANONICAL url: tracking params
(utm_*, fbclid, gclid, ref), fragments, default ports, case-variant
hosts and trailing slashes all produce distinct raw urls for the same
resource.  Everything here is built from JVM-side string/array
expressions so the DuckDB oracle can reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")


def _is_tracking(p: Column) -> Column:
    cond = F.lit(False)
    for pref in TRACKING_PREFIXES:
        cond = cond | p.startswith(pref)
    return cond | (p == "")


def canonical_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default port stripped,
    empty path -> '/', non-root trailing slash stripped, tracking
    params dropped, surviving params SORTED, fragment dropped.

    URLs without a ``scheme://`` prefix pass through UNCHANGED — the
    alternative (every schemeless string collapsing to ':///') would
    merge unrelated malformed rows into one dedup group."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    # strip default ports (:80 http, :443 https)
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]+)", 1))
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.substring(host, 1, F.length(host) - 3),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.substring(host, 1, F.length(host) - 4),
    ).otherwise(host)
    path = F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", "/").otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"), lambda p: ~_is_tracking(p)
    )
    qs = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.concat_ws("&", F.sort_array(params)))
    ).otherwise("")
    return F.when(scheme == "", url).otherwise(
        F.concat(scheme, F.lit("://"), host, path, qs)
    )


def canonicalize_urls(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, canonical_url) for every row."""
    return pages.select(
        F.col(url_col).alias("url"), canonical_url(F.col(url_col)).alias("canonical_url")
    )


def url_dup_groups(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawl-level mirror detection: rows sharing a canonical url."""
    return (
        canonicalize_urls(pages, url_col)
        .groupBy("canonical_url")
        .agg(F.min("url").alias("representative"), F.count("*").alias("n_variants"))
    )
