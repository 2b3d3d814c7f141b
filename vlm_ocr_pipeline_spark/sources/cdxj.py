"""CDXJ source: Common-Crawl-style capture-index lines -> DataFrame.

A CDX(J) line is `<searchable-url-key> <timestamp> <json>` where the
JSON carries the capture fields (url, mime, status, digest, length,
offset, filename) — the index used to locate records inside WARC
archives (the cc-index layout).  Reading it is pure DataFrame work:
``spark.read.text`` -> split off the two fixed tokens ->
``from_json`` the rest.  Everything stays JVM-side (one scan, no
Python), so index scans over billions of lines prune and push down
like any other columnar read.

The (surt, warc_ts) output orders captures exactly like the WARC
source keys pages; join index-derived tables on the index's own surt
column (see :func:`surt_key` for its canonicalization caveats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

CDXJ_FIELDS = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("length", T.StringType()),
        T.StructField("offset", T.StringType()),
        T.StructField("filename", T.StringType()),
    ]
)


def _ts14_to_timestamp(ts: Column) -> Column:
    """CDX 14-digit timestamp (yyyyMMddHHmmss) -> timestamp; null on
    malformed input (a corrupt index line must not kill a billion-line
    scan)."""
    return F.try_to_timestamp(ts, F.lit("yyyyMMddHHmmss"))


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """Captures DataFrame from CDXJ files (.cdxj / .cdx.gz — Spark's
    text source decompresses gzip transparently and splits plain files
    by line).

    Output: (surt, warc_ts, url, mime, status, digest, length, offset,
    filename) — length/offset as longs for fetch planning.
    """
    lines = spark.read.text(path).filter(F.length("value") > 0)
    # first two space-separated tokens are fixed; the JSON may contain
    # spaces, so split with a limit instead of exploding all tokens
    parts = F.split(F.col("value"), " ", 3)
    parsed = lines.select(
        parts.getItem(0).alias("surt"),
        _ts14_to_timestamp(parts.getItem(1)).alias("warc_ts"),
        F.from_json(parts.getItem(2), CDXJ_FIELDS).alias("j"),
    )
    return parsed.select(
        "surt",
        "warc_ts",
        F.col("j.url").alias("url"),
        F.col("j.mime").alias("mime"),
        F.col("j.status").cast("int").alias("status"),
        F.col("j.digest").alias("digest"),
        F.col("j.length").cast("long").alias("length"),
        F.col("j.offset").cast("long").alias("offset"),
        F.col("j.filename").alias("filename"),
    )


def surt_key(url: Column) -> Column:
    """SURT-style sort key for a url (scheme dropped, host reversed
    with commas and lowercased, port dropped, path appended after ')'
    — a bare host keys as the root page ')/', matching index keys).
    JVM-side expressions only:
    e.g. https://sub.example.org/a/b -> org,example,sub)/a/b

    This is the STRUCTURAL transform only, not full SURT/URL
    canonicalization (no percent-encoding normalization, no
    session-parameter stripping, no www folding) — index writers
    canonicalize before surt-ing, so joining surt_key(raw_url) against
    a real index's surt column can miss canonicalized captures.  Run
    urls.canonical_url first, or join on the index's own surt on both
    sides, when exactness matters.
    """
    no_scheme = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(no_scheme, r"^([^/]+)", 1))
    host = F.regexp_replace(host, r":\d+$", "")  # port
    path = F.regexp_extract(no_scheme, r"^[^/]+(/.*)?$", 1)
    path = F.when(F.length(path) > 0, path).otherwise(F.lit("/"))
    rev = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    return F.concat(rev, F.lit(")"), path)


def fetch_plan(captures: DataFrame) -> DataFrame:
    """Group deduplicated 200-status captures by archive file and sort
    by offset — the read plan a WARC fetcher executes (one task per
    filename, sequential offsets).  Keeps the latest capture per
    (surt, digest): recrawls with identical content are one fetch."""
    latest = captures.filter(F.col("status") == 200).groupBy(
        "surt", "digest"
    ).agg(
        F.max(F.struct("warc_ts", "filename", "offset", "length")).alias("c")
    )
    return latest.select(
        "surt",
        F.col("c.warc_ts").alias("warc_ts"),
        F.col("c.filename").alias("filename"),
        F.col("c.offset").alias("offset"),
        F.col("c.length").alias("length"),
    ).repartition("filename").sortWithinPartitions("filename", "offset")
