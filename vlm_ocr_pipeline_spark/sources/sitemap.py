"""Sitemap source: XML sitemaps / sitemap indexes -> URL DataFrame.

The crawl-frontier complement of the CDXJ capture index: sitemaps are
how sites DECLARE their URLs (sitemaps.org protocol), so a fetch plan
usually unions "what the site declares" (here) with "what was already
captured" (cdxj.fetch_plan) and anti-joins the checkpoint table.

Parsing is pure JVM regex over whole files — the spec caps a sitemap
at 50 MB/50k URLs, so one file per row is the intended granularity,
and a directory of thousands of sitemaps parallelizes per file.  No
XML library: the protocol's fixed <url>/<sitemap> + <loc>/<lastmod>
structure is regular, and real-world sitemaps that violate it also
break lenient parsers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# block-level patterns ((?s) = dot matches newlines; Java regex)
_URL_BLOCK = r"(?s)<url\s*>(.*?)</url\s*>"
_SITEMAP_BLOCK = r"(?s)<sitemap\s*>(.*?)</sitemap\s*>"
_LOC = r"(?s)<loc\s*>\s*(.*?)\s*</loc\s*>"
_LASTMOD = r"(?s)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>"


def read_sitemap(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Parse every sitemap file under ``path`` (or an explicit list).

    Output: (sitemap_file, kind, url, lastmod) — ``kind`` is 'url' for
    page entries and 'sitemap' for index entries pointing at child
    sitemaps (callers recurse on those with a second read; unbounded
    recursion inside one operator would hide fetch fan-out).
    ``lastmod`` stays a string: the protocol allows both date and
    datetime forms, and normalization policy belongs to the caller.
    """
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("sitemap_file"), F.col("value")
    )

    def entries(kind: str, block_re: str):
        block = F.explode(
            F.regexp_extract_all(F.col("value"), F.lit(block_re), F.lit(1))
        ).alias("block")
        return (
            raw.select("sitemap_file", block)
            .select(
                "sitemap_file",
                F.lit(kind).alias("kind"),
                F.regexp_extract(F.col("block"), _LOC, 1).alias("url"),
                F.nullif(
                    F.regexp_extract(F.col("block"), _LASTMOD, 1), F.lit("")
                ).alias("lastmod"),
            )
            .filter(F.col("url") != "")
        )

    return entries("url", _URL_BLOCK).unionByName(
        entries("sitemap", _SITEMAP_BLOCK)
    )


def read_sitemap_tree(
    spark: SparkSession,
    path: str | list[str],
    max_depth: int = 3,
    resolve=None,
) -> DataFrame:
    """Recurse through sitemap INDEXES to a bounded depth and return
    every page entry found, with the level it came from.

    Real sitemap trees are 2-3 levels deep (index -> index -> urlset),
    so every caller of :func:`read_sitemap` ends up writing the same
    loop; this is that loop, cycle-safe and bounded.  Per level the
    driver collects only the child SITEMAP urls — the protocol caps an
    index at 50k entries, so the collect is bounded side metadata, and
    page urls stay distributed (each level's frame is unioned lazily,
    never collected).

    ``resolve(url) -> path | None`` maps a declared child-sitemap URL
    to a readable path (a crawl stores fetched sitemaps in a mirror
    directory); ``None`` skips the child.  The default is identity —
    right when entries already reference readable paths, e.g. local
    fixtures or a mounted mirror keyed by URL.

    Output: (sitemap_file, kind='url', url, lastmod, depth).
    """
    if resolve is None:
        resolve = lambda u: u  # noqa: E731
    frame = read_sitemap(spark, path).withColumn("depth", F.lit(0))
    out = frame.filter(F.col("kind") == "url")
    seen: set[str] = set()
    # cycle safety runs on RESOLVED PATHS, seeded with the root(s): a
    # child entry re-declaring a root (or two URL aliases resolving
    # to one path) must not re-read — and re-emit — a file's page rows
    # at a second depth.  URL-level dedup alone missed both cases.
    seen_paths: set[str] = set([path] if isinstance(path, str) else path)
    for depth in range(1, max_depth + 1):
        children = [
            r["url"]
            for r in frame.filter(F.col("kind") == "sitemap")
            .select("url")
            .distinct()
            .collect()
        ]
        paths = []
        for u in children:
            if u in seen:
                continue
            seen.add(u)
            p = resolve(u)
            if p is None or p in seen_paths:
                continue
            seen_paths.add(p)
            paths.append(p)
        if not paths:
            break
        frame = read_sitemap(spark, paths).withColumn("depth", F.lit(depth))
        out = out.unionByName(frame.filter(F.col("kind") == "url"))
    return out


def discover_sitemaps(
    robots: DataFrame,
    resolve,
    max_depth: int = 3,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """The full crawl-discovery chain: robots.txt ``Sitemap:``
    directives -> sitemap indexes -> page URLs.

    ``resolve(url) -> path | None`` maps each declared sitemap URL to
    a readable fetched copy (required here — robots always declares
    URLs, never local paths).  The robots side is tiny (one body per
    host), so collecting its distinct declared URLs is bounded side
    metadata — the same contract as :func:`read_sitemap_tree`'s
    per-level collect; page rows stay distributed.

    ALL declared roots walk in ONE tree (the level loop batches every
    host's files into one read per depth), so the driver round-trips
    scale with tree DEPTH, never with host count — per-host walks
    would serialize thousands of Spark jobs.  Per-host attribution,
    when needed, joins page URLs back to
    :func:`~vlm_ocr_pipeline_spark.operators.urls.parse_robots_sitemaps`
    output (cross-host declarations are legal, so file-level
    attribution is ambiguous by nature).

    Output: (sitemap_file, kind='url', url, lastmod, depth)."""
    from ..operators.urls import parse_robots_sitemaps

    spark = robots.sparkSession
    declared = (
        parse_robots_sitemaps(robots, host_col, body_col)
        .select("sitemap_url")
        .distinct()
        .collect()
    )
    roots = []
    seen: set[str] = set()
    for r in declared:
        p = resolve(r["sitemap_url"])
        if p is not None and p not in seen:
            seen.add(p)
            roots.append(p)
    if not roots:
        return spark.createDataFrame(
            [],
            "sitemap_file string, kind string, url string, "
            "lastmod string, depth int",
        )
    return read_sitemap_tree(spark, roots, max_depth=max_depth, resolve=resolve)
