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


# ---- domain-level curation ------------------------------------------
# Crawl corpora are curated per REGISTRABLE domain (eTLD+1): quality
# priors, crawl budgets and blocklists all key on it, not on the full
# host.  The extractor below is a deliberate heuristic subset of the
# public-suffix list — the common ccTLD second-level zones — built from
# JVM string/array expressions so the DuckDB oracle reproduces it.

MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr",
    "co.in", "co.nz", "co.kr", "co.za",
    "com.sg", "com.hk", "com.tw",
)


def registrable_domain(url: Column) -> Column:
    """eTLD+1 of a url: the last two host labels, or the last three
    when the trailing two form a known multi-part public suffix
    (``example.co.uk``, not ``co.uk``).  Ports are excluded from the
    host capture; IPv4 literals pass through whole; schemeless rows
    yield '' (unknown — callers group or filter them explicitly)."""
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#:]+)", 1))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, -2, 2))
    last3 = F.concat_ws(".", F.slice(labels, -3, 3))
    is_ip = host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    return (
        F.when(host == "", "")
        .when(is_ip, host)
        .when(n <= 2, host)
        .when(last2.isin(*MULTI_PART_SUFFIXES), last3)
        .otherwise(last2)
    )


def domain_summary(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registrable-domain corpus composition: page count and
    distinct canonical resources (mirror-collapsed).  One hash-agg
    shuffle on the domain key; the canonical-distinct is a partial
    count_distinct, not a pre-distinct exchange."""
    return (
        pages.select(
            registrable_domain(F.col(url_col)).alias("domain"),
            canonical_url(F.col(url_col)).alias("canon"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.countDistinct("canon").cast("long").alias("n_resources"),
        )
    )


def blocklist_filter(
    pages: DataFrame, blocked_domains: list[str] | DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop pages whose registrable domain is on a blocklist.

    The blocklist joins as a BROADCAST left-anti join (plan-gated in
    tests/test_domains.py): even a 10^6-domain list is tens of MB —
    always broadcastable — so the corpus side never shuffles.  Accepts
    a Python list (driver-side lists come from config files) or a
    single-column DataFrame named ``domain`` (blocklists maintained as
    tables)."""
    if "_dom" in pages.columns:  # same guard pattern as asof.py
        raise ValueError(
            "blocklist_filter reserves the temporary column name '_dom'; "
            "rename it in the input first"
        )
    spark = pages.sparkSession
    if isinstance(blocked_domains, DataFrame):
        bl = blocked_domains.select(F.col("domain"))
    else:
        bl = spark.createDataFrame(
            [(d.lower(),) for d in blocked_domains], "domain string"
        )
    tagged = pages.withColumn("_dom", registrable_domain(F.col(url_col)))
    return (
        tagged.join(
            F.broadcast(bl), tagged["_dom"] == bl["domain"], "left_anti"
        ).drop("_dom")
    )


# ---- robots.txt rules -----------------------------------------------


def parse_robots_rules(
    robots: DataFrame, domain_col: str = "domain", body_col: str = "body"
) -> DataFrame:
    """Parse robots.txt bodies into (domain, rule, path_prefix) rows
    for the wildcard ('*') user-agent group(s), RFC 9309 group
    semantics: consecutive User-agent lines open a group, Allow /
    Disallow lines belong to the most recent group, '#' starts a
    comment.  Empty Disallow values (allow-all) produce no row.

    Parsing runs in mapInPandas because robots bodies are a TINY side
    input (one short text per host — never the corpus side); the
    output feeds :func:`robots_disallow_filter` as a broadcast.
    """
    import pandas as pd

    def gen(batches):
        for b in batches:
            rows = []
            for domain, body in zip(b[domain_col], b[body_col]):
                agents: list[str] = []
                in_rules = False
                for line in (body or "").splitlines():
                    line = line.split("#", 1)[0].strip()
                    if not line or ":" not in line:
                        continue
                    field, _, value = line.partition(":")
                    field = field.strip().lower()
                    value = value.strip()
                    if field == "user-agent":
                        if in_rules:  # a new group starts
                            agents = []
                            in_rules = False
                        agents.append(value)
                    elif field in ("allow", "disallow"):
                        in_rules = True
                        if "*" in agents and value:
                            rows.append(
                                {
                                    "domain": domain,
                                    "rule": field,
                                    "path_prefix": value,
                                }
                            )
            yield pd.DataFrame(
                rows, columns=["domain", "rule", "path_prefix"]
            )

    return robots.select(
        F.col(domain_col).alias(domain_col), F.col(body_col).alias(body_col)
    ).mapInPandas(gen, schema="domain string, rule string, path_prefix string")


def robots_disallow_filter(
    pages: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop pages a site's robots.txt disallows for '*' agents.

    Longest-match decides, Allow wins ties (the Google/RFC 9309
    precedence rule); prefixes are literal (no '*'/'$' wildcards —
    documented simplification).  The rules aggregate to ONE array row
    per host and broadcast, and the match is a JVM higher-order filter
    over that array — the 100 TB pages side never shuffles and needs
    no per-page grouping.
    """
    for c in ("_host", "_path", "_rules"):
        if c in pages.columns:
            raise ValueError(
                f"robots_disallow_filter reserves column name {c!r}; "
                "rename it in the input first"
            )
    rule_arrays = rules.groupBy(F.col("domain")).agg(
        F.collect_list(F.struct("rule", "path_prefix")).alias("_rules")
    )
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[A-Za-z]+://([^/?#:]+)", 1))
    path = F.regexp_extract(F.col(url_col), r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    tagged = pages.withColumn("_host", host).withColumn(
        "_path", F.when(path == "", "/").otherwise(path)
    )
    j = tagged.join(
        F.broadcast(rule_arrays),
        tagged["_host"] == rule_arrays["domain"],
        "left",
    )
    matches = F.filter(
        F.coalesce(
            F.col("_rules"),
            F.array().cast("array<struct<rule:string,path_prefix:string>>"),
        ),
        lambda r: F.col("_path").startswith(r["path_prefix"]),
    )
    longest = lambda kind: F.array_max(  # noqa: E731
        F.transform(
            F.filter(matches, lambda r: r["rule"] == kind),
            lambda r: F.length(r["path_prefix"]),
        )
    )
    dis, alw = longest("disallow"), longest("allow")
    keep = dis.isNull() | (alw.isNotNull() & (alw >= dis))
    return j.filter(keep).drop("_host", "_path", "_rules", "domain")
