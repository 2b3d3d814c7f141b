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

# RFC 3986 §2.3 unreserved characters: percent-encodings of these are
# equivalent to the bare character and MUST decode during
# normalization (§6.2.2.2); all other escapes only get uppercase hex
# (§6.2.2.1).  Reserved characters (%2F, %3F, ...) are never decoded,
# so normalization can't change URL structure.
_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
import re as _re

_PCT_RE = _re.compile("%([0-9A-Fa-f]{2})")


def py_percent_normalize(s: str) -> str:
    """Python twin of :func:`percent_normalize` (used when rules parse
    in Python, e.g. robots.txt paths)."""
    def sub(m):
        h = m.group(1).upper()
        c = chr(int(h, 16))
        return c if c in _UNRESERVED else "%" + h

    return _PCT_RE.sub(sub, s or "")


def percent_normalize(col: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, JVM-side:
    decode escapes of unreserved characters (%7E -> ~, %41 -> A) and
    uppercase the hex of everything else (%2f -> %2F).  Without this,
    mirror detection under-merges (%7Euser vs ~user) and robots path
    matching misses encoded rules.  A chain of literal replaces — one
    per unreserved code plus 12 hex-case rewrites — all inside
    whole-stage codegen; URLs are short, so the repeated scans are
    noise next to any hash."""
    # uppercase the FIRST hex digit (requires a valid second digit, so
    # stray '%' runs in malformed URLs stay untouched) ...
    for d in "abcdef":
        col = F.regexp_replace(col, f"%{d}([0-9A-Fa-f])", f"%{d.upper()}$1")
    # ... then the second digit (first is uppercase by now)
    for d in "abcdef":
        col = F.regexp_replace(col, f"(%[0-9A-F]){d}", f"$1{d.upper()}")
    for c in _UNRESERVED:
        col = F.replace(col, F.lit(f"%{ord(c):02X}"), F.lit(c))
    return col


def sql_percent_normalize(col: str) -> str:
    """DuckDB twin of :func:`percent_normalize` (same rewrite chain,
    RE2 \\1 rewrite syntax)."""
    e = col
    for d in "abcdef":
        e = f"regexp_replace({e}, '%{d}([0-9A-Fa-f])', '%{d.upper()}\\1', 'g')"
    for d in "abcdef":
        e = f"regexp_replace({e}, '(%[0-9A-F]){d}', '\\1{d.upper()}', 'g')"
    for c in _UNRESERVED:
        lit = c.replace("'", "''")
        e = f"replace({e}, '%{ord(c):02X}', '{lit}')"
    return e


def _is_tracking(p: Column) -> Column:
    cond = F.lit(False)
    for pref in TRACKING_PREFIXES:
        cond = cond | p.startswith(pref)
    return cond | (p == "")


def canonical_url(url: Column) -> Column:
    """Canonical form: percent-encoding normalized (RFC 3986 §6.2.2 —
    unreserved escapes decoded, remaining hex uppercased), lowercase
    scheme+host, default port stripped, empty path -> '/', non-root
    trailing slash stripped, tracking params dropped, surviving params
    SORTED, fragment dropped.

    URLs without a ``scheme://`` prefix pass through UNCHANGED — the
    alternative (every schemeless string collapsing to ':///') would
    merge unrelated malformed rows into one dedup group."""
    raw = url
    url = percent_normalize(url)
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
    return F.when(scheme == "", raw).otherwise(
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


# ---- real public-suffix list (eTLD+1 done right) --------------------
# MULTI_PART_SUFFIXES above is a 22-entry heuristic kept as the
# oracle-compatible default; domains under any of the ~9,000 other PSL
# suffixes (example.co.id, example.com.vn, every github.io site)
# mis-group there.  registrable_domain_psl accepts the full Mozilla
# public-suffix list (publicsuffix.org — public data; load the dat
# file's non-comment lines) and resolves eTLD+1 with the real PSL
# algorithm: longest-label match wins, '*.' wildcard rules match any
# label, '!' exception rules override wildcards, unmatched hosts fall
# back to the implicit '*' rule (last label is the suffix).
#
# DEFAULT_PSL_SNAPSHOT is a small bundled subset of that list (the
# high-traffic suffixes) so the operator is useful with no side file.

DEFAULT_PSL_SNAPSHOT = (
    # ccTLD second-level registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "org.mx", "gob.mx",
    "com.ar", "com.tr", "gen.tr", "org.tr",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.kr", "or.kr", "go.kr", "ne.kr",
    "co.za", "org.za", "web.za",
    "com.sg", "org.sg", "edu.sg",
    "com.hk", "org.hk", "edu.hk",
    "com.tw", "org.tw", "idv.tw",
    "co.id", "or.id", "web.id", "ac.id", "sch.id", "go.id", "my.id",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.my", "org.my", "edu.my",
    "com.ph", "net.ph", "org.ph",
    "co.th", "in.th", "ac.th", "go.th",
    "com.eg", "com.sa", "com.pk", "com.bd", "com.ng", "com.ua",
    "co.il", "org.il", "ac.il",
    # wildcard + exception examples from the real list
    "*.ck", "!www.ck", "*.bd", "*.er", "*.fk", "!co.fk",
    # private-section platform suffixes (each user site = own domain)
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "netlify.app", "vercel.app", "pages.dev",
    "web.app", "firebaseapp.com", "s3.amazonaws.com", "cloudfront.net",
    "azurewebsites.net", "readthedocs.io", "neocities.org",
    "fastly.net", "workers.dev", "repl.co", "glitch.me", "onrender.com",
)


def load_psl(spark, entries=None) -> DataFrame:
    """PSL rule lines -> lookup table (match_suffix, ps_labels, is_exc).

    ``entries``: iterable of PSL rule strings (default: the bundled
    snapshot).  Encoding: a normal rule ``co.uk`` matches hosts whose
    trailing labels equal it and declares a public suffix of
    ``len(labels)`` labels; a wildcard rule ``*.ck`` is stored under
    its fixed tail ``ck`` with ``ps_labels = tail+1`` (any single
    label fills the '*'); an exception ``!www.ck`` is stored verbatim
    with ``ps_labels = len-1`` (the rule minus its leftmost label is
    the suffix) and beats wildcard matches.  Exceptions win
    match_suffix collisions."""
    best: dict[str, tuple[bool, int]] = {}
    for raw in (entries if entries is not None else DEFAULT_PSL_SNAPSHOT):
        rule = raw.strip().lower()
        if not rule or rule.startswith("//"):
            continue
        if rule.startswith("!"):
            body = rule[1:]
            key, val = body, (True, len(body.split(".")) - 1)
        elif rule.startswith("*."):
            tail = rule[2:]
            key, val = tail, (False, len(tail.split(".")) + 1)
        else:
            key, val = rule, (False, len(rule.split(".")))
        # collisions resolved driver-side (exceptions win, then longer
        # suffix) so the lookup table needs no groupBy exchange
        if key not in best or val > best[key]:
            best[key] = val
    return spark.createDataFrame(
        [(k, pl, exc) for k, (exc, pl) in sorted(best.items())],
        "match_suffix string, ps_labels int, is_exc boolean",
    )


def registrable_domain_psl(
    pages: DataFrame,
    psl: DataFrame | None = None,
    url_col: str = "url",
    out_col: str = "domain",
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Add the PSL-resolved registrable domain (eTLD+1) as ``out_col``.

    100 TB shape: the PSL joins as ``max_suffix_labels`` BROADCAST
    left joins (one per candidate suffix length — the full Mozilla
    list is ~250 KB, always broadcastable), so the pages side never
    shuffles; everything else is JVM array/string expressions.
    Matching follows the PSL algorithm: an exception match wins, else
    the longest public suffix across all candidate lengths, else the
    implicit '*' rule (1-label suffix).  Hosts that ARE a bare public
    suffix, IPv4 literals, and schemeless rows follow
    :func:`registrable_domain`'s conventions (host / host / '').

    ``max_suffix_labels`` caps candidate suffix length; the handful of
    real 5-label PSL entries need ``5``."""
    reserved = [f"_ps{k}" for k in range(1, max_suffix_labels + 1)]
    reserved += [f"_pe{k}" for k in range(1, max_suffix_labels + 1)]
    for c in reserved + ["_host", "_labels", "_n"]:
        if c in pages.columns:
            raise ValueError(
                f"registrable_domain_psl reserves column name {c!r}; "
                "rename it in the input first"
            )
    spark = pages.sparkSession
    if psl is None:
        psl = load_psl(spark)
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[A-Za-z]+://([^/?#:]+)", 1))
    tagged = (
        pages.withColumn("_host", host)
        .withColumn("_labels", F.split(F.col("_host"), r"\."))
        .withColumn("_n", F.size("_labels"))
    )
    out = tagged
    for k in range(1, max_suffix_labels + 1):
        lastk = F.when(
            F.col("_n") >= k, F.concat_ws(".", F.slice(F.col("_labels"), -k, k))
        )
        side = F.broadcast(
            psl.select(
                F.col("match_suffix").alias(f"_k{k}"),
                F.col("ps_labels").alias(f"_ps{k}"),
                F.col("is_exc").alias(f"_pe{k}"),
            )
        )
        out = out.join(side, lastk == F.col(f"_k{k}"), "left").drop(f"_k{k}")
    ks = range(1, max_suffix_labels + 1)
    exc_pl = F.coalesce(
        *[F.when(F.col(f"_pe{k}"), F.col(f"_ps{k}")) for k in reversed(list(ks))]
    )
    norm_pl = F.greatest(
        *[F.when(~F.col(f"_pe{k}"), F.col(f"_ps{k}")) for k in ks], F.lit(1)
    )
    ps = F.coalesce(exc_pl, norm_pl)
    reg = ps + F.lit(1)
    is_ip = F.col("_host").rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    domain = (
        F.when(F.col("_host") == "", "")
        .when(is_ip, F.col("_host"))
        .when(F.col("_n") <= ps, F.col("_host"))
        .otherwise(F.concat_ws(".", F.slice(F.col("_labels"), -reg, reg)))
    )
    return out.withColumn(out_col, domain).drop("_host", "_labels", "_n", *reserved)


def blocklist_filter(
    pages: DataFrame,
    blocked_domains: list[str] | DataFrame,
    url_col: str = "url",
    psl: DataFrame | None = None,
) -> DataFrame:
    """Drop pages whose registrable domain is on a blocklist.

    The blocklist joins as a BROADCAST left-anti join (plan-gated in
    tests/test_domains.py): even a 10^6-domain list is tens of MB —
    always broadcastable — so the corpus side never shuffles.  Accepts
    a Python list (driver-side lists come from config files) or a
    single-column DataFrame named ``domain`` (blocklists maintained as
    tables).  With ``psl`` (a :func:`load_psl` table) the domain key
    resolves through the real public-suffix list — still broadcast
    joins only — so blocked platform domains like ``spam.github.io``
    match exactly instead of collapsing into ``github.io``."""
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
    if psl is not None:
        tagged = registrable_domain_psl(pages, psl, url_col=url_col, out_col="_dom")
    else:
        tagged = pages.withColumn("_dom", registrable_domain(F.col(url_col)))
    return (
        tagged.join(
            F.broadcast(bl), tagged["_dom"] == bl["domain"], "left_anti"
        ).drop("_dom")
    )


# ---- robots.txt rules -----------------------------------------------
# robots.txt scopes to the full AUTHORITY (RFC 9309 §2.3: one file per
# scheme/host/port), NOT the registrable domain.  All rule keys below
# are therefore the full lowercased host: keying rules by eTLD+1 would
# silently exempt every subdomain page (www.example.org pages would
# bypass rules stored under example.org).


def _robots_rule_regex(path: str) -> str | None:
    """RFC 9309 §2.2.3 rule pattern -> anchored Java regex, or None
    when the rule is a plain literal prefix (fast startswith path).
    '*' matches any run of octets; a trailing '$' anchors the end."""
    if "*" not in path and not path.endswith("$"):
        return None
    import re as _re

    anchored = path.endswith("$")
    body = path[:-1] if anchored else path
    pat = ".*".join(_re.escape(seg) for seg in body.split("*"))
    return "^" + pat + ("$" if anchored else "")


def _robots_rule_regex_col(path: Column) -> Column:
    """Column mirror of :func:`_robots_rule_regex` (JVM-side, so the
    recompute-if-absent fallback never needs a per-row Python UDF)."""
    anchored = path.endswith("$")
    body = F.when(anchored, F.substring(path, 1, F.length(path) - 1)).otherwise(path)
    esc = F.regexp_replace(body, r"([\\.^$|?*+()\[\]{}])", "\\\\$1")
    wc = F.replace(esc, F.lit("\\*"), F.lit(".*"))
    built = F.concat(
        F.lit("^"), wc, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )
    return F.when(path.contains("*") | anchored, built)


def _parse_robots_groups(
    body: str | None,
) -> list[tuple[list[str], list[tuple[str, str]]]]:
    """robots.txt body -> [(user-agent lines, [(field, value), ...])]
    with GROUP-SCOPED fields (allow / disallow / crawl-delay) attached
    to the most recent User-agent run.  Crawl-delay closes an agent
    run exactly like a rule line does — the original-spec reading the
    engines that honor Crawl-delay use."""
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    in_rules = False
    for line in (body or "").splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules or not groups:
                groups.append(([], []))
                in_rules = False
            groups[-1][0].append(value.lower())
        elif field in ("allow", "disallow", "crawl-delay") and groups:
            in_rules = True
            groups[-1][1].append((field, value))
    return groups


def _robots_winning_agent(groups, token: str) -> str:
    """RFC 9309 §2.2.1 group selection: the longest User-agent line
    that is a prefix of the crawler token wins; '*' only when nothing
    longer matched; empty token -> '*' (the default-crawler view)."""
    if token:
        best = ""
        for ag, _rules in groups:
            for a in ag:
                if a != "*" and token.startswith(a) and len(a) > len(best):
                    best = a
        return best if best else "*"
    return "*"


def parse_robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str | None = None,
) -> DataFrame:
    """Parse robots.txt bodies into (host, rule, path_prefix, pattern)
    rows for the group(s) that govern this crawler, RFC 9309 group
    semantics: consecutive User-agent lines open a group, Allow /
    Disallow lines belong to the most recent group, '#' starts a
    comment.  Empty Disallow values (allow-all) produce no row.

    Group selection (§2.2.1): with ``user_agent`` (the crawler's
    product token, e.g. "examplebot-news"), a group's User-agent line
    matches when it is a case-insensitive prefix of the token ('*'
    matches anything); the MOST SPECIFIC (longest) matching line wins,
    every group carrying that winning line combines, and '*' groups
    apply only when nothing longer matched.  Without ``user_agent``
    (the default) only '*' groups are taken — the prior behavior.
    A winning group that exists but has no rules (allow-all) correctly
    yields no rows, NOT a fallback to '*'.

    ``host`` must be the full lowercased host the robots.txt was
    fetched from (see module note above).  ``pattern`` is the rule
    compiled once to an anchored regex when it uses RFC 9309 '*'/'$'
    wildcards, else null (literal prefix — matched via startswith).

    Parsing runs in mapInPandas because robots bodies are a TINY side
    input (one short text per host — never the corpus side); the
    output feeds :func:`robots_disallow_filter` as a broadcast.
    """
    import pandas as pd

    token = (user_agent or "").strip().lower()

    def gen(batches):
        for b in batches:
            rows = []
            for host, body in zip(b[host_col], b[body_col]):
                groups = _parse_robots_groups(body)
                sel = _robots_winning_agent(groups, token)
                for ag, rules in groups:
                    if sel not in ag:
                        continue
                    for field, value in rules:
                        if field not in ("allow", "disallow") or not value:
                            continue
                        # RFC 9309 matches percent-encoded octets
                        # consistently: normalize the rule here, the
                        # page path in robots_disallow_filter (same
                        # RFC 3986 §6.2.2 rewrite on both sides)
                        value = py_percent_normalize(value)
                        rows.append(
                            {
                                "host": host,
                                "rule": field,
                                "path_prefix": value,
                                "pattern": _robots_rule_regex(value),
                            }
                        )
            yield pd.DataFrame(
                rows, columns=["host", "rule", "path_prefix", "pattern"]
            )

    return robots.select(
        F.col(host_col).alias(host_col), F.col(body_col).alias(body_col)
    ).mapInPandas(
        gen, schema="host string, rule string, path_prefix string, pattern string"
    )


def parse_robots_sitemaps(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """``Sitemap:`` directives from robots.txt bodies -> (host,
    sitemap_url) rows — the crawl-discovery chain's first hop (robots
    -> sitemap index -> urlsets, see
    :func:`~vlm_ocr_pipeline_spark.sources.sitemap.discover_sitemaps`).

    Sitemap records are GROUP-INDEPENDENT (they apply regardless of
    user-agent groups, per the sitemaps.org extension RFC 9309 §2.2.4
    points at), so this is a pure JVM projection: one case-insensitive
    multiline regex over each body, no Python.  The URL value stops at
    whitespace or '#' (trailing comments); relative values are emitted
    as-is — resolution policy belongs to the caller's ``resolve``."""
    sm = F.regexp_extract_all(
        F.col(body_col),
        F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^#\s]+)"),
        F.lit(1),
    )
    return (
        robots.select(
            F.lower(F.col(host_col)).alias("host"),
            F.explode(sm).alias("sitemap_url"),
        )
        .filter(F.col("sitemap_url") != "")
        .distinct()
    )


def parse_robots_crawl_delay(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    user_agent: str | None = None,
) -> DataFrame:
    """``Crawl-delay:`` per host for the governing user-agent group ->
    (host, crawl_delay_s double) rows.  Not in RFC 9309 but a de-facto
    directive several major engines honor; group selection follows the
    same §2.2.1 longest-token rule as :func:`parse_robots_rules`.
    Non-numeric and negative values are ignored; multiple applicable
    values keep the LARGEST (the conservative, politest reading).
    Hosts without a directive emit no row — the caller picks its own
    default.  Tiny side input (one short body per host), same
    mapInPandas shape as the rules parser."""
    import pandas as pd

    token = (user_agent or "").strip().lower()

    def gen(batches):
        for b in batches:
            rows = []
            for host, body in zip(b[host_col], b[body_col]):
                groups = _parse_robots_groups(body)
                sel = _robots_winning_agent(groups, token)
                best: float | None = None
                for ag, rules in groups:
                    if sel not in ag:
                        continue
                    for field, value in rules:
                        if field != "crawl-delay":
                            continue
                        try:
                            d = float(value)
                        except ValueError:
                            continue
                        if d >= 0 and (best is None or d > best):
                            best = d
                if best is not None:
                    rows.append({"host": host, "crawl_delay_s": best})
            yield pd.DataFrame(rows, columns=["host", "crawl_delay_s"])

    return robots.select(
        F.col(host_col).alias(host_col), F.col(body_col).alias(body_col)
    ).mapInPandas(gen, schema="host string, crawl_delay_s double")


def robots_disallow_filter(
    pages: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop pages a site's robots.txt disallows for '*' agents.

    Longest-match decides — RFC 9309 §2.2.2: most octets in the RULE
    (wildcards count as written) — and Allow wins ties.  Rules with
    '*'/'$' wildcards match via their precompiled anchored regex
    (``pattern`` column from :func:`parse_robots_rules`; recomputed
    here if absent), literal rules via startswith.  Rules key on the
    full lowercased HOST (see module note) and aggregate to ONE array
    row per host that joins as a broadcast; the match is a JVM
    higher-order filter over that array — the 100 TB pages side never
    shuffles and needs no per-page grouping.  Pages' own columns
    (including any ``domain``/``host``) pass through untouched.
    """
    for c in ("_host", "_path", "_rules", "_rhost"):
        if c in pages.columns:
            raise ValueError(
                f"robots_disallow_filter reserves column name {c!r}; "
                "rename it in the input first"
            )
    key = "host" if "host" in rules.columns else "domain"  # legacy key name
    if "pattern" not in rules.columns:
        # legacy rule tables: normalize percent-encodings (idempotent)
        # before compiling, matching what parse_robots_rules emits
        rules = rules.withColumn(
            "path_prefix", percent_normalize(F.col("path_prefix"))
        ).withColumn("pattern", _robots_rule_regex_col(F.col("path_prefix")))
    rule_arrays = rules.groupBy(F.col(key).alias("_rhost")).agg(
        F.collect_list(F.struct("rule", "path_prefix", "pattern")).alias("_rules")
    )
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[A-Za-z]+://([^/?#:]+)", 1))
    # RFC 9309 §2.2.2 matches rules against path PLUS query (rules like
    # '/*?sessionid=' exist to target query strings); fragment excluded
    pathq = F.regexp_extract(F.col(url_col), r"^[A-Za-z]+://[^/?#]+([^#]*)", 1)
    tagged = pages.withColumn("_host", host).withColumn(
        "_path",
        percent_normalize(
            F.when(pathq == "", "/")
            .when(pathq.startswith("?"), F.concat(F.lit("/"), pathq))
            .otherwise(pathq)
        ),
    )
    j = tagged.join(
        F.broadcast(rule_arrays),
        tagged["_host"] == rule_arrays["_rhost"],
        "left",
    )
    empty = "array<struct<rule:string,path_prefix:string,pattern:string>>"
    matches = F.filter(
        F.coalesce(F.col("_rules"), F.array().cast(empty)),
        lambda r: F.when(
            r["pattern"].isNull(), F.col("_path").startswith(r["path_prefix"])
        ).otherwise(F.regexp_like(F.col("_path"), r["pattern"])),
    )
    longest = lambda kind: F.array_max(  # noqa: E731
        F.transform(
            F.filter(matches, lambda r: r["rule"] == kind),
            lambda r: F.length(r["path_prefix"]),
        )
    )
    dis, alw = longest("disallow"), longest("allow")
    keep = dis.isNull() | (alw.isNotNull() & (alw >= dis))
    return j.filter(keep).drop("_host", "_path", "_rules", "_rhost")
