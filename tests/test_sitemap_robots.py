"""Sitemap source and robots.txt rules filtering."""

import pytest

from pyspark.sql import functions as F

from vlm_ocr_pipeline_spark.operators.urls import (
    parse_robots_rules,
    robots_disallow_filter,
)
from vlm_ocr_pipeline_spark.sources.sitemap import read_sitemap

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://docs.example.org/a </loc>
    <lastmod>2026-01-05</lastmod>
  </url>
  <url><loc>https://docs.example.org/b</loc></url>
  <url><priority>0.3</priority></url>
</urlset>
"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://docs.example.org/sitemap-1.xml</loc>
    <lastmod>2026-02-01T10:00:00Z</lastmod>
  </sitemap>
</sitemapindex>
"""


def test_read_sitemap_urls_and_index(spark, tmp_path):
    (tmp_path / "sm.xml").write_text(SITEMAP)
    (tmp_path / "idx.xml").write_text(SITEMAP_INDEX)
    out = read_sitemap(spark, str(tmp_path)).toPandas()
    urls = out[out.kind == "url"]
    assert sorted(urls["url"]) == [
        "https://docs.example.org/a",  # whitespace trimmed
        "https://docs.example.org/b",
    ]
    assert urls.set_index("url").loc[
        "https://docs.example.org/a", "lastmod"
    ] == "2026-01-05"
    assert urls.set_index("url").loc[
        "https://docs.example.org/b", "lastmod"
    ] is None
    idx = out[out.kind == "sitemap"]
    assert list(idx["url"]) == ["https://docs.example.org/sitemap-1.xml"]
    # the <url> block without a <loc> contributes nothing
    assert len(out) == 3


def _idx(*locs):
    items = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in locs)
    return f'<?xml version="1.0"?><sitemapindex>{items}</sitemapindex>'


def _urlset(*locs):
    items = "".join(f"<url><loc>{u}</loc></url>" for u in locs)
    return f'<?xml version="1.0"?><urlset>{items}</urlset>'


def test_read_sitemap_tree_recurses_bounded_and_cycle_safe(spark, tmp_path):
    from vlm_ocr_pipeline_spark.sources.sitemap import read_sitemap_tree

    base = "https://example.org/"
    # root index -> (leaf-1 urlset, second index); second index ->
    # (root index AGAIN = cycle, leaf-2 urlset)
    (tmp_path / "root.xml").write_text(_idx(base + "leaf1.xml", base + "idx2.xml"))
    (tmp_path / "idx2.xml").write_text(_idx(base + "root.xml", base + "leaf2.xml"))
    (tmp_path / "leaf1.xml").write_text(_urlset(base + "a", base + "b"))
    (tmp_path / "leaf2.xml").write_text(_urlset(base + "c"))

    resolve = lambda u: str(tmp_path / u.rsplit("/", 1)[1])  # noqa: E731
    out = read_sitemap_tree(
        spark, str(tmp_path / "root.xml"), max_depth=3, resolve=resolve
    ).toPandas()
    got = dict(zip(out["url"], out["depth"]))
    # leaf1 found at depth 1, leaf2 at depth 2; the cycle back to
    # root.xml is never re-read (resolved-path seen set seeded with the
    # root), so the walk terminates without a wasted level
    assert got == {base + "a": 1, base + "b": 1, base + "c": 2}
    assert out["kind"].eq("url").all()

    # a MIXED root (page entries + index entries) re-declared by a
    # child must emit its page rows exactly once — path-level dedup;
    # likewise two URL aliases resolving to one path read it once
    mixed = _idx(base + "leaf1.xml", base + "idx3.xml").replace(
        "</sitemapindex>", f"<url><loc>{base}home</loc></url></sitemapindex>"
    )
    (tmp_path / "mixed.xml").write_text(mixed)
    (tmp_path / "idx3.xml").write_text(
        _idx(base + "mixed.xml", base + "alias/../leaf2.xml")
    )
    res3 = lambda u: str(tmp_path / ("mixed.xml" if "mixed" in u else u.rsplit("/", 1)[1]))  # noqa: E731
    out2 = read_sitemap_tree(
        spark, str(tmp_path / "mixed.xml"), max_depth=4, resolve=res3
    ).toPandas()
    assert (out2["url"] == base + "home").sum() == 1
    assert set(out2["url"]) == {base + "home", base + "a", base + "b", base + "c"}

    # depth cap: max_depth=1 stops before the second index's children
    shallow = read_sitemap_tree(
        spark, str(tmp_path / "root.xml"), max_depth=1, resolve=resolve
    ).toPandas()
    assert set(shallow["url"]) == {base + "a", base + "b"}

    # resolve -> None skips a child instead of failing
    res2 = lambda u: None if "leaf2" in u else resolve(u)  # noqa: E731
    skipped = read_sitemap_tree(
        spark, str(tmp_path / "root.xml"), max_depth=3, resolve=res2
    ).toPandas()
    assert set(skipped["url"]) == {base + "a", base + "b"}


def test_robots_sitemap_directive_chains_to_url_tree(spark, tmp_path):
    """robots -> Sitemap: -> index -> urlset: the crawl-discovery
    chain (round-4 verdict item 3)."""
    from vlm_ocr_pipeline_spark.operators.urls import parse_robots_sitemaps
    from vlm_ocr_pipeline_spark.sources.sitemap import discover_sitemaps

    base = "https://example.org/"
    (tmp_path / "idx.xml").write_text(_idx(base + "leafA.xml"))
    (tmp_path / "leafA.xml").write_text(_urlset(base + "p1", base + "p2"))
    (tmp_path / "direct.xml").write_text(_urlset(base + "p3"))
    robots = spark.createDataFrame(
        [
            ("example.org",
             "User-agent: *\nDisallow: /private\n"
             "SiteMap: https://example.org/idx.xml  # mixed case + comment\n"
             f"sitemap: {base}direct.xml\n"),
            ("other.example", "User-agent: *\nDisallow:\n"),  # none declared
        ],
        "host string, body string",
    )
    sm = parse_robots_sitemaps(robots).toPandas()
    assert set(zip(sm["host"], sm["sitemap_url"])) == {
        ("example.org", base + "idx.xml"),
        ("example.org", base + "direct.xml"),
    }
    resolve = lambda u: str(tmp_path / u.rsplit("/", 1)[1])  # noqa: E731
    out = discover_sitemaps(robots, resolve).toPandas()
    got = dict(zip(out["url"], out["depth"]))
    # direct urlset pages at depth 0, index children at depth 1
    assert got == {base + "p3": 0, base + "p1": 1, base + "p2": 1}
    assert out["kind"].eq("url").all()
    # robots with no declarations -> empty frame, stable schema
    none = discover_sitemaps(
        robots.filter("host = 'other.example'"), resolve
    )
    assert none.count() == 0
    assert none.columns == ["sitemap_file", "kind", "url", "lastmod", "depth"]
    # Sitemap lines must not disturb rule-group parsing
    from vlm_ocr_pipeline_spark.operators.urls import parse_robots_rules

    rules = parse_robots_rules(robots).toPandas()
    assert list(zip(rules["rule"], rules["path_prefix"])) == [
        ("disallow", "/private")
    ]


ROBOTS = """# comment line
User-agent: SpecialBot
Disallow: /everything

User-agent: *
User-agent: OtherBot
Disallow: /private/
Allow: /private/public/
Disallow:
Disallow: /tmp
"""


def test_parse_robots_rules_wildcard_groups_only(spark):
    robots = spark.createDataFrame(
        [("docs.example.org", ROBOTS)], "host string, body string"
    )
    rules = parse_robots_rules(robots).toPandas()
    got = {(r.rule, r.path_prefix) for r in rules.itertuples()}
    # SpecialBot's group excluded; empty Disallow dropped
    assert got == {
        ("disallow", "/private/"),
        ("allow", "/private/public/"),
        ("disallow", "/tmp"),
    }
    assert set(rules["host"]) == {"docs.example.org"}
    # literal rules carry no compiled pattern
    assert rules["pattern"].isna().all()


def test_robots_disallow_filter_longest_match_allow_wins(spark):
    robots = spark.createDataFrame(
        [("docs.example.org", ROBOTS)], "host string, body string"
    )
    rules = parse_robots_rules(robots)
    pages = spark.createDataFrame(
        [
            (1, "https://docs.example.org/open/page"),
            (2, "https://docs.example.org/private/secret"),
            (3, "https://docs.example.org/private/public/ok"),
            (4, "https://docs.example.org/tmp/file"),
            (5, "https://other.example.net/private/whatever"),  # no rules host
        ],
        "id long, url string",
    )
    kept = robots_disallow_filter(pages, rules)
    assert sorted(r["id"] for r in kept.collect()) == [1, 3, 5]
    assert kept.columns == ["id", "url"]  # helpers dropped
    # pages side joins the rules as a broadcast
    plan = robots_disallow_filter(pages, rules)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    with pytest.raises(ValueError, match="_path"):
        robots_disallow_filter(pages.withColumn("_path", F.lit("x")), rules)


ROBOTS_WILDCARDS = """User-agent: *
Disallow: /*?sessionid=
Disallow: /print$
Allow: /shop/*?sessionid=keep
Disallow: /downloads/*.pdf$
"""


def test_robots_rfc9309_wildcard_rules(spark):
    """RFC 9309 §2.2.3: '*' matches any octet run, trailing '$' anchors
    the end; precedence (§2.2.2) = most octets in the rule as written,
    Allow wins ties."""
    robots = spark.createDataFrame(
        [("shop.example.org", ROBOTS_WILDCARDS)], "host string, body string"
    )
    rules = parse_robots_rules(robots)
    pats = {
        r["path_prefix"]: r["pattern"] for r in rules.collect()
    }
    assert pats["/*?sessionid="] == r"^/.*\?sessionid="
    assert pats["/print$"] == "^/print$"
    pages = spark.createDataFrame(
        [
            (1, "https://shop.example.org/item/42"),             # clean: keep
            (2, "https://shop.example.org/item/42?sessionid=ab"), # wildcard hit
            (3, "https://shop.example.org/print"),                # $-anchored hit
            (4, "https://shop.example.org/print/page"),           # NOT anchored-match
            (5, "https://shop.example.org/shop/x?sessionid=keep"),  # longer Allow
            (6, "https://shop.example.org/downloads/a.pdf"),      # *.pdf$ hit
            (7, "https://shop.example.org/downloads/a.pdf.html"), # $ keeps this
        ],
        "id long, url string",
    )
    kept = sorted(r["id"] for r in robots_disallow_filter(pages, rules).collect())
    assert kept == [1, 4, 5, 7]


ROBOTS_UA = """User-agent: examplebot
Disallow: /bot-only/

User-agent: examplebot-news
Disallow: /news-bot/

User-agent: *
Disallow: /everyone/

User-agent: politebot
# group exists but allows everything
Disallow:
"""


def test_parse_robots_rules_user_agent_group_selection(spark):
    """RFC 9309 §2.2.1: longest case-insensitive prefix-matching
    User-agent line wins; '*' only when nothing specific matches; a
    matching-but-empty group means allow-all, not fallback."""
    robots = spark.createDataFrame(
        [("h.example.org", ROBOTS_UA)], "host string, body string"
    )

    def rules_for(ua):
        return {
            r["path_prefix"]
            for r in parse_robots_rules(robots, user_agent=ua).collect()
        }

    # exact token: its own group, not '*'
    assert rules_for("examplebot") == {"/bot-only/"}
    # longer token: the MOST SPECIFIC matching line wins over the
    # shorter prefix and over '*'
    assert rules_for("Examplebot-News") == {"/news-bot/"}
    # token extending a line: prefix match applies
    assert rules_for("examplebot-images") == {"/bot-only/"}
    # unknown crawler: '*' group
    assert rules_for("otherbot") == {"/everyone/"}
    # matching group with no rules: allow-all (no rows, no fallback)
    assert rules_for("politebot") == set()
    # default (no user_agent): unchanged '*'-only behavior
    assert {
        r["path_prefix"] for r in parse_robots_rules(robots).collect()
    } == {"/everyone/"}


def test_robots_filter_preserves_page_domain_column(spark):
    """A pages frame carrying its own 'domain' (or 'host') column must
    pass through untouched — only reserved temp columns are dropped."""
    robots = spark.createDataFrame(
        [("docs.example.org", ROBOTS)], "host string, body string"
    )
    rules = parse_robots_rules(robots)
    pages = spark.createDataFrame(
        [(1, "https://docs.example.org/open", "example.org", "docs.example.org")],
        "id long, url string, domain string, host string",
    )
    out = robots_disallow_filter(pages, rules)
    assert out.columns == ["id", "url", "domain", "host"]
    row = out.collect()[0]
    assert row["domain"] == "example.org" and row["host"] == "docs.example.org"


def test_robots_filter_legacy_domain_key_and_recomputed_patterns(spark):
    """Rules built without a 'pattern' column (or keyed by the legacy
    'domain' name) still work: patterns are recomputed JVM-side."""
    rules = spark.createDataFrame(
        [
            ("docs.example.org", "disallow", "/a/*.zip$"),
            ("docs.example.org", "disallow", "/plain"),
        ],
        "domain string, rule string, path_prefix string",
    )
    pages = spark.createDataFrame(
        [
            (1, "https://docs.example.org/a/x.zip"),
            (2, "https://docs.example.org/a/x.zip.txt"),
            (3, "https://docs.example.org/plain/f"),
            (4, "https://docs.example.org/ok"),
        ],
        "id long, url string",
    )
    kept = sorted(r["id"] for r in robots_disallow_filter(pages, rules).collect())
    assert kept == [2, 4]
