"""Domain-level curation: registrable-domain extraction (eTLD+1
heuristic), per-domain rollup, and the broadcast blocklist anti-join."""

from pyspark.sql import functions as F

from vlm_ocr_pipeline_spark.operators.urls import (
    blocklist_filter,
    domain_summary,
    registrable_domain,
)

CASES = [
    ("https://docs.example.org/x", "example.org"),
    ("https://a.b.c.example.org/x", "example.org"),
    ("HTTPS://News.Example.CO.UK/x?y=1", "example.co.uk"),
    ("http://cdn.media.example.com.au:8080/x", "example.com.au"),
    ("http://192.168.10.1:8080/x", "192.168.10.1"),
    ("http://localhost/x", "localhost"),
    ("http://co.uk/", "co.uk"),  # bare suffix host: n<=2 passthrough
    ("no-scheme-at-all", ""),
]


def test_registrable_domain_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [
        r["d"]
        for r in df.select(registrable_domain(F.col("url")).alias("d")).collect()
    ]
    assert got == [d for _, d in CASES]


def test_domain_summary_collapses_mirrors(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example.org/p?utm_source=x",),
            ("https://a.example.org/p",),  # same canonical resource
            ("https://b.example.org/q",),
            ("https://news.example.co.uk/r",),
        ],
        "url string",
    )
    rows = {r["domain"]: r for r in domain_summary(df).collect()}
    assert rows["example.org"]["n_pages"] == 3
    assert rows["example.org"]["n_resources"] == 2
    assert rows["example.co.uk"]["n_pages"] == 1


def test_blocklist_filter_drops_and_broadcasts(spark):
    df = spark.createDataFrame(
        [
            ("https://spam.example.com/a", 1),
            ("https://sub.spam.example.com/b", 2),  # same eTLD+1
            ("https://ok.example.org/c", 3),
        ],
        "url string, id int",
    )
    kept = blocklist_filter(df, ["Example.COM"])  # case-insensitive
    assert sorted(r["id"] for r in kept.collect()) == [3]
    assert kept.columns == ["url", "id"]  # helper column dropped

    # DataFrame-typed blocklist behaves the same
    bl = spark.createDataFrame([("example.com",)], "domain string")
    assert sorted(r["id"] for r in blocklist_filter(df, bl).collect()) == [3]

    plan = blocklist_filter(df, ["example.com"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


PSL_CASES = [
    # the cases the 22-suffix heuristic gets WRONG, resolved right here
    ("https://user.github.io/project/", "user.github.io"),
    ("https://www.toko.example.co.id/x", "example.co.id"),
    ("https://shop.example.com.vn/x", "example.com.vn"),
    ("https://blog.example.blogspot.com/p", "example.blogspot.com"),
    # wildcard rule *.ck: any x.ck is a public suffix
    ("https://www.shop.biz.ck/x", "shop.biz.ck"),
    # exception !www.ck overrides the wildcard
    ("https://www.ck/x", "www.ck"),
    ("https://a.www.ck/x", "www.ck"),
    # heuristic-covered cases stay identical
    ("HTTPS://News.Example.CO.UK/x?y=1", "example.co.uk"),
    ("https://a.b.c.example.org/x", "example.org"),
    ("http://192.168.10.1:8080/x", "192.168.10.1"),
    ("http://github.io/", "github.io"),  # bare public suffix passthrough
    ("no-scheme-at-all", ""),
]


def test_registrable_domain_psl_cases(spark):
    from vlm_ocr_pipeline_spark.operators.urls import registrable_domain_psl

    df = spark.createDataFrame(
        [(u, i) for i, (u, _) in enumerate(PSL_CASES)], "url string, id int"
    )
    out = registrable_domain_psl(df).orderBy("id").collect()
    assert [r["domain"] for r in out] == [d for _, d in PSL_CASES]
    # input columns pass through, helpers dropped
    assert registrable_domain_psl(df).columns == ["url", "id", "domain"]


def test_registrable_domain_psl_broadcast_no_shuffle(spark):
    """The PSL resolves via broadcast joins only — the corpus side must
    not exchange (the whole point at 100 TB)."""
    from vlm_ocr_pipeline_spark.operators.urls import registrable_domain_psl

    df = spark.createDataFrame([("https://a.example.co.id/x",)], "url string")
    plan = registrable_domain_psl(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning" not in plan  # no corpus-side exchange


def test_registrable_domain_psl_custom_list_and_guard(spark):
    import pytest as _pytest

    from vlm_ocr_pipeline_spark.operators.urls import load_psl, registrable_domain_psl

    psl = load_psl(spark, ["co.test", "// comment", "", "*.wild", "!ok.wild"])
    df = spark.createDataFrame(
        [
            ("https://a.b.co.test/x",),
            ("https://x.deep.wild/x",),
            ("https://sub.ok.wild/x",),
        ],
        "url string",
    )
    got = [r["domain"] for r in registrable_domain_psl(df, psl).collect()]
    assert got == ["b.co.test", "x.deep.wild", "ok.wild"]

    bad = spark.createDataFrame([("https://a.example.org/x", 1)], "url string, _ps2 int")
    with _pytest.raises(ValueError, match="_ps2"):
        registrable_domain_psl(bad)


def test_blocklist_filter_with_psl_distinguishes_platform_sites(spark):
    """PSL-resolved blocklist: blocking spam.github.io must drop only
    that site — the heuristic collapses every *.github.io page into
    'github.io' and can't express this."""
    from vlm_ocr_pipeline_spark.operators.urls import load_psl

    df = spark.createDataFrame(
        [
            ("https://spam.github.io/a", 1),
            ("https://sub.spam.github.io/b", 2),  # same registrable site
            ("https://good.github.io/c", 3),
        ],
        "url string, id int",
    )
    psl = load_psl(spark)
    kept = blocklist_filter(df, ["spam.github.io"], psl=psl)
    assert sorted(r["id"] for r in kept.collect()) == [3]
    # heuristic path would key all three under github.io -> block all
    assert blocklist_filter(df, ["github.io"]).count() == 0


def test_blocklist_filter_reserved_column_guard(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("https://a.example.org/x", "y")], "url string, _dom string")
    with _pytest.raises(ValueError, match="_dom"):
        blocklist_filter(df, ["example.org"])


def test_percent_encoding_normalization(spark):
    """RFC 3986 §6.2.2: unreserved escapes decode, other escapes get
    uppercase hex, reserved escapes never decode — mirror variants
    merge under canonical_url and the DuckDB twin agrees."""
    import duckdb

    from vlm_ocr_pipeline_spark.operators.urls import (
        canonical_url,
        percent_normalize,
        py_percent_normalize,
        sql_percent_normalize,
    )

    samples = [
        "https://example.org/%7Euser/page",
        "https://example.org/~user/page",
        "https://example.org/%7euser/page",        # lowercase hex
        "https://example.org/a%2fb",               # reserved: keep, upcase
        "https://example.org/a%2Fb",
        "https://example.org/%41%62c?q=%5a",       # %41->A %62->b %5a->Z
        "https://example.org/50%25off",            # %25 ('%') reserved: keep
        "https://example.org/broken%zz%4",         # malformed: untouched
        "",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, url string")
    got = {r["i"]: r["n"] for r in df.select("i", percent_normalize(F.col("url")).alias("n")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(samples)))
    exp = dict(con.execute(f"SELECT i, {sql_percent_normalize('url')} FROM t").fetchall())
    for i, s in enumerate(samples):
        assert got[i] == exp[i] == py_percent_normalize(s), s
    assert got[0] == got[1] == got[2] == "https://example.org/~user/page"
    assert got[3] == got[4] == "https://example.org/a%2Fb"
    assert got[5] == "https://example.org/Abc?q=Z"
    assert got[6] == samples[6]
    assert got[7] == samples[7]

    canon = {r["i"]: r["c"] for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    assert canon[0] == canon[1] == canon[2]  # mirror merge
    assert canon[3] == canon[4]
    assert canon[8] == ""  # schemeless passthrough unchanged


def test_robots_percent_encoded_paths_match(spark):
    """RFC 9309 percent-encoding consistency: an encoded rule matches
    the decoded page path and vice versa (unreserved chars), while
    encoded-reserved octets compare case-insensitively on hex."""
    from vlm_ocr_pipeline_spark.operators.urls import (
        parse_robots_rules,
        robots_disallow_filter,
    )

    robots = spark.createDataFrame(
        [("example.org",
          "User-agent: *\nDisallow: /%7Eprivate\nDisallow: /a%2fb\n")],
        "host string, body string",
    )
    rules = parse_robots_rules(robots)
    got = {r["path_prefix"] for r in rules.collect()}
    assert got == {"/~private", "/a%2Fb"}
    pages = spark.createDataFrame(
        [
            ("https://example.org/~private/x",),     # decoded page, encoded rule
            ("https://example.org/%7eprivate/y",),   # encoded page
            ("https://example.org/a%2Fb",),          # reserved octet, case-variant
            ("https://example.org/a%2fb",),
            ("https://example.org/public",),
        ],
        "url string",
    )
    kept = [r["url"] for r in robots_disallow_filter(pages, rules).collect()]
    assert kept == ["https://example.org/public"]
