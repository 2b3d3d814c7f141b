"""Crawl-frontier builder: declared - captured - done - disallowed,
mirror-deduplicated, per-host politeness slots with a hot-host cap."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vlm_ocr_pipeline_spark.operators.frontier import build_fetch_frontier


def test_frontier_composition(spark):
    declared = spark.createDataFrame(
        [
            # mirror pair: same canonical resource -> ONE candidate
            ("https://a.example.org/page?b=2&a=1", "2026-01-02"),
            ("https://a.example.org/page/?a=1&b=2&utm_source=x", "2026-03-04"),
            ("https://a.example.org/fresh", "2026-05-01"),
            ("https://a.example.org/old", "2025-01-01"),
            ("https://a.example.org/captured", None),
            ("https://a.example.org/done", None),
            ("https://a.example.org/private/x", "2026-06-01"),
            ("https://b.example.org/only", None),
        ],
        "url string, lastmod string",
    )
    captured = spark.createDataFrame(
        [("https://a.example.org/captured/?utm_source=z",)], "url string"
    )
    done = spark.createDataFrame(
        [("https://a.example.org/done",)], "url string"
    )
    from vlm_ocr_pipeline_spark.operators.urls import parse_robots_rules

    rules = parse_robots_rules(
        spark.createDataFrame(
            [("a.example.org", "User-agent: *\nDisallow: /private\n")],
            "host string, body string",
        )
    )
    out = build_fetch_frontier(
        declared, captured=captured, done=done, robots_rules=rules
    ).toPandas()
    mirror_min = "https://a.example.org/page/?a=1&b=2&utm_source=x"
    assert set(out["url"]) == {
        mirror_min,  # lexicographic min url of the mirror pair
        "https://a.example.org/fresh",
        "https://a.example.org/old",
        "https://b.example.org/only",
    }
    rows = {r["url"]: r for _, r in out.iterrows()}
    # mirror pair kept the FRESHEST declaration
    assert rows[mirror_min]["lastmod"] == "2026-03-04"
    # per-host slots: 0..n-1 within a host, fresher lastmod first
    a_rows = out[out["host"] == "a.example.org"].sort_values("slot")
    assert list(a_rows["slot"]) == [0, 1, 2]
    assert list(a_rows["url"])[:2] == [
        "https://a.example.org/fresh",  # 2026-05-01
        mirror_min,                     # 2026-03-04
    ]
    assert rows["https://b.example.org/only"]["slot"] == 0
    # deterministic
    again = build_fetch_frontier(
        declared, captured=captured, done=done, robots_rules=rules
    ).toPandas()
    assert sorted(map(tuple, again.values.tolist())) == sorted(
        map(tuple, out.values.tolist())
    )


def test_frontier_per_host_cap_bounds_hot_host(spark):
    rows = [(f"https://hot.example.org/p{i}", None) for i in range(500)]
    rows += [(f"https://cold.example.org/p{i}", None) for i in range(3)]
    declared = spark.createDataFrame(rows, "url string, lastmod string")
    out = build_fetch_frontier(declared, per_host_cap=20).toPandas()
    by_host = out.groupby("host").size().to_dict()
    assert by_host["hot.example.org"] == 20  # exact hard cap
    assert by_host["cold.example.org"] == 3  # under-cap host untouched
    hot = out[out["host"] == "hot.example.org"]
    assert sorted(hot["slot"]) == list(range(20))
    # deterministic cap selection (hash order, no rand)
    again = build_fetch_frontier(declared, per_host_cap=20).toPandas()
    assert set(again["url"]) == set(out["url"])


def test_frontier_reserved_column_guard(spark):
    bad = spark.createDataFrame(
        [("https://x.example.org/", "v")], "url string, _canon string"
    )
    with pytest.raises(ValueError, match="_canon"):
        build_fetch_frontier(bad)


def test_build_frontier_job_end_to_end(spark, tmp_path):
    """robots + sitemap mirror + cdxj + done -> frontier parquet."""
    import json
    import os
    import subprocess
    import sys

    base = "https://site.example.org/"
    (tmp_path / "mirror").mkdir()
    (tmp_path / "mirror" / "root.xml").write_text(
        '<?xml version="1.0"?><sitemapindex>'
        f"<sitemap><loc>{base}leaf.xml</loc></sitemap></sitemapindex>"
    )
    (tmp_path / "mirror" / "leaf.xml").write_text(
        '<?xml version="1.0"?><urlset>'
        + "".join(
            f"<url><loc>{base}p{i}</loc><lastmod>2026-0{i % 5 + 1}-01</lastmod></url>"
            for i in range(8)
        )
        + f"<url><loc>{base}private/x</loc></url></urlset>"
    )
    spark.createDataFrame(
        [("site.example.org",
          f"User-agent: *\nDisallow: /private\nSitemap: {base}root.xml\n")],
        "host string, body string",
    ).write.parquet(str(tmp_path / "robots"))
    # p0 already captured (cdxj), p1 already done
    (tmp_path / "idx").mkdir()
    (tmp_path / "idx" / "a.cdxj").write_text(
        'org,example,site)/p0 20260101000000 {"url": "' + base + 'p0", '
        '"mime": "text/html", "status": "200", "digest": "d", '
        '"length": "10", "offset": "0", "filename": "f.warc.gz"}\n'
    )
    spark.createDataFrame([(base + "p1",)], "url string").write.parquet(
        str(tmp_path / "done")
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "build_frontier.py"),
         "--robots", str(tmp_path / "robots"),
         "--sitemap-mirror", str(tmp_path / "mirror"),
         "--cdxj", str(tmp_path / "idx"),
         "--done", str(tmp_path / "done"),
         "--per-host-cap", "4",
         "--output", str(tmp_path / "out")],
        capture_output=True, text=True, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    rep = json.load(open(tmp_path / "out" / "report.json"))
    assert rep["declared_from_sitemaps"] == 9
    assert rep["captured_rows"] == 1
    assert rep["frontier_rows"] == 4  # 8 pages - p0 - p1 - private, cap 4
    got = spark.read.parquet(str(tmp_path / "out" / "frontier")).toPandas()
    assert len(got) == 4
    assert base + "p0" not in set(got["url"])
    assert base + "p1" not in set(got["url"])
    assert all("/private" not in u for u in got["url"])
    assert sorted(got["slot"]) == [0, 1, 2, 3]


def test_crawl_delay_schedule(spark):
    """robots Crawl-delay -> per-host not_before_s = slot * delay."""
    from vlm_ocr_pipeline_spark.operators.urls import parse_robots_crawl_delay

    robots = spark.createDataFrame(
        [
            ("slow.example.org",
             "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n"),
            ("fast.example.org", "User-agent: *\nDisallow:\n"),
            ("bot.example.org",
             "User-agent: examplebot\nCrawl-delay: 2\n"
             "User-agent: *\nCrawl-delay: 30\n"),
            ("junk.example.org", "User-agent: *\nCrawl-delay: soon\n"),
        ],
        "host string, body string",
    )
    delays = {
        r["host"]: r["crawl_delay_s"]
        for r in parse_robots_crawl_delay(robots).collect()
    }
    # '*' view: junk value ignored, no-directive host absent
    assert delays == {"slow.example.org": 10.0, "bot.example.org": 30.0}
    # token view selects the specific group
    bot = {
        r["host"]: r["crawl_delay_s"]
        for r in parse_robots_crawl_delay(
            robots, user_agent="examplebot-news"
        ).collect()
    }
    assert bot["bot.example.org"] == 2.0

    declared = spark.createDataFrame(
        [(f"https://slow.example.org/p{i}",) for i in range(3)]
        + [(f"https://fast.example.org/p{i}",) for i in range(3)],
        "url string",
    )
    fr = build_fetch_frontier(
        declared,
        crawl_delays=parse_robots_crawl_delay(robots),
        default_delay_s=1.0,
    ).toPandas()
    assert "not_before_s" in fr.columns
    by_host = fr.groupby("host")
    for host, g in by_host:
        g = g.sort_values("slot")
        step = 10.0 if host == "slow.example.org" else 1.0
        assert list(g["not_before_s"]) == [0.0, step, 2 * step]
    # without any delay input the schedule column is absent (stable
    # pre-existing schema)
    assert "not_before_s" not in build_fetch_frontier(declared).columns
