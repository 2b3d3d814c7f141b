"""CDXJ index source: line parsing, surt key, fetch planning."""

import json

import pyspark.sql.functions as F
import pytest

from vlm_ocr_pipeline_spark.sources import cdxj


def _lines():
    rows = [
        ("org,example)/a", "20260116120000",
         {"url": "https://example.org/a", "mime": "text/html", "status": "200",
          "digest": "AAAA", "length": "512", "offset": "0",
          "filename": "crawl-00.warc.gz"}),
        # recrawl of the same content (same digest) — later ts wins
        ("org,example)/a", "20260117120000",
         {"url": "https://example.org/a", "mime": "text/html", "status": "200",
          "digest": "AAAA", "length": "512", "offset": "9000",
          "filename": "crawl-07.warc.gz"}),
        ("org,example)/b", "20260116120005",
         {"url": "https://example.org/b", "mime": "text/html", "status": "404",
          "digest": "BBBB", "length": "128", "offset": "2048",
          "filename": "crawl-00.warc.gz"}),
        ("org,example)/c?q=a+b", "20260116120009",
         {"url": "https://example.org/c?q=a b", "mime": "text/html",
          "status": "200", "digest": "CCCC", "length": "64", "offset": "700",
          "filename": "crawl-00.warc.gz"}),
    ]
    return [f"{s} {ts} {json.dumps(j)}" for s, ts, j in rows]


@pytest.fixture(scope="module")
def captures(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("cdx") / "part.cdxj"
    p.write_text("\n".join(_lines()) + "\n")
    return cdxj.read_cdxj(spark, str(p)).cache()


def test_read_cdxj_parses_fields(captures):
    pdf = captures.toPandas().sort_values(["surt", "warc_ts"])
    assert len(pdf) == 4
    a = pdf[pdf.url == "https://example.org/a"].iloc[0]
    assert a["status"] == 200 and a["length"] == 512 and a["offset"] == 0
    assert str(a["warc_ts"]).startswith("2026-01-16 12:00:00")
    # JSON containing spaces parses (split limit, not token explode)
    assert "q=a b" in set(pdf["url"].map(lambda u: u.split("?")[-1]))


def test_fetch_plan_dedups_and_orders(captures):
    plan = cdxj.fetch_plan(captures).toPandas()
    # 404 dropped; digest AAAA deduped to its LATEST capture
    assert len(plan) == 2
    a = plan[plan.surt == "org,example)/a"].iloc[0]
    assert a["filename"] == "crawl-07.warc.gz" and a["offset"] == 9000
    # within a partition rows are offset-ordered per filename
    by_file = plan.sort_index().groupby("filename")["offset"].apply(list)
    assert all(v == sorted(v) for v in by_file)


def test_surt_key_expression(spark):
    d = spark.createDataFrame(
        [("https://Sub.Example.org:8443/a/b?q=1",),
         ("http://example.org",),
         ("https://example.org/",)],
        ["url"],
    ).select(cdxj.surt_key(F.col("url")).alias("k"))
    ks = [r.k for r in d.collect()]
    assert ks[0] == "org,example,sub)/a/b?q=1"
    assert ks[1] == "org,example)/"   # bare host keys as the root page
    assert ks[2] == "org,example)/"
