"""Skew handling: salted two-phase agg correctness + skew join."""

import pyspark.sql.functions as F
import pytest

from vlm_ocr_pipeline_spark.operators import skew
from vlm_ocr_pipeline_spark.sources import datagen


@pytest.fixture(scope="module")
def pages(spark):
    return datagen.synth_pages(spark, 300, partitions=4).cache()


def test_domain_extraction(spark, pages):
    doms = pages.select(skew.domain_of(F.col("url")).alias("d")).distinct()
    vals = {r["d"] for r in doms.collect()}
    assert "hot.example.com" in vals
    assert all(v for v in vals)


def test_salted_agg_matches_naive(spark, pages):
    salted = skew.domain_stats(pages).toPandas().set_index("domain")
    naive = (
        pages.groupBy(skew.domain_of(F.col("url")).alias("domain"))
        .agg(F.count("*").alias("n_pages"),
             F.sum(F.length("html")).alias("total_bytes"))
        .toPandas().set_index("domain")
    )
    assert salted["n_pages"].sort_index().equals(naive["n_pages"].sort_index())
    assert salted["total_bytes"].sort_index().equals(
        naive["total_bytes"].sort_index()
    )
    # the hot domain really is hot (~30%)
    assert salted.loc["hot.example.com", "n_pages"] >= 0.25 * 300


def test_hot_key_probe_and_skew_join(spark, pages):
    fact = pages.select(
        skew.domain_of(F.col("url")).alias("domain"), "url"
    )
    hot = skew.find_hot_keys(fact, F.col("domain"), top_n=1)
    assert hot == ["hot.example.com"]
    dim = fact.select("domain").distinct().withColumn("rank", F.lit(1))
    joined = skew.broadcast_hot_keys_join(fact, dim, "domain", hot)
    assert joined.count() == fact.count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the hot slice broadcasts


def test_salt_expression_is_deterministic(spark, pages):
    """The salt must be a pure function of row content so task retries
    reproduce identical (key, salt) partials — never
    monotonically_increasing_id (nondeterministic across attempts)."""
    out = skew.domain_stats(pages, salt_buckets=4)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "monotonically_increasing_id" not in plan
    a = out.orderBy("domain").toPandas()
    b = skew.domain_stats(pages, salt_buckets=4).orderBy("domain").toPandas()
    assert a.equals(b)
