"""Physical-plan quality gates: these assert the Catalyst properties
the 100 TB design depends on (SURVEY §4) — pushdown, pruning,
broadcast, whole-stage codegen — so a regression that silently
de-optimizes a plan fails CI."""

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


def _plan(df, execute: bool = False) -> str:
    if execute:  # AQE finalizes the physical plan only at execution
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_filter_pushes_to_parquet_scan(spark, lineitem):
    df = lineitem.filter(F.col("l_quantity") < 24).select("l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,24.0)" in plan


def test_column_pruning_reaches_scan(spark, lineitem):
    df = lineitem.select("l_quantity", "l_discount")
    plan = _plan(df)
    # ReadSchema must contain only the 2 selected columns
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_quantity" in read_schema and "l_discount" in read_schema
    assert "l_extendedprice" not in read_schema


def test_small_dim_join_broadcasts(spark):
    import __spark_entry__ as e

    df = e.queries()["group_join_agg"](spark, SF)
    assert "BroadcastHashJoin" in _plan(df)


def test_agg_runs_in_wholestage_codegen(spark, lineitem):
    df = lineitem.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = _plan(df, execute=True)
    # "*(n)" is the whole-stage-codegen marker in the compact tree form
    assert "*(" in plan
    assert "HashAggregate" in plan


def test_partial_aggregation_before_shuffle(spark, lineitem):
    # map-side combine: two HashAggregate nodes around the exchange
    plan = _plan(
        lineitem.groupBy("l_returnflag").agg(F.sum("l_quantity")), execute=True
    )
    assert plan.count("HashAggregate") >= 2


def test_media_summary_never_reads_payload(spark):
    from vlm_ocr_pipeline_spark.operators.multimodal import (
        media_metadata_summary,
        synth_media,
    )
    import tempfile

    path = tempfile.mkdtemp() + "/media"
    synth_media(spark, 20, partitions=1).write.parquet(path)
    df = media_metadata_summary(spark.read.parquet(path))
    plan = _plan(df)
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "payload" not in read_schema  # column pruning on binary


def test_extract_reads_only_needed_columns(spark):
    # the fused extract selects url/warc_ts/html — text/lang pruned
    import tempfile

    from vlm_ocr_pipeline_spark.plans.pipeline import extract
    from vlm_ocr_pipeline_spark.sources.datagen import synth_pages

    path = tempfile.mkdtemp() + "/pages"
    synth_pages(spark, 20, partitions=1).write.parquet(path)
    df = extract(spark.read.parquet(path))
    plan = _plan(df)
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "html" in read_schema
    assert "lang" not in read_schema and "text" not in read_schema


def test_anti_join_is_a_real_join_not_subquery_scan(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["resume_anti_join"](spark, SF))
    assert "LeftAnti" in plan


def test_minhash_shuffles_once_per_agg(spark):
    from vlm_ocr_pipeline_spark.operators.text_dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(minhash_signatures(docs, num_hashes=4))
    # shingle explode -> ONE exchange for the groupBy(doc_id)
    assert plan.count("Exchange") <= 2  # partial agg + final exchange
