"""Spark schemas for the page-extraction pipeline (SURVEY §1.3).

One input table::

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

and derived stage tables, all keyed by (url, warc_ts) — the analog of
the reference's PageInfo.page_id (pipeline/batch/types.py:67-70).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Unified Block model (reference: pipeline/types/block.py:189-244),
# flattened bbox ints + optional text/correction fields.
BLOCK_STRUCT = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("x0", T.IntegerType()),
        T.StructField("y0", T.IntegerType()),
        T.StructField("x1", T.IntegerType()),
        T.StructField("y1", T.IntegerType()),
        T.StructField("detection_confidence", T.DoubleType()),
        T.StructField("order", T.IntegerType()),
        T.StructField("column_index", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("corrected_text", T.StringType()),
        T.StructField("correction_ratio", T.DoubleType()),
        T.StructField("description", T.StringType()),
        T.StructField("image_path", T.StringType()),
    ]
)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

# lineage rows emitted once per partition per stage (SURVEY §4.14)
LINEAGE_STRUCT = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("docs_in", T.LongType()),
        T.StructField("docs_out", T.LongType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("wall_clock_ms", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

KEY_COLS = ["url", "warc_ts"]


def blocks_stage_schema() -> T.StructType:
    """stage_blocks: detect/order output."""
    return T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("kind", T.StringType()),
            T.StructField("page_title", T.StringType()),
            T.StructField("blocks", T.ArrayType(BLOCK_STRUCT)),
            T.StructField("n_blocks", T.IntegerType()),
            T.StructField("status", T.StringType()),
            T.StructField("_lineage", LINEAGE_STRUCT),
        ]
    )


def text_stage_schema(renderer: str = "both") -> T.StructType:
    """stage_text: correct+render output — the pipeline's deliverable.

    ``renderer`` mirrors the reference's RenderingStage config
    (rendering_stage.py:27-42: markdown OR plaintext): a single-renderer
    run emits one ``rendered`` column, cutting Arrow/output bytes ~25%
    (the pipeline is memory-bandwidth-sensitive at high core counts);
    "both" keeps the two explicit columns.
    """
    render_fields = {
        "both": [
            T.StructField("rendered_markdown", T.StringType()),
            T.StructField("rendered_plaintext", T.StringType()),
        ],
        "markdown": [T.StructField("rendered", T.StringType())],
        "plaintext": [T.StructField("rendered", T.StringType())],
    }[renderer]
    return T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("kind", T.StringType()),
            T.StructField("raw_text", T.StringType()),
            T.StructField("corrected_text", T.StringType()),
            T.StructField("correction_ratio", T.DoubleType()),
            *render_fields,
            T.StructField("n_blocks", T.IntegerType()),
            T.StructField("status", T.StringType()),
            T.StructField("processed_at", T.TimestampType()),
            T.StructField("_lineage", LINEAGE_STRUCT),
        ]
    )
