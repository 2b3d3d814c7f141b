"""SQL-exposed extraction functions (the §2.9 ``spark.udf.register``
surface): after :func:`register_sql_functions`, users can write

    SELECT url, extract_plaintext(html) AS text FROM pages
    SELECT extract_markdown(html), sniff_kind(html) FROM pages

All are Arrow-batched pandas UDFs over the same kernels the pipeline
stages use, so SQL results are byte-identical to the stage output.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession, functions as F, types as T

from ..operators import stages


def _extract_series(payloads: pd.Series, column: str) -> pd.Series:
    batch = pd.DataFrame(
        {"url": "", "warc_ts": pd.NaT, "html": payloads}
    )
    out = stages.fused_extract_batch(batch)
    return out[column].astype("string")


def register_sql_functions(spark: SparkSession) -> None:
    @F.pandas_udf(T.StringType())
    def extract_plaintext(payload: pd.Series) -> pd.Series:
        return _extract_series(payload, "rendered_plaintext")

    @F.pandas_udf(T.StringType())
    def extract_markdown(payload: pd.Series) -> pd.Series:
        return _extract_series(payload, "rendered_markdown")

    @F.pandas_udf(T.StringType())
    def extract_raw_text(payload: pd.Series) -> pd.Series:
        return _extract_series(payload, "raw_text")

    @F.pandas_udf(T.StringType())
    def sniff_kind(payload: pd.Series) -> pd.Series:
        return payload.map(stages.sniff_kind).astype("string")

    spark.udf.register("extract_plaintext", extract_plaintext)
    spark.udf.register("extract_markdown", extract_markdown)
    spark.udf.register("extract_raw_text", extract_raw_text)
    spark.udf.register("sniff_kind", sniff_kind)
