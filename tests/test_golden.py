"""Golden byte-identity corpus: 300 deterministic pages, kernel-level
(no JVM — the same kernels the Spark stages call per Arrow batch).

The expected text is computed by the generator from the raw content
pieces BEFORE wrapping (sources/datagen.py), never by the kernels, so
this is a true independent oracle for the north-star invariant:
byte-identical extracted text per url.
"""

import pytest

from vlm_ocr_pipeline_spark.functions import html_extract, pdf_extract, rendering
from vlm_ocr_pipeline_spark.operators import stages
from vlm_ocr_pipeline_spark.sources import datagen


@pytest.mark.parametrize("start", [0, 100, 200])
def test_golden_byte_identity(start):
    for idx in range(start, start + 100):
        c = datagen.page_content(idx)
        if c["kind"] == "html":
            payload = datagen.html_for_content(c)
            blocks = html_extract.extract_html_page(payload)["blocks"]
            expected = datagen.expected_plaintext(c)
        else:
            payload = datagen.build_pdf(c["title"], c["paras"], c["two_col"], hyphenate=True)
            blocks = pdf_extract.spans_to_blocks(pdf_extract.extract_pdf_spans(payload))
            expected = datagen.expected_pdf_plaintext(c)
        blocks = stages.order_blocks(blocks, c["kind"])
        stages._correct_blocks(blocks, c["kind"])
        got = rendering.render_plaintext(blocks)
        assert got == expected, f"byte mismatch at idx={idx} kind={c['kind']}"


def test_generator_is_partition_independent():
    # content depends only on the index, never on batch/partition state
    a = datagen.page_content(12345)
    b = datagen.page_content(12345)
    assert a == b
