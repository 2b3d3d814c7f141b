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


def test_golden_pymupdf4llm_markdown_fixture():
    """Pinned end-to-end output of the font-header markdown renderer on
    two deterministic PDFs (two-column idx 0, single-column idx 11):
    title span (24 pt) maps to '# ', body blocks stay plain because a
    multi-line block never reaches IoU 0.3 against single-line spans —
    the reference renderer behaves identically (parity-tested in
    test_reference_parity.py)."""
    import hashlib

    pinned = {
        0: ("# Page 0 overview\n\n",
            "eba531e9ce5b399708540c9df1c3d6a7016a06bd51dcb81c9e997e3e3bb3aa21"),
        11: ("# Page 11 overview\n\n",
             "297eb21a292e7a52e63aa2eaff021018130d341ad54bb699319d94525fecf698"),
    }
    for idx, (prefix, digest) in pinned.items():
        c = datagen.page_content(idx)
        pdf = datagen.build_pdf(c["title"], c["paras"], c["two_col"], hyphenate=True)
        spans = pdf_extract.extract_pdf_spans(pdf)
        blocks = stages.order_blocks(pdf_extract.spans_to_blocks(spans), "pdf")
        stages._correct_blocks(blocks, "pdf")
        md = rendering.render_markdown_pymupdf4llm(blocks, spans)
        assert md.startswith(prefix)
        assert hashlib.sha256(md.encode()).hexdigest() == digest
