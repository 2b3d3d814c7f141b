"""Minimal PDF span parser + span clustering."""

from vlm_ocr_pipeline_spark.functions.pdf_extract import (
    extract_pdf_spans,
    spans_to_blocks,
)
from vlm_ocr_pipeline_spark.sources.datagen import build_pdf


def _pdf(stream: str, h: float = 792) -> bytes:
    return (
        b"%PDF-1.4\n1 0 obj\n<< /MediaBox [0 0 612 "
        + str(h).encode()
        + b"] >>\nendobj\nstream\n"
        + stream.encode("latin-1")
        + b"\nendstream\n%%EOF"
    )


def test_non_pdf_returns_empty():
    assert extract_pdf_spans(b"<html>") == []


def test_tm_absolute_positioning_and_y_flip():
    spans = extract_pdf_spans(_pdf("BT /F1 12 Tf 1 0 0 1 72 700 Tm (Hello) Tj ET"))
    assert len(spans) == 1
    s = spans[0]
    assert s["text"] == "Hello"
    assert s["y1"] == 792 - 700 and s["y0"] == 792 - 700 - 12
    assert s["x0"] == 72 and s["size"] == 12


def test_td_relative_moves():
    spans = extract_pdf_spans(
        _pdf("BT /F1 10 Tf 10 100 Td (a) Tj 0 -20 Td (b) Tj ET")
    )
    assert [s["text"] for s in spans] == ["a", "b"]
    assert spans[1]["y1"] - spans[0]["y1"] == 20  # moved down in top-left coords


def test_tj_array_concatenation_and_escapes():
    spans = extract_pdf_spans(
        _pdf(r"BT /F1 12 Tf 1 0 0 1 10 100 Tm [(a\(b\)) -200 (c)] TJ ET")
    )
    assert "".join(s["text"] for s in spans) == "a(b)c"


def test_octal_escape():
    spans = extract_pdf_spans(_pdf(r"BT /F1 12 Tf 1 0 0 1 0 100 Tm (\101BC) Tj ET"))
    assert spans[0]["text"] == "ABC"


def test_spans_cluster_into_title_and_paragraphs():
    pdf = build_pdf("My Title", ["first paragraph words here", "second paragraph words here"],
                    two_col=False, hyphenate=False)
    blocks = spans_to_blocks(extract_pdf_spans(pdf))
    assert [b["type"] for b in blocks] == ["title", "text", "text"]
    assert blocks[0]["text"] == "My Title"


def test_two_column_blocks_stay_separate():
    pdf = build_pdf("T Wide Title", ["left column words " * 5, "right column words " * 5],
                    two_col=True, hyphenate=False)
    blocks = spans_to_blocks(extract_pdf_spans(pdf))
    texts = [b["text"].replace("\n", " ") for b in blocks if b["type"] == "text"]
    assert len(texts) == 2
    assert texts[0].startswith("left") and texts[1].startswith("right")


def test_flatedecode_stream_roundtrip():
    plain = build_pdf("T Compressed", ["some body words here repeated often"],
                      two_col=False, hyphenate=False, compress=False)
    flate = build_pdf("T Compressed", ["some body words here repeated often"],
                      two_col=False, hyphenate=False, compress=True)
    assert b"/FlateDecode" in flate and b"/FlateDecode" not in plain
    a = spans_to_blocks(extract_pdf_spans(plain))
    b = spans_to_blocks(extract_pdf_spans(flate))
    assert a == b  # identical spans/blocks either way


def test_corrupt_flate_stream_skipped():
    flate = build_pdf("T", ["words"], False, False, compress=True)
    corrupted = flate.replace(b"stream\n", b"stream\nXX", 1)
    assert extract_pdf_spans(corrupted) == []  # skipped, no crash
