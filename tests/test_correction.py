"""Correction kernels (reference openai.py:447-450 ratio expression;
block_correction_stage.py:42-47 copy semantics)."""

from difflib import SequenceMatcher

from vlm_ocr_pipeline_spark.functions.correction import (
    copy_correct,
    correction_ratio,
    span_merge_correct,
)


def test_ratio_identical_is_zero():
    assert correction_ratio("abc", "abc") == 0.0


def test_ratio_matches_difflib_expression():
    a, b = "the quick brown fox", "the quiet brown fax"
    assert correction_ratio(a, b) == 1.0 - SequenceMatcher(None, a, b).ratio()


def test_copy_correct_is_identity():
    assert copy_correct("x  y\nz") == "x  y\nz"


def test_dehyphenation():
    assert span_merge_correct("exam-\nple text") == "example text"


def test_soft_breaks_become_spaces_paragraphs_kept():
    assert span_merge_correct("line one\nline two\n\npara two") == (
        "line one line two\n\npara two"
    )


def test_whitespace_collapse():
    assert span_merge_correct("a   b\t c") == "a b c"


def test_many_blank_lines_collapse():
    assert span_merge_correct("a\n\n\n\nb") == "a\n\nb"
