"""Overlap dedup parity (reference doclayout_v2.py:134-257 semantics)."""

import numpy as np

from vlm_ocr_pipeline_spark.functions.dedup_blocks import (
    apply_overlap_dedup_order,
    overlap_keep_mask,
)


def test_smaller_box_dropped_above_threshold():
    boxes = np.array([[0, 0, 100, 100], [10, 10, 60, 60]])  # inner ratio 1.0
    keep = overlap_keep_mask(boxes, ["text", "text"])
    assert keep.tolist() == [True, False]


def test_below_threshold_both_kept():
    boxes = np.array([[0, 0, 100, 100], [50, 50, 150, 150]])  # ratio 0.25
    keep = overlap_keep_mask(boxes, ["text", "text"])
    assert keep.tolist() == [True, True]


def test_equal_area_drops_later():
    boxes = np.array([[0, 0, 100, 100], [0, 0, 100, 100]])
    keep = overlap_keep_mask(boxes, ["text", "text"])
    assert keep.tolist() == [True, False]


def test_image_vs_nonimage_preserved():
    boxes = np.array([[0, 0, 100, 100], [10, 10, 60, 60]])
    keep = overlap_keep_mask(boxes, ["image", "text"])
    assert keep.tolist() == [True, True]
    # but image-vs-image still dedups
    keep2 = overlap_keep_mask(boxes, ["image", "image"])
    assert keep2.tolist() == [True, False]


def test_ref_text_exempt_and_appended_last():
    boxes = np.array(
        [[0, 0, 100, 100], [10, 10, 60, 60], [500, 0, 600, 100]]
    )
    types = ["ref_text", "text", "text"]
    # ref_text fully contains block 1 but is exempt -> block 1 survives
    order = apply_overlap_dedup_order(boxes, types)
    assert order.tolist() == [1, 2, 0]  # survivors first, ref_text last


def test_already_dropped_never_drops_others():
    # chain: A contains B, B contains C.  Pairwise order: (A,B) drops B;
    # then (B,C) is skipped because B is gone, (A,C) drops C.
    boxes = np.array([[0, 0, 100, 100], [5, 5, 80, 80], [10, 10, 40, 40]])
    keep = overlap_keep_mask(boxes, ["text"] * 3)
    assert keep.tolist() == [True, False, False]
