"""BBox geometry parity tests (reference: tests/unit/types/test_bbox.py
semantics; bbox.py:41-95 constructors use banker's round())."""

import numpy as np

from vlm_ocr_pipeline_spark.functions import geometry as g


def test_bankers_rounding_matches_python_round():
    # round() is banker's: 0.5 -> 0, 1.5 -> 2, 2.5 -> 2
    vals = np.array([0.5, 1.5, 2.5, -0.5, -1.5, 100.5])
    got = g.round_xyxy(vals)
    exp = np.array([round(v) for v in vals.tolist()])
    assert (got == exp).all()


def test_from_xywh_rounds_the_sum_not_the_parts():
    # reference example bbox.py:56-59: (100.5, 50.2, 200.1, 150.8)
    out = g.xywh_to_xyxy(np.array([[100.5, 50.2, 200.1, 150.8]]))
    assert out.tolist() == [[100, 50, 301, 201]]


def test_from_xyxy_example():
    out = g.round_xyxy(np.array([[100.5, 50.2, 300.8, 200.1]]))
    assert out.tolist() == [[100, 50, 301, 200]]


def test_xyxy_to_xywh_roundtrip():
    b = np.array([[10, 20, 110, 70]])
    assert g.xyxy_to_xywh(b).tolist() == [[10, 20, 100, 50]]


def test_overlap_ratio_small_mode():
    a = np.array([0, 0, 100, 100])
    b = np.array([0, 0, 50, 50])  # fully inside, smaller
    assert g.overlap_ratio_small(a, b) == 1.0
    c = np.array([200, 200, 300, 300])
    assert g.overlap_ratio_small(a, c) == 0.0


def test_iou():
    a = np.array([0, 0, 100, 100])
    b = np.array([50, 0, 150, 100])
    # inter 50*100=5000, union 20000-5000=15000
    assert abs(g.iou(a, b) - 1 / 3) < 1e-12


def test_clip_and_zero_area():
    b = np.array([[-5, -5, 50, 50], [10, 10, 10, 40]])
    clipped = g.clip(b, 40, 40)
    assert clipped[0].tolist() == [0, 0, 40, 40]
    mask = g.nonzero_area_mask(clipped)
    assert mask.tolist() == [True, False]


def test_scale_dual_dpi():
    # recognition_dpi/detection_dpi = 2.0 (loader.py:161-191)
    b = np.array([[10, 20, 30, 41]])
    assert g.scale(b, 2.0).tolist() == [[20, 40, 60, 82]]


def test_cxcywh_roundtrip():
    out = g.cxcywh_to_xyxy(np.array([[200.0, 125.0, 200.0, 150.0]]))
    assert out.tolist() == [[100, 50, 300, 200]]


def test_pypdf_rect_y_flip():
    # reference bbox.py example: BBox(100,50,300,200) @ H=792 ->
    # [100, 592, 300, 742]
    out = g.xyxy_to_pypdf_rect(np.array([[100, 50, 300, 200]]), 792)
    assert out.tolist() == [[100, 592, 300, 742]]
