"""Multi-column ordering (O2/J2), IoU span match (J1), font headers
(A9), anchor text (O10/F12)."""

import numpy as np

from vlm_ocr_pipeline_spark.functions import columns, spanmatch
from vlm_ocr_pipeline_spark.operators.stages import order_blocks


def test_merge_columns_running_mean_center():
    boxes = np.array(
        [[100, 0, 200, 50], [110, 60, 190, 100], [400, 0, 500, 100]]
    )
    cols = columns.merge_column_boxes(boxes, page_width=600)
    assert len(cols) == 2
    # first column merged both left boxes; center = mean(150, 150) = 150
    assert cols[0]["center"] == 150.0
    assert cols[0]["x0"] == 100 and cols[0]["x1"] == 200
    assert cols[1]["index"] == 1


def test_merge_threshold_is_max_of_5pct_and_25():
    # page width 100 -> threshold max(5, 25) = 25
    boxes = np.array([[0, 0, 10, 10], [20, 0, 30, 10]])  # centers 5, 25
    cols = columns.merge_column_boxes(boxes, page_width=100)
    assert len(cols) == 1  # |25-5|=20 <= 25 -> merged


def test_assign_by_overlap_then_distance():
    cols = columns.merge_column_boxes(
        np.array([[0, 0, 100, 400], [200, 0, 300, 400]]), page_width=300
    )
    blocks = np.array(
        [[10, 10, 90, 50],      # inside col 0
         [210, 10, 290, 50],    # inside col 1
         [140, 500, 160, 520]]  # overlaps neither -> nearest center (150 vs 50/250)
    )
    idx = columns.assign_block_columns(blocks, cols)
    assert idx.tolist() == [0, 1, 0]  # equidistant tie -> min() keeps first


def test_multicolumn_order_reads_columns_in_x_order():
    boxes = np.array(
        [[200, 0, 300, 50],   # right top
         [0, 0, 100, 50],     # left top
         [0, 60, 100, 110],   # left bottom
         [200, 60, 300, 110]] # right bottom
    )
    ranks, col_idx = columns.multicolumn_order(boxes, page_width=300)
    assert ranks.tolist() == [2, 0, 1, 3]
    assert col_idx.tolist() == [1, 0, 0, 1]


def test_single_column_falls_back():
    boxes = np.array([[0, 60, 100, 110], [0, 0, 100, 50]])
    ranks, col_idx = columns.multicolumn_order(boxes, page_width=100)
    assert ranks.tolist() == [1, 0]
    assert col_idx.tolist() == [0, 0]


def test_multicolumn_sorter_via_registry():
    blocks = [
        {"type": "text", "x0": 200, "y0": 0, "x1": 300, "y1": 50, "text": "R"},
        {"type": "text", "x0": 0, "y0": 0, "x1": 100, "y1": 50, "text": "L"},
    ]
    out = order_blocks(blocks, "pdf", sorter="multicolumn")
    assert [b["text"] for b in out] == ["L", "R"]
    assert out[0]["column_index"] == 0 and out[1]["column_index"] == 1


# ---- J1 span match ------------------------------------------------------
def test_span_match_best_iou_above_threshold():
    spans = np.array([[0, 0, 100, 100], [0, 0, 50, 50], [500, 500, 600, 600]])
    assert spanmatch.match_block_with_spans([0, 0, 90, 90], spans) == 0


def test_span_match_below_threshold_none():
    spans = np.array([[0, 0, 10, 10]])
    assert spanmatch.match_block_with_spans([0, 0, 100, 100], spans) is None


def test_span_match_first_wins_exact_tie():
    spans = np.array([[0, 0, 100, 100], [0, 0, 100, 100]])
    assert spanmatch.match_block_with_spans([0, 0, 100, 100], spans) == 0


# ---- A9 font headers -----------------------------------------------------
def test_font_header_levels_top3_min12():
    mapping = spanmatch.font_size_header_levels([10, 12, 14, 14, 18, 24, 30])
    assert mapping == {30: 1, 24: 2, 18: 3}  # 14 beyond top-3; 10 < 12 dropped


# ---- O10/F12 anchor text -------------------------------------------------
def test_anchor_text_formats():
    blocks = [
        {"type": "title", "x0": 100, "y0": 50, "x1": 300, "y1": 80,
         "text": "Chapter 1"},
        {"type": "image", "x0": 100, "y0": 100, "x1": 300, "y1": 250},
        {"type": "table", "x0": 10, "y0": 300, "x1": 200, "y1": 400},
        {"type": "list", "x0": 10, "y0": 420, "x1": 200, "y1": 440,
         "text": "should not appear"},
    ]
    out = spanmatch.blocks_to_anchor_text(blocks, 800, 600)
    assert out.splitlines() == [
        "Page dimensions: 800x600",
        "[100x50]Chapter 1",
        "[Image 100x100 to 300x250]",
        "[Table 10x300 to 200x400]",
        "[10x420]",
    ]


def test_anchor_text_length_budget_includes_crossing_line():
    blocks = [
        {"type": "text", "x0": 0, "y0": i, "x1": 10, "y1": i + 1,
         "text": "x" * 50}
        for i in range(200)
    ]
    out = spanmatch.blocks_to_anchor_text(blocks, 100, 100, max_length=200)
    total = sum(len(l) for l in out.splitlines())
    lines = out.splitlines()
    assert total > 200  # the crossing line is included...
    assert sum(len(l) for l in lines[:-1]) <= 200  # ...but nothing after


def test_clean_column_rects_dedupe_and_bottom_runs():
    rects = [
        [0, 0, 10, 50], [0, 0, 10, 50],      # adjacent duplicate -> one
        [40, 0, 60, 52], [20, 0, 30, 55],     # bottoms within 10 -> x0 sort
        [5, 100, 15, 200],                    # new bottom run
    ]
    out = columns.clean_column_rects(rects)
    assert out == [
        [0, 0, 10, 50], [20, 0, 30, 55], [40, 0, 60, 52],
        [5, 100, 15, 200],
    ]


def test_clean_column_rects_short_input_passthrough():
    assert columns.clean_column_rects([[1, 2, 3, 4]]) == [[1, 2, 3, 4]]
