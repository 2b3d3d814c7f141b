"""XY-cut + fallback ordering parity tests, mirroring the geometric
cases of the reference's tests/unit/ordering/test_xycut.py:40-177."""

import numpy as np

from vlm_ocr_pipeline_spark.functions import ordering


def _order_of(boxes):
    perm = ordering.xy_cut_order(np.array(boxes))
    return ordering.assign_order(len(boxes), perm).tolist()


def test_empty():
    assert ordering.xy_cut_order(np.empty((0, 4))).tolist() == []


def test_single_block():
    assert _order_of([[100, 100, 200, 200]]) == [0]


def test_vertical_order():
    # bottom listed first, top second -> ranks flip
    ranks = _order_of([[100, 200, 200, 300], [100, 50, 200, 100]])
    assert ranks == [1, 0]


def test_horizontal_order():
    ranks = _order_of([[300, 100, 400, 150], [100, 100, 200, 150]])
    assert ranks == [1, 0]


def test_grid_layout_reading_order():
    # 2x2 grid listed BR, BL, TR, TL — XY-cut reads TL, TR, BL, BR
    boxes = [
        [300, 200, 400, 300],  # bottom right
        [100, 200, 200, 300],  # bottom left
        [300, 50, 400, 100],   # top right
        [100, 50, 200, 100],   # top left
    ]
    assert _order_of(boxes) == [3, 2, 1, 0]


def test_overlapping_blocks_assign_all_orders():
    ranks = _order_of([[100, 100, 250, 200], [200, 150, 350, 250]])
    assert sorted(ranks) == [0, 1]


def test_twenty_blocks_unique_orders():
    boxes = [[i * 50, i * 30, i * 50 + 40, i * 30 + 20] for i in range(20)]
    ranks = _order_of(boxes)
    assert sorted(ranks) == list(range(20))


def test_two_column_reads_left_column_first():
    # title band on top, then left column (2 blocks) before right column
    boxes = [
        [72, 40, 540, 64],     # title (full width)
        [320, 100, 560, 400],  # right column
        [72, 100, 300, 250],   # left column top
        [72, 280, 300, 420],   # left column bottom
    ]
    ranks = _order_of(boxes)
    assert ranks[0] == 0       # title first
    assert ranks[2] == 1 and ranks[3] == 2 and ranks[1] == 3


def test_fallback_sort_is_stable_y_then_x():
    boxes = np.array(
        [[50, 10, 60, 20], [10, 10, 20, 20], [10, 5, 20, 8]]
    )
    assert ordering.fallback_order(boxes).tolist() == [2, 1, 0]


def test_sort_preserve_unranked_last():
    """None-order blocks go LAST in original sequence (the renderer
    convention, reference io/output/markdown/pymupdf4llm.py:241-246),
    then all blocks are re-ranked densely."""
    from vlm_ocr_pipeline_spark.operators.stages import _sort_preserve

    blocks = [
        {"order": None, "tag": "u1"},
        {"order": 1, "tag": "r1"},
        {"order": None, "tag": "u2"},
        {"order": 0, "tag": "r0"},
    ]
    out = _sort_preserve([dict(b) for b in blocks])
    assert [b["tag"] for b in out] == ["r0", "r1", "u1", "u2"]
    assert [b["order"] for b in out] == [0, 1, 2, 3]
