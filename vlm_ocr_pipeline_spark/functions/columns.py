"""Multi-column ordering kernel (the pymupdf sorter's semantics).

Parity with /root/reference/pipeline/layout/ordering/pymupdf/multi_column.py:

- column merge by center proximity: a box joins the first column whose
  running-mean center is within ``max(grouping_threshold, col_width)``
  where grouping_threshold = max(5% page width, 25) px; merged column
  center is the running MEAN of member centers, width tracks the merged
  bbox (multi_column.py:409-465)
- columns sorted by x0, indexed 0.. (":466-476")
- block -> column assignment: best overlap ratio (inter / block area),
  tie within COLUMN_ORDER_EPSILON=1e-6 broken by smaller center
  distance; zero-overlap blocks fall back to nearest center
  (multi_column.py:478-497)
- sort key (col_idx, y0, x0); order = rank, column_index recorded
  (":499-510")
- <=1 column detected -> fallback (y0, x0) sort (":356-364")
"""

from __future__ import annotations

from typing import Any

import numpy as np

COLUMN_ORDER_EPSILON = 1e-6


def merge_column_boxes(
    boxes: np.ndarray, page_width: int
) -> list[dict[str, Any]]:
    """Merge candidate column rects by horizontal-center proximity.

    ``boxes`` is (N, 4) int xyxy.  Returns columns sorted by x0 with
    keys index/x0/y0/x1/y1/center/width.
    """
    columns: list[dict[str, Any]] = []
    grouping_threshold = max(int(page_width * 0.05), 25)
    for x0, y0, x1, y1 in np.asarray(boxes):
        center_x = (float(x0) + float(x1)) / 2.0
        added = False
        for col in columns:
            threshold = max(grouping_threshold, col["width"])
            if abs(center_x - col["center"]) <= threshold:
                col["x0"] = min(col["x0"], int(x0))
                col["y0"] = min(col["y0"], int(y0))
                col["x1"] = max(col["x1"], int(x1))
                col["y1"] = max(col["y1"], int(y1))
                col["centers"].append(center_x)
                col["center"] = sum(col["centers"]) / len(col["centers"])
                col["width"] = col["x1"] - col["x0"]
                added = True
                break
        if not added:
            columns.append(
                {
                    "x0": int(x0), "y0": int(y0), "x1": int(x1), "y1": int(y1),
                    "centers": [center_x], "center": center_x,
                    "width": int(x1) - int(x0),
                }
            )
    columns.sort(key=lambda c: c["x0"])
    for idx, col in enumerate(columns):
        col["index"] = idx
        del col["centers"]
    return columns


def assign_block_columns(
    boxes: np.ndarray, columns: list[dict[str, Any]]
) -> np.ndarray:
    """Column index per block: max overlap-ratio, epsilon tie by center
    distance, zero-overlap fallback to nearest center."""
    boxes = np.asarray(boxes)
    out = np.zeros(len(boxes), dtype=np.int64)
    for i, (x0, y0, x1, y1) in enumerate(boxes):
        area = max((x1 - x0) * (y1 - y0), 0)
        bcx = (float(x0) + float(x1)) / 2.0
        best_idx, best_overlap, best_dist = 0, 0.0, float("inf")
        for col in columns:
            iw = min(int(x1), col["x1"]) - max(int(x0), col["x0"])
            ih = min(int(y1), col["y1"]) - max(int(y0), col["y0"])
            inter = max(iw, 0) * max(ih, 0)
            ratio = inter / area if area > 0 else 0.0
            dist = abs(bcx - col["center"])
            if ratio > best_overlap or (
                abs(ratio - best_overlap) <= COLUMN_ORDER_EPSILON and dist < best_dist
            ):
                best_overlap, best_dist, best_idx = ratio, dist, col["index"]
        if best_overlap <= 0:
            best_idx = min(columns, key=lambda c: abs(bcx - c["center"]))["index"]
        out[i] = best_idx
    return out


_MIN_NBLOCK_LENGTH = 2
_BOTTOM_TOLERANCE = 10


def clean_column_rects(rects: list[list[int]]) -> list[list[int]]:
    """The column_boxes final cleanup pass (O3), ported semantics-exact
    from reference multi_column.py:244-274 ``_clean_nblocks``:

    - adjacent identical rects deduped with a REVERSE scan that compares
      each rect to its predecessor (including the quirky idx==0 step
      where bb0 wraps to nblocks[-1] — preserved)
    - runs of rects whose bottoms agree within 10 px are re-sorted by x0
    Input/output: [x0, y0, x1, y1] lists; mutates a copy.
    """
    nblocks = [list(r) for r in rects]
    if len(nblocks) < _MIN_NBLOCK_LENGTH:
        return nblocks

    for idx in range(len(nblocks) - 1, -1, -1):
        if nblocks[idx - 1] == nblocks[idx]:
            del nblocks[idx]

    y1 = nblocks[0][3]
    i0, i1 = 0, -1
    for idx in range(1, len(nblocks)):
        if abs(nblocks[idx][3] - y1) > _BOTTOM_TOLERANCE:
            if i1 > i0:
                nblocks[i0 : i1 + 1] = sorted(
                    nblocks[i0 : i1 + 1], key=lambda r: r[0]
                )
            y1 = nblocks[idx][3]
            i0 = idx
        i1 = idx
    if i1 > i0:
        nblocks[i0 : i1 + 1] = sorted(nblocks[i0 : i1 + 1], key=lambda r: r[0])
    return nblocks


def multicolumn_order(
    boxes: np.ndarray,
    page_width: int,
    column_rects: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Full multi-column ordering of one document's blocks.

    Returns (ranks, column_index) arrays aligned to the input blocks.
    When ``column_rects`` is None the blocks themselves are the column
    candidates (the web-text stand-in for pymupdf's column_boxes).
    <=1 merged column falls back to the (y0, x0) sort with column 0.
    """
    boxes = np.asarray(boxes)
    n = len(boxes)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    cand = boxes if column_rects is None else np.asarray(column_rects)
    columns = merge_column_boxes(cand, page_width)
    if len(columns) <= 1:
        perm = np.lexsort((boxes[:, 0], boxes[:, 1]))
        ranks = np.empty(n, dtype=np.int64)
        ranks[perm] = np.arange(n)
        return ranks, np.zeros(n, dtype=np.int64)
    col_idx = assign_block_columns(boxes, columns)
    perm = np.lexsort((boxes[:, 0], boxes[:, 1], col_idx))
    ranks = np.empty(n, dtype=np.int64)
    ranks[perm] = np.arange(n)
    return ranks, col_idx
