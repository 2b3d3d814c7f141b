"""LayoutReader-style line-split ordering — deterministic semantics of
the reference's mineru-layoutreader sorter with the ML model replaced by
its own documented fallback behavior (SURVEY §2.10).

Ported semantics (/root/reference/pipeline/layout/ordering/mineru/layoutreader.py):

- line-height estimate: MEDIAN height of text-like blocks, 10.0 when
  none (":104-116")
- line split (":118-177"): text-like blocks taller than 2*line_height
  split into max(2, int(h / line_height)) equal lines; other types into
  min(3, max(1, int(h / line_height))) lines
- cap: > 200 lines total -> geometric fallback sort (":25, 88-90")
- line ordering: the LayoutLMv3 call is replaced by the deterministic
  geometric line order (y0, x0) — the reference's own fallback path
- block rank = MEDIAN of its lines' positions in the ordered line list;
  blocks without lines rank +inf; final sort by that median, rank
  assigned 0.. (":220-258")
"""

from __future__ import annotations

from typing import Any

import numpy as np

MAX_LINES = 200
_TEXT_TYPES = {"plain text", "text", "title"}


def estimate_line_height(blocks: list[dict[str, Any]]) -> float:
    heights = [
        b["y1"] - b["y0"] for b in blocks if (b.get("type") in _TEXT_TYPES)
    ]
    return float(np.median(heights)) if heights else 10.0


def split_blocks_into_lines(
    blocks: list[dict[str, Any]], line_height: float
) -> list[tuple[list[int], int]]:
    """[(line_bbox, block_idx)] with the reference's split counts."""
    lines: list[tuple[list[int], int]] = []
    for idx, b in enumerate(blocks):
        h = b["y1"] - b["y0"]
        if b.get("type") in _TEXT_TYPES:
            if h > line_height * 2:
                num = max(2, int(h / line_height))
            else:
                lines.append(([int(b["x0"]), int(b["y0"]), int(b["x1"]), int(b["y1"])], idx))
                continue
        else:
            num = min(3, max(1, int(h / line_height)))
        line_h = h / num
        for i in range(num):
            lines.append(
                (
                    [int(b["x0"]), int(b["y0"] + i * line_h),
                     int(b["x1"]), int(b["y0"] + (i + 1) * line_h)],
                    idx,
                )
            )
    return lines


def layoutreader_order(blocks: list[dict[str, Any]]) -> np.ndarray:
    """ranks[i] = reading order of block i (median-line-position rule);
    falls back to the (y0, x0) sort above the 200-line cap."""
    n = len(blocks)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lines = split_blocks_into_lines(blocks, estimate_line_height(blocks))
    boxes = np.array([[b["x0"], b["y0"], b["x1"], b["y1"]] for b in blocks])
    if len(lines) > MAX_LINES:
        perm = np.lexsort((boxes[:, 0], boxes[:, 1]))
        ranks = np.empty(n, dtype=np.int64)
        ranks[perm] = np.arange(n)
        return ranks
    # deterministic line order: (y0, x0) — the model-free fallback
    lb = np.array([l[0] for l in lines])
    line_perm = np.lexsort((lb[:, 0], lb[:, 1]))
    positions: dict[int, list[int]] = {}
    for pos, li in enumerate(line_perm):
        positions.setdefault(lines[li][1], []).append(pos)
    medians = np.full(n, np.inf)
    for idx, ps in positions.items():
        medians[idx] = float(np.median(ps))
    order_idx = np.argsort(medians, kind="stable")
    ranks = np.empty(n, dtype=np.int64)
    ranks[order_idx] = np.arange(n)
    return ranks
