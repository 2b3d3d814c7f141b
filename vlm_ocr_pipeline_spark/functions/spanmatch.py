"""Block <-> text-span matching + font-size header levels + olmOCR-style
anchor text.

Parity targets in /root/reference:
- best-IoU span match, threshold 0.3 and STRICT improvement (``>``)
  during the scan, ``>=`` threshold at the end
  (pipeline/io/output/markdown/pymupdf4llm.py:70-131)
- font-size header mapping: distinct sizes desc, filter >= 12.0,
  top 3 -> levels 1..3 (pymupdf4llm.py:42-50; constants.py:65)
- olmOCR anchor text: "Page dimensions: WxH" header then one line per
  block in bbox anchor format, stopping AFTER the line that pushes the
  cumulative length past max_length=4000
  (pipeline/types/result.py:118-161; bbox.py:413-445 format strings;
  text blocks truncate content to 50 chars)
"""

from __future__ import annotations

from typing import Any

from .geometry import iou as _iou_arrays

import numpy as np

DEFAULT_IOU_THRESHOLD = 0.3
MIN_HEADER_FONT_SIZE = 12.0
MAX_HEADER_LEVELS = 3
ANCHOR_MAX_LENGTH = 4000


def match_block_with_spans(
    block_box: np.ndarray | list[int],
    span_boxes: np.ndarray,
    iou_threshold: float = DEFAULT_IOU_THRESHOLD,
) -> int | None:
    """Index of the best-IoU span for a block, or None below threshold.

    Strict ``>`` comparison during the scan means the FIRST span wins
    exact IoU ties — preserved from the reference loop.
    """
    if len(span_boxes) == 0:
        return None
    ious = _iou_arrays(np.asarray(block_box), np.asarray(span_boxes))
    best = 0
    best_iou = 0.0
    for i, v in enumerate(ious):
        if v > best_iou:
            best_iou = float(v)
            best = i
    if best_iou >= iou_threshold:
        return best
    return None


def font_size_header_levels(
    font_sizes: list[float],
    min_header_font_size: float = MIN_HEADER_FONT_SIZE,
    max_levels: int = MAX_HEADER_LEVELS,
) -> dict[float, int]:
    """Distinct sizes desc, filtered >= min size, top-k -> level 1..k."""
    unique_sizes = sorted(set(font_sizes), reverse=True)
    header_sizes = [s for s in unique_sizes if s >= min_header_font_size]
    return {s: i + 1 for i, s in enumerate(header_sizes[:max_levels])}


def _anchor_line(b: dict[str, Any]) -> str:
    t = b.get("type") or ""
    x0, y0, x1, y1 = b["x0"], b["y0"], b["x1"], b["y1"]
    if t in ("text", "title", "list", "plain text"):
        # content only for text/title/plain text (result.py:152) — list
        # blocks keep the point format with empty content
        content = (b.get("text") or "")[:50] if t != "list" else ""
        return f"[{x0:.0f}x{y0:.0f}]{content}"
    if t in ("image", "figure", "equation"):
        return f"[Image {x0:.0f}x{y0:.0f} to {x1:.0f}x{y1:.0f}]"
    if t == "table":
        return f"[Table {x0:.0f}x{y0:.0f} to {x1:.0f}x{y1:.0f}]"
    return f"[{x0:.0f}x{y0:.0f}]"


def blocks_to_anchor_text(
    blocks: list[dict[str, Any]],
    page_width: int,
    page_height: int,
    max_length: int = ANCHOR_MAX_LENGTH,
) -> str:
    """olmOCR anchor text with the reference's cumulative length budget
    (the line that crosses the budget is still included)."""
    lines = [f"Page dimensions: {page_width}x{page_height}"]
    for b in blocks:
        lines.append(_anchor_line(b))
        if sum(len(line) for line in lines) > max_length:
            break
    return "\n".join(lines)
