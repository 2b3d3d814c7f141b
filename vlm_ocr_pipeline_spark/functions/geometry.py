"""Block geometry kernels (vectorized numpy).

Semantics parity with the reference BBox type:
- integer pixel xyxy, top-left origin, constructors round with Python
  banker's rounding (reference: pipeline/types/bbox.py:62-67,90-95 uses
  ``round()``; ``np.round`` matches banker's rounding, ``int()`` does not).
- area           reference: pipeline/layout/ordering/paddleocr/doclayout_v2.py:208-218
- overlap_ratio  ("small" mode: intersection / smaller area)
                 reference: doclayout_v2.py:220-257
- iou            reference: pipeline/io/output/markdown/pymupdf4llm.py:115-131
- clip           reference: pipeline/layout/detection/base.py:165-178

All functions take/return numpy arrays shaped (N, 4) as [x0, y0, x1, y1]
so the Spark stages can run them over whole Arrow batches at once.
"""

from __future__ import annotations

import numpy as np


def round_xyxy(coords: np.ndarray) -> np.ndarray:
    """Round float coords to int with banker's rounding (matches round())."""
    return np.round(np.asarray(coords, dtype=np.float64)).astype(np.int64)


def xywh_to_xyxy(xywh: np.ndarray) -> np.ndarray:
    """[x, y, w, h] floats -> rounded integer [x0, y0, x1, y1].

    Matches BBox.from_xywh: x1 = round(x + w) (round the SUM, not the parts).
    """
    a = np.asarray(xywh, dtype=np.float64)
    out = np.empty_like(a)
    out[..., 0] = a[..., 0]
    out[..., 1] = a[..., 1]
    out[..., 2] = a[..., 0] + a[..., 2]
    out[..., 3] = a[..., 1] + a[..., 3]
    return round_xyxy(out)


def xyxy_to_xywh(xyxy: np.ndarray) -> np.ndarray:
    """Integer [x0,y0,x1,y1] -> [x, y, w, h] (JSON serialization format)."""
    a = np.asarray(xyxy)
    out = np.empty_like(a)
    out[..., 0] = a[..., 0]
    out[..., 1] = a[..., 1]
    out[..., 2] = a[..., 2] - a[..., 0]
    out[..., 3] = a[..., 3] - a[..., 1]
    return out


def area(boxes: np.ndarray) -> np.ndarray:
    """abs((x1-x0)*(y1-y0)) per box."""
    b = np.asarray(boxes)
    return np.abs((b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1]))


def intersection_area(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise-broadcastable intersection area between box arrays."""
    a = np.asarray(a)
    b = np.asarray(b)
    iw = np.minimum(a[..., 2], b[..., 2]) - np.maximum(a[..., 0], b[..., 0])
    ih = np.minimum(a[..., 3], b[..., 3]) - np.maximum(a[..., 1], b[..., 1])
    return np.maximum(iw, 0) * np.maximum(ih, 0)


def overlap_ratio_small(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection / min(area_a, area_b); 0.0 when either area is 0.

    "small" mode of the reference's _calculate_overlap_ratio.
    """
    inter = intersection_area(a, b).astype(np.float64)
    smaller = np.minimum(area(a), area(b)).astype(np.float64)
    out = np.zeros_like(inter, dtype=np.float64)
    mask = (inter > 0) & (smaller > 0)
    out[mask] = inter[mask] / smaller[mask]
    return out


def iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection-over-union; 0.0 when union is 0."""
    inter = intersection_area(a, b).astype(np.float64)
    union = area(a) + area(b) - inter
    out = np.zeros_like(inter, dtype=np.float64)
    mask = union > 0
    out[mask] = inter[mask] / union[mask]
    return out


def clip(boxes: np.ndarray, width: int, height: int) -> np.ndarray:
    """Clamp coords into [0, width] x [0, height] (immutable copy)."""
    b = np.asarray(boxes).copy()
    b[..., 0] = np.clip(b[..., 0], 0, width)
    b[..., 2] = np.clip(b[..., 2], 0, width)
    b[..., 1] = np.clip(b[..., 1], 0, height)
    b[..., 3] = np.clip(b[..., 3], 0, height)
    return b


def nonzero_area_mask(boxes: np.ndarray) -> np.ndarray:
    """True where width > 0 and height > 0 (zero-area drop, base.py:180-183)."""
    b = np.asarray(boxes)
    return (b[..., 2] > b[..., 0]) & (b[..., 3] > b[..., 1])


def scale(boxes: np.ndarray, factor: float) -> np.ndarray:
    """Multiply coords by factor and round to int (dual-DPI block scaling,
    reference: pipeline/io/input/loader.py:161-191)."""
    return round_xyxy(np.asarray(boxes, dtype=np.float64) * float(factor))


def cxcywh_to_xyxy(cxcywh: np.ndarray) -> np.ndarray:
    """[center_x, center_y, w, h] -> rounded int [x0, y0, x1, y1]
    (YOLO-style boxes; reference bbox.py from_cxcywh semantics: corners
    are rounded from cx -/+ w/2)."""
    a = np.asarray(cxcywh, dtype=np.float64)
    out = np.empty_like(a)
    out[..., 0] = a[..., 0] - a[..., 2] / 2
    out[..., 1] = a[..., 1] - a[..., 3] / 2
    out[..., 2] = a[..., 0] + a[..., 2] / 2
    out[..., 3] = a[..., 1] + a[..., 3] / 2
    return round_xyxy(out)


def xyxy_to_pypdf_rect(boxes: np.ndarray, page_height: float) -> np.ndarray:
    """Top-left-origin xyxy -> bottom-left-origin PDF rect
    [x0, y0_bottom, x1, y1_bottom] with the reference's Y-axis flip
    (bbox.py:405-411: y0_bottom = round(H - y1), y1_bottom = round(H - y0))."""
    b = np.asarray(boxes)
    out = np.empty_like(b)
    out[..., 0] = b[..., 0]
    out[..., 2] = b[..., 2]
    out[..., 1] = np.round(page_height - b[..., 3])
    out[..., 3] = np.round(page_height - b[..., 1])
    return out
