"""Reading-order kernels: recursive XY-cut and geometric fallback sort.

Semantics parity (bit-exact ranks for identical inputs) with the
reference's MinerU XY-cut sorter:

- recursive projection split    reference: pipeline/layout/ordering/mineru/xycut.py:91-147
- projection histogram          xycut.py:149-172  (length = max over BOTH
  coords of the axis, i.e. cols ``axis::2``; histogram += 1 over
  [start, end) with bounds guard)
- profile split                 xycut.py:174-204 (min_value=0, min_gap=1,
  end indices are exclusive: ``arr_end += 1``)
- band membership uses ``lo <= coord < hi`` strictly on the *start*
  coordinate only (y0 for bands, x0 for columns; xycut.py:118,143)
- single-x-group early emit     xycut.py:138-140
- unsplittable-x early emit     xycut.py:132-134
- fallback sort by (y0, x0)     xycut.py:206-216 (stable)

The output is a permutation of input indices; rank within the permutation
is the block's ``order`` (xycut.py:80-82).  Written array-first so a
whole Arrow batch of documents can be processed without per-block Python
object churn.
"""

from __future__ import annotations

import numpy as np


def _segments(profile: np.ndarray, min_value: float = 0, min_gap: float = 1):
    """Split a 1-D occupancy profile into [start, end) runs.

    A run boundary occurs wherever consecutive occupied indices are more
    than ``min_gap`` apart. Returns (starts, ends) or None when nothing
    exceeds ``min_value``.
    """
    occupied = np.flatnonzero(profile > min_value)
    if occupied.size == 0:
        return None
    gap_at = np.flatnonzero(np.diff(occupied) > min_gap)
    starts = np.concatenate(([occupied[0]], occupied[gap_at + 1]))
    ends = np.concatenate((occupied[gap_at], [occupied[-1]])) + 1
    return starts, ends


def _occupancy(boxes: np.ndarray, axis: int) -> np.ndarray:
    """Histogram of how many boxes cover each pixel along ``axis``.

    Profile length is ``max(boxes[:, axis::2])`` — intervals are clipped
    by the same bounds guard the reference applies.
    """
    lo_hi = boxes[:, axis::2]
    length = int(lo_hi.max())
    prof = np.zeros(length, dtype=np.int64)
    for lo, hi in lo_hi:
        lo_i, hi_i = int(lo), int(hi)
        if 0 <= lo_i < length and 0 <= hi_i <= length:
            prof[lo_i:hi_i] += 1
    return prof


def xy_cut_order(boxes: np.ndarray) -> np.ndarray:
    """Return the XY-cut reading-order permutation of box indices.

    ``boxes`` is an (N, 4) integer array of [x0, y0, x1, y1]. The result
    ``perm`` satisfies: block ``perm[k]`` has reading order ``k``.
    """
    boxes = np.asarray(boxes, dtype=np.int64)
    n = len(boxes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    out: list[int] = []
    _cut(boxes, np.arange(n), out)
    return np.asarray(out, dtype=np.int64)


def _cut(boxes: np.ndarray, idx: np.ndarray, out: list[int]) -> None:
    if len(boxes) == 0:
        return
    by_y = boxes[:, 1].argsort()
    boxes, idx = boxes[by_y], idx[by_y]

    bands = _segments(_occupancy(boxes, axis=1))
    if bands is None:
        return
    for band_lo, band_hi in zip(*bands):
        in_band = (band_lo <= boxes[:, 1]) & (boxes[:, 1] < band_hi)
        if not in_band.any():
            continue
        bb, bi = boxes[in_band], idx[in_band]

        by_x = bb[:, 0].argsort()
        bb, bi = bb[by_x], bi[by_x]

        cols = _segments(_occupancy(bb, axis=0))
        if cols is None or len(cols[0]) == 1:
            out.extend(bi.tolist())
            continue
        for col_lo, col_hi in zip(*cols):
            in_col = (col_lo <= bb[:, 0]) & (bb[:, 0] < col_hi)
            _cut(bb[in_col], bi[in_col], out)


def fallback_order(boxes: np.ndarray) -> np.ndarray:
    """Stable (y0, x0) sort permutation — the reference's fallback
    everywhere (xycut.py:206-216, multi_column.py:512-522,
    layoutreader.py:261-268, doclayout_v2.py:122-132)."""
    boxes = np.asarray(boxes)
    if len(boxes) == 0:
        return np.empty(0, dtype=np.int64)
    return np.lexsort((boxes[:, 0], boxes[:, 1])).astype(np.int64)


def assign_order(n_blocks: int, perm: np.ndarray) -> np.ndarray:
    """ranks[i] = reading order of block i given permutation ``perm``."""
    ranks = np.empty(n_blocks, dtype=np.int64)
    ranks[perm] = np.arange(len(perm))
    return ranks
