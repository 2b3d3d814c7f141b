"""Overlap dedup of layout blocks within one document.

Semantics parity with the reference PP-DocLayoutV2 sorter's overlap
filter (pipeline/layout/ordering/paddleocr/doclayout_v2.py:134-257):

- ``ref_text`` blocks are exempt and re-appended AFTER the survivors
  (doclayout_v2.py:152-154, 206)
- all-pairs overlap ratio in "small" mode (inter / smaller area)
- pairs where exactly one side is type ``image`` are preserved
  (doclayout_v2.py:177-178)
- when ratio > threshold (default 0.7, constants.py:47) the SMALLER box
  is dropped; ties (equal area) drop the later block j
- a block already dropped never causes further drops (the i/j
  skip-check runs pair-by-pair in index order)

The pairwise loop is O(n²) per document but n is small (layout blocks
per page); the vectorized ratio matrix keeps the Python loop to the
drop-resolution pass only.
"""

from __future__ import annotations

import numpy as np

from . import geometry

DEFAULT_OVERLAP_THRESHOLD = 0.7


def overlap_keep_mask(
    boxes: np.ndarray,
    types: list[str] | np.ndarray,
    threshold: float = DEFAULT_OVERLAP_THRESHOLD,
) -> np.ndarray:
    """Boolean keep-mask over blocks, replicating the reference's
    sequential pairwise drop resolution.

    Note: the reference returns survivors-in-order followed by the
    exempt ``ref_text`` blocks; callers that need that exact ordering
    should partition by the mask AND the exemption (see
    :func:`apply_overlap_dedup_order`).
    """
    n = len(boxes)
    if n == 0:
        return np.zeros(0, dtype=bool)
    types = np.asarray(types, dtype=object)
    exempt = types == "ref_text"
    cand = np.flatnonzero(~exempt)
    m = len(cand)
    keep = np.ones(n, dtype=bool)
    if m < 2:
        return keep

    cb = np.asarray(boxes)[cand]
    ratio = geometry.overlap_ratio_small(cb[:, None, :], cb[None, :, :])
    areas = geometry.area(cb)
    ct = types[cand]

    dropped = np.zeros(m, dtype=bool)
    for i in range(m):
        for j in range(i + 1, m):
            if dropped[i] or dropped[j]:
                continue
            if ratio[i, j] <= threshold:
                continue
            # image-vs-non-image overlaps are intentional (figures with
            # text on top) — keep both
            if ("image" in (ct[i], ct[j])) and ct[i] != ct[j]:
                continue
            if areas[i] >= areas[j]:
                dropped[j] = True
            else:
                dropped[i] = True
    keep[cand[dropped]] = False
    return keep


def apply_overlap_dedup_order(
    boxes: np.ndarray,
    types: list[str] | np.ndarray,
    threshold: float = DEFAULT_OVERLAP_THRESHOLD,
) -> np.ndarray:
    """Indices of surviving blocks in the reference's output order:
    non-exempt survivors first (original relative order), then exempt
    ``ref_text`` blocks."""
    keep = overlap_keep_mask(boxes, types, threshold)
    types = np.asarray(types, dtype=object)
    exempt = types == "ref_text"
    survivors = np.flatnonzero(keep & ~exempt)
    return np.concatenate([survivors, np.flatnonzero(exempt)]).astype(np.int64)
