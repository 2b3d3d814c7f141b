"""Text-correction kernels.

- ``correction_ratio`` — 1 - difflib.SequenceMatcher(None, a, b).ratio()
  (reference: pipeline/recognition/api/openai.py:447-450 and both gemini
  clients — identical expression in all three).
- ``copy_correct`` — the reference's *active* block-correction semantics
  are a passthrough copy text -> corrected_text
  (pipeline/stages/block_correction_stage.py:42-47); kept as the default.
- ``span_merge_correct`` — our deterministic analog of VLM page
  correction for the web-text payload (SURVEY §2.10): de-hyphenation at
  line breaks, then intra-line whitespace collapse.  Paragraph breaks
  (blank lines) are preserved.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

_DEHYPHEN = re.compile(r"(\w)-\n(\w)", re.UNICODE)
_INTRA_WS = re.compile(r"[ \t\f\v]+")
_SOFT_BREAK = re.compile(r"(?<!\n)\n(?!\n)")
_MANY_BLANK = re.compile(r"\n{3,}")


def _difflib_total_match(a: str, b: str) -> int:
    """Total matched characters exactly as
    ``SequenceMatcher(None, a, b)`` computes them (autojunk semantics
    included), vectorized.

    difflib with no junk function and autojunk on does, per recursion
    window: a sparse diagonal-run DP over the positions of RARE b
    characters only (chars occurring > len(b)//100 + 1 times are
    'popular' when len(b) >= 200 and excluded), picks the first longest
    run in (i, j) scan order, then greedily extends it over ANY equal
    characters.  Runs are global diagonal structures, so they are
    computed ONCE here and only clipped per window — the
    char-at-a-time dict DP difflib re-runs per window (~2 ms per PDF
    page, ~70% of extraction CPU before the identical-string guard)
    becomes a few numpy masks.  Differential-tested against stdlib
    difflib in tests/test_correction.py."""
    import numpy as np

    la, lb = len(a), len(b)
    if not la or not lb:
        return 0
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    av = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    # b2j over rare chars (autojunk): counts > len(b)//100 + 1 are
    # popular and never participate in the DP (only in extensions)
    codes, counts = np.unique(bv, return_counts=True)
    if lb >= 200:
        keep = counts <= lb // 100 + 1
        codes = codes[keep]
    # j-positions of every rare b char, grouped by char: stable argsort
    # keeps each char's positions ascending, matching difflib's b2j
    order = np.argsort(bv, kind="stable").astype(np.int64)
    b_sorted = bv[order]
    starts = np.searchsorted(b_sorted, av)
    ends = np.searchsorted(b_sorted, av, side="right")
    if len(codes) < len(counts):  # popular chars: no DP participation
        rare_pos = np.searchsorted(codes, av)
        rare_pos[rare_pos == len(codes)] = 0
        is_rare = codes[rare_pos] == av if len(codes) else np.zeros(la, bool)
        starts = np.where(is_rare, starts, 0)
        ends = np.where(is_rare, ends, 0)
    lens = ends - starts
    empty = np.array([], dtype=np.int64)
    total_s = int(lens.sum())
    if total_s == 0:
        s_i = s_j = empty
    else:
        s_i = np.repeat(np.arange(la, dtype=np.int64), lens)
        cum = np.zeros(la, dtype=np.int64)
        np.cumsum(lens[:-1], out=cum[1:])
        gather = (
            np.arange(total_s, dtype=np.int64)
            - np.repeat(cum, lens)
            + np.repeat(starts, lens)
        )
        s_j = order[gather]
    # global diagonal runs: cells sorted by (diagonal, i); a run breaks
    # where the diagonal changes or i is not consecutive
    if len(s_i):
        d = s_j - s_i
        o = np.lexsort((s_i, d))
        s_i, s_j, d = s_i[o], s_j[o], d[o]
        brk = np.ones(len(s_i), dtype=bool)
        brk[1:] = (d[1:] != d[:-1]) | (s_i[1:] != s_i[:-1] + 1)
        run_id = np.cumsum(brk) - 1
        run_start = np.zeros(len(s_i), dtype=np.int64)
        run_start[brk] = np.arange(len(s_i), dtype=np.int64)[brk]
        run_start = np.maximum.accumulate(run_start)
        kg = np.arange(len(s_i), dtype=np.int64) - run_start + 1
    else:
        kg = empty

    # second view of S sorted by i: a window selects its i-range by
    # binary search, so post-split windows only touch their own cells
    if len(s_i):
        by_i = np.argsort(s_i, kind="stable")
        si_sorted = s_i[by_i]

    total = 0
    queue = [(0, la, 0, lb)]
    while queue:
        alo, ahi, blo, bhi = queue.pop()
        besti, bestj, bestsize = alo, blo, 0
        found = False
        if len(s_i):
            lo = np.searchsorted(si_sorted, alo)
            hi = np.searchsorted(si_sorted, ahi)
            sel = by_i[lo:hi]
            wi, wj, wk = s_i[sel], s_j[sel], kg[sel]
            m = (wj >= blo) & (wj < bhi)
            found = m.any()
        if found:
            wi, wj, wk = wi[m], wj[m], wk[m]
            wk = np.minimum(wk, np.minimum(wi - alo + 1, wj - blo + 1))
            kmax = int(wk.max())
            cand = wk == kmax
            ci = wi[cand]
            cj = wj[cand]
            first = np.lexsort((cj, ci))[0]
            i_end, j_end = int(ci[first]), int(cj[first])
            besti, bestj, bestsize = (
                i_end - kmax + 1,
                j_end - kmax + 1,
                kmax,
            )
        # greedy extension over any equal chars (difflib's non-junk
        # while loops; the junk loops are no-ops with no isjunk fn)
        while (
            besti > alo
            and bestj > blo
            and a[besti - 1] == b[bestj - 1]
        ):
            besti, bestj, bestsize = besti - 1, bestj - 1, bestsize + 1
        while (
            besti + bestsize < ahi
            and bestj + bestsize < bhi
            and a[besti + bestsize] == b[bestj + bestsize]
        ):
            bestsize += 1
        if bestsize:
            total += bestsize
            if alo < besti and blo < bestj:
                queue.append((alo, besti, blo, bestj))
            if besti + bestsize < ahi and bestj + bestsize < bhi:
                queue.append((besti + bestsize, ahi, bestj + bestsize, bhi))
    return total


def correction_ratio(original: str, corrected: str) -> float:
    """1 - similarity ratio; 0.0 means identical.

    Identical strings short-circuit (SequenceMatcher.ratio() is exactly
    1.0 there) — the dominant case since the reference's active block
    correction is a copy.  Differing strings use the vectorized
    :func:`_difflib_total_match` (bit-identical to SequenceMatcher's
    ratio; the 2M/T division below is the same float expression)."""
    if original == corrected:
        return 0.0
    m = _difflib_total_match(original, corrected)
    t = len(original) + len(corrected)
    if not t:
        return 0.0
    return 1.0 - 2.0 * m / t


def copy_correct(text: str) -> str:
    """Reference block-correction placeholder: identity."""
    return text


def span_merge_correct(text: str) -> str:
    """Deterministic page-correction analog.

    1. join hyphenated line-break splits:  ``exam-\\nple`` -> ``example``
    2. soft line breaks (single \\n) -> single space
    3. collapse runs of spaces/tabs -> one space; trim line ends
    4. collapse 3+ newlines -> exactly one blank line
    """
    t = _DEHYPHEN.sub(r"\1\2", text)
    t = _SOFT_BREAK.sub(" ", t)
    t = _INTRA_WS.sub(" ", t)
    t = "\n".join(line.strip() for line in t.split("\n"))
    t = _MANY_BLANK.sub("\n\n", t)
    return t.strip()
