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


def correction_ratio(original: str, corrected: str) -> float:
    """1 - similarity ratio; 0.0 means identical.

    Identical strings short-circuit (SequenceMatcher.ratio() is exactly
    1.0 there) — the dominant case since the reference's active block
    correction is a copy, and difflib is ~70% of pipeline CPU without
    this guard.
    """
    if original == corrected:
        return 0.0
    return 1.0 - SequenceMatcher(None, original, corrected).ratio()


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
