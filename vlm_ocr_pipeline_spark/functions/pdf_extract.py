"""Minimal PDF text-span extraction + span->block clustering.

The web-text analog of the reference's PDF input path
(pipeline/io/input/pdf.py:193-277 extract_text_spans_from_pdf): binary
payloads sniffed as ``%PDF`` are parsed for uncompressed content-stream
text operators and yield spans ``{text, x0, y0, x1, y1, size, font}``
with top-left-origin integer coords (reference filters empty spans the
same way at pdf.py:237-244).

Supported operator subset (PDF 1.7 spec §9.4, public ISO 32000-1):
``BT/ET`` text objects, ``Tf`` (font + size), ``Td``/``TD`` (relative
line moves), ``Tm`` (absolute matrix), ``T*`` (next line), ``Tj`` and
``TJ`` show-text.  This covers everything the deterministic generator in
``sources/datagen.py`` emits and degrades gracefully (spans skipped) on
anything else.

Span clustering (the PDF "detector", replacing the YOLO models per
SURVEY §2.10): spans -> lines (same baseline within 0.5*size) -> blocks
(vertical gap <= 1.6*size AND horizontal overlap), then title/text
classification by font size vs the page median
(analog of the reference's median line height, layoutreader.py:104-116).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

from .geometry import round_xyxy

PDF_MAGIC = b"%PDF"

# Average glyph advance as a fraction of font size for Helvetica-class
# fonts — used for deterministic span width estimation (no font metrics
# in the payload).
GLYPH_WIDTH_RATIO = 0.5

_STREAM_RE = re.compile(
    rb"(?:(<<[^>]*?>>)\s*)?stream\r?\n(.*?)endstream", re.DOTALL
)
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_MEDIABOX_RE = re.compile(rb"/MediaBox\s*\[\s*([\d.]+)\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)\s*\]")
_TOKEN_RE = re.compile(
    rb"""\((?:[^()\\]|\\.)*\)   # literal string
       | \[ | \]
       | /[A-Za-z0-9]+
       | [-+]?[0-9]*\.?[0-9]+
       | [A-Za-z*']+
    """,
    re.VERBOSE,
)
_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
        b"(": b"(", b")": b")", b"\\": b"\\"}


def _decode_pdf_string(raw: bytes) -> str:
    """Decode a PDF literal string (parens stripped, escapes resolved)."""
    out = bytearray()
    i = 0
    body = raw[1:-1]
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESC:
                out += _ESC[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape
                oct_digits = body[i + 1 : i + 4]
                j = 1
                while j <= 3 and body[i + j : i + j + 1].isdigit():
                    j += 1
                out.append(int(oct_digits[: j - 1], 8) & 0xFF)
                i += j
                continue
        out += c
        i += 1
    return out.decode("latin-1")


def extract_pdf_spans(payload: bytes) -> list[dict[str, Any]]:
    """Parse text spans from a minimal-PDF binary payload.

    Returns spans with top-left-origin coords; empty-text spans are
    dropped (parity with reference pdf.py:237-244).
    """
    if not payload.startswith(PDF_MAGIC):
        return []
    m = _MEDIABOX_RE.search(payload)
    page_h = float(m.group(4)) if m else 792.0

    spans: list[dict[str, Any]] = []
    for sm in _STREAM_RE.finditer(payload):
        obj_dict, stream = sm.group(1), sm.group(2)
        if obj_dict and _FLATE_RE.search(obj_dict):
            # FlateDecode content streams (zlib; PDF spec §7.4.4) —
            # what real-world PDFs actually use
            import zlib

            try:
                stream = zlib.decompress(stream)
            except zlib.error:
                continue  # corrupt stream: skip, keep other streams
        spans.extend(_interpret_stream(stream, page_h))
    return spans


def _interpret_stream(stream: bytes, page_h: float) -> list[dict[str, Any]]:
    spans: list[dict[str, Any]] = []
    # text state
    font, size = "F1", 12.0
    x = y = 0.0          # current text position (PDF space, bottom-left)
    line_x = line_y = 0.0  # start of current line
    leading = 0.0
    in_text = False
    stack: list[Any] = []

    def show(text: str) -> None:
        nonlocal x
        if not text:
            return
        w = GLYPH_WIDTH_RATIO * size * len(text)
        y_top = page_h - y
        spans.append(
            {
                "text": text,
                "x0": x, "y0": y_top - size, "x1": x + w, "y1": y_top,
                "size": size, "font": font,
            }
        )
        x += w

    for tok in _TOKEN_RE.finditer(stream):
        t = tok.group(0)
        if t.startswith(b"("):
            stack.append(_decode_pdf_string(t))
        elif t in (b"[", b"]"):
            continue
        elif t.startswith(b"/"):
            stack.append(t[1:].decode("latin-1"))
        elif t[:1].isdigit() or t[:1] in (b"-", b"+", b"."):
            stack.append(float(t))
        else:
            op = t
            if op == b"BT":
                in_text = True
                x = y = line_x = line_y = 0.0
            elif op == b"ET":
                in_text = False
            elif op == b"Tf" and len(stack) >= 2:
                size = float(stack[-1])
                font = str(stack[-2])
            elif op in (b"Td", b"TD") and len(stack) >= 2 and in_text:
                ty = float(stack[-1])
                tx = float(stack[-2])
                if op == b"TD":
                    leading = -ty
                line_x += tx
                line_y += ty
                x, y = line_x, line_y
            elif op == b"Tm" and len(stack) >= 6 and in_text:
                line_x, line_y = float(stack[-2]), float(stack[-1])
                x, y = line_x, line_y
            elif op == b"T*" and in_text:
                line_y -= leading
                x, y = line_x, line_y
            elif op == b"TL" and len(stack) >= 1:
                leading = float(stack[-1])
            elif op == b"Tj" and stack and isinstance(stack[-1], str) and in_text:
                show(stack[-1])
            elif op == b"TJ" and in_text:
                # concatenated literal strings collected since last op;
                # numeric kerning adjusts x by -adj/1000 * size
                parts = []
                k = len(stack) - 1
                while k >= 0 and isinstance(stack[k], (str, float)):
                    parts.append(stack[k])
                    k -= 1
                for item in reversed(parts):
                    if isinstance(item, str):
                        show(item)
                    else:
                        x -= item / 1000.0 * size
            stack.clear()
    return spans


def spans_to_blocks(spans: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Cluster spans into layout blocks (the PDF-path detect stage).

    1. spans -> lines: same baseline bucket (|y1 - y1'| <= 0.5 * size)
       AND horizontally adjacent (gap <= 2 * size — spans on a shared
       baseline in different columns stay separate lines); span texts
       joined with " " in x order
    2. lines -> size classes: title when size >= 1.5 * page-median size
       (median analog of reference layoutreader.py:104-116)
    3. body lines -> column groups by transitive x-range overlap (the
       multi-column analog, SURVEY O2/O3); columns ordered by x0
    4. within each class/column, lines sorted by y0 merge into a block
       while the vertical gap is <= 1.6 * median size
    Block ``order`` stays None — the XY-cut ordering stage assigns it.
    Coordinates round via banker's rounding (BBox parity).
    """
    if not spans:
        return []
    sizes = np.array([s["size"] for s in spans], dtype=np.float64)
    median_size = float(np.median(sizes))

    order = sorted(range(len(spans)), key=lambda i: (spans[i]["y0"], spans[i]["x0"]))
    lines: list[dict[str, Any]] = []
    for i in order:
        s = spans[i]
        target = None
        for ln in lines:
            same_baseline = abs(ln["y1"] - s["y1"]) <= 0.5 * max(ln["size"], s["size"])
            adjacent = (
                s["x0"] <= ln["x1"] + 2.0 * max(ln["size"], s["size"])
                and ln["x0"] <= s["x1"] + 2.0 * max(ln["size"], s["size"])
            )
            if same_baseline and adjacent:
                target = ln
                break
        if target is None:
            lines.append(
                {"spans": [s], "x0": s["x0"], "y0": s["y0"], "x1": s["x1"],
                 "y1": s["y1"], "size": s["size"]}
            )
        else:
            target["spans"].append(s)
            target["x0"] = min(target["x0"], s["x0"])
            target["y0"] = min(target["y0"], s["y0"])
            target["x1"] = max(target["x1"], s["x1"])
            target["y1"] = max(target["y1"], s["y1"])
            target["size"] = max(target["size"], s["size"])

    for ln in lines:
        ln["spans"].sort(key=lambda s: s["x0"])
        ln["text"] = " ".join(s["text"] for s in ln["spans"])
        ln["is_title"] = ln["size"] >= 1.5 * median_size

    # column groups via transitive x-overlap (titles span the page and
    # would bridge columns, so they group separately)
    def _column_groups(lns: list[dict[str, Any]]) -> list[list[dict[str, Any]]]:
        groups: list[dict[str, Any]] = []
        for ln in sorted(lns, key=lambda l: (l["x0"], l["y0"])):
            hit = None
            for g in groups:
                if min(g["x1"], ln["x1"]) > max(g["x0"], ln["x0"]):
                    hit = g
                    break
            if hit is None:
                groups.append({"x0": ln["x0"], "x1": ln["x1"], "lines": [ln]})
            else:
                hit["lines"].append(ln)
                hit["x0"] = min(hit["x0"], ln["x0"])
                hit["x1"] = max(hit["x1"], ln["x1"])
        groups.sort(key=lambda g: g["x0"])
        return [g["lines"] for g in groups]

    gap = 1.6 * median_size
    blocks: list[dict[str, Any]] = []

    def _merge_run(lns: list[dict[str, Any]], ltype: str) -> None:
        cur: dict[str, Any] | None = None
        for ln in sorted(lns, key=lambda l: (l["y0"], l["x0"])):
            if cur is not None and 0 <= ln["y0"] - cur["y1"] <= gap:
                cur["lines"].append(ln["text"])
                cur["x0"] = min(cur["x0"], ln["x0"])
                cur["x1"] = max(cur["x1"], ln["x1"])
                cur["y1"] = ln["y1"]
            else:
                if cur is not None:
                    blocks.append(cur)
                cur = {"type": ltype, "lines": [ln["text"]], "x0": ln["x0"],
                       "y0": ln["y0"], "x1": ln["x1"], "y1": ln["y1"]}
        if cur is not None:
            blocks.append(cur)

    _merge_run([ln for ln in lines if ln["is_title"]], "title")
    for col_lines in _column_groups([ln for ln in lines if not ln["is_title"]]):
        _merge_run(col_lines, "text")

    out = []
    for b in blocks:
        coords = round_xyxy(np.array([b["x0"], b["y0"], b["x1"], b["y1"]]))
        out.append(
            {
                "type": b["type"],
                "x0": int(coords[0]), "y0": int(coords[1]),
                "x1": int(coords[2]), "y1": int(coords[3]),
                "detection_confidence": 1.0,
                "order": None,  # assigned by the ordering stage (XY-cut)
                "text": "\n".join(b["lines"]),
                "description": None,
            }
        )
    return out
