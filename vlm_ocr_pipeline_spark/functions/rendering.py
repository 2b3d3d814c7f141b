"""Block -> markdown / plaintext composition kernels.

These produce the byte-identical ``text`` invariant, so every spacing
and prefix rule is pinned to the reference:

- per-block markdown formatting   pipeline/io/output/markdown/__init__.py:88-225
- markdown document composition   markdown/__init__.py:228-312 (ranked sort,
  unranked appended; blank line inserted before header types on type
  change; ``"\\n\\n".join(lines).strip()``)
- RenderingStage markdown         pipeline/stages/rendering_stage.py:63-132
  (NOTE: renders each block through a singleton list, so the
  inter-type blank-line rule NEVER fires on this path — reproduced)
- RenderingStage plaintext        rendering_stage.py:134-211 ("[TITLE] ",
  list bullet coercion with the SHORT tuple ("-","*","1.","2.","3."),
  image blocks via [IMAGE:]/[FIGURE DESCRIPTION]/[FIGURE] parts)
- compose_page_text               pipeline/layout/ordering/analyzer.py:15-54
  (text-like only, key (order|inf, y0, x0), strip, join "\\n\\n")
- blocks_to_plaintext             pipeline/io/output/plaintext.py:14-71
  (the MIXED tuple key whose 2nd slot switches meaning with order
  presence — ported exactly)

A block is a plain dict with keys: type, x0, y0, x1, y1, text,
corrected_text, order, image_path, description (missing keys = None).
"""

from __future__ import annotations

from typing import Any

Block = dict[str, Any]

_HEADER_LEVELS = {
    "title": 1, "heading": 1, "section_header": 1,
    "subtitle": 2, "subsection_header": 2, "section_title": 2,
    "subheading": 3,
}

# list coercion guards differ between renderers — deliberate
_MD_LIST_PREFIXES = ("-", "*", "1.", "2.", "3.", "4.", "5.", "6.", "7.", "8.", "9.")
_PLAIN_LIST_PREFIXES = ("-", "*", "1.", "2.", "3.")

_SPACED_HEADER_TYPES = {"title", "heading", "section_header", "subtitle"}


def _block_text(b: Block) -> str:
    return b.get("corrected_text") or b.get("text") or ""


def block_to_markdown(b: Block) -> str:
    """Per-block markdown (markdown/__init__.py:88-225), byte-exact."""
    t = (b.get("type") or "").lower()
    text = _block_text(b)
    if not text:
        return ""

    level = _HEADER_LEVELS.get(t)
    if level is not None:
        return "#" * level + " " + text

    if t in ("text", "plain text"):
        return text
    if t in ("list", "list_item"):
        return text if text.startswith(_MD_LIST_PREFIXES) else f"- {text}"
    if t in ("table", "table_body"):
        return text if "|" in text else f"**Table:**\n\n{text}"
    if t == "table_caption":
        return f"**Table:** {text}"
    if t in ("table_footnote", "image_footnote", "phonetic", "aside_text", "page_footnote"):
        return f"*{text}*"
    if t in ("figure", "image", "image_body", "image_caption", "figure_caption"):
        return f"**Figure:** {text}"
    if t in ("equation", "interline_equation", "isolate_formula"):
        return text if text.startswith(("$$", "$")) else f"$${text}$$"
    if t == "inline_equation":
        return text if text.startswith("$") and text.endswith("$") else f"${text}$"
    if t == "formula_caption":
        return f"*Formula: {text}*"
    if t in ("code", "code_body", "algorithm"):
        if text.startswith("```") and text.endswith("```"):
            return text
        return f"```\n{text}\n```"
    if t == "code_caption":
        return f"**Code:** {text}"
    if t in ("header", "footer", "page_number", "discarded", "abandon"):
        return ""
    if t in ("ref_text", "index"):
        return text
    return text


def rank_sort(blocks: list[Block]) -> list[Block]:
    """Ranked blocks sorted by ``order`` (stable), unranked appended in
    original order; all-unranked input returned untouched
    (markdown/__init__.py:269-277, rendering_stage.py:213-231)."""
    ranked = [b for b in blocks if b.get("order") is not None]
    if not ranked:
        return list(blocks)
    ranked.sort(key=lambda b: b["order"])
    return ranked + [b for b in blocks if b.get("order") is None]


def blocks_to_markdown(blocks: list[Block]) -> str:
    """Document-level markdown WITH the inter-type header spacing rule
    (markdown/__init__.py:279-312)."""
    lines: list[str] = []
    prev_type: str | None = None
    for b in rank_sort(blocks):
        md = block_to_markdown(b)
        if not md:
            continue
        cur = (b.get("type") or "").lower()
        if prev_type is not None and cur != prev_type and cur in _SPACED_HEADER_TYPES:
            lines.append("")
        lines.append(md)
        prev_type = cur
    return "\n\n".join(lines).strip()


# image_render_mode values (rendering_stage.py:27-42)
IMAGE_RENDER_MODES = ("image_only", "image_and_description", "description_only")


def _render_image_markdown(b: Block, mode: str = "image_and_description") -> str:
    """rendering_stage.py:105-132."""
    parts: list[str] = []
    if mode in ("image_only", "image_and_description") and b.get("image_path"):
        alt = (b.get("description") or "")[:50] or "Figure"
        parts.append(f"![{alt}]({b['image_path']})")
    if mode in ("description_only", "image_and_description"):
        if b.get("description"):
            parts.append(f"**Figure:**\n\n{b['description']}")
        elif not b.get("image_path") and b.get("text"):
            parts.append(f"**Figure:**\n\n{b['text']}")
    return "\n\n".join(parts)


def render_markdown(blocks: list[Block], image_render_mode: str = "image_and_description") -> str:
    """RenderingStage markdown (rendering_stage.py:63-103): per-block
    singleton rendering means no header-spacing blank lines."""
    lines: list[str] = []
    for b in rank_sort(blocks):
        t = (b.get("type") or "").lower()
        if t in ("image", "image_body", "figure", "chart"):
            rendered = _render_image_markdown(b, image_render_mode)
        else:
            rendered = block_to_markdown(b)
        if rendered:
            lines.append(rendered)
    return "\n\n".join(lines).strip()


def _render_image_plaintext(b: Block, mode: str = "image_and_description") -> str:
    """rendering_stage.py:187-211."""
    parts: list[str] = []
    if mode in ("image_only", "image_and_description") and b.get("image_path"):
        parts.append(f"[IMAGE: {b['image_path']}]")
    if mode in ("description_only", "image_and_description"):
        if b.get("description"):
            parts.append(f"[FIGURE DESCRIPTION] {b['description']}")
        elif not b.get("image_path") and b.get("text"):
            parts.append(f"[FIGURE] {b['text']}")
    return "\n".join(parts)


def render_plaintext(blocks: list[Block], image_render_mode: str = "image_and_description") -> str:
    """RenderingStage plaintext (rendering_stage.py:134-185)."""
    lines: list[str] = []
    for b in rank_sort(blocks):
        t = (b.get("type") or "").lower()
        if t in ("image", "image_body", "figure", "chart"):
            rendered = _render_image_plaintext(b, image_render_mode)
        else:
            text = _block_text(b)
            if t == "title":
                rendered = f"[TITLE] {text}"
            elif t in ("list", "list_item") and not text.startswith(_PLAIN_LIST_PREFIXES):
                rendered = f"- {text}"
            else:
                rendered = text
        if rendered:
            lines.append(rendered)
    return "\n\n".join(lines).strip()


_TEXT_LIKE = {"plain text", "text", "title", "list"}


def compose_page_text(blocks: list[Block]) -> str:
    """Raw page text from text-like blocks (analyzer.py:15-54).

    Key is (order|+inf, y0, x0); blocks without truthy ``text`` are
    dropped BEFORE sorting; each kept text is stripped."""
    kept = [b for b in blocks if (b.get("type") in _TEXT_LIKE) and b.get("text")]
    if not kept:
        return ""

    def key(b: Block):
        o = b.get("order")
        return (float(o) if o is not None else float("inf"), b["y0"], b["x0"])

    texts = []
    for b in sorted(kept, key=key):
        s = (b.get("text") or "").strip()
        if s:
            texts.append(s)
    return "\n\n".join(texts)


def blocks_to_plaintext(blocks: list[Block]) -> str:
    """plaintext.py:14-71 with its mixed-meaning tuple key: when ANY
    block has an order, slot 2 is ``order`` for ranked items but ``y``
    for unranked ones — ported verbatim because fixtures depend on it."""
    items: list[tuple[int, int, str, Any]] = []
    for b in blocks:
        if b.get("type") not in _TEXT_LIKE:
            continue
        tv = b.get("text")
        if tv and tv.strip():
            items.append((b["y0"], b["x0"], tv.strip(), b.get("order")))
    if not items:
        return ""
    if any(it[3] is not None for it in items):
        items.sort(
            key=lambda it: (
                0 if it[3] is not None else 1,
                it[3] if it[3] is not None else it[0],
                it[0],
                it[1],
            )
        )
    else:
        items.sort(key=lambda it: (it[0], it[1]))
    return "\n\n".join(it[2] for it in items)


# --------------------------------------------------------------------
# pymupdf4llm-style renderer: header levels from matched span font sizes
# (reference io/output/markdown/pymupdf4llm.py:133-267, byte-exact)
def _block_markdown_with_font(
    b: Block,
    spans: list[dict[str, Any]],
    span_boxes,
    levels: dict[float, int],
    iou_threshold: float,
) -> str:
    """pymupdf4llm.py:134-188 block_to_markdown_with_font."""
    from .spanmatch import match_block_with_spans

    btype = (b.get("type") or "").lower()
    text = b.get("corrected_text") or b.get("text") or ""
    if not text:
        return ""
    idx = match_block_with_spans(
        [b["x0"], b["y0"], b["x1"], b["y1"]], span_boxes, iou_threshold
    )
    size = spans[idx].get("size") if idx is not None else None
    level = levels.get(size) if size is not None else None
    if level is not None:
        return "#" * level + " " + text
    if btype in ("list", "list_item"):
        if not text.startswith(("-", "*")):
            return f"- {text}"
        return text
    if btype == "table":
        if "|" in text:
            return text
        return f"**Table:**\n\n{text}"
    if btype in ("figure", "image"):
        return f"**Figure:** {text}"
    if btype == "equation":
        if text.startswith(("$$", "$")):
            return text
        return f"$${text}$$"
    return text


def render_markdown_pymupdf4llm(
    blocks: list[Block],
    spans: list[dict[str, Any]],
    iou_threshold: float = 0.3,
) -> str:
    """Markdown with REAL header levels: each block is IoU-matched
    (threshold 0.3) to its best text span; the top-3 distinct span font
    sizes >= 12 pt map to #/##/### (pymupdf4llm.py:191-267).

    Composition quirks preserved byte-exactly: reading-order sort only
    happens when at least one block is ranked (unranked append last);
    consecutive headers get an extra blank line element, which under the
    '\\n\\n' join renders as a 4-newline gap."""
    import numpy as np

    from .spanmatch import font_size_header_levels

    font_sizes = [s.get("size") for s in spans if s.get("size")]
    levels = font_size_header_levels(font_sizes) if font_sizes else {}
    span_boxes = np.array(
        [[s["x0"], s["y0"], s["x1"], s["y1"]] for s in spans], dtype=np.float64
    ).reshape(-1, 4)
    ranked = [b for b in blocks if b.get("order") is not None]
    unranked = [b for b in blocks if b.get("order") is None]
    if ranked:
        sorted_blocks = sorted(ranked, key=lambda b: b["order"]) + unranked
    else:
        sorted_blocks = list(blocks)
    lines: list[str] = []
    prev_was_header = False
    for b in sorted_blocks:
        md = _block_markdown_with_font(b, spans, span_boxes, levels, iou_threshold)
        if not md:
            continue
        is_header = md.strip().startswith("#")
        if is_header and prev_was_header:
            lines.append("")
        lines.append(md)
        prev_was_header = is_header
    return "\n\n".join(lines).strip()
