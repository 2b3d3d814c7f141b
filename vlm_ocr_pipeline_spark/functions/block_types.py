"""Canonical block-type vocabulary + detector-vocab normalization.

Parity: pipeline/types/block.py:18-186 in the reference. The canonical
set is the MinerU-2.5-style vocabulary; each detector front-end maps its
own labels into it via a static table (``map_type`` falls back to the
raw label when unknown — same as block.py:167-186).

In the Spark rebuild the maps become broadcast literals inside the
detect stage (SURVEY §2.2 P6); they're plain dicts here so both the
pandas kernels and the Spark ``F.create_map`` construction share one
definition.
"""

from __future__ import annotations

TEXT = "text"
TITLE = "title"
IMAGE = "image"
TABLE = "table"
LIST = "list"
HEADER = "header"
FOOTER = "footer"
PAGE_NUMBER = "page_number"
REF_TEXT = "ref_text"
DISCARDED = "discarded"
CODE = "code"
INTERLINE_EQUATION = "interline_equation"

CANONICAL_TYPES: frozenset[str] = frozenset(
    {
        "text", "title",
        "image", "image_body", "image_caption", "image_footnote",
        "table", "table_body", "table_caption", "table_footnote",
        "equation", "interline_equation", "inline_equation",
        "code", "code_body", "code_caption", "algorithm",
        "list",
        "header", "footer", "page_number", "page_footnote",
        "ref_text", "phonetic", "aside_text", "index",
        "discarded", "abandon",
        # legacy aliases kept for fixture parity (block.py:71-77)
        "plain text", "figure", "isolate_formula", "formula_caption",
        "figure_caption", "list_item",
    }
)

# Text-like types used for page-text composition
# (analyzer.py:32-33, plaintext.py:43-48)
TEXT_LIKE_TYPES: frozenset[str] = frozenset({"plain text", "text", "title", "list"})

# Image-like types that get special render treatment
# (rendering_stage.py:97,168)
IMAGE_LIKE_TYPES: frozenset[str] = frozenset({"image", "image_body", "figure", "chart"})

# Detector-vocabulary normalization tables (block.py:80-165).  The HTML
# front-end ("dom") is ours: semantic HTML tags -> canonical types.
DETECTOR_TYPE_MAPS: dict[str, dict[str, str]] = {
    "doclayout-yolo": {
        "title": "title", "plain text": "text", "text": "text",
        "figure": "image", "image": "image", "table": "table",
        "equation": "interline_equation", "list": "list", "list_item": "list",
    },
    "mineru-doclayout-yolo": {
        "title": "title", "plain text": "text", "abandon": "discarded",
        "figure": "image", "figure_caption": "image_caption",
        "table": "table", "table_caption": "table_caption",
        "table_footnote": "table_footnote",
        "isolate_formula": "interline_equation",
        "formula_caption": "image_caption",
    },
    "mineru-vlm": {
        "text": "text", "title": "title", "image": "image",
        "image_body": "image_body", "image_caption": "image_caption",
        "image_footnote": "image_footnote", "table": "table",
        "table_body": "table_body", "table_caption": "table_caption",
        "table_footnote": "table_footnote",
        "interline_equation": "interline_equation",
        "inline_equation": "inline_equation",
        "code": "code", "code_body": "code_body",
        "code_caption": "code_caption", "algorithm": "algorithm",
        "list": "list", "header": "header", "footer": "footer",
        "page_number": "page_number", "page_footnote": "page_footnote",
        "ref_text": "ref_text", "phonetic": "phonetic",
        "aside_text": "aside_text", "index": "index",
        "discarded": "discarded",
    },
    "olmocr-vlm": {
        "text": "text",
    },
    "paddleocr-doclayout-v2": {
        "doc_title": "title", "paragraph_title": "title", "text": "text",
        "sidebar_text": "aside_text", "page_number": "page_number",
        "header": "header", "footer": "footer",
        "header_image": "header", "footer_image": "footer",
        "abstract": "text", "contents": "text",
        "reference": "ref_text", "reference_content": "ref_text",
        "footnote": "page_footnote", "formula": "interline_equation",
        "formula_number": "interline_equation", "algorithm": "algorithm",
        "image": "image", "table": "table", "table_title": "table_caption",
        "chart": "image", "chart_title": "image_caption", "seal": "image",
    },
    # Our HTML/DOM front-end: tag-derived labels -> canonical types
    "dom": {
        "h1": "title", "h2": "title", "h3": "title",
        "h4": "title", "h5": "title", "h6": "title",
        "p": "text", "li": "list", "pre": "code", "code": "code",
        "table": "table", "blockquote": "text", "figcaption": "image_caption",
        "img": "image", "figure": "image",
        "nav": "discarded", "aside": "aside_text",
        "header": "header", "footer": "footer",
    },
}


def map_type(label: str, detector: str) -> str:
    """Normalize a detector label to the canonical vocabulary; unknown
    labels pass through unchanged (block.py:183-186)."""
    table = DETECTOR_TYPE_MAPS.get(detector)
    if table is None:
        return label
    return table.get(label.lower(), label)
