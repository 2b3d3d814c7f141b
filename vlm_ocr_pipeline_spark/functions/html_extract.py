"""HTML -> layout-block detection kernel (the web-text "detector").

Replaces the reference's ML layout detectors (SURVEY §2.10) with a
deterministic DOM front-end: an html.parser-based tokenizer + tree
builder feeding readability/trafilatura-style text-density and
link-density boilerplate heuristics (public-domain technique; see
Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features", WSDM 2010).

Output block schema matches the unified Block model (SURVEY §1.1):
``{type, x0, y0, x1, y1, detection_confidence, order, text}`` where the
4 int slots pack DOM geometry — x0=depth, y0=document-order index,
x1=depth+1, y1=index+1 — so the generic geometric fallback sort
(y0, x0) reproduces DOM order and ALL downstream ordering/rendering
operators work unchanged on both the HTML and PDF paths.

Reading order is assigned at detect time (order = emission index), the
same contract as the reference's PP-DocLayoutV2 detector
(pipeline/layout/detection/paddleocr/doclayout_v2.py:216-225).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Any

from .block_types import map_type

# tags whose entire subtree is ignored
_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe",
              "button", "select", "option", "form", "input", "textarea"}
# tags that emit one block from their (non-block-child) text; table
# subtrees aggregate into ONE table block with cell/row markers
_BLOCK_TAGS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre",
               "blockquote", "figcaption", "table", "dt", "dd"}
_CELL_MARK = "\x01"
_ROW_MARK = "\x02"
# container tags that mark boilerplate context for all descendants
_BOILER_CONTEXT = {"nav", "aside", "header", "footer"}
# void elements that never close
_VOID = {"br", "img", "hr", "meta", "link", "input", "area", "base", "col",
         "embed", "source", "track", "wbr"}

_WS = re.compile(r"\s+")

# Boilerplate thresholds (resolved constants, analog of the reference's
# plan-time config resolution, SURVEY §4.9).  Values follow the classic
# boilerpipe density rules.
LINK_DENSITY_MAX = 0.333333
MIN_BLOCK_CHARS = 3
SHORT_LINKY_CHARS = 40
SHORT_LINKY_DENSITY = 0.2


class _Node:
    __slots__ = ("tag", "depth", "parents", "text_parts", "link_chars", "n_descendant_tags")

    def __init__(self, tag: str, depth: int, parents: tuple[str, ...]):
        self.tag = tag
        self.depth = depth
        self.parents = parents
        self.text_parts: list[str] = []
        self.link_chars = 0
        self.n_descendant_tags = 0


class _DomBlocker(HTMLParser):
    """Single-pass tokenizer that emits flat block records in DOM order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self.skip_depth = 0
        self.boiler_depth = 0
        self.anchor_depth = 0
        self.pre_depth = 0
        self.open_blocks: list[_Node] = []
        self.blocks: list[dict[str, Any]] = []
        self.title_parts: list[str] = []
        self.in_title = False

    # -- tag events ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID:
            if tag == "img" and not self.skip_depth:
                alt = dict(attrs).get("alt") or ""
                self._emit_img(alt)
            return
        self.stack.append(tag)
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
        if tag in _BOILER_CONTEXT:
            self.boiler_depth += 1
        if tag == "a":
            self.anchor_depth += 1
        if tag == "pre":
            self.pre_depth += 1
        if tag == "title":
            self.in_title = True
        if self.open_blocks:
            self.open_blocks[-1].n_descendant_tags += 1
            if self.open_blocks[-1].tag == "table":
                if tag in ("td", "th"):
                    self.open_blocks[-1].text_parts.append(_CELL_MARK)
                elif tag == "tr":
                    self.open_blocks[-1].text_parts.append(_ROW_MARK)
        if tag in _BLOCK_TAGS and not self.skip_depth:
            self.open_blocks.append(
                _Node(tag, len(self.stack) - 1, tuple(self.stack[:-1]))
            )

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID:
            return
        # pop to the matching open tag (tolerates misnesting)
        if tag in self.stack:
            while self.stack:
                popped = self.stack.pop()
                if popped in _SKIP_TAGS:
                    self.skip_depth -= 1
                if popped in _BOILER_CONTEXT:
                    self.boiler_depth -= 1
                if popped == "a":
                    self.anchor_depth -= 1
                if popped == "pre":
                    self.pre_depth -= 1
                if popped == "title":
                    self.in_title = False
                if (
                    self.open_blocks
                    and popped in _BLOCK_TAGS
                    and self.open_blocks[-1].tag == popped
                    and self.open_blocks[-1].depth == len(self.stack)
                ):
                    self._emit(self.open_blocks.pop())
                if popped == tag:
                    break

    def handle_data(self, data: str) -> None:
        if self.skip_depth:
            return
        if self.in_title:
            self.title_parts.append(data)
            return
        if not self.open_blocks:
            return
        node = self.open_blocks[-1]
        node.text_parts.append(data)
        if self.anchor_depth:
            node.link_chars += len(_WS.sub(" ", data).strip())

    # -- block emission --------------------------------------------
    def _emit_img(self, alt: str) -> None:
        i = len(self.blocks)
        self.blocks.append(
            {
                "type": "image",
                "x0": len(self.stack), "y0": i,
                "x1": len(self.stack) + 1, "y1": i + 1,
                "detection_confidence": 1.0,
                "order": i,
                "text": None,
                "description": _WS.sub(" ", alt).strip() or None,
                "boiler_ctx": self.boiler_depth > 0,
                "tag": "img",
            }
        )

    def _emit(self, node: _Node) -> None:
        raw = "".join(node.text_parts)
        if node.tag == "pre":
            text = raw.strip("\n")
        elif node.tag == "table":
            lines = []
            for row in raw.split(_ROW_MARK):
                cells = [_WS.sub(" ", c).strip() for c in row.split(_CELL_MARK)]
                cells = [c for c in cells if c]
                if cells:
                    lines.append(" | ".join(cells))
            text = "\n".join(lines)
        else:
            text = _WS.sub(" ", raw).strip()
        if not text:
            return
        i = len(self.blocks)
        self.blocks.append(
            {
                "type": node.tag,
                "x0": node.depth, "y0": i,
                "x1": node.depth + 1, "y1": i + 1,
                "detection_confidence": 1.0,
                "order": i,
                "text": text,
                "description": None,
                "link_chars": node.link_chars,
                "boiler_ctx": self.boiler_depth > 0
                or any(p in _BOILER_CONTEXT for p in node.parents),
                "tag": node.tag,
            }
        )


def detect_html_blocks(html: str) -> list[dict[str, Any]]:
    """Tokenize HTML and return candidate blocks in DOM order.

    Types are still raw tags at this point; classification + type
    normalization happens in :func:`classify_blocks`.
    """
    p = _DomBlocker()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # malformed input: keep whatever was emitted before the error
        pass
    return p.blocks


# ------------------------------------------------------------------
# fast scanner: a compiled-regex tokenizer that drives the SAME
# _DomBlocker event handlers as html.parser (~3x faster on the parse
# loop). html.parser remains the reference implementation; equivalence
# is pinned by tests/test_html_extract.py::test_fast_scanner_equivalence
# over the golden corpus + adversarial snippets.
# ------------------------------------------------------------------
# CLEAN-tag grammar only: a simple name and well-formed
# whitespace-separated attributes (value optionally quoted, unquoted
# values may contain but not start with quotes — mirroring
# attrfind_tolerant's value rule), optional adjacent self-close.
# Anything outside this shape falls back to stdlib html.parser mid-
# document, so junk regions get byte-exact stdlib semantics while the
# overwhelmingly common clean tags stay on the fast path.
_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)"
    r"((?:\s+[^\s/>=]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|(?!['\"])[^>\s]*))?)*)"
    r"\s*(/>|>)"
)
_ALT_RE = re.compile(r"""\balt\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]*))""", re.IGNORECASE)
# raw-text elements whose content must not be tokenized (html.parser's
# CDATA_CONTENT_ELEMENTS — textarea is merely skipped, not raw, so both
# tokenizers stay event-equivalent)
_RAW_TEXT = {"script", "style"}
# stdlib html.parser set_cdata_mode terminator: '</' + optional ws +
# name + optional ws + '>' matched CASE-INSENSITIVELY — a plain
# case-sensitive find('</script') diverges on e.g. an early '</SCRIPT>'
# followed by a later lowercase one (it would swallow the intervening
# content)
_RAW_END = {name: re.compile(rf"</\s*{name}\s*>", re.IGNORECASE) for name in _RAW_TEXT}
_unescape = __import__("html").unescape


def _fast_feed(blocker: "_DomBlocker", doc: str) -> None:
    """Drive blocker events from a regex scan (no per-char state
    machine).  Data is entity-unescaped like convert_charrefs=True."""
    i, n = 0, len(doc)
    find = doc.find
    emit = blocker.handle_data
    while i < n:
        lt = find("<", i)
        if lt == -1:
            data = doc[i:]
            if data:
                emit(_unescape(data) if "&" in data else data)
            return
        if lt > i:
            data = doc[i:lt]
            emit(_unescape(data) if "&" in data else data)
        nxt = doc[lt + 1 : lt + 2]
        if nxt == "!":
            if doc.startswith("<!--", lt):
                end = find("-->", lt + 4)
                if end == -1:  # unterminated comment: stdlib EOF recovery
                    blocker.feed(doc[lt:])
                    blocker.close()
                    return
                i = end + 3
            else:  # doctype / CDATA-ish
                end = find(">", lt)
                if end == -1:
                    blocker.feed(doc[lt:])
                    blocker.close()
                    return
                i = end + 1
            continue
        if nxt == "?":
            end = find(">", lt)
            if end == -1:
                blocker.feed(doc[lt:])
                blocker.close()
                return
            i = end + 1
            continue
        m = _TAG_RE.match(doc, lt)
        if m is None:
            if nxt.isalpha() or nxt == "/":
                # malformed construct (unterminated quote etc.): hand
                # the REST of the document to the stdlib parser driving
                # the same blocker — exact-equivalence slow path for the
                # rare junk region
                blocker.feed(doc[lt:])
                blocker.close()
                return
            emit("<")  # stray '<' before non-tag text
            i = lt + 1
            continue
        closing, name, attrs = m.group(1), m.group(2).lower(), m.group(3)
        self_closed = m.group(4) == "/>"
        i = m.end()
        if closing:
            blocker.handle_endtag(name)
            continue
        if name == "img":
            am = _ALT_RE.search(attrs)
            alt = None
            if am:
                alt = am.group(2) or am.group(3) or am.group(4) or ""
                if "&" in alt:
                    alt = _unescape(alt)
            blocker.handle_starttag("img", [("alt", alt)] if alt is not None else [])
            continue
        blocker.handle_starttag(name, [])
        if self_closed and name not in _VOID:
            # self-closed non-void element: emit the matching end event
            blocker.handle_endtag(name)
            continue
        if name in _RAW_TEXT:
            # skip raw content up to the real closing tag, matched with
            # the stdlib's own cdata-mode regex for exact equivalence
            m2 = _RAW_END[name].search(doc, i)
            blocker.handle_endtag(name)
            if m2 is None:
                return
            i = m2.end()


def fast_detect_html_blocks(html: str) -> "_DomBlocker":
    p = _DomBlocker()
    try:
        _fast_feed(p, html)
    except Exception:
        pass
    return p


def classify_blocks(blocks: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Apply link-density / length boilerplate heuristics and normalize
    tag labels to the canonical block vocabulary.

    A block is marked ``discarded`` (and therefore stripped by every
    renderer) when:
    - it sits inside nav/header/footer/aside context, or
    - link density > 1/3, or
    - it is shorter than SHORT_LINKY_CHARS chars with link density >
      SHORT_LINKY_DENSITY, or
    - it is shorter than MIN_BLOCK_CHARS.
    Table cells are kept only via their table (cells inherit the rule).
    """
    out = []
    for b in blocks:
        b = dict(b)
        tag = b.pop("tag")
        link_chars = b.pop("link_chars", 0)
        boiler_ctx = b.pop("boiler_ctx", False)
        text = b.get("text") or ""
        n = len(text)
        density = (link_chars / n) if n else 0.0
        if tag == "img":
            b["type"] = "image"
            if boiler_ctx:
                b["type"] = "discarded"
            out.append(b)
            continue
        is_boiler = (
            boiler_ctx
            or density > LINK_DENSITY_MAX
            or (n < SHORT_LINKY_CHARS and density > SHORT_LINKY_DENSITY)
            or n < MIN_BLOCK_CHARS
        )
        b["type"] = "discarded" if is_boiler else map_type(tag, "dom")
        out.append(b)
    return out


def extract_html_page(html: str, fast: bool = True) -> dict[str, Any]:
    """Full HTML detect step for one page: blocks + page title.

    ``fast`` uses the regex scanner (default; ~3x quicker tokenize);
    ``fast=False`` runs stdlib html.parser — the reference
    implementation the scanner is equivalence-tested against.
    """
    if fast:
        p = fast_detect_html_blocks(html)
    else:
        p = _DomBlocker()
        try:
            p.feed(html)
            p.close()
        except Exception:
            pass
    blocks = classify_blocks(p.blocks)
    title = _WS.sub(" ", "".join(p.title_parts)).strip() or None
    return {"blocks": blocks, "title": title}
