"""Figure crop sink (SURVEY S14).

The reference crops each image-type block out of the rendered page
raster and saves it to ``images/page_{num}_block_{idx}_{type}.png``,
setting ``block.image_path`` to that relative path
(/root/reference/pipeline/image_extractor.py:67-153).  A web-text
engine has no raster, so the faithful analog is a BYTE CROP of the
source payload: the ``<img ...>`` tag's byte span, emitted to a side
table keyed (url, warc_ts, block_idx) whose ``image_path`` column uses
the reference's exact naming scheme at the serialization boundary.

Shape for 100 TB: one fused mapInPandas (zero shuffle, same as the
extract stage); rows carry only the tag-sized crops, never the full
payload.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from ..functions import charset, html_extract
from .stages import sniff_kind

# byte-level img-tag matcher.  Image blocks are emitted by the DOM
# detector in source order, but a blind j-th-block-to-j-th-match
# pairing misattributes crops whenever an <img> occurs in a region the
# detector suppresses (noscript/comments/script raw text): pairing
# therefore aligns greedily on the NORMALIZED ALT TEXT — each block
# takes the first remaining match whose alt equals its description,
# falling back to the next unused match — so a suppressed alt-less
# tracker pixel cannot steal a captioned figure's byte span.
_IMG_RE = re.compile(rb"<img\b[^>]*>?", re.IGNORECASE)


def _crop_alt(crop: bytes, codec: str = "utf-8") -> str | None:
    """Alt text of one img-tag crop, normalized exactly like the
    detector's description field (html_extract._emit_img).  ``codec``
    is the PAGE's sniffed charset so the alt text decodes exactly like
    the detector decoded the full page (a fragment carries no meta tag
    to sniff on its own)."""
    from html import unescape

    s = crop.decode(codec, errors="replace")
    m = html_extract._ALT_RE.search(s)
    if not m:
        return None
    alt = m.group(2) or m.group(3) or m.group(4) or ""
    if "&" in alt:
        alt = unescape(alt)
    return html_extract._WS.sub(" ", alt).strip() or None

CROP_SCHEMA = (
    "url string, warc_ts timestamp, block_idx int, block_type string, "
    "image_path string, crop binary, byte_start long, byte_end long, "
    "description string"
)


def image_path_for(page_num: int, block_idx: int, block_type: str) -> str:
    """Reference filename scheme (image_extractor.py:99-101):
    images/page_<num>_block_<idx>_<type>.png with spaces underscored."""
    t = block_type.replace(" ", "_").lower()
    return f"images/page_{page_num}_block_{block_idx}_{t}.png"


def figure_crop_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for url, ts, payload in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
        if sniff_kind(payload) != "html":
            continue  # PDF-path blocks are text spans; nothing to crop
        try:
            text, codec, _ = charset.decode_payload(payload)
            page = html_extract.extract_html_page(text)
        except Exception:
            continue
        blocks = page["blocks"]
        img_positions = [
            (i, b) for i, b in enumerate(blocks) if b.get("type") == "image"
        ]
        matches = list(_IMG_RE.finditer(payload))
        alts = [_crop_alt(payload[m.start() : m.end()], codec) for m in matches]
        used = [False] * len(matches)
        cursor = 0
        for bi, b in img_positions:
            desc = b.get("description")
            pick = None
            # alt-equality pass, two tiers: prefer an unused alt match
            # AT/AFTER the cursor (blocks and tags share DOM order, so
            # the in-order match is the right one when alts repeat —
            # e.g. a suppressed nav logo and the real logo sharing alt
            # text), then fall back to an unused alt match ANYWHERE
            # (an alt match earlier than the cursor must still bind
            # when nothing ahead matches).  Only REAL alt texts
            # participate — a None description matching a None alt is
            # no signal and would bind a suppressed alt-less tracker
            # pixel from anywhere in the page.
            if desc is not None:
                for j in list(range(cursor, len(matches))) + list(range(cursor)):
                    if not used[j] and alts[j] == desc:
                        pick = j
                        break
            if pick is None:  # no alt match anywhere: next unused in order
                for j in range(cursor, len(matches)):
                    if not used[j]:
                        pick = j
                        break
            if pick is None:
                # tags exhausted (detector emitted more image blocks
                # than raw <img> tags): a null-crop row keeps the block
                # visible instead of silently dropping the remainder
                rows.append(
                    {
                        "url": url,
                        "warc_ts": ts,
                        "block_idx": bi,
                        "block_type": "image",
                        "image_path": image_path_for(0, bi, "image"),
                        "crop": None,
                        "byte_start": None,
                        "byte_end": None,
                        "description": desc,
                    }
                )
                continue
            used[pick] = True
            cursor = max(cursor, pick + 1)
            m = matches[pick]
            rows.append(
                {
                    "url": url,
                    "warc_ts": ts,
                    "block_idx": bi,
                    "block_type": "image",
                    "image_path": image_path_for(0, bi, "image"),
                    "crop": payload[m.start() : m.end()],
                    "byte_start": m.start(),
                    "byte_end": m.end(),
                    "description": b.get("description"),
                }
            )
    cols = [c.split()[0] for c in CROP_SCHEMA.split(", ")]
    return pd.DataFrame(rows, columns=cols)


def extract_figure_crops(pages: DataFrame) -> DataFrame:
    """Side table of figure byte-crops for every HTML page — key
    (url, warc_ts, block_idx), ``image_path`` in reference naming."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield figure_crop_batch(b)

    return pages.select("url", "warc_ts", "html").mapInPandas(
        gen, schema=CROP_SCHEMA
    )
