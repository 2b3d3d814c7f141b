"""Deterministic synthetic Common-Crawl-style page generation.

Two generators, both seeded per page index (content is identical for a
given index regardless of partitioning, so golden fixtures are stable):

- :func:`synth_pages` — distributed generation of a mixed HTML/PDF
  pages table at arbitrary scale (bench + scaling runs).  The ``text``
  column carries the EXPECTED byte-exact plaintext extraction, computed
  from the raw content pieces *before* they are wrapped in
  HTML/PDF — so golden verification is a join + string equality, not a
  re-run of the kernels.
- :func:`pages_from_documents` — wraps the driver-provided
  ``documents`` table into HTML pages whose extraction result is a pure
  SQL expression over ``documents`` (the DuckDB oracle for the
  end-to-end pipeline in ``__spark_entry__.py``).

Host-domain skew is generated on purpose: ~30%% of pages share one hot
domain (``hot.example.com``) so the salted repartition path is actually
exercised (north_rule).
"""

from __future__ import annotations

import html as html_mod
from collections.abc import Iterator
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .. import schema

BASE_TS = datetime(2025, 1, 1)

_WORDS = (
    "data spark shuffle partition column batch arrow vector page crawl "
    "extract content boiler nav main text block order render title body "
    "stream join filter agg window salt skew broadcast codegen plan scan "
    "parquet iceberg checkpoint resume lineage metric byte ident fixture"
).split()

_NAV_LINKS = ["Home", "About", "Archive", "Contact", "Privacy", "Search",
              "Login", "Subscribe"]

PARA_SPACING = 36  # pt between paragraphs in PDFs (> merge gap -> new block)
LINE_SPACING = 15  # pt within a paragraph (< merge gap -> same block)
BODY_SIZE = 12
TITLE_SIZE = 24


# ------------------------------------------------------------ content
def _words_for(rng: np.random.Generator, n: int) -> list[str]:
    return [_WORDS[i] for i in rng.integers(0, len(_WORDS), size=n)]


def page_content(idx: int) -> dict:
    """Deterministic content pieces for page ``idx``.

    HTML pages mix in the FIXTURES.md §1 coverage set: lists, tables,
    code blocks, figures with captions, a linky comments section
    (must be stripped), and occasional empty pages."""
    rng = np.random.default_rng(idx + 1_000_003)
    n_paras = int(rng.integers(2, 6))
    paras = [
        " ".join(_words_for(rng, int(rng.integers(25, 70)))) for _ in range(n_paras)
    ]
    kind = "pdf" if idx % 10 < 3 else "html"  # ~30% PDF payloads
    domain = "hot.example.com" if idx % 10 < 3 else f"site{idx % 997}.example.org"
    is_html = kind == "html"
    empty = is_html and idx % 31 == 17
    w = paras[0].split()
    return {
        "title": f"Page {idx} overview",
        "paras": [] if empty else paras,
        "kind": kind,
        "empty": empty,
        "url": f"https://{domain}/p/{idx}",
        "two_col": kind == "pdf" and idx % 3 == 0,
        "with_list": is_html and not empty and idx % 4 == 0,
        "list_items": [f"item {j} {w[j % 5]}" for j in range(3)],
        "with_table": is_html and not empty and idx % 5 == 1,
        "table_rows": [("metric", "value"), (w[0], w[1]), (w[2], w[3])],
        "with_code": is_html and not empty and idx % 6 == 2,
        "code": f"def f_{idx}(x):\n    return x * {idx % 7}",
        "with_figure": is_html and not empty and idx % 7 == 3,
        "figure_alt": f"chart of {w[0]}",
        "figure_caption": f"Figure {idx % 9}: {w[1]} over {w[2]} and more words",
    }


def expected_plaintext(c: dict) -> str:
    """What the pipeline must produce for this page, computed from the
    content pieces only (never from the kernels)."""
    if c.get("empty"):
        return ""
    parts = [f"[TITLE] {c['title']}"]
    parts.extend(c["paras"])
    if c.get("with_list"):
        parts.extend(f"- {it}" for it in c["list_items"])
    if c.get("with_table"):
        parts.append("\n".join(" | ".join(r) for r in c["table_rows"]))
    if c.get("with_code"):
        parts.append(c["code"])
    if c.get("with_figure"):
        parts.append(f"[FIGURE DESCRIPTION] {c['figure_alt']}")
        parts.append(c["figure_caption"])
    return "\n\n".join(parts)


# --------------------------------------------------------------- HTML
def wrap_html(
    title: str,
    paras: list[str],
    list_items: list[str] | None = None,
    table_rows: list[tuple[str, str]] | None = None,
    code: str | None = None,
    figure: tuple[str, str] | None = None,  # (alt, caption)
    empty: bool = False,
) -> str:
    esc = html_mod.escape
    nav = "".join(f'<li><a href="/{x.lower()}">{x}</a></li>' for x in _NAV_LINKS)
    paras_html = "\n".join(f"<p>{esc(p)}</p>" for p in paras)
    list_html = ""
    if list_items:
        list_html = "<ul>" + "".join(f"<li>{esc(x)}</li>" for x in list_items) + "</ul>"
    table_html = ""
    if table_rows:
        rows = "".join(
            "<tr>" + "".join(f"<td>{esc(c)}</td>" for c in r) + "</tr>"
            for r in table_rows
        )
        table_html = f"<table>{rows}</table>"
    code_html = f"<pre>{esc(code)}</pre>" if code else ""
    figure_html = ""
    if figure:
        alt, caption = figure
        figure_html = (
            f'<figure><img src="fig.png" alt="{esc(alt)}">'
            f"<figcaption>{esc(caption)}</figcaption></figure>"
        )
    # a comments section: short, link-heavy rows the extractor must strip
    comments = (
        '<div class="comments">'
        '<p><a href="/u/1">user1</a> nice</p>'
        '<p><a href="/u/2">user2</a> +1 <a href="/reply">reply</a></p>'
        "</div>"
    )
    article = "" if empty else f"""<h1>{esc(title)}</h1>
{paras_html}
{list_html}
{table_html}
{code_html}
{figure_html}"""
    return f"""<!DOCTYPE html>
<html lang="en"><head><title>{esc(title)} — Example Site</title>
<style>body {{margin: 0}}</style><script>var x = 1;</script></head>
<body>
<header><p>Example Site banner</p></header>
<nav><ul>{nav}</ul></nav>
<aside><p><a href="/rel1">Related one</a> <a href="/rel2">Related two</a></p></aside>
<main><article>
{article}
</article></main>
{comments}
<footer><p>&copy; 2026 Example Site — <a href="/terms">Terms</a></p></footer>
</body></html>"""


# ---------------------------------------------------------------- PDF
def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _wrap_text(text: str, width_chars: int, hyphenate: bool) -> list[str]:
    """Word wrap; when ``hyphenate`` split the first long-enough word
    across lines with a trailing hyphen (de-hyphenation test input)."""
    lines: list[str] = []
    cur: list[str] = []
    cur_len = 0
    did_hyphen = False
    for w in text.split(" "):
        if hyphenate and not did_hyphen and len(w) >= 6 and cur_len + len(w) + 1 > width_chars and cur:
            head, tail = w[:3], w[3:]
            cur.append(head + "-")
            lines.append(" ".join(cur))
            cur, cur_len = [tail], len(tail)
            did_hyphen = True
            continue
        if cur and cur_len + len(w) + 1 > width_chars:
            lines.append(" ".join(cur))
            cur, cur_len = [w], len(w)
        else:
            cur.append(w)
            cur_len += len(w) + (1 if cur_len else 0)
    if cur:
        lines.append(" ".join(cur))
    return lines


def build_pdf(
    title: str, paras: list[str], two_col: bool, hyphenate: bool,
    compress: bool = False,
) -> bytes:
    """Emit a minimal, spec-conformant PDF whose content stream uses only
    the Tm/Tf/Tj subset the parser in functions/pdf_extract.py handles;
    ``compress`` FlateDecodes the content stream like real-world PDFs."""
    page_w, page_h = 612, 792
    ops: list[str] = ["BT", f"/F1 {TITLE_SIZE} Tf",
                      f"1 0 0 1 72 {page_h - 72} Tm",
                      f"({_pdf_escape(title)}) Tj",
                      f"/F1 {BODY_SIZE} Tf"]
    y_start = page_h - 72 - 48
    if two_col:
        # one paragraph per column, both anchored at y_start: the body
        # y-band stays continuous, so XY-cut reads left column then
        # right — the reading order the expected text assumes
        layout = [(para, [72, 320][min(ci, 1)], 30) for ci, para in enumerate(paras[:2])]
        anchored = True
    else:
        layout = [(para, 72, 78) for para in paras]
        anchored = False
    y = y_start
    for pi, (para, x, width_chars) in enumerate(layout):
        if anchored:
            y = y_start
        lines = _wrap_text(para, width_chars, hyphenate and pi == 0)
        for line in lines:
            ops.append(f"1 0 0 1 {x} {y} Tm")
            ops.append(f"({_pdf_escape(line)}) Tj")
            y -= LINE_SPACING
        y -= PARA_SPACING - LINE_SPACING
    ops.append("ET")
    stream = "\n".join(ops).encode("latin-1")
    if compress:
        import zlib

        stream = zlib.compress(stream)
        contents = (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(stream), stream)
        )
    else:
        contents = b"<< /Length %d >>\nstream\n%s\nendstream" % (
            len(stream) + 1, stream,
        )

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
        ),
        contents,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def expected_pdf_plaintext(c: dict) -> str:
    """Expected extraction for a generated PDF: title block + one block
    per paragraph (wrap + span-merge round-trips each paragraph to its
    original single-spaced string); two-column pages carry exactly one
    paragraph per column."""
    paras = c["paras"][:2] if c["two_col"] else c["paras"]
    return "\n\n".join([f"[TITLE] {c['title']}"] + paras)


def html_for_content(c: dict) -> str:
    """wrap_html invocation for a page_content dict."""
    return wrap_html(
        c["title"],
        c["paras"],
        c["list_items"] if c.get("with_list") else None,
        c["table_rows"] if c.get("with_table") else None,
        c["code"] if c.get("with_code") else None,
        (c["figure_alt"], c["figure_caption"]) if c.get("with_figure") else None,
        empty=c.get("empty", False),
    )


# ------------------------------------------------------------- driver
def _gen_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        rows = []
        for idx in b["id"]:
            idx = int(idx)
            c = page_content(idx)
            if c["kind"] == "pdf":
                payload = build_pdf(
                    c["title"], c["paras"], c["two_col"], hyphenate=True,
                    compress=idx % 2 == 0,  # half the PDFs FlateDecode
                )
                expected = expected_pdf_plaintext(c)
            else:
                payload = html_for_content(c).encode("utf-8")
                expected = expected_plaintext(c)
            rows.append(
                {
                    "url": c["url"],
                    "warc_ts": BASE_TS + timedelta(seconds=idx),
                    "html": payload,
                    "text": expected,
                    "lang": "en",
                }
            )
        yield pd.DataFrame(rows)


def synth_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table of ``n`` pages."""
    partitions = partitions or spark.sparkContext.defaultParallelism
    rng = spark.range(0, n, 1, partitions)
    return rng.mapInPandas(_gen_batch, schema=schema.PAGES_SCHEMA)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap the driver's ``documents`` table into HTML pages.

    The extraction result is then a pure SQL transform of ``documents``
    (see __spark_entry__.oracle_sql): title block ``Doc {doc_id}`` +
    one paragraph = whitespace-collapsed ``text``.
    """
    from ..partitioning import spread_narrow

    docs = spread_narrow(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, text in zip(b["doc_id"], b["text"]):
                rows.append(
                    {
                        "url": f"https://docs.example.org/doc/{int(doc_id)}",
                        "warc_ts": BASE_TS + timedelta(seconds=int(doc_id)),
                        "html": wrap_html(f"Doc {int(doc_id)}", [text]).encode("utf-8"),
                        "text": None,
                        "lang": "en",
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(gen, schema=schema.PAGES_SCHEMA)


def figure_pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap the driver's ``documents`` table into HTML pages that carry
    ONE figure (img + figcaption) with doc-derived alt/caption.

    Used by the figure-crop driver query: the wrap is the fixed
    wrap_html template around four holes (title twice, escaped text
    once, alt twice, caption once), so the img tag's byte span and
    bytes are reconstructible in pure SQL (octet_length of the filled
    prefix) — the same template-oracle trick as extract_dedup.
    """
    from ..partitioning import spread_narrow

    docs = spread_narrow(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, text in zip(b["doc_id"], b["text"]):
                doc_id = int(doc_id)
                rows.append(
                    {
                        "url": f"https://docs.example.org/fig/{doc_id}",
                        "warc_ts": BASE_TS + timedelta(seconds=doc_id),
                        "html": wrap_html(
                            f"Doc {doc_id}",
                            [text],
                            figure=(
                                f"Figure {doc_id} diagram",
                                f"Caption {doc_id}",
                            ),
                        ).encode("utf-8"),
                        "text": None,
                        "lang": "en",
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(gen, schema=schema.PAGES_SCHEMA)


def pdf_pages_from_documents(
    spark: SparkSession, sf_dir: str, max_chars: int = 60
) -> DataFrame:
    """Wrap the driver's ``documents`` table into single-body-line PDF
    pages (body = first ``max_chars`` chars of the whitespace-collapsed
    text, short enough to stay one wrapped line).

    One line per block means every block IoU-matches its span, so the
    font-header markdown is a pure SQL transform of ``documents``:
    ``rtrim('# Doc ' || doc_id || 4 newlines || '## ' || substr(...))``
    (title span 24 pt -> level 1, body 12 pt -> level 2, consecutive
    headers get the renderer's extra blank element).
    """
    import re

    from ..partitioning import spread_narrow

    docs = spread_narrow(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, text in zip(b["doc_id"], b["text"]):
                doc_id = int(doc_id)
                body = re.sub(r"\s+", " ", text).strip()[:max_chars]
                rows.append(
                    {
                        "url": f"https://docs.example.org/pdf/{doc_id}",
                        "warc_ts": BASE_TS + timedelta(seconds=doc_id),
                        "html": build_pdf(
                            f"Doc {doc_id}", [body], two_col=False,
                            hyphenate=False, compress=doc_id % 2 == 0,
                        ),
                        "text": None,
                        "lang": "en",
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(gen, schema=schema.PAGES_SCHEMA)
