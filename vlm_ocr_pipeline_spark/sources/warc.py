"""WARC source: read Common-Crawl-style WARC files into the pages
table shape (url, warc_ts, html, text, lang).

WARC (ISO 28500 / WARC 1.0) is the archive format the input-table
pages originate from, so an engine claiming the crawl-extraction
surface needs the ingestion edge too.  Only deterministic parsing —
no network, no external libs:

- record grammar: ``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<Content-Length
  bytes>\\r\\n\\r\\n`` — records are walked by Content-Length (never by
  regex splitting, which corrupts on binary payloads containing the
  magic).
- ``response`` records carry an HTTP message; the page payload is the
  bytes after the HTTP header terminator.  Other record types
  (request, metadata, warcinfo, ...) are skipped.
- gzip: real WARCs are concatenated per-record gzip members; a
  leading ``1f 8b`` triggers member-by-member decompression
  (zlib decompressobj loop), which handles both whole-file gzip and
  member-per-record layouts.

Scale shape: ``spark.read.format("binaryFile")`` gives one task per
WARC file (WARC is not block-splittable without a sidecar index —
the same per-file parallelism Common Crawl jobs use: thousands of
~1 GB files, not splits within one).  Parsing runs in ``mapInPandas``
over the file bytes; emitted rows carry only url/ts/payload, never
the raw archive.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schema

_CRLF2 = b"\r\n\r\n"


_GZ_CHUNK = 1 << 20


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the standard WARC layout:
    one member per record).

    Streams bounded chunks through each decompressobj — feeding the
    whole remaining tail per member would copy O(file) bytes per
    member, O(n^2) total on a 1 GB archive with tens of thousands of
    members.  A corrupt member (or trailing junk) ends decompression
    and yields the intact prefix, mirroring the truncated-plain-WARC
    behavior: one bad record must not kill a whole ingestion task.
    """
    out = []
    view = memoryview(data)
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            while not d.eof and pos < n:
                chunk = view[pos : pos + _GZ_CHUNK]
                pos += len(chunk)
                out.append(d.decompress(chunk))
            out.append(d.flush())
        except zlib.error:
            break  # corrupt member: return the complete prefix
        if not d.eof:
            break  # truncated final member
        # bytes fed past this member's end belong to the next member
        pos -= len(d.unused_data)
    return b"".join(out)


def _parse_warc_ts(value: str) -> datetime | None:
    """WARC-Date is ISO-8601 Zulu (2026-01-16T12:00:00Z)."""
    try:
        return (
            datetime.fromisoformat(value.replace("Z", "+00:00"))
            .astimezone(timezone.utc)
            .replace(tzinfo=None)
        )
    except ValueError:
        return None


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, block_bytes) for each WARC record, walking by
    Content-Length.  Malformed trailing bytes end iteration (a
    truncated archive yields its complete prefix records)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            break  # desynchronized: stop rather than guess
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            if k:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + len(_CRLF2)
        if body_start + clen > n:
            break  # truncated record
        yield headers, data[body_start : body_start + clen]
        pos = body_start + clen


def http_payload(block: bytes) -> bytes:
    """Payload of an HTTP response message: bytes after the header
    terminator (the whole block when no HTTP headers are present)."""
    i = block.find(_CRLF2)
    return block[i + len(_CRLF2) :] if i >= 0 else block


def pages_from_warc_bytes(data: bytes) -> list[dict]:
    """Response-record pages from one WARC file's bytes."""
    rows = []
    for headers, block in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        rows.append(
            {
                "url": url,
                "warc_ts": _parse_warc_ts(headers.get("warc-date", "")),
                "html": http_payload(block),
                "text": None,
                "lang": None,
            }
        )
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Pages DataFrame from a directory/glob of .warc / .warc.gz files
    (one task per file; see module docstring for why)."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for b in batches:
            rows = []
            for data in b["content"]:
                rows.extend(pages_from_warc_bytes(bytes(data)))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(gen, schema=schema.PAGES_SCHEMA)


# ------------------------------------------------------------ writer
def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize (url, warc_ts, payload[, warc_type, http_headers])
    dicts as a WARC 1.0 byte stream — the test/fixture twin of
    :func:`iter_warc_records`."""
    import gzip as _gzip

    out = []
    for r in records:
        wtype = r.get("warc_type", "response")
        http = r.get(
            "http_headers", b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
        )
        body = http + _CRLF2 + r["payload"] if wtype == "response" else r["payload"]
        ts = r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        rec = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {wtype}\r\n".encode()
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"WARC-Date: {ts}\r\n".encode()
            + f"Content-Length: {len(body)}".encode()
            + _CRLF2
            + body
            + b"\r\n\r\n"
        )
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)


def fetch_warc_records(
    index: DataFrame, warc_dir: str
) -> DataFrame:
    """Selective record fetch: read ONLY the records a capture index
    points at, by (filename, offset, length) — the standard
    Common-Crawl access pattern (cc-index -> range request into the
    archive), and the complement of :func:`read_warc`'s full scan.

    ``index``: any frame with string ``filename`` and numeric
    ``offset`` / ``length`` columns (:func:`~vlm_ocr_pipeline_spark.
    sources.cdxj.read_cdxj` output qualifies directly).  ``offset``
    addresses the record's gzip member (or the raw record in a plain
    .warc), ``length`` its byte span — exactly what CDXJ carries.

    Scale shape: the index rows hash-partition by ``filename`` so one
    task owns each archive and reads its picks in ascending-offset
    order through one handle (sequential-ish I/O, one open per file
    per task); only the indexed byte ranges are read — a 1000-record
    pick out of a 100 TB archive set reads ~1000 x ~50 KB, never the
    archives.  On object storage the open/seek/read maps onto ranged
    GETs the same way.  Rows whose file is missing or whose range is
    corrupt are skipped (a stale index entry must not kill the fetch).

    Output: the PAGES schema (url, warc_ts, html, text, lang) — feeds
    ``plans.pipeline.extract`` directly, like :func:`read_warc`.
    """
    import os as _os

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for b in batches:
            rows = []
            order = b.sort_values(["filename", "offset"])
            handle = None
            handle_name = None
            for fn, off, ln in zip(
                order["filename"], order["offset"], order["length"]
            ):
                if fn is None or off is None or ln is None:
                    continue
                path = _os.path.join(warc_dir, str(fn))
                try:
                    if handle_name != path:
                        if handle is not None:
                            handle.close()
                        handle = open(path, "rb")
                        handle_name = path
                    handle.seek(int(off))
                    raw = handle.read(int(ln))
                except OSError:
                    handle, handle_name = None, None
                    continue  # stale index entry / missing archive
                rows.extend(pages_from_warc_bytes(raw))
            if handle is not None:
                handle.close()
            yield pd.DataFrame(rows, columns=cols)

    sel = index.select(
        F.col("filename").cast("string").alias("filename"),
        F.col("offset").cast("long").alias("offset"),
        F.col("length").cast("long").alias("length"),
    )
    return sel.repartition("filename").mapInPandas(
        gen, schema=schema.PAGES_SCHEMA
    )
