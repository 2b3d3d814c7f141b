"""Charset sniffing + legacy decode + mojibake repair for raw payloads.

Every decode in the pipeline used to be ``payload.decode("utf-8",
errors="replace")`` — correct for the ~90% of the modern web that is
UTF-8 and silently destructive for the rest: a windows-1252 or
Shift_JIS page becomes U+FFFD soup, which then poisons tokenization,
dedup shingles and quality scores downstream.  A 100 TB crawl cannot
assume UTF-8; browsers don't (WHATWG Encoding spec), and neither do
CCNet-style pipelines (which carry chardet for exactly this).

This module is the codec-free analog: a deterministic, stdlib-only
decode ladder mirroring what a browser does when the transport layer
gives no trustworthy hint (our WARC reader strips HTTP headers at scan
time, and real-crawl Content-Type charset labels are wrong often
enough that the in-payload evidence wins anyway):

1. BOM (UTF-8 / UTF-16 LE-BE / UTF-32 LE-BE) — authoritative.
2. WHATWG-style prescan of the first 1024 bytes for ``<meta
   charset=...>`` / ``<meta http-equiv=Content-Type ...>`` / an XML
   ``encoding=`` declaration, with label normalization per the
   Encoding Standard (latin1/ascii are windows-1252 aliases, gb2312
   decodes as its GBK superset, ...).
3. Strict UTF-8 validation — valid UTF-8 is essentially never
   anything else (the spec's reasoning for utf-8 first-class).
4. windows-1252 fallback (the WHATWG default for unlabeled legacy
   bytes), with the five unmapped bytes replaced.

Plus the ftfy-core mojibake pass for text that was ALREADY decoded
wrongly upstream of us (double-encoded UTF-8 published as such by the
origin server): telltale ``Ã.../â€./Â.`` lead-byte patterns scored by
one shared regex — expressible both as a Python check and as a
JVM-side ``regexp_count`` column so the quality surface can flag
mojibake rates per domain without leaving codegen.

All pure stdlib (``codecs`` ships every codec used here); the hot
path stays Arrow-batched — :func:`decode_payload` is called from the
existing mapInPandas stages, never from a row-at-a-time UDF.
"""

from __future__ import annotations

import codecs
import re

# --------------------------------------------------------------- labels
# WHATWG Encoding Standard label -> Python codec name, restricted to
# labels that actually occur in crawls.  Key rules encoded here:
# - ascii / iso-8859-1 / latin1 are LABELS FOR windows-1252 (the
#   superset browsers decode them as);
# - gb2312 is a label for GBK; euc-jp/shift_jis/big5/euc-kr as usual;
# - iso-8859-9 maps to windows-1254, iso-8859-11 to windows-874.
_LABEL_TO_CODEC: dict[str, str] = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "us-ascii": "cp1252", "ascii": "cp1252", "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252", "latin1": "cp1252", "latin-1": "cp1252",
    "l1": "cp1252", "windows-1252": "cp1252", "cp1252": "cp1252",
    "x-cp1252": "cp1252", "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "windows-1250": "cp1250", "cp1250": "cp1250",
    "windows-1251": "cp1251", "cp1251": "cp1251", "koi8-r": "koi8-r",
    "koi8-u": "koi8-u", "iso-8859-5": "iso8859-5",
    "windows-1253": "cp1253", "iso-8859-7": "iso8859-7",
    "windows-1254": "cp1254", "iso-8859-9": "cp1254", "latin5": "cp1254",
    "windows-1255": "cp1255", "iso-8859-8": "iso8859-8",
    "windows-1256": "cp1256", "iso-8859-6": "iso8859-6",
    "windows-1257": "cp1257", "iso-8859-13": "iso8859-13",
    "iso-8859-4": "iso8859-4", "iso-8859-15": "iso8859-15",
    "latin9": "iso8859-15", "windows-874": "cp874", "tis-620": "cp874",
    "iso-8859-11": "cp874", "windows-1258": "cp1258",
    "gbk": "gbk", "gb2312": "gbk", "x-gbk": "gbk", "gb_2312": "gbk",
    "gb_2312-80": "gbk", "chinese": "gbk", "csgb2312": "gbk",
    "gb18030": "gb18030", "big5": "big5", "big5-hkscs": "big5hkscs",
    "cn-big5": "big5", "x-x-big5": "big5",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis", "ms_kanji": "shift_jis",
    "windows-31j": "cp932", "euc-jp": "euc_jp", "x-euc-jp": "euc_jp",
    "iso-2022-jp": "iso2022_jp", "euc-kr": "euc_kr", "korean": "euc_kr",
    "ks_c_5601-1987": "euc_kr", "csksc56011987": "euc_kr",
    "windows-949": "cp949", "utf-16": "utf-16", "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be", "macintosh": "mac_roman",
    "x-mac-roman": "mac_roman", "ibm866": "cp866", "cp866": "cp866",
}


def resolve_label(label: str | None) -> str | None:
    """Python codec for a charset label, or None when unknown/empty."""
    if not label:
        return None
    codec = _LABEL_TO_CODEC.get(label.strip().strip("'\"").lower())
    if codec is None:
        return None
    try:  # belt+braces: every mapped codec must exist in this stdlib
        codecs.lookup(codec)
    except LookupError:  # pragma: no cover - stdlib always has these
        return None
    return codec


# ------------------------------------------------------------------ BOM
_BOMS: tuple[tuple[bytes, str], ...] = (
    # order matters: UTF-32 BOMs contain the UTF-16 ones as prefixes
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def bom_codec(payload: bytes) -> str | None:
    for bom, codec in _BOMS:
        if payload[: len(bom)] == bom:
            return codec
    return None


# -------------------------------------------------------------- prescan
# WHATWG "prescan the byte stream": look inside the first 1024 bytes
# for a declared charset.  Regexes run on a latin-1 view of the prefix
# (structure bytes are all ASCII in every encoding we accept except
# UTF-16/32, which the BOM step already caught).
_PRESCAN_LIMIT = 1024
_META_CHARSET = re.compile(
    rb"""<meta[^>]{0,200}?charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]+)""",
    re.IGNORECASE | re.DOTALL,
)
_META_HTTP_EQUIV = re.compile(
    rb"""<meta[^>]{0,200}?http-equiv\s*=\s*["']?content-type["']?"""
    rb"""[^>]{0,200}?content\s*=\s*["'][^"']{0,100}?charset=([a-zA-Z0-9._:-]+)""",
    re.IGNORECASE | re.DOTALL,
)
_XML_DECL = re.compile(
    rb"""<\?xml[^>]{0,100}?encoding\s*=\s*["']([a-zA-Z0-9._:-]+)""",
    re.IGNORECASE,
)


def declared_codec(payload: bytes) -> str | None:
    """Charset declared in the document prefix (meta/xml-decl), resolved
    to a Python codec; None when absent or unrecognized."""
    head = payload[:_PRESCAN_LIMIT]
    for pat in (_META_CHARSET, _META_HTTP_EQUIV, _XML_DECL):
        m = pat.search(head)
        if m:
            return resolve_label(m.group(1).decode("ascii", "replace"))
    return None


# --------------------------------------------------------------- decode
def sniff_codec(payload: bytes, declared: str | None = None) -> tuple[str, str]:
    """(codec, evidence) for a payload: evidence is one of
    ``bom | declared | meta | utf-8 | fallback`` — kept as a status
    column so crawl dashboards can see the charset mix per domain."""
    codec = bom_codec(payload)
    if codec:
        return codec, "bom"
    codec = _nul_pattern_codec(payload)
    if codec:
        return codec, "nul-pattern"
    # ISO-2022-JP is pure 7-bit ASCII + ESC shift sequences, so it IS
    # valid UTF-8 — the validity ladder would silently keep the raw
    # escape runs.  The shift sequences themselves (ESC $ B / ESC $ @
    # to JIS X 0208, ESC ( B back to ASCII) never occur in real text,
    # so their presence is decisive.
    if b"\x1b$B" in payload or b"\x1b$@" in payload:
        return "iso2022_jp", "escape-shift"
    hinted = resolve_label(declared)
    if hinted and hinted != "utf-8":
        # non-UTF-8 transport hint: honored only if payload isn't
        # actually valid UTF-8 (mislabeled UTF-8 is the common lie)
        if not _is_utf8(payload):
            return hinted, "declared"
    meta = declared_codec(payload)
    if meta and meta != "utf-8":
        if not _is_utf8(payload):
            return meta, "meta"
    if _is_utf8(payload):
        return "utf-8", "utf-8"
    # Not strictly valid UTF-8 and no usable declaration.  A page
    # that is MOSTLY valid UTF-8 with a few corrupt bytes (truncation,
    # mid-flight damage) must stay UTF-8-with-replacement — decoding
    # it as 1252 turns every multibyte char into mojibake, strictly
    # worse than a few U+FFFDs.  Discriminator: the fraction of
    # high bytes explained by well-formed multibyte sequences.
    high = sum(1 for b in payload if b >= 0x80)
    if high:
        mb_bytes = sum(
            len(m) for m in _UTF8_MB.findall(payload)
        )
        if mb_bytes >= 0.75 * high:
            return "utf-8", "utf-8-lossy"
    return "cp1252", "fallback"


# well-formed UTF-8 multibyte sequences (RFC 3629 table, incl. the
# E0/ED/F0/F4 continuation restrictions)
_UTF8_MB = re.compile(
    rb"[\xC2-\xDF][\x80-\xBF]"
    rb"|\xE0[\xA0-\xBF][\x80-\xBF]|[\xE1-\xEC][\x80-\xBF]{2}"
    rb"|\xED[\x80-\x9F][\x80-\xBF]|[\xEE-\xEF][\x80-\xBF]{2}"
    rb"|\xF0[\x90-\xBF][\x80-\xBF]{2}|[\xF1-\xF3][\x80-\xBF]{3}"
    rb"|\xF4[\x80-\x8F][\x80-\xBF]{2}"
)


def _nul_pattern_codec(payload: bytes) -> str | None:
    """BOM-less UTF-16 detection: mostly-Latin text in UTF-16 puts a
    NUL in every other byte — a pattern no single-byte page and no
    valid UTF-8 text ever shows (which is also why this must run
    BEFORE UTF-8 validation: ``a\\x00b\\x00`` is valid UTF-8).
    Decided on the first 1024 bytes; requires a strong one-sided
    majority so binary junk doesn't trip it."""
    head = payload[: _PRESCAN_LIMIT & ~1]
    if len(head) < 16:
        return None
    pairs = len(head) // 2
    even = sum(1 for i in range(0, len(head), 2) if head[i] == 0)
    odd = sum(1 for i in range(1, len(head), 2) if head[i] == 0)
    if odd > 0.45 * pairs and even < 0.05 * pairs:
        return "utf-16-le"  # low bytes first: NULs in odd positions
    if even > 0.45 * pairs and odd < 0.05 * pairs:
        return "utf-16-be"
    return None


def _is_utf8(payload: bytes) -> bool:
    try:
        payload.decode("utf-8", "strict")
        return True
    except UnicodeDecodeError:
        return False


def decode_payload(
    payload: bytes, declared: str | None = None
) -> tuple[str, str, str]:
    """(text, codec, evidence): the full decode ladder.  Never raises —
    a payload that defeats even the sniffed codec (truncated multibyte
    tail, stray control bytes) decodes with replacement, preserving
    every byte the codec CAN map instead of failing the row."""
    codec, evidence = sniff_codec(payload, declared)
    try:
        return payload.decode(codec, "strict"), codec, evidence
    except (UnicodeDecodeError, ValueError):
        return payload.decode(codec, "replace"), codec, evidence


# ------------------------------------------------------------- mojibake
# UTF-8 bytes misdecoded as windows-1252 leave a fingerprint no real
# text has at rate: a LEAD-byte image (cp1252's rendering of bytes
# C2-DF for 2-byte sequences, E0-EF 3-byte, F0-F4 4-byte) followed by
# the right number of CONTINUATION-byte images (cp1252's rendering of
# 0x80-0xBF).  Build the classes from the codec table itself - no
# hand-typed literals - in the \\x{HHHH} form shared by Java regex
# (Spark) and RE2 (DuckDB): the textnorm.hex_class trick.

# cp1252 bytes 81 8D 8F 90 9D are unmapped; ftfy's "sloppy-1252" maps
# them to the same control codepoints latin-1 would - needed both to
# re-encode a mojibake string whose original UTF-8 bytes hit them and
# to make the continuation class total.
_SLOPPY_EXTRA = {0x81: 0x81, 0x8D: 0x8D, 0x8F: 0x8F, 0x90: 0x90, 0x9D: 0x9D}
_SLOPPY_ENCODE: dict[int, int] = {}
_SLOPPY_DECODE: dict[int, int] = {}
for _b in range(256):
    try:
        _cp = ord(bytes([_b]).decode("cp1252"))
    except UnicodeDecodeError:
        _cp = _SLOPPY_EXTRA[_b]
    _SLOPPY_ENCODE[_cp] = _b
    _SLOPPY_DECODE[_b] = _cp


def _image_class(lo: int, hi: int, hexform: bool) -> str:
    """Regex char-class body of cp1252's images of bytes [lo, hi]."""
    cps = sorted(_SLOPPY_DECODE[b] for b in range(lo, hi + 1))
    if hexform:
        return "".join(f"\\x{{{c:04X}}}" for c in cps)
    import re as _re
    return "".join(_re.escape(chr(c)) for c in cps)


def _mojibake_pattern(hexform: bool) -> str:
    cont = _image_class(0x80, 0xBF, hexform)
    two = _image_class(0xC2, 0xDF, hexform)
    three = _image_class(0xE0, 0xEF, hexform)
    four = _image_class(0xF0, 0xF4, hexform)
    return (
        f"[{two}][{cont}]"
        f"|[{three}][{cont}]{{2}}"
        f"|[{four}][{cont}]{{3}}"
    )


MOJIBAKE_PATTERN = _mojibake_pattern(hexform=True)
_PY_MOJIBAKE = re.compile(_mojibake_pattern(hexform=False))


def py_mojibake_count(text: str) -> int:
    """Number of mojibake fingerprints in the text (Python twin of the
    column expression; used by :func:`fix_mojibake`'s accept test)."""
    return len(_PY_MOJIBAKE.findall(text or ""))


def _sloppy_1252_bytes(text: str) -> bytes | None:
    """Re-encode a str as the windows-1252 bytes it displays as, or
    None when any char is outside cp1252's image (true non-latin text —
    never mojibake, never touch it)."""
    out = bytearray()
    for ch in text:
        b = _SLOPPY_ENCODE.get(ord(ch))
        if b is None:
            return None
        out.append(b)
    return bytes(out)


def fix_mojibake(text: str, max_passes: int = 2) -> str:
    """Undo UTF-8-read-as-windows-1252 damage (the ftfy core move):
    re-encode through sloppy-1252 and strictly re-decode as UTF-8,
    accepting a pass only when it strictly reduces the fingerprint
    count; up to ``max_passes`` rounds handles doubly-encoded text.
    Clean text round-trips unchanged (count 0 short-circuits), so the
    pass is idempotent and safe to run corpus-wide."""
    for _ in range(max_passes):
        before = py_mojibake_count(text)
        if before == 0:
            return text
        raw = _sloppy_1252_bytes(text)
        if raw is None:
            return text
        try:
            candidate = raw.decode("utf-8", "strict")
        except UnicodeDecodeError:
            return text
        if py_mojibake_count(candidate) >= before:
            return text
        text = candidate
    return text


def mojibake_count_col(col):
    """Spark Column: fingerprint count via ``regexp_count`` — JVM-side,
    stays inside codegen.  DuckDB twin: :func:`sql_mojibake_count`."""
    from pyspark.sql import functions as F

    return F.regexp_count(col, F.lit(MOJIBAKE_PATTERN))


def sql_mojibake_count(col: str) -> str:
    """DuckDB expression equal to :func:`mojibake_count_col` (the same
    pattern string compiles in RE2 — \\x{HHHH} classes only)."""
    pat = MOJIBAKE_PATTERN.replace("'", "''")
    return f"length(regexp_extract_all({col}, '{pat}'))"
