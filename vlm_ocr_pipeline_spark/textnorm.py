"""Shared text-normalization + tokenization expressions.

Two distinct canonical forms, used by every operator:

- :func:`normalize_text` — whitespace-collapsed trimmed text: the
  CONTENT IDENTITY (exact-dedup hash key, fingerprints).  Never
  script-aware: two byte-identical documents must stay identical.
- :func:`tokenized_text` / :func:`words` — the TOKEN STREAM: the
  normalized text with every no-whitespace-script character (CJK
  ideographs, kana, hangul, Thai clusters) spaced out as its own
  token.  Whitespace-only splitting turns a Chinese document into ONE
  "word", silently degenerating shingles, MinHash/SimHash, token
  counts, tf-idf, repetition stats and BPE pre-tokenization on a large
  fraction of any real crawl; per-character tokens (the mBERT / CCNet
  fallback for unsegmented scripts) restore all of them, and word
  n-gram shingles over char tokens become the standard char n-grams.

Every operator that tokenizes MUST use these, and the DuckDB oracles
all mirror the exact same expressions via :func:`sql_tokenized` /
``SQL_COLLAPSE`` — a second, subtly different tokenizer copy silently
diverges operators from each other and from the oracles.  The regex
stays inside the Java-regex / RE2 common subset (``\\x{HHHH}`` class
escapes work in both) so one pattern string serves Spark and DuckDB;
only the replacement syntax differs (``$1`` vs ``\\1``).

:func:`py_words` is the same tokenizer for driver/executor Python code
(BPE apply, classifier features) — one definition, three dialects.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, functions as F

# Unicode ranges of scripts written WITHOUT inter-word whitespace,
# (start, end) inclusive.  Each character (plus, for Thai, its
# combining vowel/tone marks) becomes one token.
NOSPACE_RANGES: tuple[tuple[int, int], ...] = (
    (0x0E01, 0x0E4E),  # Thai letters + vowels/tones (see marks below)
    (0x3041, 0x309F),  # Hiragana
    (0x30A0, 0x30FF),  # Katakana
    (0x3400, 0x4DBF),  # CJK Extension A
    (0x4E00, 0x9FFF),  # CJK Unified Ideographs
    (0xAC00, 0xD7A3),  # Hangul syllables
    (0xF900, 0xFAFF),  # CJK Compatibility Ideographs
)

# Thai combining marks must stay glued to their base consonant — a
# token atom is one no-space char plus any run of these.
_THAI_MARK_RANGES: tuple[tuple[int, int], ...] = (
    (0x0E31, 0x0E31),  # mai han-akat
    (0x0E34, 0x0E3A),  # above/below vowels
    (0x0E47, 0x0E4E),  # tone marks + thanthakhat/nikhahit/yamakkan
)


def hex_class(ranges: tuple[tuple[int, int], ...]) -> str:
    """Character-class body in the ``\\x{HHHH}`` escape form shared by
    Java regex (Spark) and RE2 (DuckDB)."""
    return "".join(
        f"\\x{{{a:04X}}}" if a == b else f"\\x{{{a:04X}}}-\\x{{{b:04X}}}"
        for a, b in ranges
    )


def _chr_class(ranges: tuple[tuple[int, int], ...]) -> str:
    """Same class body with literal characters (Python ``re``)."""
    return "".join(
        chr(a) if a == b else f"{chr(a)}-{chr(b)}" for a, b in ranges
    )


# one token atom: a no-space-script char + its combining marks.  The
# SAME pattern string compiles in Java regex and RE2.
TOKEN_ATOM = (
    f"([{hex_class(NOSPACE_RANGES)}][{hex_class(_THAI_MARK_RANGES)}]*)"
)
# cheap probe: does the text contain ANY no-space-script char?  Gates
# the spacing rewrite so Latin-only documents (the overwhelming bulk
# of most crawls) pay one extra regex SCAN, never a string rebuild —
# measured: ungated, the rewrite added ~80% to the shingle-family
# dedup queries on an all-ASCII corpus
NOSPACE_PROBE = f"[{hex_class(NOSPACE_RANGES)}]"
_PY_TOKEN_ATOM = _re.compile(
    f"([{_chr_class(NOSPACE_RANGES)}][{_chr_class(_THAI_MARK_RANGES)}]*)"
)

# DuckDB twin of tokenized_text(); col must be a column name or SQL
# expression.  RE2 rewrite syntax is \1 (Java's is $1) — the only
# place the two dialects differ.
SQL_COLLAPSE = r"trim(regexp_replace({col}, '\s+', ' ', 'g'))"


def sql_tokenized(col: str = "text") -> str:
    """The DuckDB expression equal to ``tokenized_text(col)``."""
    spaced = f"regexp_replace({col}, '{TOKEN_ATOM}', ' \\1 ', 'g')"
    return (
        f"CASE WHEN regexp_matches({col}, '{NOSPACE_PROBE}') "
        f"THEN {SQL_COLLAPSE.format(col=spaced)} "
        f"ELSE {SQL_COLLAPSE.format(col=col)} END"
    )


def normalize_text(text: Column) -> Column:
    """Whitespace-collapsed, trimmed text (the canonical CONTENT key —
    exact dedup, fingerprints).  Not script-aware by design."""
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def tokenized_text(text: Column) -> Column:
    """The canonical TOKEN STREAM: no-space-script chars spaced out as
    single-char tokens (Thai marks glued to their base), then
    whitespace-collapsed.  Equal to :func:`normalize_text` on text with
    no such characters — including the empty string — so all existing
    Latin-script behavior is unchanged; the ``NOSPACE_PROBE`` gate
    makes that fast path also SKIP the rewrite entirely."""
    spaced = F.regexp_replace(text, TOKEN_ATOM, " $1 ")
    return F.when(
        text.rlike(NOSPACE_PROBE),
        F.trim(F.regexp_replace(spaced, r"\s+", " ")),
    ).otherwise(normalize_text(text))


def words(text: Column) -> Column:
    """Token array of the text: whitespace words, with no-space-script
    runs contributing one token per character cluster."""
    return F.split(tokenized_text(text), " ")


def py_words(text: str) -> list[str]:
    """Python twin of :func:`words` for driver/executor code (BPE
    apply, classifier features).  ``str.split()`` with no argument
    collapses whitespace exactly like the column expression; the only
    divergence is the empty string ([] here vs [''] in SQL), which no
    Python consumer counts."""
    return _PY_TOKEN_ATOM.sub(r" \1 ", text or "").split()


def shingles_of(w: Column, n: int) -> Column:
    """Word n-gram shingle array over an ALREADY-MATERIALIZED words
    column.  Operators should project :func:`words` into its own
    column in a separate select and build shingles from that column —
    this expression references ``w`` three times (two size guards + the
    slice), and inlined words() would tokenize the text three times per
    row (CollapseProject re-inlines only cheap single-use aliases, so
    the two-select shape is safe; measured ~30% on the MinHash
    front-end at sf0.1).

    Short-document guard: Spark's sequence(1, 0) is the DESCENDING
    [1, 0] (implicit step -1) whose 0 index crashes slice() — where
    DuckDB's generate_series(1, 0) is empty.  Docs with < n words yield
    no shingles on either engine.  Over no-space scripts the word
    tokens are characters, so these are the standard char n-grams."""
    sh = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    return F.when(F.size(w) >= n, sh).otherwise(F.array().cast("array<string>"))


def shingle_array(text: Column, n: int) -> Column:
    """:func:`shingles_of` over inline :func:`words` — convenient for
    single-expression contexts; hot operators prefer the two-select
    materialized shape (see shingles_of)."""
    return shingles_of(words(text), n)
