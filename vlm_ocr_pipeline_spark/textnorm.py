"""Shared text-normalization expressions.

Every operator that tokenizes (dedup shingles, simhash, token counts,
tf-idf, shard packing) MUST use these — the DuckDB oracles all mirror
``string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')``,
so a second, subtly different copy of the tokenizer silently diverges
operators from each other and from the oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def normalize_text(text: Column) -> Column:
    """Whitespace-collapsed, trimmed text (the canonical dedup key)."""
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def words(text: Column) -> Column:
    """Whitespace-token array of the normalized text."""
    return F.split(normalize_text(text), " ")


def shingle_array(text: Column, n: int) -> Column:
    """Word n-gram shingle array, guarded for short documents: Spark's
    sequence(1, 0) is the DESCENDING [1, 0] (implicit step -1) whose 0
    index crashes slice() — where DuckDB's generate_series(1, 0) is
    empty.  Docs with < n words yield no shingles on either engine."""
    w = words(text)
    sh = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    return F.when(F.size(w) >= n, sh).otherwise(F.array().cast("array<string>"))
