"""Distributed BPE tokenizer-vocabulary trainer + broadcast-vocab apply.

The missing piece between a curated corpus and a real training run: a
LEARNED subword vocabulary instead of the fixed regex pre-tokenizer
(textstats.BPE_TOKEN_PATTERN stays the oracle-checked default).

Shape at 100 TB:
- word counting is the distributed part — one hash-agg shuffle on the
  word key with map-side partial combine, then a bounded top-K
  (``max_words`` distinct words) collect.  The merge loop itself runs
  on the DRIVER over that word-frequency table: vocab-sized, never
  corpus-sized — the standard Sennrich (2016) trainer shape, with the
  incremental pair-index so each merge touches only the words that
  contain the merged pair.
- apply ships the merge-rank dict to executors inside the mapInPandas
  closure (a broadcast of a few hundred KB) and never shuffles the
  corpus; per-word results are memoised per batch-iterator (Zipf makes
  the cache hit rate ~1 after the first few thousand words).

Pre-tokenization reuses :mod:`vlm_ocr_pipeline_spark.textnorm` — the
single-tokenizer invariant: BPE learns WITHIN textnorm tokens
(whitespace words; single characters for no-space scripts like CJK,
where BPE merges then learn multi-char units the way real multilingual
vocabs do), so the word boundary definition stays the one every oracle
mirrors.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .. import textnorm

EOW = "</w>"  # end-of-word symbol (its own token, Sennrich-style)


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    max_words: int = 30000,
) -> list[tuple[str, int]]:
    """Distributed word counting -> bounded (word, count) list for the
    driver merge loop, top-``max_words`` by (count desc, word asc) so
    the truncation is deterministic."""
    rows = (
        docs.select(F.explode(textnorm.words(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["count"]) for r in rows]


def train_bpe_from_frequencies(
    freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """The driver merge loop: repeatedly merge the most frequent
    adjacent symbol pair (ties broken by lexicographically smallest
    pair — fully deterministic for a given frequency table).

    Incremental bookkeeping: a pair -> word-index inverted index means
    each merge rescans only words containing the winning pair, not the
    whole vocabulary."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], c) for w, c in freqs
    ]
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, c) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_words[p].add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words.pop(best, ())):
            syms, c = words[wi]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            if len(out) == len(syms):
                continue  # stale index entry — pair already merged away
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
            for p in zip(out, out[1:]):
                pair_counts[p] += c
                pair_words[p].add(wi)
            words[wi] = (out, c)
        pair_counts.pop(best, None)
    return merges


def train_bpe_vocab(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_words: int = 30000,
) -> list[tuple[str, str]]:
    """Distributed counting + driver merges; see module docstring."""
    return train_bpe_from_frequencies(
        word_frequencies(docs, text_col, max_words), num_merges
    )


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The token inventory a merge list induces: every base character
    that appears in a merge, EOW, and each merge product, in merge
    order (character entries sorted for determinism)."""
    chars = sorted({c for a, b in merges for c in a + b if len(c) == 1})
    return chars + [EOW] + [a + b for a, b in merges]


def vocab_ids(merges: list[tuple[str, str]]) -> dict[str, int]:
    """token -> id over :func:`bpe_vocab`'s deterministic order, with
    id 0 reserved for <unk> (a character outside every merge — possible
    when applying a vocab to text the trainer never sampled)."""
    return {"<unk>": 0, **{t: i + 1 for i, t in enumerate(bpe_vocab(merges))}}


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encoding of one word (the GPT-2
    apply loop), mirroring the trainer's left-to-right merge order."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        pairs = set(zip(syms, syms[1:]))
        best = min(pairs, key=lambda p: ranks.get(p, float("inf")))
        if best not in ranks:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                out.append(best[0] + best[1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    as_ids: bool = False,
) -> DataFrame:
    """Encode every document with a trained merge list.

    Output: (doc_id, bpe_tokens array<string>, n_bpe_tokens int) — or,
    with ``as_ids``, (doc_id, bpe_ids array<int>, n_bpe_tokens int)
    using :func:`vocab_ids`'s mapping (unknown tokens -> 0 = <unk>),
    the form a training run's data loader actually reads.
    Arrow-batched mapInPandas; the merge ranks ride the task closure
    and the corpus never shuffles.  Joining a document's tokens and
    splitting on EOW reconstructs its ``textnorm.tokenized_text`` words
    exactly (BPE is lossless within words) — the round-trip test pins
    this.
    """
    ranks = {p: i for i, p in enumerate(merges)}
    ids_map = vocab_ids(merges) if as_ids else None
    out_col = "bpe_ids" if as_ids else "bpe_tokens"

    def gen(batches):
        cache: dict[str, list] = {}
        for b in batches:
            ids, toks, counts = [], [], []
            for did, text in zip(b[id_col], b[text_col]):
                words = str(text or "").split()
                enc: list = []
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = encode_word(w, ranks)
                        if ids_map is not None:
                            got = [ids_map.get(t, 0) for t in got]
                        cache[w] = got
                    enc.extend(got)
                ids.append(did)
                toks.append(enc)
                counts.append(len(enc))
            yield pd.DataFrame(
                {id_col: ids, out_col: toks, "n_bpe_tokens": counts}
            )

    src = docs.select(
        F.col(id_col).alias(id_col),
        # tokenize BEFORE Python (script-aware spacing + collapse) so
        # the plain whitespace split here equals textnorm.words — one
        # tokenizer definition, not two
        textnorm.tokenized_text(F.col(text_col)).alias(text_col),
    )
    id_type = docs.schema[id_col].dataType.simpleString()
    elem = "array<int>" if as_ids else "array<string>"
    return src.mapInPandas(
        gen,
        schema=f"{id_col} {id_type}, {out_col} {elem}, n_bpe_tokens int",
    )
