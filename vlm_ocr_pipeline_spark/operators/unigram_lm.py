"""Unigram-LM tokenizer trainer + broadcast-vocab apply (the
SentencePiece alternative to BPE — Kudo 2018, hard-EM variant).

Completes the tokenizer menu a real training run chooses from: BPE
(operators/bpe.py) grows a vocab bottom-up by merging; the unigram LM
starts from an over-complete substring inventory and PRUNES to the
target size under a piece-probability model, segmenting with Viterbi.

Shape at 100 TB — identical contract to the BPE trainer:
- the distributed part is word counting (one hash-agg shuffle with
  map-side combine, bounded top-K collect via bpe.word_frequencies);
- seeding/EM/pruning run on the DRIVER over that word table: the
  candidate inventory is bounded by max_words x max_piece_len^2
  substrings, vocab-scale work, never corpus-scale;
- apply ships the (piece -> logprob) dict in the mapInPandas closure
  and never shuffles the corpus; per-word Viterbi results memoise per
  batch iterator (Zipf: hit rate ~1 after the first few thousand).

Determinism: no RNG anywhere — seed counts are exact, hard-EM
(Viterbi counts) re-estimation is deterministic, pruning sorts by
(count desc, piece asc), and Viterbi breaks score ties toward the
LONGER piece then the lexicographically smaller one.

Pre-tokenization is textnorm.tokenized_text — the single-tokenizer
invariant shared with BPE, shingles, and every oracle.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .. import textnorm
from .bpe import word_frequencies

# score for a character absent from the vocab (coverage fallback):
# worse than any real piece so it is only used when unavoidable
_UNK_PENALTY = -20.0


def _viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs.

    dp over end positions; ties prefer the longer last piece, then the
    lexicographically smaller one (fully deterministic).  Characters
    outside the vocab segment as themselves at ``_UNK_PENALTY``."""
    n = len(word)
    best: list[float] = [0.0] + [-math.inf] * n
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i > 1:
                    continue
                lp = _UNK_PENALTY
            score = best[i] + lp
            prev = back[j]
            if score > best[j] or (
                score == best[j]
                and prev is not None
                and (len(piece), prev[1]) > (len(prev[1]), piece)
            ):
                best[j] = score
                back[j] = (i, piece)
    out: list[str] = []
    j = n
    while j > 0:
        i, piece = back[j]  # type: ignore[misc]
        out.append(piece)
        j = i
    return out[::-1]


def train_unigram_from_frequencies(
    freqs: list[tuple[str, int]],
    vocab_size: int,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    shrink: float = 0.75,
    em_iters: int = 2,
) -> list[tuple[str, float]]:
    """Driver-side unigram-LM training over a (word, count) table.

    1. SEED: every substring (length <= max_piece_len) of every word,
       scored by total occurrence count; keep the top
       ``vocab_size * seed_factor`` plus ALL single characters
       (coverage: any word must segment).
    2. Hard EM: Viterbi-segment each word under current probs, count
       piece usage weighted by word frequency, re-normalize.
    3. PRUNE: drop the lowest-count multi-char pieces down to
       max(vocab_size, ceil(size * shrink)); repeat EM+prune until the
       target size, then ``em_iters`` final polish rounds.

    Returns [(piece, logprob)] sorted by (-logprob, piece) — a
    deterministic function of the input table.
    """
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    chars = {c for w, _ in freqs for c in w}
    sub_counts: Counter = Counter()
    for w, c in freqs:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                sub_counts[w[i:j]] += c
    ranked = sorted(sub_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {p for p, _ in ranked[: vocab_size * seed_factor]} | chars
    counts = {p: sub_counts[p] for p in vocab}

    def to_logp(cnt: dict[str, int]) -> dict[str, float]:
        total = sum(cnt.values()) or 1
        return {p: math.log(max(c, 1) / total) for p, c in cnt.items()}

    logp = to_logp(counts)

    def em_round() -> dict[str, int]:
        new: Counter = Counter()
        for w, c in freqs:
            for piece in _viterbi(w, logp, max_piece_len):
                new[piece] += c
        return {p: new.get(p, 0) for p in vocab}

    while len(vocab) > max(vocab_size, len(chars)):
        counts = em_round()
        target = max(vocab_size, int(len(vocab) * shrink), len(chars))
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        keep_multi = max(0, target - len(chars))
        vocab = chars | {p for p, _ in multi[:keep_multi]}
        counts = {p: c for p, c in counts.items() if p in vocab}
        logp = to_logp(counts)
    for _ in range(em_iters):
        counts = em_round()
        logp = to_logp(counts)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def train_unigram_vocab(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    max_words: int = 30000,
    max_piece_len: int = 8,
) -> list[tuple[str, float]]:
    """Distributed counting + driver EM; see module docstring."""
    return train_unigram_from_frequencies(
        word_frequencies(docs, text_col, max_words),
        vocab_size,
        max_piece_len=max_piece_len,
    )


def unigram_vocab_ids(vocab: list[tuple[str, float]]) -> dict[str, int]:
    """piece -> id over the trained vocab's deterministic order, id 0
    reserved for <unk> (out-of-vocab characters)."""
    return {"<unk>": 0, **{p: i + 1 for i, (p, _) in enumerate(vocab)}}


def apply_unigram(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    as_ids: bool = False,
    max_piece_len: int = 8,
) -> DataFrame:
    """Viterbi-encode every document with a trained unigram vocab.

    Output: (doc_id, ul_tokens array<string>, n_ul_tokens int) — or,
    with ``as_ids``, (doc_id, ul_ids array<int>, n_ul_tokens int),
    unknown characters -> 0 = <unk>.  Arrow-batched mapInPandas, the
    log-prob dict rides the task closure, the corpus never shuffles.
    Joining a document's pieces per word reconstructs its
    ``textnorm.tokenized_text`` exactly (segmentation is lossless)."""
    logp = dict(vocab)
    ids_map = unigram_vocab_ids(vocab) if as_ids else None
    out_col = "ul_ids" if as_ids else "ul_tokens"

    def gen(batches):
        cache: dict[str, list] = {}
        for b in batches:
            ids, toks, counts = [], [], []
            for did, text in zip(b[id_col], b[text_col]):
                enc: list = []
                for w in str(text or "").split():
                    got = cache.get(w)
                    if got is None:
                        got = _viterbi(w, logp, max_piece_len)
                        if ids_map is not None:
                            got = [ids_map.get(p, 0) for p in got]
                        cache[w] = got
                    enc.extend(got)
                ids.append(did)
                toks.append(enc)
                counts.append(len(enc))
            yield pd.DataFrame(
                {id_col: ids, out_col: toks, "n_ul_tokens": counts}
            )

    src = docs.select(
        F.col(id_col).alias(id_col),
        textnorm.tokenized_text(F.col(text_col)).alias(text_col),
    )
    id_type = docs.schema[id_col].dataType.simpleString()
    elem = "array<int>" if as_ids else "array<string>"
    return src.mapInPandas(
        gen,
        schema=f"{id_col} {id_type}, {out_col} {elem}, n_ul_tokens int",
    )
