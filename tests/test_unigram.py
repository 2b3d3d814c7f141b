"""Unigram-LM tokenizer (SentencePiece-style): trainer determinism,
Viterbi optimality (differential vs exhaustive segmentation),
round-trip losslessness, ids, CJK, and corpus-level apply."""

from __future__ import annotations

import itertools
import math

from pyspark.sql import functions as F

from vlm_ocr_pipeline_spark import textnorm as tn
from vlm_ocr_pipeline_spark.operators import unigram_lm as ul

FREQS = [
    ("newest", 40), ("widest", 30), ("lowest", 30), ("new", 20),
    ("wide", 15), ("low", 15), ("nest", 10), ("west", 25), ("est", 5),
]


def _all_segmentations(word):
    n = len(word)
    for cuts in itertools.product([0, 1], repeat=n - 1):
        out, start = [], 0
        for i, c in enumerate(cuts, 1):
            if c:
                out.append(word[start:i])
                start = i
        out.append(word[start:])
        yield out


def test_viterbi_matches_exhaustive_best():
    vocab = ul.train_unigram_from_frequencies(FREQS, vocab_size=20)
    logp = dict(vocab)

    def score(seg):
        s = 0.0
        for p in seg:
            lp = logp.get(p)
            if lp is None:
                if len(p) > 1:
                    return -math.inf
                lp = ul._UNK_PENALTY
            s += lp
        return s

    for w, _ in FREQS + [("newnest", 0), ("zzz", 0)]:
        got = ul._viterbi(w, logp, max_len=8)
        assert "".join(got) == w  # lossless
        best = max(score(s) for s in _all_segmentations(w))
        assert math.isclose(score(got), best), (w, got, best)


def test_trainer_deterministic_and_sized():
    v1 = ul.train_unigram_from_frequencies(FREQS, vocab_size=15)
    v2 = ul.train_unigram_from_frequencies(FREQS, vocab_size=15)
    assert v1 == v2
    chars = {c for w, _ in FREQS for c in w}
    # every char is covered; multi-char pieces pruned to the target
    pieces = {p for p, _ in v1}
    assert chars <= pieces
    assert len(pieces) <= max(15, len(chars)) + len(chars)
    # common suffix 'est' family survives pruning (highest mass)
    assert any(p in pieces for p in ("est", "west", "newest"))
    # probabilities normalized-ish: all logprobs negative
    assert all(lp < 0 for _, lp in v1)


def test_apply_unigram_roundtrip_and_ids(spark):
    docs = spark.createDataFrame(
        [(i, "the newest widest tower " * 2 + f"doc{i}") for i in range(20)],
        "doc_id long, text string",
    )
    vocab = ul.train_unigram_vocab(docs, vocab_size=40, max_words=1000)
    assert vocab == ul.train_unigram_vocab(docs, vocab_size=40, max_words=1000)
    enc = {r["doc_id"]: r for r in ul.apply_unigram(docs, vocab).collect()}
    tok = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id", tn.tokenized_text(F.col("text")).alias("t")
        ).collect()
    }
    for did, r in enc.items():
        # pieces concatenate back to the tokenized words, in order
        rebuilt, words = [], tok[did].split()
        it = iter(r["ul_tokens"])
        for w in words:
            acc = ""
            while acc != w:
                acc += next(it)
            rebuilt.append(acc)
        assert rebuilt == words
        assert r["n_ul_tokens"] == len(r["ul_tokens"])
    # ids: <unk>=0 for unseen characters, invertible otherwise
    ids_map = ul.unigram_vocab_ids(vocab)
    assert ids_map["<unk>"] == 0
    odd = spark.createDataFrame([(1, "newest ZZZ")], "doc_id long, text string")
    out = ul.apply_unigram(odd, vocab, as_ids=True).collect()[0]
    assert 0 in out["ul_ids"]  # Z is out-of-vocab -> <unk>
    assert out["n_ul_tokens"] == len(out["ul_ids"])


def test_unigram_learns_cjk_pieces(spark):
    zh = "中文文档的主要内容是关于分布式系统的设计与实现"
    docs = spark.createDataFrame(
        [(i, (zh + " ") * 2) for i in range(8)], "doc_id long, text string"
    )
    vocab = ul.train_unigram_vocab(docs, vocab_size=60, max_words=1000)
    pieces = {p for p, _ in vocab}
    # chars-as-tokens means every CJK char is a candidate; training on
    # repeated text must keep the single chars (words ARE single chars
    # after script-aware tokenization, so pieces stay 1-char here)
    assert any(len(p) == 1 and ord(p[0]) > 0x2E80 for p in pieces)
    enc = ul.apply_unigram(docs, vocab).collect()[0]
    assert enc["n_ul_tokens"] >= len(zh)


def test_unigram_counts_budget_shards(spark):
    """Learned-unigram token counts drive shard packing exactly like
    BPE counts: same two-phase prefix sum, budgets in learned tokens."""
    from vlm_ocr_pipeline_spark.operators.corpus import pack_token_shards

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * (i % 3 + 1)) for i in range(30)],
        "doc_id long, text string",
    )
    vocab = ul.train_unigram_vocab(docs, vocab_size=30, max_words=1000)
    counted = ul.apply_unigram(docs, vocab).select(
        "doc_id", F.col("n_ul_tokens").cast("long").alias("n_tokens")
    )
    shards = pack_token_shards(docs, 50, counts=counted).collect()
    by_id = sorted(shards, key=lambda r: r["doc_id"])
    want = {
        r["doc_id"]: r["n_ul_tokens"]
        for r in ul.apply_unigram(docs, vocab).collect()
    }
    cum = 0
    for r in by_id:
        assert r["n_tokens"] == want[r["doc_id"]]
        assert r["shard_id"] == cum // 50
        cum += r["n_tokens"]
