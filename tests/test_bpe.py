"""Distributed BPE vocabulary trainer + broadcast-vocab apply."""

from collections import Counter

from pyspark.sql import functions as F

from vlm_ocr_pipeline_spark.operators import bpe


def _naive_train(freqs, num_merges):
    """Reference trainer: full recount every merge (the textbook
    Sennrich loop) — the incremental index must match it exactly."""
    words = [(list(w) + [bpe.EOW], c) for w, c in freqs]
    merges = []
    for _ in range(num_merges):
        counts = Counter()
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                counts[p] += c
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        nxt = []
        for syms, c in words:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, c))
        words = nxt
    return merges


FREQS = [
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
    ("new", 2), ("west", 1), ("stow", 4), ("tower", 2),
]


def test_incremental_trainer_matches_naive_reference():
    for n in (1, 5, 12, 40):
        assert bpe.train_bpe_from_frequencies(FREQS, n) == _naive_train(FREQS, n), n


def test_trainer_deterministic_and_exact_first_merges():
    m = bpe.train_bpe_from_frequencies(FREQS, 4)
    assert m == bpe.train_bpe_from_frequencies(FREQS, 4)
    # hand-checked: 'est' appears in newest(6)+widest(3)+west(1) = 10,
    # contested only by pairs at <= 10; ties resolve lexicographically
    counts = Counter()
    for w, c in FREQS:
        syms = list(w) + [bpe.EOW]
        for p in zip(syms, syms[1:]):
            counts[p] += c
    best0 = min(counts, key=lambda p: (-counts[p], p))
    assert m[0] == best0  # first merge is the true argmax


def test_encode_word_roundtrip_and_vocab():
    merges = bpe.train_bpe_from_frequencies(FREQS, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in FREQS + [("unseenword", 0)]:
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks) == w + bpe.EOW  # lossless within the word
    vocab = bpe.bpe_vocab(merges)
    assert bpe.EOW in vocab and len(vocab) == len(set(vocab))
    # every merge product is in the vocab
    assert all(a + b in vocab for a, b in merges)


def test_train_and_apply_on_spark(spark):
    docs = spark.createDataFrame(
        [(i, "the newest widest tower " * 3 + f"doc{i}") for i in range(40)],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe_vocab(docs, num_merges=25, max_words=1000)
    assert merges == bpe.train_bpe_vocab(docs, num_merges=25, max_words=1000)
    enc = bpe.apply_bpe(docs, merges).orderBy("doc_id")
    rows = enc.collect()
    assert len(rows) == 40
    # document round-trip: tokens joined, EOW -> space, equals the
    # normalized text (the single-tokenizer word boundary)
    norm = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id",
            F.trim(F.regexp_replace("text", r"\s+", " ")).alias("t"),
        ).collect()
    }
    for r in rows:
        joined = "".join(r["bpe_tokens"]).replace(bpe.EOW, " ").rstrip()
        assert joined == norm[r["doc_id"]]
        assert r["n_bpe_tokens"] == len(r["bpe_tokens"])
    # learned vocab compresses: fewer tokens than characters, more
    # than whitespace words
    n_words = len(norm[0].split())
    assert n_words < rows[0]["n_bpe_tokens"] < len(norm[0])


def test_apply_bpe_as_ids_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "newest widest stow"), (2, "newest zzqq")],  # zzqq: unseen chars
        "doc_id long, text string",
    )
    merges = bpe.train_bpe_vocab(
        spark.createDataFrame(
            [(0, "newest widest stow " * 5)], "doc_id long, text string"
        ),
        num_merges=12,
    )
    ids_map = bpe.vocab_ids(merges)
    inv = {v: k for k, v in ids_map.items()}
    assert ids_map["<unk>"] == 0 and len(inv) == len(ids_map)
    toks = {r["doc_id"]: r["bpe_tokens"] for r in bpe.apply_bpe(docs, merges).collect()}
    ids = {r["doc_id"]: r["bpe_ids"] for r in
           bpe.apply_bpe(docs, merges, as_ids=True).collect()}
    # id stream maps back to the token stream wherever known
    back = [inv[i] for i in ids[1]]
    assert back == toks[1]
    # doc 2 contains chars never seen in training -> some <unk> (id 0)
    assert 0 in ids[2]
    assert len(ids[2]) == len(toks[2])


def test_token_count_and_shards_accept_merges(spark):
    from vlm_ocr_pipeline_spark.operators.corpus import pack_token_shards
    from vlm_ocr_pipeline_spark.operators.textstats import token_count

    docs = spark.createDataFrame(
        [(i, "newest widest stow " * (i % 3 + 1)) for i in range(30)],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe_vocab(docs, num_merges=10, max_words=100)
    tc = token_count(docs, bpe_merges=merges).orderBy("doc_id").collect()
    ref = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe.apply_bpe(docs, merges).collect()}
    assert all(r["n_bpe_vocab_tokens"] == ref[r["doc_id"]] for r in tc)
    # default output schema unchanged (oracle stability)
    assert "n_bpe_vocab_tokens" not in token_count(docs).columns

    shards = pack_token_shards(docs, 40, bpe_merges=merges).collect()
    assert {r["doc_id"] for r in shards} == set(range(30))
    assert all(r["n_tokens"] == ref[r["doc_id"]] for r in shards)
    # shard ids are the prefix-sum buckets of the BPE counts
    run = 0
    expect = {}
    for did in range(30):
        expect[did] = run // 40
        run += ref[did]
    assert all(r["shard_id"] == expect[r["doc_id"]] for r in shards)
