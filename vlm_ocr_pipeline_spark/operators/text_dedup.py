"""Corpus-level deduplication operators for training-data pipelines.

All heavy lifting stays JVM-side (built-in pyspark.sql.functions) so
Catalyst can push filters / prune columns and every hash is portable to
the DuckDB oracle:

- exact dedup         md5(text) grouping
- n-gram Jaccard      word-3-gram shingles -> shingle-share candidate
                      pairs -> |inter| / |union|
- MinHash + LSH       k minhashes as MIN(md5(shingle || ':' || seed))
                      (lexicographic min over hex strings IS a valid
                      min-hash permutation family and is byte-identical
                      across engines), banded into LSH buckets
- SimHash             16-bit signature from per-hex-digit majority vote
- embedding near-dup  cosine >= threshold pairs via the similarity op

Scale notes (100 TB): every operator below is one shuffle on a
well-spread key (hash/shingle/band), no driver-side loops; shingle
explosion is bounded by an optional document length cap; banded LSH
turns the O(n²) pair space into per-bucket candidates only.
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401 — resolved in pandas_udf type hints

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from ..partitioning import spread_narrow as _spread  # noqa: E402
from ..textnorm import (  # noqa: E402 — canonical tokenizer, shared with oracles
    normalize_text,
    shingle_array as _shingle_array,
    shingles_of as _shingles_of,
    words as _words,
)


def _exploded_shingles(docs, id_col, text_col, n, pos=False):
    """(doc_id, shingle) [or (doc_id, pos, shingle)] with the words
    array MATERIALIZED in its own projection first: the shingle
    expression references the array three times, and inlining words()
    would run the script-aware tokenizer three times per row (measured
    ~30% of the MinHash front-end at sf0.1)."""
    w = _spread(docs).select(
        F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("_w")
    )
    sh = _shingles_of(F.col("_w"), n)
    if pos:
        return w.select("doc_id", F.posexplode(sh).alias("pos", "shingle"))
    return w.select("doc_id", F.explode(sh).alias("shingle"))


def _hashed_shingle_rows(docs, id_col, text_col, n, pos=False):
    """(doc_id, [pos,] h) — 64-bit-hashed word-n-gram shingles, one
    Arrow-batched pandas pass per partition.

    Drop-in replacement for ``_exploded_shingles(...).select(doc_id,
    xxhash64(shingle))``: the shingle string is only ever a join/group
    KEY in its consumers (dup spans, n-gram Jaccard, decontaminate),
    so WHICH 64-bit hash keys it is irrelevant to their outputs (a
    2^-64 collision was already accepted); this one is the first 8
    md5 bytes because hashlib is the fast Python hasher available.
    Moving tokenize+shingle+hash into one pandas pass replaces the
    JVM regex tokenizer, the array build, the (pos)explode, and the
    per-row hash projection — measured ~4x cheaper per pass, and rows
    enter the first exchange as (long, long[, long]) exactly as
    before.  Tokenization is textnorm.py_words (the tested twin of
    words(); shingle membership is identical — both give no shingles
    for docs under n words)."""
    import hashlib

    import numpy as np

    from ..textnorm import py_words

    out_schema = (
        f"doc_id long, {'pos int, ' if pos else ''}h long"
    )
    md5 = hashlib.md5

    def gen(batches):
        memo: dict = {}
        cap = 1 << 20
        for b in batches:
            ids = b["doc_id"].to_numpy()
            doc_ids, hs, poss, lens = [], [], [], []
            for doc_id, text in zip(ids, b["text"]):
                w = py_words(text) if text is not None else []
                m = len(w) - n + 1
                if m <= 0:
                    continue
                for i in range(m):
                    g = " ".join(w[i : i + n])
                    h = memo.get(g)
                    if h is None:
                        h = int.from_bytes(
                            md5(g.encode("utf-8")).digest()[:8],
                            "big",
                            signed=True,
                        )
                        if len(memo) < cap:
                            memo[g] = h
                    hs.append(h)
                doc_ids.append(doc_id)
                lens.append(m)
            cols = {
                "doc_id": np.repeat(np.asarray(doc_ids, dtype=np.int64), lens)
                if doc_ids
                else np.array([], dtype=np.int64),
            }
            if pos:
                cols["pos"] = (
                    np.concatenate([np.arange(m, dtype=np.int32) for m in lens])
                    if lens
                    else np.array([], dtype=np.int32)
                )
            cols["h"] = np.asarray(hs, dtype=np.int64)
            yield pd.DataFrame(cols)

    return (
        _spread(docs)
        .select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .mapInPandas(gen, schema=out_schema)
    )


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    representative (min id) and the duplicate count."""
    return (
        docs.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("representative"),
            F.count("*").alias("dup_count"),
        )
    )


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document, all JVM-side:
    sequence + transform + slice (no Python in the hot path)."""
    return _exploded_shingles(docs, id_col, text_col, n).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Candidate pairs sharing >=1 shingle, scored with exact Jaccard.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard >= threshold.

    ``max_shingle_df`` drops shingles whose document frequency exceeds
    the cap from the WHOLE computation (candidates, intersection, and
    set sizes) — without it, a stop-word-ish shingle present in d
    documents emits d^2 candidate rows, a quadratic blowup AQE cannot
    split away at 100x scale.  A shingle shared by more than cap
    documents carries no near-dup signal (it is the set-similarity
    analog of an idf floor), so the capped-universe Jaccard is computed
    consistently over informative shingles only: when the cap does not
    bind the result is IDENTICAL to uncapped.

    Plan shape (posting lists, not a self-join): ONE shuffle groups the
    exploded shingles into per-shingle sorted doc lists (collect_set
    dedups (doc, shingle) for free); the df cap filters the lists;
    pair expansion happens JVM-side inside the same stage via nested
    array transforms.  A capped list holds <= cap ids, so no reducer
    ever sees more than cap^2 pair rows per shingle — the skew bound
    the self-join lacked.  ``lists`` is cached because two branches
    (sizes, pairs) consume it; sessions running many dedups should
    spark.catalog.clearCache() between tables.
    """
    # the shingle string is only ever a GROUP KEY (pairs and sizes are
    # all that leave this stage), so only its 64-bit hash is ever
    # built — (long, long) rows into the one exchange, tokenize +
    # shingle + hash fused in one pandas pass (_hashed_shingle_rows)
    exploded = _hashed_shingle_rows(docs, id_col, text_col, n)
    lists = exploded.groupBy("h").agg(
        F.sort_array(F.collect_set("doc_id")).alias("ds")
    )
    if max_shingle_df is not None:
        lists = lists.filter(F.size("ds") <= max_shingle_df)
    lists = lists.cache()  # one row per (capped) shingle — tiny
    sizes = (
        lists.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_sh"))
    )
    ds = F.col("ds")
    pair_structs = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + 2, F.size(ds) - i - 1),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    inter = (
        lists.filter(F.size("ds") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa2 = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb2 = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa2, "doc_a")
        .join(sb2, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """k min-hashes per document.

    NO distinct() before the aggregation: min() is duplicate-
    insensitive, so deduplicating shingles first would add a full
    raw-shingle shuffle (13M strings at 150k docs) for nothing — the
    min-agg's map-side partial combine shrinks each task's shuffle
    output to num_hashes values per doc.  Measured: this lifted the
    4->16-core scaling of the whole LSH pipeline from 0.68 to 0.80
    (the raw-shingle exchange was the memory-bandwidth-bound stage).

    ``hash_family``:
    - "md5" (default): h_k(s) = md5(s || ':' || k) compared
      lexicographically — engine-portable (Spark and DuckDB md5 both
      emit lowercase hex), used by the DuckDB oracle.  Computed per
      document in ONE Arrow-batched pandas pass straight from the text:
      tokenization uses textnorm.py_words (the tested Python twin of
      words(); ``or ['']`` reproduces split()'s empty-string case, and
      measured 4x cheaper than the JVM regex chain), hex-string min ==
      digest-byte min (hex encoding is order-preserving), hashlib.md5
      digests memoize per distinct shingle per task, and the explode +
      per-occurrence md5 + shuffle of the former aggregate shape
      disappear entirely (the signature needs no exchange at all).
    - "xxhash64": h_k(s) = xxhash64(k, s) as BIGINT — integer min-agg,
      no hex strings; stays on the JVM explode+agg path (Spark's seeded
      xxhash64 has no cheap Python twin).
    """
    if hash_family == "md5":
        from pyspark.sql import types as T

        from ..textnorm import py_words

        ks = [f":{k}".encode() for k in range(num_hashes)]

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            import hashlib

            memo: dict = {}
            cap = 1 << 18  # 8 digests/entry -> bound worker memory
            md5 = hashlib.md5
            for batch in it:
                out = []
                for text in batch:
                    w_arr = py_words(text) or [""]
                    grams = [
                        " ".join(w_arr[i : i + n])
                        for i in range(len(w_arr) - n + 1)
                    ]
                    mins = None
                    for g in grams:
                        ds = memo.get(g)
                        if ds is None:
                            gb = g.encode("utf-8")
                            ds = [md5(gb + k).digest() for k in ks]
                            if len(memo) < cap:
                                memo[g] = ds
                        if mins is None:
                            mins = list(ds)
                        else:
                            for j, d in enumerate(ds):
                                if d < mins[j]:
                                    mins[j] = d
                    # docs with < n words have no shingles -> no
                    # signature row (filtered below), matching the
                    # former explode+groupBy shape
                    out.append(
                        None if mins is None else [d.hex() for d in mins]
                    )
                yield pd.Series(out, dtype=object)

        sig_once = sig.asNondeterministic()  # §4.4: no duplicated eval
        base = (
            _spread(docs)
            .filter(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"), sig_once(F.col(text_col)).alias("_mhs"))
            .filter(F.col("_mhs").isNotNull())
        )
        return base.select(
            "doc_id",
            *[F.col("_mhs")[k].alias(f"mh{k}") for k in range(num_hashes)],
        )
    if hash_family == "xxhash64":
        sh = _exploded_shingles(docs, id_col, text_col, n)
        aggs = [
            F.min(F.xxhash64(F.lit(k), F.col("shingle"))).alias(f"mh{k}")
            for k in range(num_hashes)
        ]
        return sh.groupBy("doc_id").agg(*aggs)
    raise ValueError(f"unknown hash_family {hash_family!r}")


def _lsh_buckets(
    docs: DataFrame,
    num_hashes: int,
    bands: int,
    id_col: str,
    text_col: str,
    n: int,
    hash_family: str,
    with_sig: bool = False,
) -> DataFrame:
    """(doc_id, bk) LSH bucket membership — the shared front-end of
    pair generation and cluster-label initialization.  All docs in one
    bucket are pairwise candidates (a clique).

    ``bk`` is xxhash64(band_index, band_key): the (band, concat) pair
    is only ever a join/group key, so it ships as ONE long instead of
    an int plus a rows_per_band x 32-char string — the same exchange-
    bandwidth fix as the shingle hashing in ngram/span dedup (a 2^-64
    bucket collision merges two cliques; harmless for candidate
    generation, which over-generates by design).

    ``with_sig`` adds the full minhash signature as a ``sig`` array —
    the verification payload for :func:`lsh_signature_store` /
    signature-gated drops (Catalyst prunes it when unused)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, id_col, text_col, n, hash_family)
    band_cols = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        band_cols.append(F.xxhash64(F.lit(b), F.concat_ws("|", *cols)))
    sel = ["doc_id", F.explode(F.array(*band_cols)).alias("bk")]
    if with_sig:
        sel.append(
            F.array(*[F.col(f"mh{k}") for k in range(num_hashes)]).alias("sig")
        )
    return sig.select(*sel)


def _bucket_pairs(buckets: DataFrame) -> DataFrame:
    """Candidate pairs from bucket membership (docs sharing >=1 band)."""
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, ["bk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands_shared"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """Banded MinHash-LSH candidate pairs: docs sharing a full band of
    min-hashes.  Output (doc_a, doc_b, n_bands_shared)."""
    return _bucket_pairs(
        _lsh_buckets(docs, num_hashes, bands, id_col, text_col, n, hash_family)
    )


def _md5_prefix64(word: str, _memo: dict) -> int:
    """First 8 bytes of md5(word) as a big-endian unsigned int — the
    integer whose 16 hex digits are ``substr(md5(word), 1, 16)``.  Both
    simhash constructions derive from it: per-word md5 is the dominant
    cost, and real text repeats words heavily, so results memoize per
    task (bounded; see _MEMO_CAP)."""
    v = _memo.get(word)
    if v is None:
        import hashlib

        v = int.from_bytes(
            hashlib.md5(word.encode("utf-8")).digest()[:8], "big"
        )
        if len(_memo) < _MEMO_CAP:
            _memo[word] = v
    return v


_MEMO_CAP = 1 << 20  # ~16 MB of dict: plenty for any task's vocab slice


def _simhash_counts(batch, _memo: dict):
    """Per-doc bit-position vote counts over a pandas Series of TEXTS:
    returns (counts (docs x 64), n_words (docs,)).  Tokenizes with
    textnorm.py_words (``or ['']`` reproduces split()'s empty-string
    case, so empty/whitespace-only docs vote exactly like the JVM
    words() path).  Bit p of a word = bit p of hi | lo<<32 where hi/lo
    are the two 32-bit halves of the md5 hex prefix — exactly the
    former explode + conv + 64 shift-mask aggregate construction,
    minus the explode, the md5 per (word, occurrence), and the
    aggregation exchange."""
    import numpy as np

    from ..textnorm import py_words

    wordss = [py_words(t) or [""] for t in batch]
    lens = np.fromiter((len(w) for w in wordss), dtype=np.int64, count=len(wordss))
    flat = np.empty(int(lens.sum()), dtype=np.uint64)
    pos = 0
    for w_arr in wordss:
        for w in w_arr:
            flat[pos] = _md5_prefix64(w, _memo)
            pos += 1
    # v64be = hi * 2^32 + lo; simhash64 bit order wants hi bits 0-31,
    # lo bits 32-63 -> w = hi | lo << 32
    hi = flat >> np.uint64(32)
    lo = flat & np.uint64(0xFFFFFFFF)
    w64 = hi | (lo << np.uint64(32))
    bits = (
        (w64[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.int64)
    starts = np.zeros(len(batch), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    counts = np.add.reduceat(bits, starts, axis=0) if len(flat) else bits[:0]
    # reduceat quirk: an empty slice (zero-length doc) copies the next
    # row — zero those out explicitly
    if (lens == 0).any():
        counts[lens == 0] = 0
    return counts, lens


def simhash16(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash over word unigrams: bit p is the majority vote of
    md5(word)[p] >= '8' across the document's words.  Portable to SQL
    (same construction digit-by-digit).

    Computed per document in ONE Arrow-batched pandas pass straight
    from the text — hex digit p >= '8' is bit 4*(15-p)+3 of the md5
    prefix int — with no explode and no aggregation exchange (the
    former shape shuffled one row per word occurrence)."""
    import numpy as np

    from pyspark.sql import types as T

    # digit p of the 16-hex-digit prefix is nibble 15-p; digit >= '8'
    # iff that nibble's top bit (bit 4*(15-p)+3 of v64be) is set.  In
    # w64 = hi | lo<<32 coordinates that is bit 31-4p (p<8: hi digit)
    # and bit 95-4p i.e. 63-4(p-8) (p>=8: lo digit).
    digit_bits = np.array(
        [31 - 4 * p for p in range(8)] + [63 - 4 * (p - 8) for p in range(8, 16)]
    )

    @F.pandas_udf(T.StringType())
    def sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        memo: dict = {}
        for batch in it:
            counts, lens = _simhash_counts(batch, memo)
            c = counts[:, digit_bits]
            # s_p = (+1)*c - (-1)*(n-c) >= 0  <=>  2c >= n
            bit_chars = np.where(2 * c >= lens[:, None], "1", "0")
            yield pd.Series(["".join(row) for row in bit_chars])

    # asNondeterministic: stop Catalyst cloning the UDF below pushed
    # filters (an inner join's inferred isnotnull re-evaluated the whole
    # signature pass under the spread exchange — guide-§4.4 duplication)
    sig_once = sig.asNondeterministic()
    return (
        _spread(docs)
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), sig_once(F.col(text_col)).alias("simhash"))
    )


def simhash_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Documents bucketed by identical 16-bit simhash (near-dup
    candidates at this signature width)."""
    return (
        simhash16(docs, id_col, text_col)
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("representative"), F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > 1)
    )


def dedup_keep_representatives(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "window",
) -> DataFrame:
    """APPLY exact dedup: keep one row (min id) per distinct normalized
    content — the filter step a training pipeline runs after
    :func:`exact_dup_groups` identifies duplicates.  Both strategies
    return identical rows:

    - ``"window"``: row_number over a hash-partitioned window — ONE
      shuffle, but it moves the FULL rows (text included).  Optimal
      when the keep-id set is too large to broadcast (10^12-doc
      corpora): the corpus must move once no matter what.  On a
      single shared-memory-bus box this shuffle is bandwidth-bound
      (measured 0.50 scaling at 4->16 local cores on 3.6 GB of text);
      on a real cluster each node has its own bus.
    - ``"broadcast_ids"``: winners = groupBy(hash).agg(min(id)) — the
      shuffle carries only (hash, id) pairs (~48 bytes/row with
      map-side combine), then the surviving ids broadcast back as a
      semi-join, so the TEXT NEVER MOVES.  The right plan whenever
      8 bytes x n_distinct fits in executor memory (<= ~10^8 distinct
      contents; a per-shard run at larger scale).
    """
    h = F.md5(normalize_text(F.col(text_col)))
    if strategy == "window":
        from pyspark.sql.window import Window

        w = Window.partitionBy(h).orderBy(id_col)
        return (
            docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if strategy == "broadcast_ids":
        keep = (
            docs.select(F.col(id_col).alias("_id"), h.alias("_h"))
            .groupBy("_h")
            .agg(F.min("_id").alias("_keep"))
            .select(F.col("_keep").alias(id_col))
        )
        return docs.join(F.broadcast(keep), id_col, "left_semi")
    raise ValueError(f"unknown strategy {strategy!r}")


def neardup_clusters(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_iterations: int = 20,
    stats: dict | None = None,
    min_bands: int = 1,
    min_jaccard: float | None = None,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the
    MinHash-LSH candidate-pair graph, as iterative min-label
    propagation with pointer jumping (each doc's cluster
    representative = the smallest doc id reachable through near-dup
    edges).

    Each round does two things: (1) hash-to-min — every doc takes the
    minimum label among itself and its neighbors (one hop), then
    (2) pointer jumping — every doc also takes its label's OWN label
    (label[label[v]]), which halves remaining path lengths.  Together
    the rounds needed are O(log diameter), so even an adversarial
    near-dup CHAIN of length d converges in ~log2(d) rounds instead of
    d; dense clusters (the common crawl shape) still converge in 2-3.
    Convergence is detected exactly (no label changed in a full
    round).  If the ``max_iterations`` backstop fires first, the
    result would be PARTIALLY merged — this warns loudly and records
    ``converged=False`` in ``stats`` so callers can detect truncation
    (the DuckDB recursive-CTE oracle would diverge on such inputs).

    Every round's label table is ``localCheckpoint``-ed (eager): the
    per-round plan therefore never embeds previous rounds' joins, so
    plan size, optimizer time, and recompute-on-failure cost stay
    O(1) per round instead of O(rounds) — the difference between 3 and
    20 rounds being safe at 100 TB.

    Initial labels come from BUCKET-MIN contraction, not identity:
    every doc starts at the min doc id across its LSH buckets (each
    bucket is a candidate clique, so this is a sound 1-hop-min over a
    SUPERSET of each doc's pair neighborhood).  Dense near-dup
    clusters — the dominant real-corpus shape — are therefore fully
    labeled before the first join round, and the loop usually runs
    exactly one confirming round; measured on the 150k-doc scaling
    corpus this removed two of three label-propagation rounds (each
    round is a serial barrier of joins + checkpoint + count that
    bounds scaling at high core counts).

    ``stats`` (optional dict) is filled with ``iterations`` and
    ``converged`` for tests/monitoring.

    Candidate VERIFICATION (``min_bands`` / ``min_jaccard``): by
    default any single shared band makes two docs cluster-mates — at
    12 hashes / 4 bands a pair at Jaccard 0.5 shares a band with
    p ≈ 41%, so raw LSH collisions over-merge plausibly-similar
    non-dups.  ``min_bands >= 2`` requires that many shared bands;
    ``min_jaccard`` additionally requires the signature-estimated
    Jaccard (fraction of agreeing minhash components — an unbiased
    estimator of the true Jaccard) to reach the threshold, the
    SlimPajama/BigCode-style check before irreversible drops.  Both
    gates run on the bounded candidate-pair set only (never all
    pairs); when either is active the bucket-min label INIT is skipped
    (a bucket is no longer automatically a clique) and labels start at
    identity, so only verified edges merge.

    Output: (doc_id, representative, cluster_size) for EVERY document
    (singletons are their own representative).
    """
    import warnings

    verified = min_bands > 1 or min_jaccard is not None
    buckets = _lsh_buckets(
        docs, num_hashes, bands, id_col, text_col, 3, "md5",
        with_sig=verified,
    ).localCheckpoint(eager=False)
    raw_pairs = _bucket_pairs(buckets.select("doc_id", "bk"))
    if min_bands > 1:
        raw_pairs = raw_pairs.filter(F.col("n_bands_shared") >= min_bands)
    pairs = raw_pairs.select("doc_a", "doc_b")
    if min_jaccard is not None:
        sigs = buckets.select("doc_id", "sig").dropDuplicates(["doc_id"])
        est = F.size(
            F.filter(
                F.zip_with("_sa", "_sb", lambda a, b: a == b), lambda x: x
            )
        ) / F.lit(num_hashes)
        pairs = (
            pairs.join(
                sigs.select(
                    F.col("doc_id").alias("doc_a"), F.col("sig").alias("_sa")
                ),
                "doc_a",
            )
            .join(
                sigs.select(
                    F.col("doc_id").alias("doc_b"), F.col("sig").alias("_sb")
                ),
                "doc_b",
            )
            .filter(est >= F.lit(min_jaccard))
            .select("doc_a", "doc_b")
        )
    edges = (
        pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .toDF("src", "dst")
        .localCheckpoint(eager=False)
    )
    if verified:
        # a bucket is only a CANDIDATE clique once gates are active —
        # seeding labels from bucket minima would pre-merge rejected
        # pairs, so start at identity and let verified edges propagate
        labels = (
            docs.select(F.col(id_col).alias("doc_id"))
            .distinct()
            .select("doc_id", F.col("doc_id").alias("label"))
            .localCheckpoint(eager=False)
        )
    else:
        bmin = buckets.groupBy("bk").agg(F.min("doc_id").alias("_bmin"))
        init = (
            buckets.join(bmin, ["bk"])
            .groupBy("doc_id")
            .agg(F.min("_bmin").alias("_init"))
        )
        labels = (
            docs.select(F.col(id_col).alias("doc_id"))
            .distinct()
            .join(init, "doc_id", "left")
            .select(
                "doc_id", F.coalesce("_init", F.col("doc_id")).alias("label")
            )
            .localCheckpoint(eager=False)
        )
    converged = False
    iterations = 0
    for _ in range(max_iterations):
        iterations += 1
        # ONE join+agg per round over the edge set AUGMENTED with the
        # current label pointers: the (label[v] -> v) edge delivers
        # label[label[v]] (pointer jumping, formerly a separate join),
        # and the (v -> label[v]) edge floods each member's label down
        # to its representative (which re-broadcasts it next round).
        # Same fixed point — every update is still a min over labels of
        # reachable docs — with 2 exchanges per round instead of 4.
        pointer_edges = labels.select(
            F.col("label").alias("src"), F.col("doc_id").alias("dst")
        ).union(
            labels.select(
                F.col("doc_id").alias("src"), F.col("label").alias("dst")
            )
        )
        neighbor_min = (
            edges.union(pointer_edges)
            .join(labels, F.col("src") == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(
            neighbor_min, labels.doc_id == neighbor_min.dst, "left"
        ).select(
            "doc_id",
            F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            F.col("label").alias("_old"),
        )
        # eager localCheckpoint: materializes THIS round and truncates
        # lineage, so the changed-count below and the next round both
        # read stored blocks instead of replaying prior rounds
        stepped = stepped.localCheckpoint(eager=True)
        changed = stepped.filter(F.col("label") != F.col("_old")).count()
        labels = stepped.drop("_old")
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["iterations"] = iterations
        stats["converged"] = converged
    if not converged:
        warnings.warn(
            f"neardup_clusters hit max_iterations={max_iterations} before "
            "convergence — returned clusters are PARTIALLY merged (labels "
            "did not finish propagating); raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(
            "doc_id",
            F.col("label").alias("representative"),
            "cluster_size",
        )
    )


def duplicate_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-level dedup (the Lee et al. 2021 'deduplicating
    training data' family): per document, the maximal word spans
    covered by n-grams that occur in >= ``min_df`` DISTINCT documents
    — boilerplate sentences, licence blocks, and templated passages
    that whole-document dedup never catches.

    Plan shape: positional shingles (posexplode, 0-based start), one
    shuffle to per-shingle distinct-doc counts, equi-join the hot
    shingles back (no pair expansion — cost is linear in positions,
    never quadratic in df), then classic gaps-and-islands inside each
    document (running max of span ends over a per-doc window) to merge
    overlapping [pos, pos+n) hits into maximal spans.

    Output: (doc_id, start_word, end_word) with end exclusive, both
    0-based word indexes into textnorm.words order.

    Plan choice, measured: a one-shuffle variant (collect_list the
    per-shingle postings, explode back) ran ~15% faster at sf0.1
    before shingle hashing (1.44 vs 1.68 s steady-state) but
    materializes ONE ROW per shingle — a boilerplate shingle occurring
    10^9 times at corpus scale becomes a multi-GB row.  The equi-join
    shape spreads hot shingles across tasks, so it is kept; hashing
    the shingles (below) recovered the exchange cost anyway.
    """
    # the shingle STRING never reaches the output (only positions do),
    # so only its 64-bit hash is ever built: both the df-agg and the
    # join-back exchange (long, long, long) rows instead of ~90-byte
    # strings — measured on the 150k-doc scaling harness: 16-core 54.9
    # -> 37.0 s and scaling efficiency 0.541 -> 0.82 (the string
    # exchange was the bandwidth ceiling; a 2^-64 collision could mark
    # one spurious span — acceptable for a dedup heuristic).  Tokenize
    # + shingle + hash run fused in one pandas pass per consumer pass
    # (_hashed_shingle_rows) — recomputing that pass for the join-back
    # stays cheaper than materializing 24 B/word of positions.
    sh = _hashed_shingle_rows(docs, id_col, text_col, n, pos=True)
    hot = (
        sh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("h")
    )
    marked = sh.join(hot, "h").select("doc_id", "pos")
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    runmax = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        runmax.isNull() | (F.col("pos") > runmax), 1
    ).otherwise(0)
    islands = marked.withColumn(
        "_island", F.sum(new_island).over(w)
    )
    return (
        islands.groupBy("doc_id", "_island")
        .agg(
            F.min("pos").cast("long").alias("start_word"),
            (F.max("pos") + n).cast("long").alias("end_word"),
        )
        .select("doc_id", "start_word", "end_word")
    )


def scrub_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """APPLY substring dedup: rebuild each document's text with the
    words inside :func:`duplicate_ngram_spans` ranges removed.  All
    JVM-side: spans collect per doc (bounded — spans are maximal and
    disjoint), word filtering is a higher-order array expression.

    Output: (doc_id, text, n_scrubbed_words)."""
    sp = spans.groupBy(F.col(id_col).alias("doc_id")).agg(
        F.collect_list(F.struct("start_word", "end_word")).alias("_sp")
    )
    joined = docs.join(sp, docs[id_col] == sp["doc_id"], "left").select(
        docs[id_col].alias("doc_id"),
        F.col(text_col).alias("_t"),
        F.coalesce(
            "_sp", F.array().cast("array<struct<start_word:long,end_word:long>>")
        ).alias("_sp"),
    )
    indexed = F.transform(
        _words(F.col("_t")),
        lambda x, i: F.struct(x.alias("w"), i.cast("long").alias("i")),
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("_sp"),
            lambda r: (s["i"] >= r["start_word"]) & (s["i"] < r["end_word"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.concat_ws(" ", F.transform(kept, lambda s: s["w"])).alias("text"),
        F.aggregate(
            "_sp",
            F.lit(0).cast("long"),
            lambda acc, r: acc + (r["end_word"] - r["start_word"]),
        ).alias("n_scrubbed_words"),
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word unigrams as a BIGINT signature.

    Bit p of a word's hash = bit p of the 64-bit integer spelled by the
    first 16 hex digits of md5(word), read as two 32-bit halves (hi =
    digits 1-8 -> bits 0-31, lo = digits 9-16 -> bits 32-63).  Per-doc
    bit p is the majority vote: set iff 2 * count(words with bit p) >=
    n_words (ties set, matching the s >= 0 convention of simhash16).

    Integer representation, not a bit string: the per-bit aggregation
    is 64 shift-and-mask sums (cheap integer codegen vs 64 substring
    CASEs, measured 5.6 s -> ~1 s at sf0.1), downstream Hamming is a
    single bit_count(xor), and the whole construction is recomputable
    in DuckDB ('0x' hex casts, >>, &, xor, bit_count).

    16-bit signatures have only 65,536 buckets — useless at corpus
    scale; 64 bits is the standard width (Charikar 2002 / Manku et al.
    2007).
    """
    import numpy as np

    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        memo: dict = {}
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        for batch in it:
            counts, lens = _simhash_counts(batch, memo)
            bits = (2 * counts >= lens[:, None]).astype(np.uint64)
            # uint64 accumulate wraps bit 63 to the intended
            # two's-complement long on the int64 view
            yield pd.Series((bits * weights).sum(axis=1).view(np.int64))

    # one Arrow-batched pandas pass over the JVM-tokenized word array:
    # the former shape exploded one row per word occurrence, md5'd each
    # occurrence, and shuffled them into a 65-expression aggregate —
    # per-doc majority votes need no exchange at all, and the word
    # memo pays md5 once per distinct word per task
    sig_once = sig.asNondeterministic()  # see simhash16: §4.4 duplication
    return (
        _spread(docs)
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), sig_once(F.col(text_col)).alias("simhash64"))
    )


def simhash64_neardup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by 64-bit SimHash: banded Hamming join.

    The signature splits into 4 x 16-bit bands; by pigeonhole, any pair
    with Hamming distance <= 3 shares at least one identical band, so
    joining on (band, key) finds EVERY qualifying pair (the Manku et
    al. 2007 multi-table scheme) while only same-band docs are ever
    compared.  Hamming distance is a single bit_count(xor).  Output:
    (doc_a, doc_b, hamming), hamming <= max_hamming (must stay <= 3 for
    the 4-band guarantee to be exact).

    Scale note: run exact dedup first — a cluster of d identical docs
    shares all bands and legitimately emits d^2/2 pairs.
    """
    if max_hamming > 3:
        raise ValueError("4-band scheme is exact only for max_hamming <= 3")
    sig = simhash64(docs, id_col, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash64", 16 * b)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("key"),
            )
            for b in range(4)
        ]
    )
    buckets = sig.select(
        "doc_id", F.col("simhash64").alias("sig"), F.explode(bands).alias("bk")
    ).select("doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # pre-partition on the join key: both self-join sides then share ONE
    # exchange (ReusedExchange), so the signature computation runs once
    # instead of once per side — without this the pandas signature UDF
    # (no upstream exchange of its own) is evaluated twice
    buckets = buckets.repartition("band", "key")
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C recipe): flag
    every training document sharing at least one word ``n``-gram with a
    held-out evaluation set, so it can be dropped before training.

    Plan shape: both sides shingle to xxhash64 longs (the shingle
    string is again only a join key); the test side dedups to distinct
    gram hashes — a SMALL set (benchmarks are tiny next to a corpus) —
    and broadcast-joins against the train grams, so the 100 TB train
    side exchanges only its HITS: scan -> explode -> broadcast join ->
    one doc_id shuffle over the (tiny) contaminated subset.

    Output: (doc_id, n_hits) of CONTAMINATED train docs, n_hits =
    distinct shared gram hashes per doc.
    """
    def grams(df):
        return _hashed_shingle_rows(df, id_col, text_col, n).withColumnRenamed(
            "h", "g"
        )

    test_grams = grams(test).select("g").distinct()
    return (
        grams(train)
        .join(F.broadcast(test_grams), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").cast("long").alias("n_hits"))
    )


# ---- incremental (cross-snapshot) near-dup dedup --------------------
# A crawl pipeline never sees the corpus at once: each monthly/daily
# snapshot must dedup against EVERYTHING kept so far without re-reading
# the historical text.  The state is the LSH bucket set — 8 bytes per
# (doc, band), text-free — and each new batch both filters against it
# and emits the delta to append.


def dedup_store_exists(path: str) -> bool:
    """Explicit first-run detection for persistent dedup stores: True
    iff ``path`` holds at least one parquet part file.  Callers use
    this INSTEAD of catching read errors — a transient read failure
    misread as "first run" would let a seed branch overwrite (destroy)
    the accumulated cross-snapshot state, and real corruption should
    propagate, not silently re-admit every historical duplicate.
    Local-filesystem walk; a deployment on an object store swaps in the
    Hadoop FileSystem API under the same contract."""
    import os

    if not os.path.isdir(path):
        return False
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def ensure_dedup_meta(
    store_dir: str, meta: dict, legacy_defaults: dict | None = None
) -> None:
    """Pin the LSH parameters a bucket store was built with.

    Buckets built with different (num_hashes, bands, n, hash_family)
    NEVER collide with a batch's, so a mismatched store silently dedups
    nothing — the sidecar ``_dedup_meta.json`` (underscore prefix:
    parquet readers skip it) makes that a hard failure instead.  If the
    sidecar exists it must equal ``meta`` (raises ValueError); if
    missing (store seeded before the guard, or by an older streaming
    run) it is backfilled so the NEXT mismatched run fails.

    ``legacy_defaults`` fills keys ABSENT from an older stored sidecar
    before comparing (metadata evolution: e.g. pre-signature stores
    implicitly have ``signatures: false``)."""
    import json
    import os

    meta_path = os.path.join(store_dir, "_dedup_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            stored = json.load(f)
        if legacy_defaults:
            stored = {**legacy_defaults, **stored}
        if stored != meta:
            raise ValueError(
                f"dedup store {store_dir} was seeded with {stored} but this "
                f"run uses {meta}; buckets from different LSH params never "
                "collide, so the store would silently dedup nothing. Use "
                "the original params or a fresh store."
            )
    else:
        os.makedirs(store_dir, exist_ok=True)
        with open(meta_path, "w") as f:
            json.dump(meta, f)


def lsh_bucket_store(
    docs: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """The persistent dedup state for :func:`incremental_neardup`: the
    DISTINCT band-bucket keys (``bk`` long) of a corpus.  8 bytes per
    row, bands × n_docs rows upper bound — at 10^12 docs × 4 bands
    that's ≤ 32 TB raw and far less after distinct + parquet encoding,
    vs re-scanning the corpus text every batch.  Write it as parquet
    (append the delta each batch); membership carries no doc ids —
    callers that need provenance join the batch's buckets against
    ``_lsh_buckets`` output instead."""
    return _lsh_buckets(
        docs, num_hashes, bands, id_col, text_col, n, hash_family
    ).select("bk").distinct()


def lsh_signature_store(
    docs: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """The VERIFIED dedup state: distinct (bk, sig) rows — each bucket
    key carries the full minhash signature of the doc(s) that put it
    there, so :func:`incremental_neardup` can check shared-band counts
    and signature-estimated Jaccard against the SPECIFIC historical doc
    before an irreversible drop, instead of treating any single
    3-hash band collision as proof.  Costs ``num_hashes`` extra values
    per row (~96 B/doc with xxhash64 signatures, ~384 B with md5 hex —
    prefer ``hash_family='xxhash64'`` at corpus scale); still text-free
    and append-only, same protocol as :func:`lsh_bucket_store`."""
    return (
        _lsh_buckets(
            docs, num_hashes, bands, id_col, text_col, n, hash_family,
            with_sig=True,
        )
        .select("bk", "sig")
        .distinct()
    )


def dedup_store_stats(spark, path: str) -> dict:
    """Operational surface for a persistent dedup store: part-file
    count (cheap, filesystem walk) plus row / distinct-bucket counts
    (one scan).  Append-only stores accumulate both duplicate rows
    (the same bucket re-emitted by later batches) and small delta
    files — this is how an operator decides when
    :func:`compact_dedup_store` is due."""
    import os

    n_files = 0
    for _root, _dirs, files in os.walk(path):
        n_files += sum(f.endswith(".parquet") for f in files)
    df = spark.read.parquet(path)
    cols = [c for c in df.columns if c != "batch_id"]
    rows = df.count()
    distinct = df.select(*cols).distinct().count()
    return {
        "files": n_files,
        "rows": rows,
        "distinct_rows": distinct,
        "redundant_rows": rows - distinct,
        "columns": cols,
    }


def compact_dedup_store(spark, path: str, target_rows_per_file: int = 4_000_000) -> dict:
    """Distinct-merge every delta of an append-only dedup store and
    rewrite it as one partition set — the lifecycle step a
    continuous-crawl store needs: each batch appends its (possibly
    overlapping) bucket delta, so rows and file count grow monotonically
    even when the distinct bucket set barely moves, and scan cost grows
    with them.  Works on bucket stores, signature stores, and the
    streaming twin's ``batch_id=N`` layout (the partition column is
    dropped — bucket identity is global).

    The rewrite goes to a sibling temp dir, then swaps directories and
    re-writes the `_dedup_meta.json` sidecar; the swap window is not
    transactional on a plain filesystem (this container has no
    table-format jars) — production deployments put the store in a
    transactional table and ALTER-swap instead, same distinct-merge
    plan.  Returns before/after stats."""
    import json
    import os
    import shutil

    meta_path = os.path.join(path, "_dedup_meta.json")
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    before = dedup_store_stats(spark, path)
    df = spark.read.parquet(path).select(*before["columns"]).distinct()
    n_parts = max(1, -(-before["distinct_rows"] // target_rows_per_file))
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_parts, "bk").write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    if meta is not None:
        with open(meta_path, "w") as f:
            json.dump(meta, f)
    after = dedup_store_stats(spark, path)
    return {
        "rows_before": before["rows"],
        "files_before": before["files"],
        "rows_after": after["rows"],
        "files_after": after["files"],
    }


def content_hash_store(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Persistent EXACT-dedup state: the distinct md5 content hashes of
    a corpus (same key as :func:`exact_dup_groups`, so the store is
    debuggable against it).  md5, not a 64-bit hash: at 10^12 docs a
    single 64-bit key expects birthday collisions, and an exact-dedup
    false positive silently drops a unique document."""
    return docs.select(
        F.md5(normalize_text(F.col(text_col))).alias("h")
    ).distinct()


def incremental_exact_dedup(
    new_docs: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Exact dedup of a new batch against the historical content-hash
    store, then within itself; returns ``(kept_docs, new_hashes)`` —
    append the delta, same protocol as :func:`incremental_neardup`
    (whose bucket store also catches exact dups; use THIS variant when
    only exact-match semantics are wanted — no false drops, and the
    state is one 32-char hash per distinct content instead of
    ``bands`` buckets per doc).

    Plan shape: identical to incremental_neardup — the batch's distinct
    hashes broadcast against the store scan (the 100 TB store never
    shuffles or broadcasts), hits broadcast back as a left-anti, and
    within-batch dedup is the plain min-id-per-content rule."""
    if "_h" in new_docs.columns:
        raise ValueError(
            "incremental_exact_dedup reserves column name '_h'; "
            "rename it in the input first"
        )
    h = F.md5(normalize_text(F.col(text_col)))
    hashed = new_docs.withColumn("_h", h)
    hits = store.select(F.col("h").alias("_h")).join(
        F.broadcast(hashed.select("_h").distinct()), "_h"
    )
    kept = hashed.join(F.broadcast(hits.distinct()), "_h", "left_anti")
    w_min = kept.groupBy("_h").agg(F.min(id_col).alias(id_col))
    kept = kept.join(w_min, [id_col, "_h"]).drop("_h")
    new_hashes = content_hash_store(kept, id_col, text_col)
    return kept, new_hashes


def incremental_neardup(
    new_docs: DataFrame,
    store: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hash_family: str = "md5",
    within_batch: bool = True,
    min_bands: int = 1,
    min_jaccard: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW crawl batch against the historical bucket store,
    then (optionally) within itself.  Returns ``(kept_docs,
    new_state)`` — append ``new_state`` to the store after writing
    the kept docs, and the next batch dedups against both.

    Plan shape (the decontaminate pattern, inverted): the BATCH is the
    small side — its distinct buckets broadcast against the store scan,
    so the 100 TB store never shuffles and never broadcasts; the hit
    doc-ids (tiny) broadcast back as a left-anti.  Within-batch dedup
    then runs :func:`neardup_clusters` on the survivors only.

    Drop VERIFICATION: by default (``min_bands=1``, no jaccard gate) a
    batch doc is dropped on ANY single shared bucket — cheap, but at
    the default 12 hashes / 4 bands a non-dup pair at Jaccard 0.5
    still collides with p ≈ 41%, a false-drop rate that compounds as
    the store grows.  With a :func:`lsh_signature_store` (rows carry
    ``sig``), ``min_bands`` requires that many distinct shared bands
    WITH THE SAME stored signature, and ``min_jaccard`` requires the
    signature-estimated Jaccard vs that stored doc to reach the
    threshold — the standard verify-before-drop step.  The store scan
    still never shuffles (its rows only stream into the same broadcast
    join, now carrying ``sig``); verification math runs on the tiny
    collision set.  Gates beyond the defaults raise if the store has
    no ``sig`` column.
    """
    verified = min_bands > 1 or min_jaccard is not None
    if verified and "sig" not in store.columns:
        raise ValueError(
            "min_bands/min_jaccard verification needs a signature store "
            "(lsh_signature_store); this store has columns "
            f"{store.columns} — reseed with signatures or drop the gates"
        )
    bk = _lsh_buckets(
        new_docs, num_hashes, bands, id_col, text_col, n, hash_family,
        with_sig=verified,
    )
    if not verified:
        hit_bks = store.select("bk").join(
            F.broadcast(bk.select("bk").distinct()), "bk"
        )
        hit_ids = (
            bk.join(F.broadcast(hit_bks.distinct()), "bk")
            .select(F.col("doc_id").alias(id_col))
            .distinct()
        )
    else:
        # store rows whose bucket collides with the batch (store side
        # streams into the broadcast join exactly as before, now with
        # the signature payload along for the ride)
        hit_rows = store.select("bk", F.col("sig").alias("_ssig")).join(
            F.broadcast(bk.select("bk").distinct()), "bk"
        )
        # per (batch doc, stored signature): distinct shared bands +
        # component agreement — all on the bounded collision set
        cand = bk.join(F.broadcast(hit_rows), "bk")
        per = cand.groupBy("doc_id", "_ssig").agg(
            F.count_distinct("bk").alias("_nb"),
            F.first("sig").alias("_sig"),
        )
        est = F.size(
            F.filter(
                F.zip_with("_sig", "_ssig", lambda a, b: a == b), lambda x: x
            )
        ) / F.lit(num_hashes)
        cond = F.col("_nb") >= F.lit(min_bands)
        if min_jaccard is not None:
            cond = cond & (est >= F.lit(min_jaccard))
        hit_ids = (
            per.filter(cond).select(F.col("doc_id").alias(id_col)).distinct()
        )
    kept = new_docs.join(F.broadcast(hit_ids), id_col, "left_anti")
    if within_batch:
        # neardup_clusters pins n=3/md5 internally (its oracle shape)
        clusters = neardup_clusters(
            kept, num_hashes=num_hashes, bands=bands,
            id_col=id_col, text_col=text_col,
            min_bands=min_bands, min_jaccard=min_jaccard,
        )
        reps = clusters.filter(
            F.col("doc_id") == F.col("representative")
        ).select(F.col("doc_id").alias(id_col))
        kept = kept.join(reps, id_col)
    maker = lsh_signature_store if verified else lsh_bucket_store
    new_state = maker(
        kept, num_hashes, bands, id_col, text_col, n, hash_family
    )
    return kept, new_state
