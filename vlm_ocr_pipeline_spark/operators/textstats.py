"""Text analysis operators: token counts, quality scores, language-ID
heuristic, fingerprints.

Everything is built-in pyspark.sql.functions (whole-stage codegen) and
each expression has an exact ANSI-SQL twin for the DuckDB oracle —
ratios are single int/int double divisions so both engines produce the
identical IEEE-754 value.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from ..textnorm import (
    hex_class as _hex_class,
    normalize_text as _norm,
    py_words as _py_words,
    words as _words,
)

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on")

# marker words per language for the n-gram/langid heuristic; counts of
# ' word ' occurrences decide the predicted language
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "que"),
}

# charset-range languages: one vote per character in the script's
# Unicode ranges (pure length arithmetic — oracle-stable), competing
# in the same argmax as the marker-word votes.  A language whose
# script also carries another's (Japanese prose mixes kana with Han
# ideographs) gets a weight so typical mixed text wins: kana are
# ~30-40% of Japanese running text, so 3x kana votes beat the Han
# count on real Japanese while a Chinese doc quoting a kana word
# stays zh.  Deterministic heuristic, not a classifier — the
# fastText-style model (train_quality_classifier) is the learned path.
LANG_SCRIPTS: dict[str, tuple[int, tuple[tuple[int, int], ...]]] = {
    "ar": (1, ((0x0600, 0x06FF),)),
    "ja": (3, ((0x3041, 0x309F), (0x30A0, 0x30FF))),
    "ko": (1, ((0xAC00, 0xD7A3),)),
    "ru": (1, ((0x0400, 0x04FF),)),
    "th": (1, ((0x0E01, 0x0E5B),)),
    "zh": (1, ((0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF))),
}


def _count_occurrences(haystack: Column, needle: str) -> Column:
    """Occurrences of ``needle`` — regexp_count scans without building
    a replacement string (the DuckDB oracle uses the value-identical
    length-arithmetic form: both consume matches left to right)."""
    return F.regexp_count(haystack, F.lit(needle)).cast("int")


# BPE-style pre-tokenizer pattern (GPT-2-ish word/number/punct split,
# simplified to the RE2-compatible subset shared by Spark and DuckDB)
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bpe_merges: list | None = None,
) -> DataFrame:
    """Whitespace tokens, a BPE-ish regex pre-token count, and the
    chars/4 rule-of-thumb subword estimate.  With ``bpe_merges`` (from
    :func:`~vlm_ocr_pipeline_spark.operators.bpe.train_bpe_vocab`) an
    extra ``n_bpe_vocab_tokens`` column counts the LEARNED subword
    tokens (joined on id — the default output stays oracle-stable)."""
    norm = _norm(F.col(text_col))
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_words(F.col(text_col))).alias("n_tokens"),
        F.regexp_count(norm, F.lit(BPE_TOKEN_PATTERN)).alias("n_bpe_tokens"),
        F.ceil(F.length(norm) / 4).cast("int").alias("n_subwords_est"),
        F.length(norm).alias("n_chars"),
    )
    if bpe_merges is not None:
        from .bpe import apply_bpe

        learned = apply_bpe(docs, bpe_merges, id_col, text_col).select(
            F.col(id_col).alias("doc_id"),
            F.col("n_bpe_tokens").alias("n_bpe_vocab_tokens"),
        )
        out = out.join(learned, "doc_id")
    return out


def token_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """:func:`token_count` + :func:`fingerprints` in ONE projection
    (same scan, no join) — used where one pass should produce both the
    token accounting and the content cache key."""
    norm = _norm(F.col(text_col))
    h = F.md5(norm)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_words(F.col(text_col))).alias("n_tokens"),
        F.regexp_count(norm, F.lit(BPE_TOKEN_PATTERN)).alias("n_bpe_tokens"),
        F.ceil(F.length(norm) / 4).cast("int").alias("n_subwords_est"),
        F.length(norm).alias("n_chars"),
        h.alias("fingerprint"),
        F.substring(h, 1, 16).alias("fingerprint16"),
    )


def _quality_base_cols(text_col: str) -> list[Column]:
    """Stage-1 quality INGREDIENTS — each expensive expression (the
    tokenized word array, the regex strips, the stopword padded-count
    chain) appears exactly ONCE; the ratios in
    :func:`_quality_final_cols` then reference plain columns.  A
    single-projection version re-evaluated words()/norm per ratio,
    which got measurably expensive once tokenization turned
    script-aware."""
    norm = _norm(F.col(text_col))
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    n_stop = sum(
        _count_occurrences(padded, f" {w} ") for w in STOPWORDS
    )
    n_punct = F.regexp_count(norm, F.lit(r"[\.,;:!\?]"))
    n_digit = F.regexp_count(norm, F.lit(r"[0-9]"))
    return [
        F.size(_words(F.col(text_col))).alias("n_words"),
        F.length(norm).alias("_n_chars"),
        n_stop.alias("_n_stop"),
        n_punct.alias("_n_punct"),
        n_digit.alias("_n_digit"),
    ]


def _quality_final_cols() -> list[Column]:
    """Stage-2 ratios over :func:`_quality_base_cols` columns.  (A
    function, not a module constant: F.col needs a live SparkContext
    in classic mode, and this module imports before any session in
    tests/driver tooling.)"""
    return [
        F.col("n_words"),
        (F.col("_n_chars") / F.col("n_words")).alias("mean_word_len"),
        (F.col("_n_stop") / F.col("n_words")).alias("stopword_ratio"),
        (F.col("_n_punct") / F.col("_n_chars")).alias("punct_ratio"),
        (F.col("_n_digit") / F.col("_n_chars")).alias("digit_ratio"),
    ]


def _script_count(col: Column, ranges: tuple[tuple[int, int], ...]) -> Column:
    """Chars of ``col`` inside the Unicode ``ranges`` (regexp_count —
    one scan, no rebuild; single-char matches, so the count equals the
    oracle's length-arithmetic form exactly)."""
    cls = f"[{_hex_class(ranges)}]"
    return F.regexp_count(col, F.lit(cls)).cast("int")


def _lang_score_cols(text_col: str) -> list[Column]:
    """Stage-1 per-language vote columns (``score_<lang>``):
    marker-word occurrences for spaced Latin-script languages, weighted
    script-char counts for charset-range languages (``LANG_SCRIPTS``).
    Projected ONCE — the argmax in :func:`_predicted_lang_col` folds
    over the resulting plain columns, never re-evaluating these."""
    norm = _norm(F.col(text_col))
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    scores = {
        lang: sum(_count_occurrences(padded, f" {m} ") for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }
    scores.update(
        {
            lang: _script_count(norm, ranges) * weight
            for lang, (weight, ranges) in LANG_SCRIPTS.items()
        }
    )
    return [scores[lang].alias(f"score_{lang}") for lang in sorted(scores)]


def _lang_codes() -> list[str]:
    return sorted(set(LANG_MARKERS) | set(LANG_SCRIPTS))


def _predicted_lang_col() -> Column:
    """Stage-2 argmax over the ``score_<lang>`` columns: highest vote
    count wins, ties break to the earlier language code, all-zero ->
    'und'.  Linear-size expression (array_max over (score, -index)
    structs) — the naive CASE fold doubled the tree per language and
    at 10 languages exploded codegen."""
    langs = _lang_codes()
    entries = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"), F.lit(-i).alias("ni")
            )
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(entries)
    code = F.element_at(
        F.array(*[F.lit(lang) for lang in langs]), (-best["ni"] + 1).cast("int")
    )
    return F.when(best["s"] >= 1, code).otherwise(F.lit("und")).alias(
        "predicted_lang"
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic quality features used by web-corpus filters:
    mean word length, stopword ratio, punctuation ratio, digit ratio.
    Each ratio is one exact double division (oracle-stable).  Two
    chained narrow projections (ingredients, then ratios) — no
    shuffle, no re-evaluated tokenizer."""
    return docs.select(
        F.col(id_col).alias("doc_id"), *_quality_base_cols(text_col)
    ).select("doc_id", *_quality_final_cols())


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word + script-range language heuristic (see
    :func:`_lang_score_cols`)."""
    scored = docs.select(
        F.col(id_col).alias("doc_id"), *_lang_score_cols(text_col)
    )
    return scored.select(
        "doc_id",
        _predicted_lang_col(),
        *[F.col(f"score_{lang}") for lang in _lang_codes()],
    )


def quality_lang(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """quality_scores + lang_id + mojibake fingerprint count in ONE
    pass over the text (two chained narrow projections, same scan, no
    join).  ``mojibake_count`` (functions/charset.py) flags documents
    whose text was charset-mangled UPSTREAM of the crawl — a per-domain
    sum of it is the dashboard that catches a broken origin server."""
    from ..functions import charset

    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        *_quality_base_cols(text_col),
        charset.mojibake_count_col(F.col(text_col)).cast("long").alias(
            "mojibake_count"
        ),
        *_lang_score_cols(text_col),
    )
    return scored.select(
        "doc_id",
        *_quality_final_cols(),
        F.col("mojibake_count"),
        _predicted_lang_col(),
        *[F.col(f"score_{lang}") for lang in _lang_codes()],
    )


def repair_mojibake(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide mojibake repair: undo UTF-8-read-as-1252 damage in
    documents published ALREADY mangled (charset.fix_mojibake — the
    ftfy core move, accept-gated on strictly reducing the fingerprint
    count, hence idempotent and a no-op on clean text).

    Scale shape: Arrow-batched pandas_udf, zero shuffle, narrow
    projection only.  The per-value fast path is one compiled-regex
    search returning 0 for clean text, so the overwhelmingly-clean
    common case costs one regex scan per document — the same order as
    any quality signal."""
    from pyspark.sql.functions import pandas_udf

    from ..functions import charset

    @pandas_udf("string")
    def fix(s: pd.Series) -> pd.Series:
        return s.map(lambda t: charset.fix_mojibake(t) if t else t)

    return docs.withColumn(text_col, fix(F.col(text_col)))


def repetition_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_bigram_ratio: float = 0.2,
    min_distinct_word_ratio: float = 0.3,
) -> DataFrame:
    """Repetition-based quality signals for web corpora (the Gopher /
    MassiveText-style filters, Rae et al. 2021 §A1.1): the fraction of
    distinct words and the share of the most frequent word bigram.
    Machine-generated / boilerplate-looped pages score low on the
    first and high on the second.

    Scale shape: one projection for the per-doc word stats, then
    explode word bigrams -> count per (doc, bigram) -> max/sum per doc
    — two shuffles keyed on (doc_id[, bigram]), both well spread; no
    per-row Python.  Docs with < 2 words have no bigrams: ratio null,
    and they fail the distinct-ratio gate only if genuinely repetitive.

    Output: (doc_id, n_words, distinct_word_ratio, top_bigram_ratio,
    quality_pass).
    """
    w = _words(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), w.alias("_w"))
    stats = base.select(
        "doc_id",
        F.size("_w").cast("long").alias("n_words"),
        (F.size(F.array_distinct("_w")) / F.size("_w")).alias(
            "distinct_word_ratio"
        ),
    )
    from ..textnorm import shingles_of

    # bigrams from the SAME materialized words column (shingles_of
    # references the array three times; inline words() would tokenize
    # three times per row)
    bi = base.select(
        "doc_id", F.explode(shingles_of(F.col("_w"), 2)).alias("bg")
    )
    top = (
        bi.groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("_mx"), F.sum("count").alias("_tot"))
        .select(
            "doc_id", (F.col("_mx") / F.col("_tot")).alias("top_bigram_ratio")
        )
    )
    out = stats.join(top, "doc_id", "left")
    passed = (
        (F.col("distinct_word_ratio") >= F.lit(min_distinct_word_ratio))
        & (
            F.coalesce(F.col("top_bigram_ratio"), F.lit(0.0))
            <= F.lit(max_top_bigram_ratio)
        )
    )
    return out.select(
        "doc_id",
        "n_words",
        "distinct_word_ratio",
        "top_bigram_ratio",
        passed.alias("quality_pass"),
    )


def compression_quality(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """zlib compression ratio per document — the classic cheap proxy
    for templated / repetitive machine text (highly compressible) vs
    natural prose.  zlib is not expressible in SQL, so this is an
    Arrow-batched pandas UDF (vectorized, never per-row Python via
    F.udf); correctness is pinned by construction tests instead of a
    DuckDB oracle.

    Output: (doc_id, n_bytes, n_compressed, compression_ratio) with
    ratio = compressed/raw in (0, ~1.1]; lower = more repetitive.
    """
    from pyspark.sql.functions import pandas_udf

    # `from __future__ import annotations` stringifies these hints and
    # pandas_udf resolves them against the MODULE globals — hence the
    # module-level pandas import above
    @pandas_udf("long")
    def _zlen(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6)) if t else 0
        )

    raw = F.octet_length(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        raw.cast("long").alias("n_bytes"),
        _zlen(F.col(text_col)).alias("n_compressed"),
    ).withColumn(
        "compression_ratio",
        F.when(F.col("n_bytes") > 0, F.col("n_compressed") / F.col("n_bytes")),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprints: full md5 plus a 16-hex-char prefix key
    (the checkpoint/cache key analog of the reference's image hash,
    pipeline/recognition/cache.py:37-52)."""
    norm = _norm(F.col(text_col))
    h = F.md5(norm)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        h.alias("fingerprint"),
        F.substring(h, 1, 16).alias("fingerprint16"),
    )


# ---- character-LM perplexity (the CCNet-style quality signal) -------


def train_char_lm(
    docs: DataFrame,
    sample_size: int = 2048,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Train a byte-bigram language model on a bounded deterministic
    sample of the corpus (the ``sample_size`` docs with the lowest
    xxhash64(id) — same scale contract as the IVF trainer: training is
    always on a sample, scoring is distributed).

    Returns a (256, 256) float64 matrix of add-one-smoothed log
    P(next_byte | byte) over UTF-8 bytes.  A byte bigram model is the
    cheapest member of the CCNet perplexity-filter family: real prose
    in the corpus's languages scores low perplexity, while random
    bytes, wrong-alphabet text, and encoding garbage score high.

    ``seed`` is reserved for forward-compatible sampling variants; the
    hash sample itself is deterministic.
    """
    import numpy as np

    rows = (
        docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .withColumn("_h", F.xxhash64(F.col("_id")))
        .orderBy("_h", "_id")
        .limit(sample_size)
        .collect()
    )
    counts = np.ones((256, 256), dtype=np.float64)  # add-one smoothing
    for r in rows:
        b = np.frombuffer((r["_t"] or "").encode("utf-8"), dtype=np.uint8)
        if len(b) >= 2:
            np.add.at(counts, (b[:-1], b[1:]), 1.0)
    return np.log(counts / counts.sum(axis=1, keepdims=True))


def _hashed_feature_indices(text: str, dim: int):
    """Hashed unigram + word-bigram feature indices (the fastText
    input layer): crc32(token) % dim.  Pure Python/zlib so the driver
    trainer and the executor scorer share one definition byte-for-byte
    — no cross-engine parity needed, the model never leaves Python.
    Tokenization is textnorm.py_words (script-aware: CJK/Thai chars
    are tokens, so their bigrams carry the signal fastText's char
    n-grams would)."""
    import zlib

    import numpy as np

    words = _py_words(text)
    feats = [zlib.crc32(w.encode("utf-8")) % dim for w in words]
    feats += [
        zlib.crc32((a + "\x00" + b).encode("utf-8")) % dim
        for a, b in zip(words, words[1:])
    ]
    return np.asarray(feats, dtype=np.int64)


def train_quality_classifier(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    dim: int = 1 << 18,
    sample_size: int = 2048,
    epochs: int = 5,
    lr: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """fastText-style hashed linear quality classifier (the CCNet /
    GPT-3 'looks like the good corpus' filter): logistic regression
    over mean-pooled hashed unigram+bigram features, trained on
    bounded deterministic samples of a positive corpus (e.g. a
    curated/wiki-like set) and a negative one (raw crawl).

    Scale contract matches :func:`train_char_lm` and the IVF trainer:
    training always happens driver-side on the ``sample_size``
    lowest-xxhash64(id) docs per side (bounded collect), scoring is
    distributed.  Training is fully deterministic: fixed sample order
    (hash, id), fixed epoch count, no RNG (weights start at zero).

    Returns ``(weights, bias)`` — a float64 array of size ``dim`` and
    a float — for :func:`quality_classifier_score`.
    """
    import numpy as np

    def sample(df):
        return (
            df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
            .withColumn("_h", F.xxhash64(F.col("_id")))
            .orderBy("_h", "_id")
            .limit(sample_size)
            .collect()
        )

    examples = [( _hashed_feature_indices(r["_t"], dim), 1.0) for r in sample(pos_docs)]
    examples += [(_hashed_feature_indices(r["_t"], dim), 0.0) for r in sample(neg_docs)]
    # deterministic interleave: alternate classes so SGD never sees a
    # long single-class run (examples are already hash-ordered per side)
    pos = [e for e in examples if e[1] == 1.0]
    neg = [e for e in examples if e[1] == 0.0]
    order = []
    for i in range(max(len(pos), len(neg))):
        if i < len(pos):
            order.append(pos[i])
        if i < len(neg):
            order.append(neg[i])
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    for _ in range(epochs):
        for feats, y in order:
            if len(feats) == 0:
                continue
            z = w[feats].mean() + b
            p = 1.0 / (1.0 + np.exp(-z))
            g = p - y
            np.add.at(w, feats, -lr * g / len(feats))
            b -= lr * g
    return w, b


def calibrate_quality_classifier(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    model,
    train_sample_size: int = 2048,
    holdout_size: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Held-out calibration for a :func:`train_quality_classifier`
    model, so ``--min-p-good`` is chosen from data instead of guessed.

    The trainer consumes the ``train_sample_size`` lowest-xxhash64(id)
    docs per side; the held-out set is the NEXT ``holdout_size`` docs
    in the same deterministic hash order — disjoint by construction,
    no RNG.  Scoring runs driver-side over those bounded samples (the
    model is a weight vector; executors aren't needed for ~1k rows).

    Returns a JSON-ready dict: exact rank-based ROC AUC, the
    positive-rate threshold sweep (precision/recall/F1 at 0.05 steps),
    and the best-F1 ``suggested_threshold``.  ``auc`` is None when a
    side has no held-out docs beyond the training window (corpus
    smaller than the sample) — callers surface that instead of
    trusting a sweep over nothing."""
    import numpy as np

    w, b = model
    dim = len(w)

    def window(df):
        rows = (
            df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
            .withColumn("_h", F.xxhash64(F.col("_id")))
            .orderBy("_h", "_id")
            .limit(train_sample_size + holdout_size)
            .collect()
        )
        return rows[train_sample_size:]

    def score(t):
        feats = _hashed_feature_indices(t, dim)
        if len(feats) == 0:
            return None
        return float(1.0 / (1.0 + np.exp(-(w[feats].mean() + b))))

    pos = [s for s in (score(r["_t"]) for r in window(pos_docs)) if s is not None]
    neg = [s for s in (score(r["_t"]) for r in window(neg_docs)) if s is not None]
    out: dict = {"n_pos_holdout": len(pos), "n_neg_holdout": len(neg)}
    if not pos or not neg:
        out.update({"auc": None, "sweep": [], "suggested_threshold": None})
        return out
    # exact AUC = P(pos > neg) + 0.5 P(tie), via the rank statistic
    allscores = sorted(pos + neg)
    import bisect

    def rank_mass(s):  # average rank of s among allscores (1-based)
        lo = bisect.bisect_left(allscores, s)
        hi = bisect.bisect_right(allscores, s)
        return (lo + hi + 1) / 2.0

    r_sum = sum(rank_mass(s) for s in pos)
    auc = (r_sum - len(pos) * (len(pos) + 1) / 2.0) / (len(pos) * len(neg))
    sweep = []
    best = None
    for i in range(1, 20):
        t = round(i * 0.05, 2)
        tp = sum(s >= t for s in pos)
        fp = sum(s >= t for s in neg)
        fn = len(pos) - tp
        prec = tp / (tp + fp) if tp + fp else None
        rec = tp / (tp + fn) if tp + fn else None
        f1 = (
            2 * prec * rec / (prec + rec)
            if prec is not None and rec is not None and (prec + rec) > 0
            else 0.0
        )
        sweep.append(
            {"threshold": t, "precision": prec, "recall": rec, "f1": round(f1, 4)}
        )
        if best is None or f1 > best[0]:
            best = (f1, t)
    out.update(
        {
            "auc": round(auc, 4),
            "sweep": sweep,
            "suggested_threshold": best[1],
        }
    )
    return out


def quality_classifier_score(
    docs: DataFrame,
    model,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document with a :func:`train_quality_classifier`
    model: (doc_id, p_good double) — sigmoid of the mean-pooled hashed
    feature weights.  Arrow-batched pandas UDF; the weight array rides
    the task closure (2 MB at the default dim — broadcast once per
    executor), the corpus never shuffles.  Empty docs score null."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    w, b = model
    dim = len(w)

    @pandas_udf("double")
    def _score(texts: pd.Series) -> pd.Series:
        def one(t):
            feats = _hashed_feature_indices(t, dim)
            if len(feats) == 0:
                return None
            z = w[feats].mean() + b
            return float(1.0 / (1.0 + np.exp(-z)))

        return texts.map(one)

    return docs.select(
        F.col(id_col).alias("doc_id"), _score(F.col(text_col)).alias("p_good")
    )


def lm_perplexity(
    docs: DataFrame,
    log_probs,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against a :func:`train_char_lm` model.

    Output: (doc_id, n_scored_bytes, bits_per_byte) where
    bits_per_byte = -mean log2 P(b_i | b_{i-1}); lower = more like the
    training sample.  Arrow-batched pandas UDF, numpy-vectorized per
    document (one fancy-index + mean over the byte array — no Python
    per-byte work)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    lp = log_probs / np.log(2.0)  # bits

    @pandas_udf("double")
    def _bpb(texts: pd.Series) -> pd.Series:
        def score(t):
            b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
            if len(b) < 2:
                return None
            return float(-lp[b[:-1], b[1:]].mean())

        return texts.map(score)

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(F.octet_length(F.col(text_col)) - 1, F.lit(0))
        .cast("long")
        .alias("n_scored_bytes"),
        _bpb(F.col(text_col)).alias("bits_per_byte"),
    )
