"""Corpus-preparation operators for training-data pipelines: the steps
that run AFTER extraction + dedup and BEFORE tokenizer/training jobs.

All constructions are engine-portable (md5 buckets, integer hex casts,
rounded doubles) so every operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..partitioning import spread_narrow
from ..textnorm import words as _words


def _hash_fraction(key: Column, salt: str) -> Column:
    """Uniform [0, 1) fraction from md5(key || ':' || salt) — the
    standard deterministic-split hash: stable across runs, machines and
    engines (never rand(): resampling on retry leaks test docs into
    train)."""
    bucket = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(f":{salt}"))), 1, 8),
        16,
        10,
    ).cast("long")
    return bucket / F.lit(float(1 << 32))


def deterministic_split(
    docs: DataFrame,
    test_fraction: float = 0.1,
    salt: str = "42",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reproducible train/test assignment by content-independent id
    hash.  Output: (doc_id, split) for every document."""
    frac = _hash_fraction(F.col(id_col), salt)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(frac < test_fraction, "test").otherwise("train").alias("split"),
    )


def pack_token_shards(
    docs: DataFrame,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_range_partitions: int | None = None,
    checkpoint: bool = True,
    bpe_merges: list | None = None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Pack documents (in id order) into shards of ~``tokens_per_shard``
    whitespace tokens: shard_id = floor(exclusive_prefix_sum / budget).
    With ``bpe_merges`` (a trained merge list from
    :func:`~vlm_ocr_pipeline_spark.operators.bpe.train_bpe_vocab`),
    budgets count LEARNED subword tokens instead — the real
    training-run shard unit; the regex-free whitespace count stays the
    oracle-checked default.  ``counts`` (a (doc_id, n_tokens) frame,
    e.g. from the unigram-LM tokenizer) overrides both — any learned
    counter budgets shards through the same two-phase prefix sum.

    Scale shape: a naive global window (Window.orderBy with no
    partition) funnels the whole table through ONE task.  Instead the
    classic two-phase prefix sum: range-partition by id, cumulative sum
    WITHIN each partition, then add each partition's exclusive offset
    (one bounded collect of P partial totals — P rows, never data).

    Robustness: the intermediate is ``localCheckpoint``-ed (eager), so
    the offset collect and the final select read the SAME materialized
    partitioning — a recompute can't silently re-assign partition ids
    (with cache() an evicted block would).  Partition offsets
    accumulate in the order of each partition's MIN doc_id (the actual
    range order observed in the data), not in ascending-pid order, so
    nothing depends on repartitionByRange's undocumented pid/range
    alignment.

    Output: (doc_id, n_tokens, shard_id).
    """
    sess = docs.sparkSession
    p = num_range_partitions or sess.sparkContext.defaultParallelism
    if counts is not None:
        counted = counts.select(
            F.col(id_col).alias("doc_id"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
    elif bpe_merges is not None:
        from .bpe import apply_bpe

        counted = apply_bpe(docs, bpe_merges, id_col, text_col).select(
            F.col(id_col).alias("doc_id"),
            F.col("n_bpe_tokens").cast("long").alias("n_tokens"),
        )
    else:
        tok = F.size(_words(F.col(text_col)))
        # tokenize on a SPREAD scan and pin the counts before the range
        # exchange: repartitionByRange evaluates its input twice (range
        # sampling + the real pass), and a single-row-group synthetic
        # file would otherwise run the tokenizer twice on one core —
        # measured ~2/3 of this operator's time at sf1.0.  The pinned
        # frame is (doc_id, n_tokens) longs only.
        counted = (
            spread_narrow(docs)
            .select(
                F.col(id_col).alias("doc_id"), tok.cast("long").alias("n_tokens")
            )
            .localCheckpoint(eager=True)
            if checkpoint
            else docs.select(
                F.col(id_col).alias("doc_id"), tok.cast("long").alias("n_tokens")
            )
        )
    # repartitionByRange is itself the spreading shuffle for the range
    # pass (sampling runs over the pinned counts, not the tokenizer)
    base = (
        counted.repartitionByRange(p, "doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy("doc_id")
    local = base.withColumn("_cum_local", F.sum("n_tokens").over(w))
    # checkpoint=False keeps the logical plan inspectable (plan-gate
    # tests) at the cost of the weaker cache() pinning
    local = local.localCheckpoint(eager=True) if checkpoint else local.cache()
    # bounded driver collect: one (total, min-id) pair per partition
    parts = local.groupBy("_pid").agg(
        F.sum("n_tokens").alias("t"), F.min("doc_id").alias("mn")
    ).collect()
    offsets = {}
    running = 0
    for r in sorted(parts, key=lambda r: r["mn"]):
        offsets[r["_pid"]] = running
        running += r["t"]
    # empty input -> empty offsets: create_map() would be VOID-typed
    # and the [_pid] lookup fails to resolve, so use a typed 0
    if offsets:
        offset_col = F.create_map(
            *[F.lit(v) for kv in offsets.items() for v in kv]
        )[F.col("_pid")]
    else:
        offset_col = F.lit(0).cast("long")
    cum = F.col("_cum_local") + F.coalesce(offset_col, F.lit(0))
    shard = F.floor((cum - F.col("n_tokens")) / F.lit(tokens_per_shard))
    return local.select(
        "doc_id", "n_tokens", shard.cast("long").alias("shard_id")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking for context-length packing: each doc
    splits into windows of ``chunk_tokens`` whitespace tokens with
    ``overlap`` tokens shared between consecutive windows (the standard
    pretraining-sample chunker).

    Fully JVM-side: token array -> sequence of window starts ->
    per-window slice + join, exploded with the chunk index.  Output:
    (doc_id, chunk_idx, chunk_text, n_chunk_tokens).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    # materialize the words array once — the chunk transform slices it
    # per window, and inline words() would re-tokenize per reference
    base = spread_narrow(docs).select(
        F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("_w")
    )
    w = F.col("_w")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(w) - overlap) / F.lit(float(stride))).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(w, i * stride + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
            F.size(F.slice(w, i * stride + 1, chunk_tokens))
            .cast("long")
            .alias("n_chunk_tokens"),
        ),
    )
    return (
        base.select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.chunk_text", "c.n_chunk_tokens")
    )


# conservative, RE2-compatible patterns (the DuckDB oracle mirrors them
# verbatim, so stay inside the Java-regex / RE2 common subset)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}[ \-.]?\([0-9]{2,4}\)[ \-.]?[0-9]{2,4}[\-.][0-9]{2,6}"


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails and parenthesized phone numbers to <EMAIL>/<PHONE>
    sentinels, with per-doc match counts (the audit columns a removal
    pipeline reports).  Output: (doc_id, scrubbed, n_emails, n_phones).
    """
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE)).cast("long")
    scrub1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_phones = F.regexp_count(scrub1, F.lit(PHONE_RE)).cast("long")
    scrub2 = F.regexp_replace(scrub1, PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        scrub2.alias("scrubbed"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
    )


def vocab_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary report: doc count, total/distinct token counts
    and the type-token ratio (an integer-exact single division)."""
    word = F.explode(_words(F.col(text_col))).alias("term")
    terms = spread_narrow(docs).select(F.col(id_col).alias("doc_id"), word)
    return terms.agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_tokens"),
        F.count_distinct("term").alias("n_distinct_terms"),
        (F.count_distinct("term") / F.count("*")).alias("type_token_ratio"),
    )


def language_composition(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-language corpus composition (docs + token mass per predicted
    language) — the report a multilingual pipeline checks before
    sampling ratios are chosen."""
    from .textstats import lang_id

    # lang_id normalizes its id column to 'doc_id' — rename up front so
    # a non-default id_col joins correctly
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    langs = lang_id(src).select("doc_id", "predicted_lang")
    toks = src.select(
        "doc_id", F.size(_words(F.col("text"))).cast("long").alias("n_tokens")
    )
    return (
        toks.join(langs, "doc_id")
        .groupBy("predicted_lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k terms by smoothed tf-idf:
    score = tf * (ln((N + 1) / (df + 1)) + 1), rounded to 6 decimals
    for engine stability; rank ties break on the term.

    (doc, term, tf) needs NO shuffle at all — term counts are a
    per-document function, so one Arrow-batched pandas pass (Counter
    over textnorm.py_words; ``or ['']`` reproduces the explode of
    split()'s empty-string case) replaces the former JVM tokenize +
    explode + groupBy exchange; the pass is pinned (localCheckpoint)
    because both the df aggregation and the scoring join consume it.
    df is an agg over it; N joins in as a broadcast scalar.  Output:
    (doc_id, term, score, rank).
    """
    import collections

    import pandas as pdd

    from ..textnorm import py_words

    def tf_gen(batches):
        for b in batches:
            ids, terms, tfs = [], [], []
            for doc_id, text in zip(b["doc_id"], b["text"]):
                if text is None:
                    continue
                for term, k in collections.Counter(
                    py_words(text) or [""]
                ).items():
                    ids.append(doc_id)
                    terms.append(term)
                    tfs.append(k)
            yield pdd.DataFrame(
                {"doc_id": pdd.Series(ids, dtype=object),
                 "term": pdd.Series(terms, dtype=object),
                 "tf": pdd.Series(tfs, dtype="int64")}
            )

    id_type = docs.schema[id_col].dataType.simpleString()
    tf = (
        spread_narrow(docs)
        .select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .mapInPandas(tf_gen, schema=f"doc_id {id_type}, term string, tf long")
        .localCheckpoint(eager=False)
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_tbl = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(n_tbl))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "score", F.col("rank").cast("long").alias("rank"))
    )


def shuffle_corpus(
    docs: DataFrame, seed: str = "7", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic global shuffle for training order: total sort by
    ``xxhash64(id, seed)`` (ties broken by id).  Training jobs need the
    corpus in a random-looking but REPRODUCIBLE order — never rand()
    (retries would resample) and never a driver-side permutation.

    Scale shape: ``orderBy`` is Spark's sampled range-exchange + local
    sort — the same mechanism that sorts 100 TB in TeraSort; no single
    task ever sees more than its key range.  Changing ``seed`` gives an
    independent epoch order."""
    key = F.xxhash64(F.col(id_col), F.lit(seed))
    return docs.orderBy(key.asc(), F.col(id_col).asc())
