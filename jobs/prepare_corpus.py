"""spark-submit entry point: raw crawl pages -> training-ready corpus.

The full post-extraction preparation chain a training-data pipeline
runs, composed from this package's operators:

    0. blocklist         drop blocked registrable domains
                         (broadcast anti-join, pre-extraction;
                         --psl resolves eTLD+1 through the real
                         public-suffix list)
    0b. robots           drop pages robots.txt disallows for '*'
                         agents (RFC 9309 incl. wildcard rules;
                         broadcast rule arrays, pre-extraction)
    1. extract           fused detect -> order -> correct -> render
    2. quality/lang      token counts, quality ratios, language ID,
                         Gopher-style repetition gate, optional
                         char-LM perplexity gate (CCNet-style)
    2b. decontaminate    optional: drop docs sharing any 13-gram with
                         a held-out evaluation set
    3. exact dedup       keep one doc per distinct content
    3b. span scrub       optional substring-level dedup (remove word
                         spans covered by cross-doc duplicate n-grams)
    4. near-dup dedup    MinHash-LSH pairs -> connected components ->
                         keep cluster representatives; --dedup-store
                         switches to INCREMENTAL mode (filter against
                         the persistent bucket state of all prior
                         batches, append this batch's delta)
    5. split             deterministic train/test assignment
    6. shard packing     fixed-token-budget shards for the tokenizer
                         (--bpe-merges trains a BPE vocab on the
                         deduped corpus and budgets shards in learned
                         subword tokens, writing bpe_merges.json)
    7. epoch shuffle     optional deterministic training order
                         (total sort by xxhash64(doc_id, seed))

Cluster usage:

    cd /root/repo && zip -qr /tmp/vlm_ocr_pipeline_spark.zip vlm_ocr_pipeline_spark
    spark-submit --master <cluster> \\
        --py-files /tmp/vlm_ocr_pipeline_spark.zip \\
        jobs/prepare_corpus.py --input <pages dir> --output <corpus dir> \\
        [--input-format parquet|warc] [--synthesize 5000] \\
        [--tokens-per-shard 1000000] [--test-fraction 0.01] \\
        [--blocklist spam.example.com,ads.example.net] \\
        [--scrub-span-ngram 8] [--epoch-seed epoch1]

Outputs under --output:
    corpus/        one row per kept doc: url, text, split, shard_id,
                   n_tokens, predicted_lang + quality columns
    report.json    row counts per stage (the run summary)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python jobs/prepare_corpus.py` runs; under spark-submit the
# package arrives via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None, spark=None) -> dict:
    """Run the job.  ``argv`` defaults to sys.argv (the spark-submit
    path); tests pass an arg list plus their session fixture as
    ``spark`` to run IN-PROCESS — same code path, no per-run JVM boot
    (the e2e suite spawned six cold JVMs before this hook existed).
    A caller-provided session is never stopped.  Returns the report."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--input-format", choices=["parquet", "warc"],
                    default="parquet",
                    help="pages table (parquet) or raw .warc/.warc.gz files")
    ap.add_argument("--output", required=True)
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate N synthetic pages into --input first")
    ap.add_argument("--tokens-per-shard", type=int, default=1_000_000)
    ap.add_argument("--test-fraction", type=float, default=0.01)
    ap.add_argument("--min-words", type=int, default=20)
    ap.add_argument("--lsh-hashes", type=int, default=8)
    ap.add_argument("--lsh-bands", type=int, default=4)
    ap.add_argument("--blocklist", default="",
                    help="comma-separated registrable domains to drop")
    ap.add_argument("--psl", default="",
                    help="'builtin' (bundled snapshot) or a public-"
                         "suffix-list file; resolves blocklist domains "
                         "through the real PSL instead of the heuristic")
    ap.add_argument("--robots", default="",
                    help="parquet of (host, body) robots.txt fetches; "
                         "disallowed pages are dropped pre-extraction "
                         "(RFC 9309 incl. wildcards)")
    ap.add_argument("--robots-user-agent", default="",
                    help="this crawler's product token for robots group "
                         "selection (most specific match wins; default: "
                         "'*' groups only)")
    ap.add_argument("--bpe-merges", type=int, default=0,
                    help="if > 0, train a BPE vocab of this many merges "
                         "on the deduped corpus, pack shards by LEARNED "
                         "token counts, and write bpe_merges.json")
    ap.add_argument("--unigram-vocab", type=int, default=0,
                    help="if > 0, train a SentencePiece-style unigram-LM "
                         "vocab of this size instead (mutually exclusive "
                         "with --bpe-merges), pack shards by its Viterbi "
                         "token counts, and write unigram_vocab.json")
    ap.add_argument("--scrub-span-ngram", type=int, default=0,
                    help="if > 0, remove word spans covered by n-grams "
                         "shared across docs (substring-level dedup)")
    ap.add_argument("--dedup-store", default="",
                    help="parquet dir of LSH bucket state (8-byte keys, "
                         "no text). When set, near-dup dedup runs "
                         "INCREMENTALLY: this batch filters against the "
                         "store (its scan never shuffles or broadcasts) "
                         "and appends its own delta — the continuous-"
                         "crawl mode. First run seeds the store.")
    ap.add_argument("--neardup-min-bands", type=int, default=1,
                    help="require this many shared LSH bands (with the "
                         "same stored doc) before a near-dup drop; > 1 "
                         "switches the store to signature rows")
    ap.add_argument("--neardup-min-jaccard", type=float, default=0.0,
                    help="if > 0, additionally require the signature-"
                         "estimated Jaccard vs the colliding doc to "
                         "reach this value before dropping (verified "
                         "drops; store carries signatures)")
    ap.add_argument("--compact-dedup-store", action="store_true",
                    help="after appending this batch's delta, distinct-"
                         "merge the store's accumulated deltas into one "
                         "partition set (bounds scan cost as batches "
                         "accumulate); before/after stats land in the "
                         "report")
    ap.add_argument("--epoch-seed", default="",
                    help="if set, write the corpus in deterministic "
                         "shuffled order keyed by this seed")
    ap.add_argument("--pin-dir", default="",
                    help="stage-pin directory: when set, inter-stage "
                         "pins are DURABLE parquet tables under this "
                         "dir (a lost executor replays from storage — "
                         "the right mode for long cluster runs) instead "
                         "of executor-local checkpoint blocks (fastest; "
                         "single-node/bench default)")
    ap.add_argument("--quality-reference", default="",
                    help="parquet of (doc_id, text) GOOD-corpus docs; "
                         "with --min-p-good trains a fastText-style "
                         "hashed classifier (reference = positives, "
                         "this corpus = negatives, CCNet-style) and "
                         "keeps docs scoring >= the threshold")
    ap.add_argument("--min-p-good", type=float, default=0.0)
    ap.add_argument("--fix-mojibake", action="store_true",
                    help="repair UTF-8-read-as-1252 mangled text "
                         "(charset.fix_mojibake; idempotent, no-op on "
                         "clean documents)")
    ap.add_argument("--max-bits-per-byte", type=float, default=0.0,
                    help="if > 0, drop docs scoring above this char-LM "
                         "perplexity (bits/byte; model trained on a "
                         "deterministic sample of this corpus)")
    ap.add_argument("--decontaminate-against", default="",
                    help="parquet of (doc_id, text) eval docs; train "
                         "docs sharing any 13-gram are dropped")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from vlm_ocr_pipeline_spark.operators.corpus import (
        deterministic_split,
        pack_token_shards,
    )
    from vlm_ocr_pipeline_spark.operators.text_dedup import (
        dedup_keep_representatives,
        neardup_clusters,
    )
    from vlm_ocr_pipeline_spark.operators.textstats import (
        quality_lang,
        repetition_quality,
    )
    from vlm_ocr_pipeline_spark.plans.pipeline import extract
    from vlm_ocr_pipeline_spark.plans.session import get_spark

    owns_session = spark is None
    if owns_session:
        spark = get_spark(app="prepare-corpus")
    report: dict[str, int] = {}

    _pin_n = [0]

    def pin(df):
        """Materialize-and-truncate between stages: every optional gate
        re-branches docs onto itself (docs ⋈ f(docs)), so with cache()
        the final write's plan STRING doubles per stage — an 11-stage
        run OOMed the driver merely rendering it.  Two modes:

        - default: eager localCheckpoint — executor-local blocks,
          fastest, but a lost executor kills the chain (fine for
          single-node and bench runs);
        - ``--pin-dir``: durable parquet stage tables — each pin is a
          write + re-read, so a lost executor replays from storage and
          the run survives node loss (the mode for real cluster runs;
          the stage files double as debuggable intermediates)."""
        if args.pin_dir:
            _pin_n[0] += 1
            p = os.path.join(args.pin_dir, f"stage_{_pin_n[0]:02d}")
            df.write.mode("overwrite").parquet(p)
            return spark.read.parquet(p)
        return df.localCheckpoint(eager=True)

    if args.synthesize:
        from vlm_ocr_pipeline_spark.sources.datagen import synth_pages

        synth_pages(spark, args.synthesize).write.mode("overwrite").parquet(
            args.input
        )

    if args.input_format == "warc":
        from vlm_ocr_pipeline_spark.sources.warc import read_warc

        pages = read_warc(spark, args.input)
    else:
        pages = spark.read.parquet(args.input)

    # 0. domain blocklist BEFORE extraction — dropping a page here is
    # a string expression + broadcast anti-join; dropping it after
    # costs a full parse
    if args.blocklist:
        from vlm_ocr_pipeline_spark.operators.urls import blocklist_filter, load_psl

        psl = None
        if args.psl == "builtin":
            psl = load_psl(spark)
        elif args.psl:
            with open(args.psl) as f:
                psl = load_psl(spark, f.read().splitlines())
        domains = [d.strip() for d in args.blocklist.split(",") if d.strip()]
        pages = blocklist_filter(pages, domains, psl=psl)
        report["blocklist_domains"] = len(domains)

    # 0b. robots.txt compliance BEFORE extraction — the rules broadcast
    # as one array row per host, so this is also shuffle-free on pages
    if args.robots:
        from vlm_ocr_pipeline_spark.operators.urls import (
            parse_robots_rules,
            robots_disallow_filter,
        )

        rules = parse_robots_rules(
            spark.read.parquet(args.robots),
            user_agent=args.robots_user_agent or None,
        )
        pages = robots_disallow_filter(pages, rules)
        report["robots_hosts"] = rules.select("host").distinct().count()

    # 1. extraction (plaintext is the training text).  doc_id keys on
    # the FULL (url, warc_ts) identity — recrawls of one url are
    # distinct docs (the checkpoint-key semantics), and a url-only hash
    # would collide them into multiplicative self-joins downstream.
    # Cache BEFORE deriving the gate tables: keep_ids and langs both
    # branch off docs, and an uncached plan would re-run the mapInPandas
    # extraction once per branch.  pages_in is counted off the CACHED
    # extraction output (one row per page, pre-status-filter), never
    # off the raw pages frame — for WARC input a pages.count() would
    # decompress and record-walk every archive a second time.
    ext = extract(pages, renderer="plaintext").cache()
    report["pages_in"] = ext.count()
    docs = ext.filter(F.col("status") == "complete").select(
        "url",
        F.xxhash64("url", "warc_ts").alias("doc_id"),
        F.col("rendered").alias("text"),
    )

    # 1b. optional mojibake repair BEFORE any quality/dedup signal:
    # mangled and clean editions of one page must hash identically,
    # and quality ratios on repaired text are the real ones
    if args.fix_mojibake:
        from vlm_ocr_pipeline_spark.operators.textstats import repair_mojibake

        docs = repair_mojibake(docs)

    # 2. quality + language + repetition gates (quality_lang = one
    # projection for both signal families; repetition_quality drops
    # machine-looped pages)
    ql = quality_lang(docs.select("doc_id", "text")).select(
        "doc_id", "n_words", "predicted_lang"
    )
    docs = docs.join(ql.filter(F.col("n_words") >= args.min_words), "doc_id")
    rq = repetition_quality(docs.select("doc_id", "text"))
    docs = (
        docs.join(rq.filter(F.col("quality_pass")).select("doc_id"), "doc_id")
        .drop("n_words")
    )
    docs = pin(docs)
    report["after_quality_gate"] = docs.count()

    # 2-continued: optional reference-corpus classifier gate — the
    # fastText-style hashed linear model trains on bounded samples
    # (reference = positives, this corpus = negatives) and scoring is
    # one Arrow-batched projection
    if args.quality_reference and args.min_p_good > 0:
        from vlm_ocr_pipeline_spark.operators.textstats import (
            quality_classifier_score,
            train_quality_classifier,
        )

        from vlm_ocr_pipeline_spark.operators.textstats import (
            calibrate_quality_classifier,
        )

        ref = spark.read.parquet(args.quality_reference)
        model = train_quality_classifier(ref, docs)
        # held-out AUC + threshold sweep so --min-p-good is chosen
        # from data (suggested_threshold = best F1 on the holdout)
        report["quality_classifier"] = calibrate_quality_classifier(
            ref, docs, model
        )
        keep = quality_classifier_score(docs, model).filter(
            F.col("p_good") >= args.min_p_good
        )
        docs = pin(docs.join(keep.select("doc_id"), "doc_id"))
        report["after_classifier_gate"] = docs.count()

    # 2-continued: optional CCNet-style perplexity gate — the bigram
    # LM trains on a bounded deterministic sample of THIS corpus, so
    # the gate drops distribution outliers (wrong alphabet, encoding
    # garbage) rather than enforcing an external notion of quality
    if args.max_bits_per_byte > 0:
        from vlm_ocr_pipeline_spark.operators.textstats import (
            lm_perplexity,
            train_char_lm,
        )

        lm = train_char_lm(docs)
        keep = lm_perplexity(docs, lm).filter(
            F.col("bits_per_byte") <= args.max_bits_per_byte
        )
        docs = pin(docs.join(keep.select("doc_id"), "doc_id"))
        report["after_perplexity_gate"] = docs.count()

    # 2b. optional benchmark decontamination
    if args.decontaminate_against:
        from vlm_ocr_pipeline_spark.operators.text_dedup import decontaminate

        eval_docs = spark.read.parquet(args.decontaminate_against)
        hits = decontaminate(docs, eval_docs).select("doc_id")
        docs = pin(docs.join(hits, "doc_id", "left_anti"))
        report["after_decontamination"] = docs.count()

    # 3. exact dedup
    docs = pin(dedup_keep_representatives(docs))
    report["after_exact_dedup"] = docs.count()

    # 3b. optional substring-level dedup: scrub cross-doc duplicate
    # n-gram spans (licence blocks, boilerplate sentences), then drop
    # docs the scrub emptied below the min-words bar
    if args.scrub_span_ngram > 0:
        from vlm_ocr_pipeline_spark.operators.text_dedup import (
            duplicate_ngram_spans,
            scrub_duplicate_spans,
        )

        spans = duplicate_ngram_spans(docs, n=args.scrub_span_ngram)
        scrubbed = scrub_duplicate_spans(docs, spans)
        docs = (
            docs.select("doc_id", "url")
            .join(scrubbed, "doc_id")
            .filter(F.length(F.trim("text")) > 0)
            .drop("n_scrubbed_words")
        )
        docs = pin(docs)
        report["after_span_scrub"] = docs.count()

    # 4. near-dup dedup: keep each LSH cluster's representative.  With
    # --dedup-store, the batch ALSO dedups against every prior batch's
    # bucket state (incremental/continuous-crawl mode) and appends its
    # delta for the next run.
    store = None
    # LSH params are part of the store's identity: buckets built with
    # different (num_hashes, bands) NEVER collide with this batch's, so
    # a mismatched store would silently dedup nothing.  A sidecar meta
    # file pins the params at seed time and hard-fails on mismatch.
    min_jacc = args.neardup_min_jaccard if args.neardup_min_jaccard > 0 else None
    verified = args.neardup_min_bands > 1 or min_jacc is not None
    # "signatures" is part of the STORE FORMAT identity (bucket-only
    # rows can't verify), so it lives in the sidecar; the gate
    # thresholds themselves may vary run to run
    meta = {"num_hashes": args.lsh_hashes, "bands": args.lsh_bands,
            "n": 3, "hash_family": "md5", "signatures": verified}
    if args.dedup_store:
        from vlm_ocr_pipeline_spark.operators.text_dedup import (
            dedup_store_exists,
            ensure_dedup_meta,
        )

        # first-run detection is EXPLICIT (dir absent / no parquet part
        # files): a catch-all around the read once treated any transient
        # read failure as "first run" and the seed branch then
        # mode('overwrite')-destroyed the accumulated store.  A real
        # read error now propagates.  ensure_dedup_meta verifies the
        # LSH-param sidecar (hard-fail on mismatch) and backfills it on
        # stores seeded before the guard existed.
        if dedup_store_exists(args.dedup_store):
            ensure_dedup_meta(
                args.dedup_store, meta, legacy_defaults={"signatures": False}
            )
            store = spark.read.parquet(args.dedup_store)
    if store is not None:
        from vlm_ocr_pipeline_spark.operators.text_dedup import (
            incremental_neardup,
            lsh_bucket_store,
            lsh_signature_store,
        )

        docs, _ = incremental_neardup(
            docs, store, num_hashes=args.lsh_hashes, bands=args.lsh_bands,
            min_bands=args.neardup_min_bands, min_jaccard=min_jacc,
        )
        docs = pin(docs)
        report["after_neardup_dedup"] = docs.count()
        # delta from the PINNED frame: the store maker on kept docs
        # equals the delta incremental_neardup returned by
        # construction, but reads the checkpointed blocks instead of
        # re-running the batch's MinHash/bucket joins a second time
        maker = lsh_signature_store if verified else lsh_bucket_store
        maker(
            docs, num_hashes=args.lsh_hashes, bands=args.lsh_bands
        ).write.mode("append").parquet(args.dedup_store)
        report["dedup_store_mode"] = "incremental"
        if args.compact_dedup_store:
            from vlm_ocr_pipeline_spark.operators.text_dedup import (
                compact_dedup_store,
            )

            report["dedup_store_compaction"] = compact_dedup_store(
                spark, args.dedup_store
            )
    else:
        clusters = neardup_clusters(
            docs, num_hashes=args.lsh_hashes, bands=args.lsh_bands,
            min_bands=args.neardup_min_bands, min_jaccard=min_jacc,
        )
        reps = clusters.filter(
            F.col("doc_id") == F.col("representative")
        ).select("doc_id")
        docs = pin(docs.join(reps, "doc_id"))
        report["after_neardup_dedup"] = docs.count()
        if args.dedup_store:
            from vlm_ocr_pipeline_spark.operators.text_dedup import (
                ensure_dedup_meta,
                lsh_bucket_store,
                lsh_signature_store,
            )

            maker = lsh_signature_store if verified else lsh_bucket_store
            maker(
                docs, num_hashes=args.lsh_hashes, bands=args.lsh_bands
            ).write.mode("overwrite").parquet(args.dedup_store)
            ensure_dedup_meta(args.dedup_store, meta)
            report["dedup_store_mode"] = "seeded"

    # 5 + 6. split and shard.  With --bpe-merges the shard budget
    # counts LEARNED subword tokens: the vocab trains on the deduped
    # corpus (distributed word count, driver merge loop) and the merge
    # list lands next to the corpus so the training run tokenizes with
    # exactly the vocabulary the shards were budgeted in.
    if args.bpe_merges > 0 and args.unigram_vocab > 0:
        raise SystemExit("--bpe-merges and --unigram-vocab are mutually "
                         "exclusive (pick one tokenizer)")
    split = deterministic_split(docs, args.test_fraction)
    merges = None
    counts = None
    if args.bpe_merges > 0:
        from vlm_ocr_pipeline_spark.operators.bpe import train_bpe_vocab

        merges = train_bpe_vocab(docs, num_merges=args.bpe_merges)
        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "bpe_merges.json"), "w") as f:
            json.dump([list(p) for p in merges], f)
        report["bpe_merges"] = len(merges)
    elif args.unigram_vocab > 0:
        from vlm_ocr_pipeline_spark.operators.unigram_lm import (
            apply_unigram,
            train_unigram_vocab,
        )

        vocab = train_unigram_vocab(docs, vocab_size=args.unigram_vocab)
        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "unigram_vocab.json"), "w") as f:
            json.dump([[p, lp] for p, lp in vocab], f)
        report["unigram_vocab"] = len(vocab)
        counts = apply_unigram(docs, vocab).select(
            "doc_id", F.col("n_ul_tokens").cast("long").alias("n_tokens")
        )
    shards = pack_token_shards(
        docs, args.tokens_per_shard, bpe_merges=merges, counts=counts
    )
    corpus = docs.join(split, "doc_id").join(shards, "doc_id")

    # 7. optional deterministic epoch order for the tokenizer reader
    if args.epoch_seed:
        from vlm_ocr_pipeline_spark.operators.corpus import shuffle_corpus

        corpus = shuffle_corpus(corpus, seed=args.epoch_seed)

    out = os.path.join(args.output, "corpus")
    corpus.write.mode("overwrite").parquet(out)
    final = spark.read.parquet(out)
    report["corpus_rows"] = final.count()
    report["n_shards"] = final.select("shard_id").distinct().count()
    report["n_test"] = final.filter(F.col("split") == "test").count()

    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    if owns_session:
        spark.stop()
    return report


if __name__ == "__main__":
    main()
