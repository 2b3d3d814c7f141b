"""Corpus-preparation operators: deterministic split, shard packing,
tf-idf top terms."""

import pytest

from vlm_ocr_pipeline_spark.operators import corpus


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{j % 7}" for j in range(i % 40 + 5))) for i in range(200)]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_split_is_deterministic_and_near_fraction(spark, docs):
    a = corpus.deterministic_split(docs, 0.2).toPandas().set_index("doc_id")
    b = corpus.deterministic_split(docs, 0.2).toPandas().set_index("doc_id")
    assert a.sort_index().equals(b.sort_index())  # stable across runs
    frac = (a["split"] == "test").mean()
    assert 0.1 < frac < 0.3  # md5 buckets approximate the fraction
    # changing the salt reshuffles assignments
    c = corpus.deterministic_split(docs, 0.2, salt="other").toPandas()
    assert not a.sort_index()["split"].equals(
        c.set_index("doc_id").sort_index()["split"]
    )


def test_shard_packing_invariants(spark, docs):
    out = (
        corpus.pack_token_shards(docs, tokens_per_shard=100)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 200
    # shard ids are non-decreasing in doc order and start at 0
    assert out["shard_id"].iloc[0] == 0
    assert (out["shard_id"].diff().dropna() >= 0).all()
    # every shard's token total stays under budget + one max doc
    totals = out.groupby("shard_id")["n_tokens"].sum()
    assert (totals <= 100 + out["n_tokens"].max()).all()
    # exclusive-prefix rule: global cumsum reproduces shard ids exactly
    cum = out["n_tokens"].cumsum() - out["n_tokens"]
    assert (out["shard_id"] == cum // 100).all()


def test_shard_packing_partition_independent(spark, docs):
    a = (
        corpus.pack_token_shards(docs, 100, num_range_partitions=2)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        corpus.pack_token_shards(docs, 100, num_range_partitions=7)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_tfidf_ranks_distinctive_terms_first(spark):
    rows = [
        (0, "common common common rare0 rare0 rare0 rare0"),
        (1, "common unique1 unique1"),
        (2, "common other2"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = corpus.tfidf_top_terms(d, k=2).toPandas()
    top = out[out["rank"] == 1].set_index("doc_id")["term"]
    assert top[0] == "rare0"     # frequent AND rare beats ubiquitous
    assert top[1] == "unique1"
    assert (out.groupby("doc_id").size() <= 2).all()


def test_url_canonicalization(spark):
    from vlm_ocr_pipeline_spark.operators import urls

    rows = [
        (0, "HTTPS://Docs.Example.org:443/doc/1/?utm_source=x&b=2&a=1"),
        (1, "https://docs.example.org/doc/1?b=2&a=1&fbclid=zz"),
        (2, "http://HOST.example.org:80/path#frag"),
        (3, "https://host.example.org"),
        (4, "https://host.example.org/a/b/"),
        (5, "https://host.example.org/doc?ref=tw&gclid=1"),
    ]
    d = spark.createDataFrame(rows, ["i", "url"])
    out = urls.canonicalize_urls(d).toPandas().set_index("url")["canonical_url"]
    assert out[rows[0][1]] == "https://docs.example.org/doc/1?a=1&b=2"
    assert out[rows[1][1]] == "https://docs.example.org/doc/1?a=1&b=2"
    assert out[rows[2][1]] == "http://host.example.org/path"
    assert out[rows[3][1]] == "https://host.example.org/"
    assert out[rows[4][1]] == "https://host.example.org/a/b"
    assert out[rows[5][1]] == "https://host.example.org/doc"
    groups = urls.url_dup_groups(d).toPandas()
    g = groups.set_index("canonical_url")
    assert g.loc["https://docs.example.org/doc/1?a=1&b=2", "n_variants"] == 2


def test_chunking_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    d = spark.createDataFrame([(0, text), (1, "a b c")], ["doc_id", "text"])
    out = (
        corpus.chunk_documents(d, chunk_tokens=40, overlap=8)
        .toPandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    c0 = out[out.doc_id == 0]
    assert list(c0["chunk_idx"]) == [0, 1, 2]  # ceil((100-8)/32) = 3
    toks = [r.split(" ") for r in c0["chunk_text"]]
    assert [len(t) for t in toks] == [40, 40, 36]
    assert toks[0][-8:] == toks[1][:8]  # consecutive windows share overlap
    assert toks[1][-8:] == toks[2][:8]
    # short doc: one chunk, whole text
    c1 = out[out.doc_id == 1]
    assert list(c1["chunk_text"]) == ["a b c"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus.chunk_documents(d, chunk_tokens=8, overlap=8)


def test_pii_scrub_redacts_and_counts(spark):
    rows = [
        (0, "reach me at jane.doe+x@sub.example-corp.io or +44 (020) 7946-0958 ok"),
        (1, "no pii here at all"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = corpus.scrub_pii(d).toPandas().set_index("doc_id")
    assert "<EMAIL>" in out.loc[0, "scrubbed"]
    assert "<PHONE>" in out.loc[0, "scrubbed"]
    assert "jane" not in out.loc[0, "scrubbed"] and "7946" not in out.loc[0, "scrubbed"]
    assert out.loc[0, "n_emails"] == 1 and out.loc[0, "n_phones"] == 1
    assert out.loc[1, "scrubbed"] == "no pii here at all"
    assert out.loc[1, "n_emails"] == 0 and out.loc[1, "n_phones"] == 0


def test_url_canonicalization_schemeless_passthrough(spark):
    """Schemeless/malformed urls pass through unchanged — never
    collapse to one ':///' dedup group."""
    from vlm_ocr_pipeline_spark.operators import urls

    rows = [(0, "www.a.com/x"), (1, "example.org/y"), (2, "not a url")]
    d = spark.createDataFrame(rows, ["i", "url"])
    out = urls.canonicalize_urls(d).toPandas()
    assert (out["canonical_url"] == out["url"]).all()
    assert urls.url_dup_groups(d).count() == 3  # three distinct groups


def test_language_composition_custom_id_col(spark):
    d = spark.createDataFrame(
        [("u1", "the cat and the dog of it"), ("u2", "der Hund und die Katze und")],
        ["url", "body"],
    )
    out = (
        corpus.language_composition(d, id_col="url", text_col="body")
        .toPandas().set_index("predicted_lang")
    )
    assert out.loc["en", "n_docs"] == 1 and out.loc["de", "n_docs"] == 1


def test_chunk_reconstruction_property(spark):
    """For ANY doc length: chunk 0 plus every later chunk minus its
    overlap prefix reconstructs the token stream exactly (windows are
    contiguous with stride = chunk - overlap)."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (i, " ".join(f"x{int(rng.integers(0, 9))}"
                     for _ in range(int(rng.integers(1, 200)))))
        for i in range(60)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = (
        corpus.chunk_documents(d, chunk_tokens=32, overlap=8)
        .toPandas().sort_values(["doc_id", "chunk_idx"])
    )
    texts = dict(rows)
    for doc_id, grp in out.groupby("doc_id"):
        toks: list[str] = []
        for j, t in enumerate(grp["chunk_text"]):
            tt = t.split(" ")
            toks.extend(tt if j == 0 else tt[8:])
        assert " ".join(toks) == texts[doc_id], doc_id


def test_shard_packing_conserves_every_doc_once(spark):
    import numpy as np

    rng = np.random.default_rng(6)
    rows = [
        (i, " ".join("w" for _ in range(int(rng.integers(1, 120)))))
        for i in range(150)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = corpus.pack_token_shards(d, tokens_per_shard=300).toPandas()
    assert sorted(out["doc_id"]) == list(range(150))       # once each
    assert out["n_tokens"].sum() == sum(len(t.split()) for _, t in rows)


def test_asof_join_semantics(spark):
    """Inclusive at-or-before matching, null when nothing precedes,
    per-key isolation."""
    import datetime as dt

    from vlm_ocr_pipeline_spark.operators.asof import asof_join

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 100, T(10)), (1, 101, T(5)), (1, 102, T(1)), (2, 200, T(10))],
        ["k", "lid", "ts"],
    )
    right = spark.createDataFrame(
        [(1, 900, T(5)), (1, 901, T(8))], ["k", "rid", "ts"]
    )
    out = asof_join(
        left, right, on="k", left_time="ts", right_time="ts",
        value_cols=["rid"], prefix="m_",
    ).toPandas().set_index("lid")
    assert out.loc[100, "m_rid"] == 901       # latest at-or-before t=10
    assert out.loc[101, "m_rid"] == 900       # equal time matches (>=)
    assert out.loc[102, "m_rid"] is None or out.loc[102].isna()["m_rid"]
    assert out.loc[200].isna()["m_rid"]       # other key: no right rows


def test_range_join_equals_naive_between(spark):
    """The bucketized plan must produce exactly the naive
    BETWEEN-join's pairs (each point matches once per covering
    interval, whatever the bucket width)."""
    import datetime as dt

    import pyspark.sql.functions as F

    from vlm_ocr_pipeline_spark.operators.asof import range_join

    T = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    pts = spark.createDataFrame(
        [(1, i, T(i * 7 % 60)) for i in range(20)] + [(2, 99, T(30))],
        ["k", "pid", "ts"],
    )
    iv = spark.createDataFrame(
        [(1, 0, T(5), T(25)), (1, 1, T(20), T(59)), (2, 0, T(40), T(50))],
        ["k", "iid", "s", "e"],
    )
    for width in (60, 600, 3600):
        got = {
            (r.pid, r.iid)
            for r in range_join(pts, iv, "k", "ts", "s", "e", width).collect()
        }
        naive = {
            (r.pid, r.iid)
            for r in pts.join(
                iv, (pts.k == iv.k) & (pts.ts >= iv.s) & (pts.ts <= iv.e)
            ).collect()
        }
        assert got == naive and len(got) > 0, width


def test_hypertable_rollup_derivation_consistency(spark):
    """The coarse rollup DERIVED from the fine one (sums of sums) must
    equal the coarse rollup computed from raw events — the
    continuous-aggregate refresh invariant."""
    import pyspark.sql.functions as F

    from vlm_ocr_pipeline_spark.operators.rollup_time import (
        derive_coarser,
        hypertable_rollup,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    full = hypertable_rollup(events).cache()
    direct = (
        full.filter(F.col("resolution") == "1 hour")
        .orderBy("bucket_start", "key").toPandas().reset_index(drop=True)
    )
    derived = (
        derive_coarser(full, "1 minute", "1 hour")
        .select("resolution", "bucket_start", "key", "n_events", "total_value")
        .orderBy("bucket_start", "key").toPandas().reset_index(drop=True)
    )
    assert direct.equals(derived)
    # every resolution conserves the event count
    totals = full.groupBy("resolution").agg(F.sum("n_events").alias("n")).toPandas()
    assert (totals["n"] == events.count()).all()


def test_asof_join_sliced_parity(spark):
    """The hot-key-safe sliced variant must return exactly asof_join's
    result at any slice width (including widths smaller than gaps, so
    carry-in crosses several empty slices)."""
    import datetime as dt

    from vlm_ocr_pipeline_spark.operators.asof import asof_join, asof_join_sliced

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, i, T(i * 7 % 59)) for i in range(30)] + [(2, 99, T(3))],
        ["k", "lid", "ts"],
    )
    right = spark.createDataFrame(
        [(1, 900, T(5)), (1, 901, T(8)), (1, 902, T(40)), (3, 950, T(1))],
        ["k", "rid", "ts"],
    )
    base = (
        asof_join(left, right, "k", "ts", "ts", ["rid"], "m_")
        .orderBy("lid").toPandas().reset_index(drop=True)
    )
    for width in (1, 4, 30, 86400):
        sliced = (
            asof_join_sliced(left, right, "k", "ts", "ts", ["rid"], "m_",
                             slice_seconds=width)
            .orderBy("lid").toPandas().reset_index(drop=True)
        )
        assert base.equals(sliced[base.columns.tolist()]), width


def test_asof_join_duplicate_right_timestamp_ties(spark):
    """Equal-timestamp right rows resolve deterministically to the max
    value struct in BOTH variants (the round-3 advice: the sliced
    carry-in tie-broke by value while the window left it unspecified)."""
    import datetime as dt

    from vlm_ocr_pipeline_spark.operators.asof import asof_join, asof_join_sliced

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame([(1, 0, T(30))], ["k", "lid", "ts"])
    # three right rows at the SAME timestamp in the last slice before a
    # gap — exactly the divergence case flagged
    right = spark.createDataFrame(
        [(1, 900, T(5)), (1, 907, T(5)), (1, 903, T(5))], ["k", "rid", "ts"]
    ).repartition(3)
    base = asof_join(left, right, "k", "ts", "ts", ["rid"], "m_").collect()
    assert base[0]["m_rid"] == 907  # max value wins, not shuffle order
    for width in (1, 10, 86400):
        got = asof_join_sliced(
            left, right, "k", "ts", "ts", ["rid"], "m_", slice_seconds=width
        ).collect()
        assert got[0]["m_rid"] == 907, width


def test_asof_reserved_column_guard(spark):
    import datetime as dt

    import pytest as _pt

    from vlm_ocr_pipeline_spark.operators.asof import asof_join, range_join

    T = dt.datetime(2024, 1, 1)
    bad = spark.createDataFrame([(1, T, 0)], ["k", "ts", "_side"])
    ok = spark.createDataFrame([(1, T, 5)], ["k", "ts", "v"])
    with _pt.raises(ValueError, match="_side"):
        asof_join(bad, ok, "k", "ts", "ts", ["v"])
    with _pt.raises(ValueError, match="reserved"):
        range_join(ok.withColumnRenamed("v", "_b"), ok, "k", "ts", "ts", "ts")


def test_pack_token_shards_exact_prefix_sum(spark):
    """Shard assignment equals the exact driver-side prefix sum even
    when input ids arrive reverse-ordered across many partitions (no
    dependence on pid/range alignment)."""
    rows = [(i, " ".join(["tok"] * (1 + i % 13))) for i in reversed(range(200))]
    d = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(7)
    out = (
        corpus.pack_token_shards(d, tokens_per_shard=100, num_range_partitions=5)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    running = 0
    for i in range(200):
        n = 1 + i % 13
        assert out.loc[i, "n_tokens"] == n
        assert out.loc[i, "shard_id"] == running // 100, i
        running += n


def test_shuffle_corpus_deterministic_total_order(spark, docs):
    a = [r["doc_id"] for r in corpus.shuffle_corpus(docs).collect()]
    b = [r["doc_id"] for r in corpus.shuffle_corpus(docs).collect()]
    assert a == b  # reproducible epoch order
    assert sorted(a) == list(range(200))  # a permutation, nothing lost
    assert a != sorted(a)  # actually shuffled away from id order
    c = [r["doc_id"] for r in corpus.shuffle_corpus(docs, seed="epoch2").collect()]
    assert c != a and sorted(c) == sorted(a)  # independent epoch
    # scale shape: a sampled range exchange + sort, never a single task
    plan = corpus.shuffle_corpus(docs)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan and "Sort [" in plan
    assert "SinglePartition" not in plan
