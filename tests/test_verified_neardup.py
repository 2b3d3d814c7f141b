"""Signature-verified near-dup drops (round-4 verdict item: a single
3-hash band collision must not irreversibly discard a non-duplicate).

A Python mirror of the md5 minhash/band construction plants a pair
that shares EXACTLY ONE band at true Jaccard ~0.4 (a statistically
expected false positive of raw 1-band LSH) and a true near-dup pair —
then asserts the gates keep the former and still drop the latter.
"""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from vlm_ocr_pipeline_spark.operators import text_dedup

NUM_HASHES, BANDS = 12, 4


def _shingles(text: str, n: int = 3) -> set[str]:
    w = text.split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _sig(text: str) -> list[str]:
    sh = _shingles(text)
    return [
        min(
            hashlib.md5(f"{s}:{k}".encode()).hexdigest() for s in sh
        )
        for k in range(NUM_HASHES)
    ]


def _bands(sig: list[str]) -> list[tuple[str, ...]]:
    rpb = NUM_HASHES // BANDS
    return [tuple(sig[b * rpb : (b + 1) * rpb]) for b in range(BANDS)]


def _shared_bands(a: str, b: str) -> int:
    return sum(x == y for x, y in zip(_bands(_sig(a)), _bands(_sig(b))))


def _jaccard(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


def _agree(a: str, b: str) -> float:
    return sum(x == y for x, y in zip(_sig(a), _sig(b))) / NUM_HASHES


def _plant() -> tuple[str, str, str]:
    """(base, midsim, neardup): midsim shares EXACTLY one band with
    base at true Jaccard in [0.3, 0.55] and signature agreement < 0.5
    (and is clearly separate from neardup too); neardup shares >= 2
    bands with base at Jaccard >= 0.7 and agreement >= 0.7.

    Deterministic search over md5: the base TAIL varies too, because a
    fixed base whose per-hash minima all come from its unshared tail
    can never share a band with any prefix-overlap candidate (the
    shared-shingle minima would have to win on both sides)."""
    prefix = [f"tok{i}" for i in range(18)]
    for u in range(60):
        base = " ".join(prefix + [f"base{u}_{j}" for j in range(12)])
        neardup = None
        for v in range(600):
            nd = " ".join(base.split()[:-1] + [f"end{v}"])
            if (
                _shared_bands(base, nd) >= 2
                and _jaccard(base, nd) >= 0.7
                and _agree(base, nd) >= 0.7
            ):
                neardup = nd
                break
        if neardup is None:
            continue
        for v in range(3000):
            cand = " ".join(prefix + [f"alt{v}_{j}" for j in range(12)])
            if (
                _shared_bands(base, cand) == 1
                and 0.3 <= _jaccard(base, cand) <= 0.55
                and _agree(base, cand) < 0.5
                and _shared_bands(neardup, cand) <= 1
                and _agree(neardup, cand) < 0.5
            ):
                return base, cand, neardup
    raise AssertionError("planting failed — md5 landscape changed?")


BASE, MIDSIM, NEARDUP = _plant()


def test_planted_pair_properties():
    assert _shared_bands(BASE, MIDSIM) == 1
    assert 0.3 <= _jaccard(BASE, MIDSIM) <= 0.55
    assert _shared_bands(BASE, NEARDUP) >= 2
    assert _jaccard(BASE, NEARDUP) >= 0.7
    # signature agreement mirrors: midsim low, neardup high
    assert _agree(BASE, MIDSIM) < 0.5
    assert _agree(BASE, NEARDUP) >= 0.7


def _store_and_batch(spark):
    hist = spark.createDataFrame([(1, BASE)], ["doc_id", "text"])
    store = text_dedup.lsh_signature_store(
        hist, num_hashes=NUM_HASHES, bands=BANDS
    )
    batch = spark.createDataFrame(
        [(100, MIDSIM), (101, NEARDUP), (102, "totally different words "
          + " ".join(f"zz{i}" for i in range(20)))],
        ["doc_id", "text"],
    )
    return store, batch


def test_unverified_default_drops_the_J04_nondup(spark):
    """The documented over-drop: any shared bucket kills the doc."""
    store, batch = _store_and_batch(spark)
    kept, _ = text_dedup.incremental_neardup(
        batch, store, num_hashes=NUM_HASHES, bands=BANDS, within_batch=False
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [102]


def test_min_bands_gate_keeps_J04_drops_true_neardup(spark):
    store, batch = _store_and_batch(spark)
    kept, delta = text_dedup.incremental_neardup(
        batch, store, num_hashes=NUM_HASHES, bands=BANDS,
        within_batch=False, min_bands=2,
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [100, 102]
    # verified mode emits a SIGNATURE delta (store stays verifiable)
    assert set(delta.columns) == {"bk", "sig"}
    assert all(len(r["sig"]) == NUM_HASHES for r in delta.collect())


def test_min_jaccard_gate_keeps_J04_drops_true_neardup(spark):
    store, batch = _store_and_batch(spark)
    kept, _ = text_dedup.incremental_neardup(
        batch, store, num_hashes=NUM_HASHES, bands=BANDS,
        within_batch=False, min_bands=1, min_jaccard=0.6,
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [100, 102]


def test_gates_require_signature_store(spark):
    hist = spark.createDataFrame([(1, BASE)], ["doc_id", "text"])
    bucket_store = text_dedup.lsh_bucket_store(
        hist, num_hashes=NUM_HASHES, bands=BANDS
    )
    batch = spark.createDataFrame([(100, MIDSIM)], ["doc_id", "text"])
    with pytest.raises(ValueError, match="signature store"):
        text_dedup.incremental_neardup(
            batch, bucket_store, num_hashes=NUM_HASHES, bands=BANDS,
            min_bands=2,
        )


def test_neardup_clusters_verified_gates(spark):
    docs = spark.createDataFrame(
        [(1, BASE), (2, MIDSIM), (3, NEARDUP)], ["doc_id", "text"]
    )
    # default: the 1-band J~0.4 edge merges everything into one cluster
    raw = text_dedup.neardup_clusters(
        docs, num_hashes=NUM_HASHES, bands=BANDS
    ).collect()
    assert {r["representative"] for r in raw} == {1}
    # jaccard gate: midsim becomes a singleton, true near-dups stay
    ver = text_dedup.neardup_clusters(
        docs, num_hashes=NUM_HASHES, bands=BANDS, min_jaccard=0.6
    ).collect()
    rep = {r["doc_id"]: r["representative"] for r in ver}
    assert rep[2] == 2 and rep[1] == rep[3] == 1
    sizes = {r["doc_id"]: r["cluster_size"] for r in ver}
    assert sizes[2] == 1 and sizes[1] == 2
    # min_bands gate agrees
    ver2 = text_dedup.neardup_clusters(
        docs, num_hashes=NUM_HASHES, bands=BANDS, min_bands=2
    ).collect()
    rep2 = {r["doc_id"]: r["representative"] for r in ver2}
    assert rep2 == rep


def test_verified_store_scan_still_streams_into_broadcast_join(spark, tmp_path):
    """The 100 TB plan gate holds in verified mode: the signature
    store's parquet scan feeds the BroadcastHashJoin directly (build
    side = batch buckets), no Exchange above the store scan."""
    hist = spark.createDataFrame([(1, BASE)], ["doc_id", "text"])
    store_path = str(tmp_path / "sigstore")
    text_dedup.lsh_signature_store(
        hist, num_hashes=NUM_HASHES, bands=BANDS
    ).write.parquet(store_path)
    store = spark.read.parquet(store_path)
    batch = spark.createDataFrame([(100, MIDSIM)], ["doc_id", "text"])
    kept, _ = text_dedup.incremental_neardup(
        batch, store, num_hashes=NUM_HASHES, bands=BANDS,
        within_batch=False, min_bands=2, min_jaccard=0.6,
    )
    plan = kept._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    # the store scan is the ONLY parquet FileScan in this plan (the
    # batch side is an in-memory RDD scan); matching on the path is
    # unreliable — long pytest tmp paths get truncated in toString
    scans = [i for i, l in enumerate(lines) if "FileScan parquet" in l]
    assert len(scans) == 1, plan
    idx = scans[0]
    join_idx = max(i for i in range(idx) if "Join" in lines[i])
    assert "BroadcastHashJoin" in lines[join_idx], lines[join_idx]
    assert "BuildRight" in lines[join_idx]
    between = "\n".join(lines[join_idx + 1 : idx])
    assert "Exchange" not in between, plan


def test_prepare_corpus_verified_incremental_chain(tmp_path, corpus_job):
    """--neardup-min-bands/--neardup-min-jaccard end-to-end: seeds a
    signature store, and a mismatched (unverified) rerun hard-fails on
    the sidecar.  In-process on the session fixture."""
    import json
    import os

    import pytest

    store = str(tmp_path / "store")
    args = [
        "--input", str(tmp_path / "pages"), "--synthesize", "60",
        "--output", str(tmp_path / "out1"), "--min-words", "5",
        "--dedup-store", store,
        "--neardup-min-bands", "2", "--neardup-min-jaccard", "0.5",
    ]
    corpus_job(*args)
    meta = json.load(open(os.path.join(store, "_dedup_meta.json")))
    assert meta["signatures"] is True
    # second run, same gates: incremental against the signature store
    args2 = [a for a in args]
    args2[args2.index(str(tmp_path / "out1"))] = str(tmp_path / "out2")
    rep2 = corpus_job(*args2)
    assert rep2["dedup_store_mode"] == "incremental"
    assert rep2["after_neardup_dedup"] == 0  # same synth input -> all dup
    # unverified rerun against a signature store must hard-fail
    args3 = [a for a in args if a not in (
        "--neardup-min-bands", "2", "--neardup-min-jaccard", "0.5")]
    args3[args3.index(str(tmp_path / "out1"))] = str(tmp_path / "out3")
    with pytest.raises(Exception, match="(?i)dedup"):
        corpus_job(*args3)
