"""Trained-quantizer IVF: deterministic training, UDF/driver parity,
recall vs brute force, and the partition-pruning plan gate that is the
operator's whole reason to exist at scale."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from vlm_ocr_pipeline_spark.operators.similarity import (
    _l2_normalize,
    assign_ivf_cells,
    cosine_topk,
    ivf_cell_udf,
    ivf_probe_cells,
    ivf_search,
    train_ivf_centroids,
    write_ivf_index,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def centroids(emb):
    return train_ivf_centroids(emb, n_cells=16, sample_size=256)


def test_train_deterministic_and_balanced(emb, centroids):
    again = train_ivf_centroids(emb, n_cells=16, sample_size=256)
    assert np.array_equal(centroids, again)
    assert centroids.shape == (16, 64)
    # unit-sphere centroids
    assert np.allclose(np.linalg.norm(centroids, axis=1), 1.0)
    counts = {
        r["cell"]: r["count"]
        for r in assign_ivf_cells(emb, centroids).groupBy("cell").count().collect()
    }
    # no dead cells, no single dominant cell on 500 vectors
    assert sorted(counts) == list(range(16))
    assert max(counts.values()) <= 10 * min(counts.values())


def test_cell_udf_matches_driver_numpy(emb, centroids):
    rows = emb.orderBy("vec_id").limit(64).collect()
    pts = _l2_normalize(
        np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    )
    expected = np.argmax(pts @ centroids.T, axis=1)
    got = (
        emb.orderBy("vec_id")
        .limit(64)
        .withColumn("cell", ivf_cell_udf(centroids)(F.col("embedding")))
        .orderBy("vec_id")
        .collect()
    )
    assert [r["cell"] for r in got] == [int(c) for c in expected]


@pytest.fixture(scope="module")
def index(spark, emb, centroids, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    write_ivf_index(emb, centroids, path)
    return spark.read.parquet(path)


def test_ivf_recall_and_exact_at_full_probe(emb, index, centroids):
    base = emb.filter("vec_id = 3").first()["embedding"]
    q = [float(v) + 0.01 for v in base]
    exact = {r["vec_id"] for r in cosine_topk(emb, q, 10).collect()}

    # the perturbed source vector lands in the query's own cell
    top1 = ivf_search(index, centroids, q, 1, nprobe=1).first()
    assert top1["vec_id"] == 3

    r4 = {r["vec_id"] for r in ivf_search(index, centroids, q, 10, nprobe=4).collect()}
    r8 = {r["vec_id"] for r in ivf_search(index, centroids, q, 10, nprobe=8).collect()}
    assert len(r4 & exact) / 10 >= 0.5  # quarter of the cells probed
    assert len(r8 & exact) / 10 >= 0.9  # half the cells probed
    # probing every cell IS brute force (same ids, same order-by-score)
    rall = {
        r["vec_id"] for r in ivf_search(index, centroids, q, 10, nprobe=16).collect()
    }
    assert rall == exact


def test_ivf_index_scan_prunes_partitions(index, centroids, emb):
    q = [0.1] * 64
    cells = ivf_probe_cells(centroids, q, nprobe=4)
    assert len(cells) == 4 and len(set(cells)) == 4
    cand = index.filter(F.col("cell").isin(cells))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    # the cell filter must reach the source listing as a PARTITION
    # filter (directory pruning), not a post-scan row filter
    assert "PartitionFilters: [cell" in plan
    assert " IN (" in plan.split("PartitionFilters")[1][:80]


def test_cluster_balanced_sample_caps_every_cell(emb, centroids):
    from vlm_ocr_pipeline_spark.operators.similarity import (
        cluster_balanced_sample,
    )

    kept = cluster_balanced_sample(emb, centroids, per_cluster=5)
    rows = kept.collect()
    per_cell = {}
    for r in rows:
        per_cell[r["cell"]] = per_cell.get(r["cell"], 0) + 1
    assert all(v <= 5 for v in per_cell.values())
    assert len(per_cell) == 16  # every cell contributes (500 vectors)
    # deterministic selection
    again = {(r["vec_id"], r["cell"]) for r in
             cluster_balanced_sample(emb, centroids, per_cluster=5).collect()}
    assert {(r["vec_id"], r["cell"]) for r in rows} == again
    # kept ids really belong to the cell they claim
    from vlm_ocr_pipeline_spark.operators.similarity import assign_ivf_cells

    truth = {r["vec_id"]: r["cell"] for r in assign_ivf_cells(emb, centroids).collect()}
    assert all(truth[r["vec_id"]] == r["cell"] for r in rows)


def test_cluster_balanced_sample_two_phase_parity_and_hot_cell_bound(
    spark, emb, centroids
):
    """The phase-1 per-partition pre-cap must (a) leave the final
    result identical to the naive single-window form — the hash order
    is total, so the global winners survive every partition cap — and
    (b) bound what the phase-2 window can receive for a HOT cell to
    partitions × per_cluster rows, so the op scales on exactly its
    target workload (one dominant topic)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vlm_ocr_pipeline_spark.operators.similarity import (
        _precap_per_partition,
        assign_ivf_cells,
        cluster_balanced_sample,
    )

    got = {
        (r["vec_id"], r["cell"])
        for r in cluster_balanced_sample(emb, centroids, per_cluster=7).collect()
    }
    # naive reference: one global window per cell (the round-3 shape)
    assigned = assign_ivf_cells(
        emb.select(F.col("vec_id"), F.col("embedding")), centroids
    )
    w = Window.partitionBy("cell").orderBy(
        F.xxhash64(F.col("vec_id"), F.lit("7")).asc(), F.col("vec_id").asc()
    )
    naive = {
        (r["vec_id"], r["cell"])
        for r in assigned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 7)
        .select("vec_id", "cell")
        .collect()
    }
    assert got == naive

    # hot-cell bound: everything in ONE cell, spread over 8 partitions
    # -> pre-cap survivors <= 8 * per_cluster, not the full 2000 rows
    hot = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.lit(3).cast("int").alias("cell"),
        F.xxhash64(F.col("id"), F.lit("7")).alias("_h"),
    ).repartition(8)
    survivors = _precap_per_partition(hot, per_cluster=5)
    n = survivors.count()
    assert n <= 8 * 5
    # and the survivors still contain the 5 global winners
    top5 = {
        r["vec_id"]
        for r in hot.orderBy("_h", "vec_id").limit(5).collect()
    }
    kept = {r["vec_id"] for r in survivors.orderBy("_h", "vec_id").limit(5).collect()}
    assert kept == top5
