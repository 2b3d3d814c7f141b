"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k, fully JVM-side
  (zip_with + aggregate; no Python, no shuffle besides the top-k sort).
  The 100 TB baseline: one scan, broadcastable query vector.
- :func:`lsh_bucketed_topk` — the scale path: sign-random-projection
  (SimHash-for-vectors) buckets computed by a vectorized pandas UDF
  (one matrix multiply per Arrow batch); the query probes only its
  bucket (optionally Hamming-adjacent buckets), cutting the scan by
  ~2^bits.
- :func:`ivf_topk` — IVF-style variant: k-means-free coarse quantizer
  using the dominant-dimension sign pattern; included as the
  bucket-join demonstration.

Cosine math is done in float64 with sequential aggregation order on
both engines (array order), so results are bit-stable for the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity_col(vec: Column, query: list[float]) -> Column:
    q = F.array(*[F.lit(float(v)) for v in query])
    return _dot(vec, q) / (_norm(vec) * _norm(q))


def cosine_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.

    ``round_digits`` rounds the score for cross-engine comparison; rank
    ties break on id so the result is fully deterministic.
    """
    sim = cosine_similarity_col(F.col(vec_col), query)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        embeddings.select(F.col(id_col).alias("vec_id"), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


# ------------------------------------------------------ LSH bucketing
def _hyperplanes(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def srp_bucket_udf(dim: int, bits: int = 8, seed: int = 7):
    """Vectorized sign-random-projection bucketing: one (batch x dim) @
    (dim x bits) matmul per Arrow batch.

    The dot is ROUNDED to 6 decimals before the sign test (here, in the
    driver-side query bucket, and in the SQL oracle): raw-double sums
    depend on addition order (BLAS matmul vs sequential SQL aggregate),
    so an unrounded sign test would need the engines to agree to 1e-15
    near zero — rounding relaxes that to 1e-6 (the repo-wide float
    aggregate rule)."""
    planes = _hyperplanes(dim, bits, seed).T  # (dim, bits)

    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (n, dim)
        signs = np.round(m.astype(np.float64) @ planes, 6) >= 0  # (n, bits)
        weights = 1 << np.arange(bits)
        return pd.Series((signs @ weights).astype(np.int32))

    return bucket


def probe_buckets(qbucket: int, bits: int, hamming_probe: int = 0) -> list[int]:
    """Buckets within ``hamming_probe`` bit flips of the query bucket
    (multi-probe LSH: neighbors whose SRP signature differs in one
    near-zero hyperplane land one bit away — probing them removes the
    single-bucket recall cliff)."""
    if hamming_probe > 2:
        raise ValueError(
            "probe_buckets enumerates Hamming distance <= 2 only; "
            f"got hamming_probe={hamming_probe}"
        )
    out = {qbucket}
    if hamming_probe >= 1:
        out.update(qbucket ^ (1 << j) for j in range(bits))
    if hamming_probe >= 2:
        out.update(
            qbucket ^ (1 << j) ^ (1 << l)
            for j in range(bits)
            for l in range(j + 1, bits)
        )
    return sorted(out)


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    bits: int = 8,
    seed: int = 7,
    hamming_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's SRP bucket
    plus (multi-probe) buckets within ``hamming_probe`` bit flips.

    At cluster scale the bucket column becomes a partition/bucketing key
    of the embeddings table, so the probe prunes files instead of
    filtering rows; Hamming-1 probing reads bits+1 of 2^bits partitions.
    """
    dim = len(query)
    planes = _hyperplanes(dim, bits, seed)
    qbits = np.round(planes @ np.asarray(query, dtype=np.float64), 6) >= 0
    qbucket = int((qbits @ (1 << np.arange(bits))).item())
    probes = probe_buckets(qbucket, bits, hamming_probe)
    bucket = srp_bucket_udf(dim, bits, seed)
    cand = embeddings.withColumn("bucket", bucket(F.col(vec_col))).filter(
        F.col("bucket").isin(probes)
    )
    return cosine_topk(cand, query, k, id_col, vec_col)


def ivf_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_probe_dims: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flavored coarse quantization: cell = sign pattern of the
    first ``n_probe_dims`` dimensions; probe the query's cell only."""
    cell = F.concat_ws(
        "",
        *[
            F.when(F.element_at(F.col(vec_col), i + 1) >= 0, "1").otherwise("0")
            for i in range(n_probe_dims)
        ],
    )
    qcell = "".join("1" if query[i] >= 0 else "0" for i in range(n_probe_dims))
    cand = embeddings.filter(cell == F.lit(qcell))
    return cosine_topk(cand, query, k, id_col, vec_col)


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP bucketing: only
    same-bucket pairs are scored (the all-pairs analog of MinHash-LSH
    for vectors).

    Pair scoring runs INSIDE each bucket group as one vectorized numpy
    pass (``applyInPandas``), not as a bucket self-join: the join form
    shipped both copies of every vector through the exchange and then
    evaluated dot AND both norms as interpreted array-aggregate
    expressions per candidate pair — O(sum b^2) higher-order-function
    evaluations that dominated the query at scale (measured 16.8 s at
    sf1.0 vs ~1 s for this shape; each vector now crosses the shuffle
    once and pair enumeration never materializes JVM rows).

    Float contract (the repo-wide round(cosine, 6) rule): a BLAS matmul
    PREFILTERS candidate pairs with a 1e-6 safety margin below the
    rounding boundary, then survivors are re-scored with the exact
    sequential float64 fold (acc + x*y in index order — bit-identical
    to the ``aggregate(zip_with(...))`` expression this replaces, and
    to the DuckDB oracle); the final round + threshold filter stays in
    the JVM, so emitted values are unchanged down to the last bit.
    """
    import numpy as np
    import pandas as pd

    first = embeddings.select(F.col(vec_col)).first()
    dim = len(first[0]) if first else 0
    bucket = srp_bucket_udf(dim, bits, seed)
    tagged = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).withColumn("bucket", bucket(F.col("v")))

    # keep every pair whose rounded cosine can possibly reach the
    # threshold: round(c, 6) >= t  <=>  c >= t - 5e-7; widen by 1e-6
    # (>> the <1e-13 BLAS-vs-sequential summation difference)
    prefilter = threshold - 5e-7 - 1e-6

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {"vec_a": pd.Series([], dtype="int64"),
             "vec_b": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
        if n < 2:
            return empty
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        # BLAS norms/dots for the prefilter only
        bnorm = np.sqrt(np.einsum("ij,ij->i", m, m))
        bnorm = np.where(bnorm == 0.0, 1.0, bnorm)
        ii_parts, jj_parts = [], []
        # row-chunked gram matrix bounds memory to chunk x n doubles
        chunk = max(1, min(n, 8_388_608 // max(n, 1)))
        for i0 in range(0, n - 1, chunk):
            i1 = min(i0 + chunk, n)
            g = (m[i0:i1] @ m.T) / (bnorm[i0:i1, None] * bnorm[None, :])
            ci, cj = np.nonzero(g >= prefilter)
            ci += i0
            keep = ci < cj  # upper triangle: vec_a < vec_b by id order
            ii_parts.append(ci[keep])
            jj_parts.append(cj[keep])
        ii = np.concatenate(ii_parts) if ii_parts else np.array([], dtype=np.int64)
        jj = np.concatenate(jj_parts) if jj_parts else np.array([], dtype=np.int64)
        if not len(ii):
            return empty
        # exact re-score: sequential float64 fold in index order, the
        # bit-identical twin of aggregate(zip_with(a, b, x*y), 0.0, +)
        nsq = np.zeros(n)
        for d in range(m.shape[1]):
            nsq += m[:, d] * m[:, d]
        nrm = np.sqrt(nsq)
        a, b = m[ii], m[jj]
        dot = np.zeros(len(ii))
        for d in range(m.shape[1]):
            dot += a[:, d] * b[:, d]
        cos = dot / (nrm[ii] * nrm[jj])
        return pd.DataFrame(
            {"vec_a": ids[ii], "vec_b": ids[jj], "cosine": cos}
        )

    scored = tagged.groupBy("bucket").applyInPandas(
        _score, schema="vec_a long, vec_b long, cosine double"
    )
    return scored.select(
        "vec_a", "vec_b", F.round(F.col("cosine"), 6).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


# ---- IVF with a TRAINED coarse quantizer ----------------------------
# (`ivf_topk` above is the quantizer-free demo; this is the real scale
# path: spherical k-means cells, a cell-partitioned parquet index, and
# nprobe searches that prune partitions instead of scanning.)


def _l2_normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(norms == 0.0, 1.0, norms)


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    sample_size: int = 4096,
    iterations: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train spherical-k-means centroids for an IVF index.

    Scale contract: training always runs on a BOUNDED deterministic
    sample — the ``sample_size`` rows with the lowest ``xxhash64(id)``
    (order-free, partition-count-free, stable under repartitioning) —
    which is how production IVF indexes are built at any corpus size
    (FAISS trains on ~10^5 vectors regardless of index size).  The only
    collect is sample_size x dim floats; assignment and search stay
    distributed.

    Deterministic: seeded kmeans++ init, fixed Lloyd iteration count,
    float64 on the driver.  Empty cells are reseeded to the point
    farthest from its current centroid (lowest sample index wins ties).
    """
    sample = (
        embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_h", F.xxhash64(F.col("_id")))
        .orderBy("_h", "_id")
        .limit(sample_size)
        .collect()
    )
    pts = _l2_normalize(
        np.asarray([r["_v"] for r in sample], dtype=np.float64)
    )
    n = pts.shape[0]
    if n < n_cells:
        raise ValueError(f"need >= {n_cells} sample vectors, got {n}")
    rng = np.random.default_rng(seed)
    # kmeans++ (cosine distance = 1 - dot on the unit sphere)
    centroids = [pts[int(rng.integers(n))]]
    for _ in range(1, n_cells):
        d2 = np.min(
            1.0 - np.stack([pts @ c for c in centroids], axis=1), axis=1
        ).clip(min=0.0)
        total = d2.sum()
        if total <= 0.0:  # all points already covered: take lowest index
            centroids.append(pts[int(np.argmax(d2))])
            continue
        centroids.append(pts[int(rng.choice(n, p=d2 / total))])
    c = np.stack(centroids)
    for _ in range(iterations):
        assign = np.argmax(pts @ c.T, axis=1)  # ties -> lowest cell
        for j in range(n_cells):
            members = pts[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
            else:  # reseed dead cell to the worst-covered point
                c[j] = pts[int(np.argmin(np.max(pts @ c.T, axis=1)))]
        c = _l2_normalize(c)
    return c


def ivf_cell_udf(centroids: np.ndarray):
    """Vectorized cell assignment: one (batch x dim) @ (dim x cells)
    matmul per Arrow batch; argmax dot == nearest spherical centroid
    (ties -> lowest cell id, matching the trainer)."""
    ct = np.ascontiguousarray(centroids.T)  # (dim, cells)

    @F.pandas_udf(T.IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        m = _l2_normalize(np.stack(vecs.to_numpy()).astype(np.float64))
        return pd.Series(np.argmax(m @ ct, axis=1).astype(np.int32))

    return cell


def assign_ivf_cells(
    embeddings: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    return embeddings.withColumn(cell_col, ivf_cell_udf(centroids)(F.col(vec_col)))


def write_ivf_index(
    embeddings: DataFrame,
    centroids: np.ndarray,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus partitioned BY CELL: an nprobe search then
    reads nprobe of n_cells directories (partition pruning at the
    source listing — no row-level filter work at all), which is the
    whole point of IVF at 100 TB."""
    assign_ivf_cells(embeddings, centroids, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)


def ivf_probe_cells(
    centroids: np.ndarray, query: list[float], nprobe: int = 4
) -> list[int]:
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    order = np.argsort(-(centroids @ q), kind="stable")  # best first
    return [int(j) for j in order[:nprobe]]


def ivf_search(
    index: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """nprobe IVF search over a cell-partitioned index DataFrame
    (``spark.read.parquet(path)`` of :func:`write_ivf_index` output —
    the ``cell.isin`` filter becomes a partition filter and prunes
    unprobed directories; see tests/test_ivf.py plan gate)."""
    cells = ivf_probe_cells(centroids, query, nprobe)
    cand = index.filter(F.col(cell_col).isin(cells))
    return cosine_topk(cand, query, k, id_col, vec_col)


def _precap_per_partition(assigned: DataFrame, per_cluster: int) -> DataFrame:
    """Phase-1 cap for :func:`cluster_balanced_sample`: WITHIN each
    input partition keep only the ``per_cluster`` smallest rows per
    cell by the total order (_h, vec_id) — a running pandas top-n
    across the partition's Arrow batches, no shuffle.  Survivors per
    cell are bounded by partitions × per_cluster, so the phase-2
    window never sees a whole hot cell in one task.  Because the hash
    order is total, each partition's cap keeps a superset of the
    global winners — phase 2's result is provably unchanged."""
    import pandas as pd

    schema = assigned.schema

    def gen(batches):
        acc = None
        for b in batches:
            cur = b if acc is None else pd.concat([acc, b], ignore_index=True)
            acc = (
                cur.sort_values(["_h", "vec_id"], kind="mergesort")
                .groupby("cell", sort=False)
                .head(per_cluster)
            )
        if acc is not None:
            yield acc

    return assigned.mapInPandas(gen, schema=schema)


def cluster_balanced_sample(
    embeddings: DataFrame,
    centroids: np.ndarray,
    per_cluster: int,
    seed: str = "7",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Topic-balanced subsampling (the SemDeDup/cluster-stratified
    curation step): assign every vector to its IVF cell, keep at most
    ``per_cluster`` per cell chosen by deterministic id hash.  Caps the
    dominant topic's share of a training mix without a global sort.

    Two-phase at scale (the op exists to tame a DOMINANT topic, i.e. a
    hot cell): phase 1 pre-caps per INPUT PARTITION per cell via a
    running pandas top-n (zero shuffle, ≤ partitions × per_cluster
    survivors per cell), phase 2 runs the per-cell window over the
    survivors only — so no single task ever sorts a whole hot cell.
    The (xxhash64(id, seed), id) order is total, making the result
    identical to the naive single-window form.

    Output: (vec_id, cell) of the kept rows."""
    assigned = assign_ivf_cells(
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col)),
        centroids,
        vec_col,
    ).select(
        "vec_id",
        "cell",
        F.xxhash64(F.col("vec_id"), F.lit(seed)).alias("_h"),
    )
    capped = _precap_per_partition(assigned, per_cluster)
    w = Window.partitionBy("cell").orderBy(F.col("_h").asc(), F.col("vec_id").asc())
    return (
        capped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_cluster)
        .select("vec_id", "cell")
    )
