"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for embedding similarity, alongside the sign-LSH
index in similarity.py: train C spherical-k-means centroids, partition the
corpus by nearest centroid (the IVF "inverted lists"), and answer a query
by ranking ONLY the ``nprobe`` closest lists — at 100 TB a query touches
nprobe/C of the corpus via plain parquet partition pruning, no custom
storage.

Everything is deterministic so results are reproducible run-to-run:

- init: the C seed vectors are the rows with the smallest
  md5(f"{seed}|{vec_id}") — a pure function of (seed, vec_id), independent
  of corpus order or partitioning;
- Lloyd's iterations: assignment + per-cluster partial sums happen in ONE
  mapInPandas pass over the corpus (numpy matmul per Arrow batch — the
  corpus never shuffles during training); the per-batch partials
  (<= batches x C tiny rows) are combined on the driver in sorted order and
  the refreshed centroids are rounded to 9 decimals, so cross-run float
  summation-order noise cannot flip an argmax;
- empty clusters keep their previous centroid.

Spherical k-means (normalize inputs, centroid = normalized mean, assign by
max dot product) is the cosine-geometry variant used by IVF indexes over
cosine/IP metrics (FAISS IVFFlat with inner-product quantizer); the
objective sum_i max_c <x_i, c> is non-decreasing per iteration.

The reference (sgroschupf/katta) has no vector search — this module is part
of the beyond-reference training-data surface (brute-force baseline
similarity.cosine_topk; LSH scale path similarity.build_ann_index; IVF
scale path here).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from katta_spark.similarity import _ann_rel, cosine_similarity_col

_META = "IVF_META.json"


def _normalize_rows(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return X / n


def _batch_matrix(pdf: pd.DataFrame, vec_col: str, dim: int) -> np.ndarray:
    return np.array(
        [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]], dtype=np.float64
    ).reshape(len(pdf), dim)


def _seed_centroids(
    embeddings: DataFrame, n_clusters: int, seed: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic init: the n_clusters vectors with the smallest
    md5(seed|vec_id) digest (ties impossible — md5 of distinct ids).
    One TakeOrderedAndProject over (32-byte hex, vector) rows."""
    rows = (
        embeddings.select(
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))).alias("h"),
            F.col(vec_col).alias("v"),
        )
        .orderBy("h")
        .limit(n_clusters)
        .collect()
    )
    if len(rows) < n_clusters:
        raise ValueError(
            f"IVF needs >= n_clusters={n_clusters} vectors, corpus has {len(rows)}"
        )
    C = np.array([np.asarray(r["v"], dtype=np.float64) for r in rows])
    return np.round(_normalize_rows(C), 9)


def _partials_pass(
    embeddings: DataFrame, C: np.ndarray, vec_col: str
) -> tuple[np.ndarray, np.ndarray, float]:
    """One corpus pass: assign every vector to its max-dot centroid and
    fold per-cluster (sum vector, count, sum of best dots) WITHIN each
    Arrow batch — the map-side-combine shape; only <= batches x C partial
    rows leave the executors. Returns (sums[C,dim], counts[C], objective).
    """
    k, dim = C.shape
    Ct = C.T.copy()
    schema = "cluster int, cnt long, obj double, sums array<double>"

    def kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = _normalize_rows(_batch_matrix(pdf, vec_col, dim))
            sims = X @ Ct
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(X)), assign]
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, assign, X)
            cnt = np.bincount(assign, minlength=k).astype(np.int64)
            objs = np.zeros(k, dtype=np.float64)
            np.add.at(objs, assign, best)
            nz = np.flatnonzero(cnt)
            yield pd.DataFrame(
                {
                    "cluster": nz.astype(np.int32),
                    "cnt": cnt[nz],
                    "obj": objs[nz],
                    "sums": [sums[c].tolist() for c in nz],
                }
            )

    parts = (
        embeddings.select(F.col(vec_col).alias(vec_col))
        .mapInPandas(kern, schema)
        .collect()
    )
    sums = np.zeros((k, dim), dtype=np.float64)
    counts = np.zeros(k, dtype=np.int64)
    obj = 0.0
    # driver combine in sorted order -> summation order independent of
    # task completion order
    for r in sorted(parts, key=lambda r: (r["cluster"], r["cnt"], r["obj"])):
        c = int(r["cluster"])
        sums[c] += np.asarray(r["sums"], dtype=np.float64)
        counts[c] += int(r["cnt"])
        obj += float(r["obj"])
    return sums, counts, obj


def train_ivf_centroids(
    embeddings: DataFrame,
    dim: int,
    n_clusters: int = 16,
    iters: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
) -> tuple[np.ndarray, list[float]]:
    """Spherical k-means. Returns (centroids[C,dim] unit rows, per-iteration
    objective trace — mean best-cosine, non-decreasing).

    ``sample_fraction``: train on a deterministic md5-hash slice of the
    corpus (the 100-TB knob — centroid quality needs a sample, not the
    corpus; the full corpus is only touched by the final assignment in
    build_ivf_index)."""
    train = embeddings
    if sample_fraction is not None:
        bound = int(sample_fraction * (1 << 32))
        train = embeddings.where(
            F.conv(F.substring(F.md5(F.concat_ws(
                "|", F.lit(f"ivfs{seed}"), F.col(id_col).cast("string"))), 1, 8),
                16, 10).cast("long") < bound
        )
    from pyspark import StorageLevel

    # The seed pass + every Lloyd iteration re-scans the training
    # relation (sample filter + column prune + Arrow pipe): persist it
    # once for the loop — iters+1 consumers, unpersisted before return.
    train = train.select(id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        C = _seed_centroids(train, n_clusters, seed, id_col, vec_col)
        trace: list[float] = []
        for _ in range(iters):
            sums, counts, obj = _partials_pass(train, C, vec_col)
            total = int(counts.sum())
            trace.append(obj / max(total, 1))
            nz = counts > 0
            C_new = C.copy()
            C_new[nz] = _normalize_rows(sums[nz] / counts[nz, None])
            C = np.round(C_new, 9)
    finally:
        train.unpersist()
    return C, trace


def build_ivf_index(
    embeddings: DataFrame,
    out_dir: str,
    dim: int,
    n_clusters: int = 16,
    iters: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
) -> dict:
    """Materialize the IVF index ONCE: train centroids, assign every vector
    (one mapInPandas map — no shuffle), write PARTITIONED BY cluster so a
    query's nprobe lists are parquet partition directories. Centroids ride
    in IVF_META.json (C x dim doubles — C is small by design; the list
    contents are the big part and they live in parquet)."""
    C, trace = train_ivf_centroids(
        embeddings, dim, n_clusters, iters, seed, id_col, vec_col, sample_fraction
    )
    Ct = C.T.copy()
    schema = f"vec_id long, {vec_col} array<float>, cluster int"

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = _normalize_rows(_batch_matrix(pdf, vec_col, dim))
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(np.int64),
                    vec_col: pdf[vec_col],
                    "cluster": np.argmax(X @ Ct, axis=1).astype(np.int32),
                }
            )

    (
        embeddings.select(id_col, vec_col)
        .mapInPandas(assign, schema)
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(os.path.join(out_dir, "vectors.parquet"))
    )
    meta = {
        "dim": dim,
        "n_clusters": n_clusters,
        "iters": iters,
        "seed": seed,
        "objective_trace": trace,
        "centroids": C.tolist(),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _META), "w") as fh:
        json.dump(meta, fh)
    return meta


def _probe_clusters(query_vec, meta: dict, nprobe: int) -> list[int]:
    C = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / qn if qn else q
    sims = C @ q
    order = np.lexsort((np.arange(C.shape[0]), -sims))  # ties -> lower id
    return [int(c) for c in order[: min(nprobe, C.shape[0])]]


def ivf_topk(
    spark: SparkSession,
    ivf_dir: str,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    exclude_vec_id: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k against a persisted IVF index: rank the
    query against centroids driver-side (C tiny dots), scan ONLY the
    nprobe best clusters' partitions (partition-pruned parquet read),
    exact-cosine rank JVM-side, TakeOrderedAndProject. nprobe=n_clusters
    degrades gracefully to the exact scan."""
    with open(os.path.join(ivf_dir, _META)) as fh:
        meta = json.load(fh)
    probes = _probe_clusters(query_vec, meta, nprobe)
    vecs = _ann_rel(spark, os.path.join(ivf_dir, "vectors.parquet")).where(
        F.col("cluster").isin(probes)
    )
    if exclude_vec_id is not None:
        vecs = vecs.where(F.col("vec_id") != exclude_vec_id)
    q = spark.createDataFrame(
        [(list(map(float, query_vec)),)], "qvec array<double>"
    )
    return (
        vecs.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                cosine_similarity_col(F.col(vec_col), F.col("qvec")), 4
            ).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def ivf_topk_batch(
    spark: SparkSession,
    ivf_dir: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Batched ANN: many queries amortized over ONE partition-pruned scan
    (the search_batch analog for vectors — at scale queries arrive in
    batches and per-query jobs waste the scan).

    ``queries``: (query_id, vector) pairs — driver-known by nature (a
    query batch, not a corpus; bounded like search_batch's query list).
    Probe clusters are ranked driver-side per query (C tiny dots), the
    scan reads only the UNION of all probed clusters' partitions, each
    query joins (broadcast) just its own probed clusters, and the
    per-query top-k is a rank-k window partitioned by query_id — fully
    parallel, no single-partition funnel.

    Returns (query_id, vec_id, cos, rnk) with rnk 1..k per query,
    row-identical per query to ivf_topk at the same nprobe.
    """
    with open(os.path.join(ivf_dir, _META)) as fh:
        meta = json.load(fh)
    rows = []
    for qid, qv in queries:
        for c in _probe_clusters(qv, meta, nprobe):
            rows.append((int(qid), c, list(map(float, qv))))
    probe_df = spark.createDataFrame(
        rows, "query_id long, cluster int, qvec array<double>"
    )
    all_probes = sorted({c for _, c, _ in rows})
    vecs = _ann_rel(spark, os.path.join(ivf_dir, "vectors.parquet")).where(
        F.col("cluster").isin(all_probes)
    )
    from pyspark.sql import Window

    scored = vecs.join(F.broadcast(probe_df), "cluster").select(
        "query_id",
        "vec_id",
        F.round(
            cosine_similarity_col(F.col(vec_col), F.col("qvec")), 4
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos", "rnk")
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 4,
    ivf_dir: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Convenience twin of similarity.cosine_topk_lsh for the IVF path:
    look the query vector up by id, probe the persisted index."""
    if ivf_dir is None:
        raise ValueError("cosine_topk_ivf needs a built index (build_ivf_index)")
    spark = embeddings.sparkSession
    qrow = (
        embeddings.where(F.col(id_col) == query_vec_id).select(vec_col).collect()
    )
    if not qrow:
        raise ValueError(f"query vec_id {query_vec_id} not in corpus")
    return ivf_topk(
        spark, ivf_dir, list(qrow[0][0]), k, nprobe,
        exclude_vec_id=query_vec_id, vec_col=vec_col,
    )
