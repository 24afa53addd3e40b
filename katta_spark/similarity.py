"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exactness baseline (JVM-side arithmetic via
zip_with/aggregate — no Python); LSH-bucketed search is the scale path: at
100 TB you never rank the full corpus, you rank the query's LSH bucket(s).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against the row with ``query_vec_id``.

    Plan: broadcast the 1-row query vector, score every row JVM-side,
    TakeOrderedAndProject for the distributed top-k. One corpus scan,
    zero shuffles of the corpus.
    """
    q = embeddings.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qvec")
    )
    return (
        embeddings.where(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_similarity_col(F.col(vec_col), F.col("qvec")), 4).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def _hyperplanes(dim: int, planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((planes, dim)).astype(np.float64)


def lsh_signatures(
    embeddings: DataFrame,
    dim: int,
    planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket): random-hyperplane LSH bucket per vector.

    The hyperplanes are seeded numpy, evaluated in one Arrow-batched
    mapInPandas pass (vectorized matmul per batch — the idiomatic shape for
    numeric kernels Spark lacks)."""
    H = _hyperplanes(dim, planes, seed)
    weights = (1 << np.arange(planes)).astype(np.int64)

    def kernel(batches):
        for pdf in batches:
            M = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if M.size == 0:
                yield pd.DataFrame({"vec_id": [], "bucket": []}).astype(
                    {"vec_id": "int64", "bucket": "int64"}
                )
                continue
            bits = (M @ H.T) > 0.0
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(np.int64),
                    "bucket": bits @ weights,
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, "vec_id long, bucket long"
    )


def _hamming_ball(bucket: int, planes: int, radius: int) -> list[int]:
    """All bucket ids within Hamming distance ``radius`` of ``bucket``."""
    out = {bucket}
    frontier = {bucket}
    for _ in range(radius):
        nxt = set()
        for b in frontier:
            for i in range(planes):
                nxt.add(b ^ (1 << i))
        out |= nxt
        frontier = nxt
    return sorted(out)


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    dim: int = 64,
    planes: int = 6,
    probe_radius: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: rank only the query's multi-probe LSH
    bucket neighborhood (Hamming ball of ``probe_radius`` around the query
    bucket — standard multi-probe LSH).

    At 100 TB the bucket predicate prunes the scan (bucket is a partition/
    cluster column of the signature table); recall is tuned by ``planes``
    and ``probe_radius``.
    """
    sigs = lsh_signatures(embeddings, dim, planes, seed, id_col, vec_col)
    qrow = sigs.where(F.col("vec_id") == query_vec_id).collect()
    if not qrow:
        return cosine_topk(embeddings, query_vec_id, k, id_col, vec_col)
    probes = _hamming_ball(int(qrow[0]["bucket"]), planes, probe_radius)
    candidates = (
        sigs.where(F.col("bucket").isin(probes))
        .where(F.col("vec_id") != query_vec_id)
        .select(F.col("vec_id").alias("_cand_id"))
    )
    emb = embeddings.join(
        candidates, F.col(id_col) == F.col("_cand_id"), "left_semi"
    )
    return cosine_topk(
        emb.unionByName(embeddings.where(F.col(id_col) == query_vec_id)),
        query_vec_id,
        k,
        id_col,
        vec_col,
    )
