"""IVF (spherical-k-means inverted lists) — the second ANN scale path.

Properties under test:
- determinism: identical centroids and identical query results across two
  independent builds (hash init + sorted driver combine + 9-decimal
  rounding remove run-order float noise);
- the objective (mean best-cosine) is non-decreasing across Lloyd's
  iterations;
- exactness degradation is graceful: nprobe = n_clusters scans every list
  and must equal the brute-force baseline row-for-row;
- recall at modest nprobe clears a floor on clustered data;
- queries are partition-pruned: the probed read's plan carries a cluster
  PartitionFilter and reads only nprobe directories.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from katta_spark.ivf import (
    build_ivf_index,
    cosine_topk_ivf,
    ivf_topk,
    train_ivf_centroids,
)
from katta_spark.plans import physical_plan
from katta_spark.similarity import cosine_topk

DIM = 16
N_CLUSTERS = 8


@pytest.fixture(scope="module")
def clustered_embeddings(spark):
    """600 vectors in 6 well-separated directional clusters (the geometry
    IVF is built for) + 60 uniform background vectors."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(6, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for ci in range(6):
        for _ in range(100):
            v = centers[ci] + 0.15 * rng.normal(size=DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(60):
        rows.append((vid, [float(x) for x in rng.normal(size=DIM)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def ivf_dir(spark, clustered_embeddings, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivf") / "idx")
    build_ivf_index(
        clustered_embeddings, d, dim=DIM, n_clusters=N_CLUSTERS, iters=6, seed=3
    )
    return d


def test_objective_monotone_and_deterministic(spark, clustered_embeddings):
    C1, tr1 = train_ivf_centroids(
        clustered_embeddings, DIM, n_clusters=N_CLUSTERS, iters=5, seed=3
    )
    C2, tr2 = train_ivf_centroids(
        clustered_embeddings, DIM, n_clusters=N_CLUSTERS, iters=5, seed=3
    )
    assert np.array_equal(C1, C2), "centroid training not deterministic"
    assert tr1 == tr2
    for a, b in zip(tr1, tr1[1:]):
        assert b >= a - 1e-12, f"objective decreased: {tr1}"
    # unit rows
    assert np.allclose(np.linalg.norm(C1, axis=1), 1.0, atol=1e-6)


def test_full_probe_equals_bruteforce(spark, clustered_embeddings, ivf_dir):
    """nprobe = n_clusters touches every list — result must match the
    exact baseline row-for-row (same rounding, same tie order)."""
    for qid in (0, 101, 350, 615):
        exact = cosine_topk(clustered_embeddings, qid, k=12).collect()
        approx = cosine_topk_ivf(
            clustered_embeddings, qid, k=12, nprobe=N_CLUSTERS, ivf_dir=ivf_dir
        ).collect()
        assert [(r.vec_id, r.cos) for r in exact] == [
            (r.vec_id, r.cos) for r in approx
        ]


def test_recall_floor_at_modest_nprobe(spark, clustered_embeddings, ivf_dir):
    """On 6 separated clusters with 8 lists, probing 3 lists keeps
    recall@10 >= 0.9 averaged over in-cluster queries."""
    hits = total = 0
    for qid in (5, 130, 250, 399, 480, 560):
        exact = {r.vec_id for r in cosine_topk(clustered_embeddings, qid, k=10).collect()}
        got = {
            r.vec_id
            for r in cosine_topk_ivf(
                clustered_embeddings, qid, k=10, nprobe=3, ivf_dir=ivf_dir
            ).collect()
        }
        hits += len(exact & got)
        total += len(exact)
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_build_deterministic_end_to_end(spark, clustered_embeddings, ivf_dir, tmp_path):
    d2 = str(tmp_path / "idx2")
    build_ivf_index(
        clustered_embeddings, d2, dim=DIM, n_clusters=N_CLUSTERS, iters=6, seed=3
    )
    with open(os.path.join(ivf_dir, "IVF_META.json")) as fh:
        m1 = json.load(fh)
    with open(os.path.join(d2, "IVF_META.json")) as fh:
        m2 = json.load(fh)
    assert m1["centroids"] == m2["centroids"]
    # identical per-vector assignment
    a1 = spark.read.parquet(os.path.join(ivf_dir, "vectors.parquet")).select(
        "vec_id", "cluster"
    )
    a2 = spark.read.parquet(os.path.join(d2, "vectors.parquet")).select(
        F.col("vec_id").alias("vec_id2"), F.col("cluster").alias("cluster2")
    )
    diff = a1.join(a2, a1.vec_id == a2.vec_id2).where(
        F.col("cluster") != F.col("cluster2")
    )
    assert diff.count() == 0


def test_query_is_partition_pruned(spark, clustered_embeddings, ivf_dir):
    qvec = clustered_embeddings.where("vec_id = 5").collect()[0]["embedding"]
    out = ivf_topk(spark, ivf_dir, list(qvec), k=10, nprobe=2)
    plan = physical_plan(out)
    pruned = any(
        "PartitionFilters" in line and "cluster" in line and "[]" not in line
        for line in plan.splitlines()
    )
    assert pruned, plan
    # and the listed cluster= directories exceed what the probe reads
    vdir = os.path.join(ivf_dir, "vectors.parquet")
    n_dirs = len([d for d in os.listdir(vdir) if d.startswith("cluster=")])
    assert n_dirs > 2


def test_batch_equals_per_query(spark, clustered_embeddings, ivf_dir):
    """ivf_topk_batch is row-identical per query to the per-query path at
    the same nprobe, and ranks run 1..k."""
    from katta_spark.ivf import ivf_topk_batch

    emb = {r.vec_id: list(r.embedding) for r in clustered_embeddings.collect()}
    qids = [5, 130, 399, 615]
    batch = ivf_topk_batch(
        spark, ivf_dir, [(q, emb[q]) for q in qids], k=8, nprobe=3
    ).collect()
    by_q: dict[int, list] = {}
    for r in sorted(batch, key=lambda r: (r.query_id, r.rnk)):
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.cos))
    assert set(by_q) == set(qids)
    for q in qids:
        single = [
            (r.vec_id, r.cos)
            for r in ivf_topk(spark, ivf_dir, emb[q], k=8, nprobe=3).collect()
        ]
        assert by_q[q] == single, q


def test_empty_cluster_keeps_previous_centroid(spark):
    """With n_clusters == n_vectors and a duplicate vector, one cluster
    goes empty mid-training — training must not NaN out or drop rows."""
    rows = [
        (0, [1.0] + [0.0] * (DIM - 1)),
        (1, [1.0] + [0.0] * (DIM - 1)),  # duplicate of 0
        (2, [0.0, 1.0] + [0.0] * (DIM - 2)),
        (3, [0.0, 0.0, 1.0] + [0.0] * (DIM - 3)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    C, trace = train_ivf_centroids(df, DIM, n_clusters=4, iters=3, seed=1)
    assert not np.isnan(C).any()
    assert len(trace) == 3


def test_training_sample_fraction(spark, clustered_embeddings):
    """The 100-TB knob: training on a hash slice still yields usable
    centroids (deterministic, unit, correct count)."""
    C, _ = train_ivf_centroids(
        clustered_embeddings, DIM, n_clusters=4, iters=3, seed=3,
        sample_fraction=0.5,
    )
    assert C.shape == (4, DIM)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-6)
