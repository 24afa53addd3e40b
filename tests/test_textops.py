"""Training-data ops: cross-checks vs DuckDB and structural properties."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import katta_spark.similarity as sim
import katta_spark.textops as tx

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")).cache()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_exact_dedup_structure(docs):
    r = tx.exact_dedup(docs)
    assert r.count() == docs.count()
    # canonical ids are non-dup rows
    assert r.where((F.col("doc_id") == F.col("canonical_id")) & F.col("is_dup")).count() == 0


def test_jaccard_symmetric_bounds(docs):
    rows = tx.jaccard_pairs(docs, threshold=0.05).collect()
    assert all(0 < r.jaccard <= 1.0 and r.a < r.b for r in rows)


def test_lsh_candidates_superset_of_high_jaccard(docs):
    """LSH with 8 hashes / 4 bands catches every pair with jaccard >= 0.9
    here (band match prob 1-(1-J^2)^4 ≈ 1 at J=0.9)."""
    high = {(r.a, r.b) for r in tx.jaccard_pairs(docs, threshold=0.9).collect()}
    cand = {(r.a, r.b) for r in tx.minhash_lsh_pairs(docs).collect()}
    assert high <= cand


def test_simhash_duck_parity(docs, duck):
    import importlib

    m = importlib.import_module("__spark_entry__")
    got = {(r.doc_id, r.simhash) for r in tx.simhash16(docs).collect()}
    want = set(duck.execute(m.oracle_sql()["simhash"]).fetchall())
    assert got == want


def test_quality_scores_ranges(docs):
    rows = tx.quality_scores(docs).collect()
    assert all(r.n_tokens >= 0 and 0 <= r.stopword_ratio <= 1 for r in rows)
    assert all(0 <= r.alnum_ratio <= 1.0 for r in rows)


def test_lang_id_values(docs):
    rows = tx.lang_id(docs).collect()
    assert {r.lang_pred for r in rows} <= {"en", "fr", "es", "de", "und"}


def test_cosine_topk_exact(emb):
    rows = sim.cosine_topk(emb, 0, 5).collect()
    assert len(rows) == 5
    assert all(-1.0001 <= r.cos <= 1.0001 for r in rows)
    # descending
    assert [r.cos for r in rows] == sorted((r.cos for r in rows), reverse=True)


def test_lsh_recall_floor(emb):
    exact = {r.vec_id for r in sim.cosine_topk(emb, 0, 10).collect()}
    approx = {r.vec_id for r in sim.cosine_topk_lsh(emb, 0, 10, dim=64).collect()}
    assert len(exact & approx) >= 3  # ANN floor on random vectors
