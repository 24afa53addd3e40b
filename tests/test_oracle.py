"""Anchor the oracle itself with hand-computed BM25 over a 5-doc micro-corpus
(FIXTURES.md §4), plus structural properties."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from katta_spark.oracle import bm25_topk, with_doc_ids
from katta_spark.scoring import BM25_B, BM25_K1
from katta_spark.tokenizer import tokenize_str

DOCS = [
    (1, "the quick brown fox"),
    (2, "the quick quick dog"),
    (3, "lazy dog sleeps"),
    (4, "fox and dog and fox"),
    (5, ""),
]


def _hand_bm25(query: str, k: int):
    """Plain-Python BM25 over DOCS — independent of Spark entirely."""
    toks = {d: tokenize_str(t) for d, t in DOCS}
    n = len(DOCS)
    doclens = {d: len(ts) for d, ts in toks.items()}
    # engine definition: avgdl = total tokens / n_docs (empty docs count)
    avgdl = sum(doclens.values()) / n
    qterms = tokenize_str(query)
    scores = {}
    for d, ts in toks.items():
        s = 0.0
        for t in qterms:  # per-occurrence weighting
            tf = ts.count(t)
            if tf == 0:
                continue
            df = sum(1 for dd in toks.values() if t in dd)
            idf = math.log1p((n - df + 0.5) / (df + 0.5))
            tfn = tf * (BM25_K1 + 1) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * doclens[d] / avgdl))
            s += idf * tfn
        if s > 0:
            scores[d] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.fixture(scope="module")
def micro(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize(
    "query", ["fox", "quick dog", "the quick brown fox", "quick quick", "nothing"]
)
def test_oracle_matches_hand_computed(spark, micro, query):
    got = [(r.doc_id, r.score) for r in bm25_topk(micro, query, k=5).collect()]
    want = _hand_bm25(query, 5)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-6)


def test_empty_query_and_absent_term(micro):
    assert bm25_topk(micro, "zzz absent", k=5).count() == 0
    assert bm25_topk(micro, "...", k=5).count() == 0


def test_topk_prefix_property(tiny_transcripts):
    """top-k is a prefix of top-(k+m) — reference LuceneClientTest.java:414."""
    docs = with_doc_ids(tiny_transcripts, num_shards=4)
    small = bm25_topk(docs, "hotalpha hotbeta", k=5, shard_col="shard_id").collect()
    big = bm25_topk(docs, "hotalpha hotbeta", k=20, shard_col="shard_id").collect()
    assert [r.doc_id for r in small] == [r.doc_id for r in big][:5]


def test_doc_ids_unique_and_stable(tiny_transcripts):
    docs = with_doc_ids(tiny_transcripts, num_shards=4)
    assert docs.select("doc_id").distinct().count() == docs.count()
    # stable: recomputing yields identical assignment
    again = with_doc_ids(tiny_transcripts, num_shards=4)
    assert (
        docs.select("conv_id", "turn_idx", "doc_id", "shard_id")
        .exceptAll(again.select("conv_id", "turn_idx", "doc_id", "shard_id"))
        .count()
        == 0
    )
    # shards roughly balanced (B3 analog: balanced shard sizing)
    sizes = [r["count"] for r in docs.groupBy("shard_id").count().collect()]
    assert len(sizes) == 4
    assert max(sizes) / min(sizes) < 1.5


def test_duplicate_doc_id_refused(spark, tmp_path_factory):
    """The doc-marker (sentinel) postings must still catch duplicate /
    colliding docIDs now that there is no separate ID-scan phase: two input
    rows with the same doc_id make marker cf exceed df -> build fails."""
    import pytest as _pytest

    from katta_spark.build import build_index

    rows = [(i, f"alpha beta w{i:04d}") for i in range(50)] + [(7, "dup text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path_factory.mktemp("dup_idx"))
    with _pytest.raises(RuntimeError, match="collision or duplicate"):
        build_index(spark, df, d, num_shards=2, doc_id_col="doc_id")


def test_sentinel_invisible_to_queries_and_stats(spark, tiny_transcripts, tmp_path_factory):
    """Doc-marker rows must not leak into stats, avgdl, or term_stats —
    and per-shard doc counts (shards.parquet) must equal the true counts."""
    import os

    from pyspark.sql import functions as F

    from katta_spark.build import SENTINEL_HASHES, build_index
    from katta_spark.oracle import with_doc_ids

    d = str(tmp_path_factory.mktemp("sent_idx"))
    summary = build_index(spark, tiny_transcripts, d, num_shards=4)
    assert summary["n_docs"] == 2000
    stats = spark.read.parquet(os.path.join(d, "stats.parquet"))
    assert stats.where(F.col("th").isin(list(SENTINEL_HASHES))).count() == 0
    want = (
        with_doc_ids(tiny_transcripts, 4)
        .groupBy("shard_id").count().orderBy("shard_id").collect()
    )
    got = (
        spark.read.parquet(os.path.join(d, "shards.parquet"))
        .orderBy("shard_id").collect()
    )
    assert [(r.shard_id, r.n_docs) for r in got] == [
        (r.shard_id, r["count"]) for r in want
    ]


def test_crash_between_data_and_lineage_replays_idempotently(
    spark, tiny_transcripts, tmp_path_factory
):
    """The lineage append is deferred to a driver thread: a crash after the
    postings commit but before the lineage row lands must replay the batch
    idempotently (dynamic partition overwrite) with identical results."""
    import os
    import shutil

    from katta_spark.build import build_index
    from katta_spark.query import search

    d = str(tmp_path_factory.mktemp("crash_idx"))
    build_index(spark, tiny_transcripts, d, num_shards=4)
    before = search(spark, d, "hotalpha w00011", k=10).collect()
    # simulate the crash window: data committed, lineage lost
    shutil.rmtree(os.path.join(d, "lineage.parquet"))
    summary = build_index(spark, tiny_transcripts, d, num_shards=4)
    assert summary["batches_committed"] == 1 and summary["batches_skipped"] == 0
    after = search(spark, d, "hotalpha w00011", k=10).collect()
    assert [(r.doc_id, r.score) for r in before] == [
        (r.doc_id, r.score) for r in after
    ]
