"""Direct re-creations of reference integration tests not covered
elsewhere (LuceneClientTest.java): binary stored-field details
(:205-243 testGetBinaryDetails) and field sort when a shard/index
contributes no matches (:281-327 testFieldSortWithNoResultShard).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from katta_spark.build import build_index
from katta_spark.query import get_details, search, search_sorted


def test_binary_stored_field_details(spark, tmp_path):
    """LuceneClientTest.testGetBinaryDetails: a doc carries an opaque
    binary stored field; search by a text term, then getDetails returns
    the exact bytes. Binary columns are first-class in the multimodal
    model (§ opaque binary + typed metadata)."""
    payload = bytes([1, 2, 3])
    rows = [
        ("c1", 0, "sample text", bytearray(payload)),
        ("c1", 1, "other words", bytearray(b"\xff\x00\x10")),
        ("c2", 0, "sample again", bytearray(b"zz")),
    ]
    src = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, payload binary"
    )
    d = str(tmp_path / "bin_idx")
    build_index(spark, src, d, num_shards=2)
    hits = search(spark, d, "text", k=10)
    det = get_details(spark, hits, src, fields=["payload"]).collect()
    assert len(det) == 1
    assert bytes(det[0]["payload"]) == payload


def test_field_sort_with_no_result_shard(spark, tmp_path):
    """LuceneClientTest.testFieldSortWithNoResultShard: a sorted search
    whose matches all live in ONE of the deployed indexes (the other
    contributes zero hits) must return them without error — the per-shard
    TopFieldCollector merge tolerates empty shards."""
    rows1 = [("a1", 0, "abc common", 1234567890123)]
    rows2 = [("b1", 0, "abc2 common", 1234567890123)]
    schema = "conv_id string, turn_idx int, text string, timesort long"
    src1 = spark.createDataFrame(rows1, schema)
    src2 = spark.createDataFrame(rows2, schema)
    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(spark, src1, d1, num_shards=2, docvalue_cols=("timesort",))
    build_index(spark, src2, d2, num_shards=2, docvalue_cols=("timesort",))
    union = src1.unionByName(src2)

    # both docs match
    both = search_sorted(
        spark, [d1, d2], "abc abc2 common", union,
        [("timesort", "asc")], k=20,
    ).collect()
    assert len(both) == 2

    # only index 2's doc matches — index 1 (and most shards) are empty
    one = search_sorted(
        spark, [d1, d2], "abc2", union, [("timesort", "asc")], k=20,
    ).collect()
    assert len(one) == 1
    assert one[0]["conv_id"] == "b1"

    # same on the single-index form with an empty shard inside it
    single = search_sorted(
        spark, d2, "abc2", src2, [("timesort", "asc")], k=20
    ).collect()
    assert len(single) == 1


def test_numdocs_greater_max_integer_katta_140(spark, tmp_path):
    """LuceneClientTest.testNumDocGreaterMaxInteger_KATTA_140: a global
    numDocs past Integer.MAX_VALUE must not overflow scoring. The
    reference injects a mocked DocumentFrequencyWritable with
    numDocs = 2^31 + 22 into the client (:541-561); here the handle's
    corpus scalar is overridden the same way — IndexHandle.n_docs is the
    exact seam search() reads (query.py reads float(index.n_docs)) — and
    the returned BM25 scores must equal the float64 closed form at that N
    (idf computes in float64 throughout; an int32 path would wrap)."""
    import math

    rows = [
        ("c1", 0, "sample text"),
        ("c1", 1, "other words"),
        ("c2", 0, "sample again"),
    ]
    src = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )
    d = str(tmp_path / "k140")
    build_index(spark, src, d, num_shards=2)

    from katta_spark.query import IndexHandle

    h = IndexHandle.open(spark, d)
    big_n = 2**31 + 23
    h.n_docs = big_n  # the reference's addNumDocs(MAX_VALUE); addNumDocs(23)

    hits = search(spark, h, "sample", k=10).collect()
    assert len(hits) == 2

    # closed form: df(sample)=2 from the real stats table, tf=1, dl=2,
    # avgdl=2 -> tf_norm = (k1+1)/(1+k1) = 1.0 exactly.
    idf = math.log1p((big_n - 2 + 0.5) / (2 + 0.5))
    for r in hits:
        assert r["score"] == pytest.approx(idf, rel=1e-6)
        assert 0.0 < r["score"] < 25.0  # sane magnitude, no wraparound
