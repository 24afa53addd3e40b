"""Delta-index compaction — the optimize() analog (IndexerJob.java:118-179).

search(compacted) must be SCORE-IDENTICAL to search_multi([base, delta]):
compaction derives the merged index purely from the postings union (no
retokenize), and its global stats equal the combined stats the multi-index
search computes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from katta_spark.build import build_index
from katta_spark.compact import compact
from katta_spark.query import count_matches, search, search_multi


@pytest.fixture(scope="module")
def base_delta(spark, tiny_transcripts, tmp_path_factory):
    root = tmp_path_factory.mktemp("compact")
    dirs = []
    for parity in (0, 1):
        d = str(root / f"part{parity}")
        build_index(
            spark,
            tiny_transcripts.where(
                F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(2)) == parity
            ),
            d,
            num_shards=4,
        )
        dirs.append(d)
    out = str(root / "merged")
    summary = compact(spark, dirs, out)
    return dirs, out, summary


@pytest.mark.parametrize(
    "query",
    [
        "hotalpha hotbeta",
        "hotalpha -hotbeta",
        "+w00011 hotalpha",
        '"hotalpha hotbeta"~4 merge',
        "(hotalpha AND hotbeta) OR w00011",
    ],
)
def test_compacted_equals_multi(spark, base_delta, query):
    dirs, out, _ = base_delta
    got = search(spark, out, query, k=12, score_dtype="float64").collect()
    want = search_multi(
        spark, dirs, query, k=12, score_dtype="float64"
    ).collect()
    # shard ids differ (multi offsets them) — compare docs + scores
    assert [r.doc_id for r in got] == [r.doc_id for r in want], query
    assert [round(r.score, 9) for r in got] == [
        round(r.score, 9) for r in want
    ], query


def test_compacted_counts_and_stats(spark, base_delta, tiny_transcripts):
    dirs, out, summary = base_delta
    assert summary["n_docs"] == tiny_transcripts.count()
    assert count_matches(spark, out, "hotalpha hotbeta") == count_matches(
        spark, dirs, "hotalpha hotbeta"
    )
    # merged term stats == stats of a from-scratch whole-corpus index:
    # df/cf are pure sums, so compare against the union-of-inputs aggregate
    import pandas as pd

    a = (
        spark.read.parquet(f"{dirs[0]}/stats.parquet")
        .unionByName(spark.read.parquet(f"{dirs[1]}/stats.parquet"))
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .orderBy("term")
        .toPandas()
    )
    b = (
        spark.read.parquet(f"{out}/stats.parquet")
        .select("term", "df", "cf")
        .orderBy("term")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_compact_refuses_duplicate_docs(spark, base_delta, tmp_path):
    dirs, _, _ = base_delta
    dup = tmp_path / "dup"
    with pytest.raises(Exception, match="duplicate doc_id"):
        compact(spark, [dirs[0], dirs[0]], str(dup))
    # the overlapped dictionary/stats jobs may have committed before the
    # merge refused — a failed compact must clean its partial artifacts
    # so the retry isn't blocked by the non-empty-out_dir guard
    import os

    assert os.listdir(dup) == []
    summary = compact(spark, dirs, str(dup))
    assert summary["n_docs"] > 0


def test_compact_refuses_shape_mismatch(
    spark, base_delta, tiny_transcripts, tmp_path
):
    dirs, _, _ = base_delta
    other = str(tmp_path / "othershape")
    build_index(
        spark, tiny_transcripts.limit(50), other, num_shards=2
    )
    with pytest.raises(ValueError, match="must share"):
        compact(spark, [dirs[0], other], str(tmp_path / "bad"))


def test_compact_refuses_nonempty_out(spark, base_delta):
    dirs, out, _ = base_delta
    with pytest.raises(ValueError, match="not empty"):
        compact(spark, dirs, out)


def test_compact_merges_docvalue_sidecars(
    spark, tiny_transcripts, tmp_path_factory
):
    """Compaction re-buckets the inputs' docvalue sidecars: field-sorted
    search over the compacted index runs the FAST path and equals both
    its own join path and a from-scratch whole-corpus dv index."""
    from katta_spark.query import IndexHandle, search_sorted

    root = tmp_path_factory.mktemp("compact_dv")
    dirs = []
    for parity in (0, 1):
        d = str(root / f"p{parity}")
        build_index(
            spark,
            tiny_transcripts.where(
                F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(2)) == parity
            ),
            d, num_shards=4, docvalue_cols=("turn_idx", "ts"),
        )
        dirs.append(d)
    out = str(root / "merged")
    compact(spark, dirs, out)
    ih = IndexHandle.open(spark, out)
    assert set(ih.docvalue_kinds()) == {"turn_idx", "ts"}
    whole = str(root / "whole")
    build_index(
        spark, tiny_transcripts, whole, num_shards=4,
        docvalue_cols=("turn_idx", "ts"),
    )
    kwargs = dict(k=9)
    got = search_sorted(
        spark, out, "hotalpha hotbeta", tiny_transcripts,
        [("ts", "desc"), ("turn_idx", "asc")], **kwargs,
    ).collect()
    via_join = search_sorted(
        spark, out, "hotalpha hotbeta", tiny_transcripts,
        [F.col("ts").desc(), F.col("turn_idx").asc()], **kwargs,
    ).collect()
    via_whole = search_sorted(
        spark, whole, "hotalpha hotbeta", tiny_transcripts,
        [("ts", "desc"), ("turn_idx", "asc")], **kwargs,
    ).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in via_join]
    assert [r.doc_id for r in got] == [r.doc_id for r in via_whole]
    assert [round(r.score, 6) for r in got] == [
        round(r.score, 6) for r in via_whole
    ]


def test_compact_refuses_mixed_docvalues(
    spark, tiny_transcripts, base_delta, tmp_path
):
    """One input with a sidecar + one without (or different cols) refuses."""
    dirs, _, _ = base_delta
    withdv = str(tmp_path / "withdv")
    build_index(
        spark,
        tiny_transcripts.where(
            F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(2)) == 1
        ),
        withdv, num_shards=4, docvalue_cols=("turn_idx",),
    )
    with pytest.raises(ValueError, match="SAME docvalue"):
        compact(spark, [dirs[0], withdv], str(tmp_path / "bad_mix"))


def test_compact_positions_false(spark, tiny_transcripts, tmp_path_factory):
    """Compacting positions=False inputs works (empty blobs pass through /
    merge to empty) and a positional/positionless mix refuses."""
    root = tmp_path_factory.mktemp("compact_nopos")
    dirs = []
    for parity in (0, 1):
        d = str(root / f"np{parity}")
        build_index(
            spark,
            tiny_transcripts.where(
                F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(2)) == parity
            ),
            d,
            num_shards=4,
            positions=False,
        )
        dirs.append(d)
    out = str(root / "np_merged")
    compact(spark, dirs, out)
    q = "hotalpha hotbeta"
    got = search(spark, out, q, k=10, score_dtype="float64").collect()
    want = search_multi(spark, dirs, q, k=10, score_dtype="float64").collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]
    import os

    post = spark.read.parquet(os.path.join(out, "postings.parquet"))
    assert post.agg(F.sum(F.length("positions"))).collect()[0][0] == 0
    with pytest.raises(ValueError, match="positions"):
        search(spark, out, '"hotalpha hotbeta"', k=5)
    # mixed inputs refuse
    dpos = str(root / "withpos")
    build_index(
        spark,
        tiny_transcripts.where(
            F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(2)) == 0
        ),
        dpos,
        num_shards=4,
    )
    with pytest.raises(ValueError, match="must share"):
        compact(spark, [dpos, dirs[1]], str(root / "mix"))


def test_passthrough_byte_identity(spark, base_delta):
    """Terms present in exactly ONE source index must pass through
    compaction byte-identical (no decode, no re-encode): every blob and
    stat column of the output row equals the single source row."""
    dirs, out, _ = base_delta
    import os

    dunion = None
    for i, d in enumerate(dirs):
        t = spark.read.parquet(os.path.join(d, "postings.parquet"))
        dunion = t if dunion is None else dunion.unionByName(t)
    single = (
        dunion.groupBy("shard_id", "th")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") == 1)
        .select("shard_id", "th")
    )
    assert single.count() > 0, "fixture must contain single-source terms"
    cols = ["doc_ids", "tfs", "doclens", "positions", "skips", "df", "cf"]
    src = dunion.join(single, ["shard_id", "th"]).select(
        "shard_id", "th", *cols
    )
    outp = (
        spark.read.parquet(os.path.join(out, "postings.parquet"))
        .join(single, ["shard_id", "th"])
        .select("shard_id", "th", *[F.col(c).alias(f"o_{c}") for c in cols])
    )
    joined = src.join(outp, ["shard_id", "th"])
    assert joined.count() == single.count()
    mismatches = joined.where(
        " OR ".join(f"{c} <> o_{c}" for c in cols)
    ).count()
    assert mismatches == 0
