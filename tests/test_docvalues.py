"""Sort-value sidecar (docvalues) — the TopFieldCollector-parity path.

Reference: Katta's field-sorted search caps per-shard work at
min(limit, maxDoc) because Lucene's TopFieldCollector reads sort values
from the index (LuceneServer.java:672-677; typed sort fields
WritableType.java:33-35). The sidecar replicates that: per-shard
(doc → mapped value) blob buckets, kernels emit only their k best rows,
and the global merge + display join touch ≤ k·shards rows.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from katta_spark.build import build_index
from katta_spark.query import IndexHandle, search, search_sorted


@pytest.fixture(scope="module")
def dv_corpus(spark, tiny_transcripts):
    """Transcripts + a float column and a nullable long column."""
    return tiny_transcripts.withColumn(
        "fval",
        F.when(
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(7)) == 0, None
        ).otherwise(
            (F.xxhash64("conv_id", "turn_idx", F.lit(3)) % 1000) / 7.0
        ),
    ).cache()


@pytest.fixture(scope="module")
def dvidx(spark, dv_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dv_idx"))
    build_index(
        spark, dv_corpus, d, num_shards=4,
        docvalue_cols=("turn_idx", "ts", "fval"),
    )
    return d


@pytest.mark.parametrize(
    "specs",
    [
        [("turn_idx", "desc")],
        [("turn_idx", "asc")],
        [("ts", "asc"), ("turn_idx", "desc")],
        [("fval", "asc")],   # nullable double: asc_nulls_first parity
        [("fval", "desc")],  # desc_nulls_last parity
    ],
)
def test_dv_fast_path_equals_join_path(spark, dvidx, dv_corpus, specs):
    """The in-index sort cap must reproduce the source-join path exactly —
    same docs, same order, same scores — including NULL placement
    (Spark asc_nulls_first / desc_nulls_last) and float ordering."""
    cols = [
        F.col(n).asc() if d == "asc" else F.col(n).desc() for n, d in specs
    ]
    got = search_sorted(
        spark, dvidx, "hotalpha hotbeta w00011", dv_corpus, specs, k=12
    ).collect()
    want = search_sorted(
        spark, dvidx, "hotalpha hotbeta w00011", dv_corpus, cols, k=12
    ).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in want]
    np.testing.assert_allclose(
        np.array([r.score for r in got]),
        np.array([r.score for r in want]),
        rtol=1e-12,
    )
    for n, _ in specs:
        assert [r[n] for r in got] == [r[n] for r in want]


def test_dv_caps_per_shard_rows(spark, dvidx):
    """≤ k·shards rows leave the kernels (the r3 path emitted EVERY
    match); the cap must still lose nothing vs the full match set."""
    k = 5
    hits = search(
        spark, dvidx, "hotalpha hotbeta", k=2**31 - 1, prune=False,
        score_dtype="float64", ordered=False,
        _dv_sort=([("turn_idx", "desc")], k),
    )
    n_capped = hits.count()
    n_match = search(
        spark, dvidx, "hotalpha hotbeta", k=2**31 - 1, ordered=False
    ).count()
    assert n_capped <= k * 4
    assert n_match > n_capped  # the cap is actually doing work here


def test_dv_match_only_mode(spark, dvidx, dv_corpus):
    """track_scores=False runs the match-only kernel under the dv cap."""
    got = search_sorted(
        spark, dvidx, "merge hotbeta", dv_corpus, [("ts", "desc")],
        k=6, track_scores=False,
    )
    assert "score" not in got.columns
    want = search_sorted(
        spark, dvidx, "merge hotbeta", dv_corpus, [F.col("ts").desc()],
        k=6, track_scores=False,
    )
    assert [r.doc_id for r in got.collect()] == [
        r.doc_id for r in want.collect()
    ]


def test_dv_missing_column_falls_back(spark, dvidx, dv_corpus):
    """A sort column without a sidecar entry silently takes the join path
    (same answer, just not capped)."""
    got = search_sorted(
        spark, dvidx, "hotalpha", dv_corpus, [("n_tokens_hint", "desc")]
        if "n_tokens_hint" in dv_corpus.columns
        else [("role", "asc"), ("turn_idx", "asc")],
        k=5,
    )
    # 'role' is not among dvidx's docvalue_cols → join path; result
    # must still be correct vs explicit Columns
    want = search_sorted(
        spark, dvidx, "hotalpha", dv_corpus,
        [F.col("role").asc(), F.col("turn_idx").asc()], k=5,
    )
    assert [r.doc_id for r in got.collect()] == [
        r.doc_id for r in want.collect()
    ]


def test_dv_unsupported_type_refused_at_build(spark, tiny_transcripts, tmp_path):
    bad = tiny_transcripts.withColumn("arr", F.array(F.lit(1), F.lit(2)))
    with pytest.raises(ValueError, match="unsupported type"):
        build_index(
            spark, bad, str(tmp_path / "bad_dv"),
            num_shards=2, docvalue_cols=("arr",),  # array — no sort order
        )


def test_dv_resume_param_guard(spark, tiny_transcripts, dvidx):
    """Resuming with different docvalue_cols refuses like keyword_cols."""
    with pytest.raises(ValueError, match="build parameters"):
        build_index(
            spark, tiny_transcripts, dvidx, num_shards=4,
            docvalue_cols=("turn_idx",),
        )


def test_dv_multi_index_fast_path(spark, dv_corpus, tmp_path_factory):
    """Sorted search over a LIST of dv-carrying indexes runs the capped
    fast path (per-index sidecars, offset shards, combined stats) and
    equals the whole-corpus single-index answer."""
    root = tmp_path_factory.mktemp("dv_multi")
    whole = str(root / "whole")
    build_index(
        spark, dv_corpus, whole, num_shards=4,
        docvalue_cols=("turn_idx", "ts"),
    )
    parts = []
    for parity in (0, 1):
        d = str(root / f"p{parity}")
        build_index(
            spark,
            dv_corpus.where(
                F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(2)) == parity
            ),
            d, num_shards=4, docvalue_cols=("turn_idx", "ts"),
        )
        parts.append(d)
    specs = [("ts", "desc"), ("turn_idx", "asc")]
    got = search_sorted(
        spark, parts, "hotalpha hotbeta", dv_corpus, specs, k=10
    ).collect()
    want = search_sorted(
        spark, whole, "hotalpha hotbeta", dv_corpus, specs, k=10
    ).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in want]
    assert [round(r.score, 9) for r in got] == [
        round(r.score, 9) for r in want
    ]
    # and the legacy multi-index join path agrees too
    legacy = search_sorted(
        spark, parts, "hotalpha hotbeta", dv_corpus,
        [F.col("ts").desc(), F.col("turn_idx").asc()], k=10,
    ).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in legacy]


def test_dv_filtered_fast_path(spark, dvidx, dv_corpus):
    """filter_df composes with the dv fast path (Katta's
    search(query, sort, filter) one call, ILuceneServer.java:84-101):
    same answer as the join path, per-shard cap intact."""
    filt = dv_corpus.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id")
    ).where(F.pmod(F.col("doc_id"), F.lit(3)) == 0)
    specs = [("ts", "asc"), ("turn_idx", "desc")]
    got = search_sorted(
        spark, dvidx, "hotalpha hotbeta w00011", dv_corpus, specs, k=8,
        filter_df=filt,
    ).collect()
    want = search_sorted(
        spark, dvidx, "hotalpha hotbeta w00011", dv_corpus,
        [F.col("ts").asc(), F.col("turn_idx").desc()], k=8,
        filter_df=filt,
    ).collect()
    assert len(got) > 0
    assert [r.doc_id for r in got] == [r.doc_id for r in want]
    np.testing.assert_allclose(
        np.array([r.score for r in got]),
        np.array([r.score for r in want]),
        rtol=1e-12,
    )
    # the filter actually excludes docs vs the unfiltered answer
    unfilt = search_sorted(
        spark, dvidx, "hotalpha hotbeta w00011", dv_corpus, specs, k=8
    ).collect()
    assert [r.doc_id for r in got] != [r.doc_id for r in unfilt]
    # capped: ≤ k·shards rows leave the kernels on the filtered path too
    hits = search(
        spark, dvidx, "hotalpha hotbeta", k=2**31 - 1, prune=False,
        score_dtype="float64", ordered=False,
        _dv_sort=([("turn_idx", "desc")], 5), filter_df=filt,
    )
    assert hits.count() <= 5 * 4


def test_dv_filtered_empty_filter(spark, dvidx, dv_corpus):
    """An empty allowed set matches nothing on the dv fast path (same as
    the join path's filter semantics)."""
    empty = spark.createDataFrame([], "doc_id long")
    got = search_sorted(
        spark, dvidx, "hotalpha", dv_corpus, [("turn_idx", "asc")], k=5,
        filter_df=empty,
    )
    assert got.count() == 0


def test_dv_filtered_multi_index(spark, dv_corpus, tmp_path_factory):
    """Filter + dv sort across a LIST of indexes: each index's own
    sharding routes the allowed set; equals the whole-corpus answer."""
    root = tmp_path_factory.mktemp("dv_multi_filt")
    whole = str(root / "whole")
    build_index(
        spark, dv_corpus, whole, num_shards=4, docvalue_cols=("turn_idx",)
    )
    parts = []
    for parity in (0, 1):
        d = str(root / f"p{parity}")
        build_index(
            spark,
            dv_corpus.where(
                F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(2)) == parity
            ),
            d, num_shards=4, docvalue_cols=("turn_idx",),
        )
        parts.append(d)
    filt = dv_corpus.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id")
    ).where(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    specs = [("turn_idx", "desc")]
    got = search_sorted(
        spark, parts, "hotalpha hotbeta", dv_corpus, specs, k=10,
        filter_df=filt,
    ).collect()
    want = search_sorted(
        spark, whole, "hotalpha hotbeta", dv_corpus, specs, k=10,
        filter_df=filt,
    ).collect()
    assert len(got) > 0
    assert [r.doc_id for r in got] == [r.doc_id for r in want]


@pytest.fixture(scope="module")
def sdv_corpus(spark, tiny_transcripts):
    """Transcripts + a nullable string column with heavy duplication."""
    return tiny_transcripts.withColumn(
        "label",
        F.when(
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(5)) == 0, None
        ).otherwise(
            F.concat(
                F.lit("g"),
                F.pmod(
                    F.xxhash64("conv_id", "turn_idx", F.lit(11)), F.lit(13)
                ).cast("string"),
            )
        ),
    ).cache()


@pytest.fixture(scope="module")
def sdvidx(spark, sdv_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sdv_idx"))
    build_index(
        spark, sdv_corpus, d, num_shards=4,
        docvalue_cols=("label", "role", "turn_idx"),
    )
    return d


@pytest.mark.parametrize(
    "specs",
    [
        [("role", "asc")],
        [("role", "desc")],
        [("label", "asc")],                      # nulls-first parity
        [("label", "desc"), ("turn_idx", "asc")],  # string+numeric mix
    ],
)
def test_string_dv_fast_equals_join(spark, sdvidx, sdv_corpus, specs):
    """String docvalues (rank dictionary): the capped in-index path must
    equal the source-join ORDER BY exactly — duplicates tie-broken by
    doc_id, NULL placement per Spark asc_nulls_first/desc_nulls_last."""
    h = IndexHandle.open(spark, sdvidx)
    assert h.docvalue_kinds()["label"] == "string"
    cols = [
        F.col(n).asc() if d == "asc" else F.col(n).desc() for n, d in specs
    ]
    got = search_sorted(
        spark, sdvidx, "hotalpha hotbeta w00011", sdv_corpus, specs, k=15
    ).collect()
    want = search_sorted(
        spark, sdvidx, "hotalpha hotbeta w00011", sdv_corpus, cols, k=15
    ).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in want]
    for n, _ in specs:
        assert [r[n] for r in got] == [r[n] for r in want]


def test_string_dv_caps_rows(spark, sdvidx):
    """The whole point: a string sort now emits ≤ k·shards rows from the
    kernels instead of every match."""
    k = 4
    hits = search(
        spark, sdvidx, "hotalpha hotbeta", k=2**31 - 1, prune=False,
        score_dtype="float64", ordered=False,
        _dv_sort=([("role", "asc")], k),
    )
    n_capped = hits.count()
    n_match = search(
        spark, sdvidx, "hotalpha hotbeta", k=2**31 - 1, ordered=False
    ).count()
    assert n_capped <= k * 4 < n_match


def test_string_dv_filtered(spark, sdvidx, sdv_corpus):
    """Filter + string dv sort compose on the fast path."""
    filt = sdv_corpus.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id")
    ).where(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    got = search_sorted(
        spark, sdvidx, "hotalpha hotbeta", sdv_corpus,
        [("label", "asc"), ("turn_idx", "desc")], k=10, filter_df=filt,
    ).collect()
    want = search_sorted(
        spark, sdvidx, "hotalpha hotbeta", sdv_corpus,
        [F.col("label").asc(), F.col("turn_idx").desc()], k=10,
        filter_df=filt,
    ).collect()
    assert len(got) > 0
    assert [r.doc_id for r in got] == [r.doc_id for r in want]


def test_string_dv_compaction_remap(spark, sdv_corpus, tmp_path_factory):
    """Compacting indexes with string docvalues: per-index ranks are NOT
    comparable — the merged index re-ranks through a merged dictionary
    (decode → remap join → re-encode) and must sort exactly like a
    whole-corpus build. The split corpora see DISJOINT label subsets so
    their per-index ranks genuinely diverge."""
    from katta_spark.compact import compact

    root = tmp_path_factory.mktemp("sdv_compact")
    whole = str(root / "whole")
    build_index(
        spark, sdv_corpus, whole, num_shards=4,
        docvalue_cols=("label", "turn_idx"),
    )
    parts = []
    for parity in (0, 1):
        d = str(root / f"p{parity}")
        build_index(
            spark,
            sdv_corpus.where(
                F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(2)) == parity
            ),
            d, num_shards=4, docvalue_cols=("label", "turn_idx"),
        )
        parts.append(d)
    out = str(root / "merged")
    compact(spark, parts, out)
    specs = [("label", "asc"), ("turn_idx", "desc")]
    got = search_sorted(
        spark, out, "hotalpha hotbeta w00011", sdv_corpus, specs, k=15
    ).collect()
    want = search_sorted(
        spark, whole, "hotalpha hotbeta w00011", sdv_corpus, specs, k=15
    ).collect()
    assert len(got) == len(want) > 0
    assert [r.doc_id for r in got] == [r.doc_id for r in want]
    assert [r.label for r in got] == [r.label for r in want]


def test_dv_multi_index_scores_off(spark, dv_corpus, tmp_path_factory):
    """Multi-index sorted search with track_scores=False (Katta's DEFAULT,
    LuceneServer.java:97) — r4 refused this; now the match-only kernel
    runs under the multi-index offset path: same docs and order as
    scores-on, minus the score column. Also exercised on the join path
    (opaque Column sorts)."""
    root = tmp_path_factory.mktemp("dv_multi_ns")
    parts = []
    for parity in (0, 1):
        d = str(root / f"p{parity}")
        build_index(
            spark,
            dv_corpus.where(
                F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(2)) == parity
            ),
            d, num_shards=4, docvalue_cols=("turn_idx", "ts"),
        )
        parts.append(d)
    specs = [("ts", "asc"), ("turn_idx", "desc")]
    off = search_sorted(
        spark, parts, "hotalpha hotbeta", dv_corpus, specs, k=10,
        track_scores=False,
    )
    assert "score" not in off.columns
    on = search_sorted(
        spark, parts, "hotalpha hotbeta", dv_corpus, specs, k=10,
        track_scores=True,
    )
    off_rows = off.collect()
    assert len(off_rows) == 10
    assert [r.doc_id for r in off_rows] == [r.doc_id for r in on.collect()]
    # join path (opaque Columns) with scores off, multi-index
    legacy = search_sorted(
        spark, parts, "hotalpha hotbeta", dv_corpus,
        [F.col("ts").asc(), F.col("turn_idx").desc()], k=10,
        track_scores=False,
    )
    assert "score" not in legacy.columns
    assert [r.doc_id for r in off_rows] == [
        r.doc_id for r in legacy.collect()
    ]


def test_string_dv_multi_index(spark, sdv_corpus, tmp_path_factory):
    """Sorted search over a LIST of indexes on a STRING docvalue column:
    per-index rank dictionaries are NOT cross-index comparable, so the
    global merge must resolve the capped candidates' ranks to their
    actual string values through each index's dictionary (the per-shard
    cap itself stays rank-based — sound within one index). The split
    corpora see DISJOINT label subsets so the per-index ranks genuinely
    diverge from global string order; a raw-rank merge returns the wrong
    docs here."""
    root = tmp_path_factory.mktemp("sdv_multi")
    # label values depend on the split parity: part 0 sees only L<even>,
    # part 1 only L<odd>, and "L0" < "L1" < "L10" < ... < "L2" < "L3"
    # interleaves lexicographically ACROSS the parts — so the two
    # per-index dictionaries assign the SAME rank to labels that differ
    # in global order (a raw-rank merge pairs L0 with L1, L10 with L11,
    # …: visibly wrong docs). Nulls stay in for null-ordering coverage.
    half = F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(2))
    corpus = sdv_corpus.withColumn(
        "label",
        F.when(F.col("label").isNull(), None).otherwise(
            F.concat(
                F.lit("L"),
                (
                    F.pmod(
                        F.xxhash64("conv_id", "turn_idx", F.lit(11)),
                        F.lit(8),
                    ) * 2 + half
                ).cast("string"),
            )
        ),
    )
    whole = str(root / "whole")
    build_index(
        spark, corpus, whole, num_shards=4,
        docvalue_cols=("label", "turn_idx"),
    )
    parts = []
    for parity in (0, 1):
        d = str(root / f"p{parity}")
        build_index(
            spark, corpus.where(half == parity),
            d, num_shards=4, docvalue_cols=("label", "turn_idx"),
        )
        parts.append(d)
    for specs in (
        [("label", "asc"), ("turn_idx", "desc")],
        [("label", "desc"), ("turn_idx", "asc")],
    ):
        got = search_sorted(
            spark, parts, "hotalpha hotbeta w00011", corpus, specs, k=15
        ).collect()
        want = search_sorted(
            spark, whole, "hotalpha hotbeta w00011", corpus, specs, k=15
        ).collect()
        assert len(got) == len(want) > 0
        assert [r.doc_id for r in got] == [r.doc_id for r in want]
        assert [r.label for r in got] == [r.label for r in want]
    # the multi-index join path (opaque Columns) agrees too
    legacy = search_sorted(
        spark, parts, "hotalpha hotbeta w00011", corpus,
        [F.col("label").asc(), F.col("turn_idx").desc()], k=15,
    ).collect()
    fast = search_sorted(
        spark, parts, "hotalpha hotbeta w00011", corpus,
        [("label", "asc"), ("turn_idx", "desc")], k=15,
    ).collect()
    assert [r.doc_id for r in fast] == [r.doc_id for r in legacy]


def test_mixed_kind_dv_falls_back(spark, sdv_corpus, tmp_path_factory):
    """The same column stored as DIFFERENT docvalue kinds in different
    indexes (string in one, long in another) has no comparable mapped key
    — search_sorted must take the source-join path (correct on original
    values), not merge incomparable keys."""
    root = tmp_path_factory.mktemp("dv_mixed_kind")
    a = str(root / "a")
    b = str(root / "b")
    half = F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(7)), F.lit(2))
    str_half = sdv_corpus.where(half == 0).withColumn(
        "tag", F.col("turn_idx").cast("string")
    )
    long_half = sdv_corpus.where(half == 1).withColumn(
        "tag", F.col("turn_idx").cast("long")
    )
    build_index(spark, str_half, a, num_shards=4, docvalue_cols=("tag",))
    build_index(spark, long_half, b, num_shards=4, docvalue_cols=("tag",))
    assert IndexHandle.open(spark, a).docvalue_kinds()["tag"] == "string"
    assert IndexHandle.open(spark, b).docvalue_kinds()["tag"] == "long"
    src = sdv_corpus.withColumn("tag", F.col("turn_idx").cast("string"))
    got = search_sorted(
        spark, [a, b], "hotalpha hotbeta", src, [("tag", "asc")], k=10
    ).collect()
    want = search_sorted(
        spark, [a, b], "hotalpha hotbeta", src, [F.col("tag").asc()], k=10
    ).collect()
    assert len(got) == 10
    assert [r.doc_id for r in got] == [r.doc_id for r in want]


def test_source_with_engine_columns(spark, dvidx, dv_corpus):
    """A source frame that already carries shard_id/score — exactly what
    oracle.with_doc_ids produces — must not make the hits↔source join
    ambiguous on either sorted path or get_details (AMBIGUOUS_REFERENCE
    regression). The engine's hit columns are authoritative: Katta's
    HitsMapWritable carries shard/score, the stored document only its
    fields (LuceneServer.java:390-410)."""
    from katta_spark.query import get_details

    src = dv_corpus.withColumn("shard_id", F.lit(99)).withColumn(
        "score", F.lit(-1.0)
    )
    plain = search_sorted(
        spark, dvidx, "hotalpha hotbeta", dv_corpus,
        [("turn_idx", "desc")], k=8,
    ).collect()
    got = search_sorted(
        spark, dvidx, "hotalpha hotbeta", src, [("turn_idx", "desc")], k=8
    ).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in plain]
    assert all(r.shard_id != 99 and r.score > 0 for r in got)
    # opaque Column spec forces the source-join fallback path
    got_j = search_sorted(
        spark, dvidx, "hotalpha hotbeta", src,
        [F.col("turn_idx").desc()], k=8,
    ).collect()
    assert [r.doc_id for r in got_j] == [r.doc_id for r in plain]
    assert all(r.shard_id != 99 and r.score > 0 for r in got_j)
    hits = search(spark, dvidx, "hotalpha", k=5)
    det = get_details(spark, hits, src).collect()
    assert len(det) == 5
    assert all(r.shard_id != 99 and r.score > 0 for r in det)
