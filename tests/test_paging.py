"""Result paging — Lucene's two forms, both replicated exactly:

- ``search(offset=N)`` — the shallow form (TopScoreDocCollector over
  offset+k then slice): every shard emits offset+k rows, the merged
  ranking drops the first N. Exact for any offset; cost grows with
  page depth exactly as in Lucene.
- ``search_after(after=(score, doc_id, shard_id))`` — the deep form
  (IndexSearcher.searchAfter): each shard kernel masks candidates
  strictly after the cursor in the reference tie-break BEFORE its top-k
  cap, so per-shard emission stays at k at any depth.

Invariants tested: pages concatenate to the full ranking with no
duplicates and no gaps, for every kernel (or/and/boolean/tree),
multi-index, filtered, tombstoned, and field-sorted paths.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import katta_spark.query as ksq
from katta_spark.build import build_index


@pytest.fixture(scope="module")
def corpus(spark, tiny_transcripts):
    return tiny_transcripts.withColumn(
        "doc_id", F.xxhash64("conv_id", "turn_idx")
    ).cache()


@pytest.fixture(scope="module")
def idx(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pg_idx"))
    build_index(
        spark, corpus, d, num_shards=4, doc_id_col="doc_id",
        keyword_cols=("role",), docvalue_cols=("turn_idx", "role"),
    )
    return d


@pytest.fixture(scope="module")
def qterms(spark, idx):
    rows = (
        spark.read.parquet(os.path.join(idx, "stats.parquet"))
        .where(~F.col("term").contains(":"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(3)
        .collect()
    )
    return [r["term"] for r in rows]


def _full(spark, idx, q, n=4000, **kw):
    """The complete ranking (n exceeds the corpus size)."""
    return ksq.search(
        spark, idx, q, k=n, score_dtype="float64", **kw
    ).toPandas()


@pytest.mark.parametrize(
    "qfmt,kw",
    [
        ("{0} {1}", {}),
        ("{0} {1}", {"mode": "and"}),
        ("+{0} {1} -{2}", {}),
        ("({0} AND {1}) OR {2}", {}),
    ],
)
def test_offset_slices_the_full_ranking(spark, idx, qterms, qfmt, kw):
    q = qfmt.format(*qterms)
    full = _full(spark, idx, q, **kw)
    for off, kk in ((0, 10), (10, 10), (25, 7), (len(full), 5)):
        page = ksq.search(
            spark, idx, q, k=kk, offset=off, score_dtype="float64", **kw
        ).toPandas()
        exp = full.iloc[off:off + kk]
        assert list(page.doc_id) == list(exp.doc_id), (q, off)
        assert list(page.score) == list(exp.score), (q, off)


@pytest.mark.parametrize(
    "qfmt,kw",
    [
        ("{0} {1}", {}),
        ("{0} {1}", {"mode": "and"}),
        ("+{0} {1} -{2}", {}),
        ("({0} AND {1}) OR {2}", {}),
    ],
)
def test_search_after_pages_concatenate(spark, idx, qterms, qfmt, kw):
    """Cursor pages reproduce the full ranking exactly — no dups, no
    gaps — across every kernel."""
    q = qfmt.format(*qterms)
    full = _full(spark, idx, q, **kw)
    got = []
    after = None
    while True:
        if after is None:
            page = ksq.search(
                spark, idx, q, k=17, score_dtype="float64", **kw
            ).collect()
        else:
            page = ksq.search_after(
                spark, idx, q, after, k=17, score_dtype="float64", **kw
            ).collect()
        if not page:
            break
        got.extend(page)
        after = (page[-1]["score"], page[-1]["doc_id"], page[-1]["shard_id"])
        assert len(got) <= len(full) + 17, "cursor loop diverged"
    assert [r["doc_id"] for r in got] == list(full.doc_id)
    assert [r["score"] for r in got] == list(full.score)


def test_search_after_multi_index_and_filter(
    spark, corpus, tmp_path_factory, qterms
):
    base = str(tmp_path_factory.mktemp("pg_multi"))
    dirs = []
    for parity in (0, 1):
        d = os.path.join(base, f"p{parity}")
        build_index(
            spark, corpus.where(F.pmod(F.col("doc_id"), F.lit(2)) == parity),
            d, num_shards=2, doc_id_col="doc_id",
        )
        dirs.append(d)
    q = f"{qterms[0]} {qterms[1]}"
    allowed = corpus.where("turn_idx % 3 != 1")
    full = ksq.search_multi(
        spark, dirs, q, k=300, score_dtype="float64", filter_df=allowed
    ).toPandas()
    p1 = ksq.search_multi(
        spark, dirs, q, k=11, score_dtype="float64", filter_df=allowed
    ).collect()
    after = (p1[-1]["score"], p1[-1]["doc_id"], p1[-1]["shard_id"])
    p2 = ksq.search_after(
        spark, dirs, q, after, k=11, score_dtype="float64",
        filter_df=allowed,
    ).toPandas()
    assert list(p2.doc_id) == list(full.doc_id[11:22])
    # offset form agrees
    p2b = ksq.search_multi(
        spark, dirs, q, k=11, offset=11, score_dtype="float64",
        filter_df=allowed,
    ).toPandas()
    assert list(p2b.doc_id) == list(p2.doc_id)


def test_offset_with_totals(spark, idx, qterms):
    q = f"{qterms[0]} {qterms[1]}"
    t0 = ksq.search_with_total(spark, idx, q, k=10).toPandas()
    t1 = ksq.search_with_total(spark, idx, q, k=10, offset=10).toPandas()
    assert t0.total_hits.iloc[0] == t1.total_hits.iloc[0]
    full = _full(spark, idx, q)
    assert list(t1.doc_id) == list(full.doc_id[10:20])


def test_sorted_paging_dv_and_join(spark, corpus, idx, qterms):
    q = f"{qterms[0]} {qterms[1]}"
    # dv fast path (numeric + string), page 2 == rows 8..16 of page-size-16
    full = ksq.search_sorted(
        spark, idx, q, corpus, [("role", "asc"), ("turn_idx", "desc")],
        k=16, doc_id_col="doc_id",
    ).toPandas()
    page2 = ksq.search_sorted(
        spark, idx, q, corpus, [("role", "asc"), ("turn_idx", "desc")],
        k=8, offset=8, doc_id_col="doc_id",
    ).toPandas()
    assert list(page2.doc_id) == list(full.doc_id[8:16])
    # join path (opaque Column sort expression)
    fullj = ksq.search_sorted(
        spark, idx, q, corpus, [F.length("text").desc()], k=16,
        doc_id_col="doc_id",
    ).toPandas()
    page2j = ksq.search_sorted(
        spark, idx, q, corpus, [F.length("text").desc()], k=8, offset=8,
        doc_id_col="doc_id",
    ).toPandas()
    assert list(page2j.doc_id) == list(fullj.doc_id[8:16])


def test_paging_with_tombstones(spark, corpus, idx, qterms, tmp_path_factory):
    import shutil

    import katta_spark.delete as kd

    d = str(tmp_path_factory.mktemp("pg_del")) + "/idx"
    shutil.copytree(idx, d)
    kd.delete_docs(spark, d, corpus.where("pmod(doc_id, 5) = 0"))
    q = f"{qterms[0]} {qterms[1]}"
    full = _full(spark, d, q)
    p1 = ksq.search(spark, d, q, k=9, score_dtype="float64").collect()
    after = (p1[-1]["score"], p1[-1]["doc_id"], p1[-1]["shard_id"])
    p2 = ksq.search_after(
        spark, d, q, after, k=9, score_dtype="float64"
    ).toPandas()
    assert list(p2.doc_id) == list(full.doc_id[9:18])


def test_paging_refusals(spark, idx, qterms):
    q = f"{qterms[0]} {qterms[1]}"
    with pytest.raises(ValueError, match="offset must be"):
        ksq.search(spark, idx, q, offset=-1)
    with pytest.raises(ValueError, match="alternative paging"):
        ksq.search(spark, idx, q, offset=5, _cursor=(1.0, 0, 0))
    with pytest.raises(ValueError, match="scoring mode"):
        ksq.search_after(spark, idx, q, (1.0, 0, 0), mode="match")
    with pytest.raises(ValueError, match="must be .score, doc_id, shard_id.|after must be"):
        ksq.search_after(spark, idx, q, (1.0, 0))


def test_search_after_unwraps_one_element_list(spark, idx, qterms):
    """A one-element index list IS a single index: clause options must
    work through it (the CLI and count_matches unwrap the same way)."""
    q = f"{qterms[0]} {qterms[1]}"
    p1 = ksq.search(spark, idx, q, k=5, min_should_match=1).collect()
    after = (
        float(p1[-1]["score"]), int(p1[-1]["doc_id"]), int(p1[-1]["shard_id"])
    )
    single = ksq.search_after(
        spark, idx, q, after, k=5, min_should_match=1
    ).collect()
    listed = ksq.search_after(
        spark, [idx], q, after, k=5, min_should_match=1
    ).collect()
    assert [tuple(r) for r in listed] == [tuple(r) for r in single]
    t_single = ksq.search_with_total(
        spark, idx, q, k=2, min_should_match=1
    ).collect()
    t_listed = ksq.search_with_total(
        spark, [idx], q, k=2, min_should_match=1
    ).collect()
    assert [tuple(r) for r in t_listed] == [tuple(r) for r in t_single]
