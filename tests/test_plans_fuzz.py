"""Physical-plan audits + seeded rank-identity fuzzing.

The plan audit enforces the scale design (SURVEY.md §4): pushed postings
predicates, TakeOrderedAndProject global merge, no corpus-sized shuffle on
the query path. The fuzz test hammers the engine-vs-oracle equivalence with
random queries beyond the fixed reference set.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from katta_spark.build import build_index
from katta_spark.oracle import bm25_topk, with_doc_ids
from katta_spark.plans import (
    audit_details_plan,
    audit_search_plan,
    audit_sorted_search_plan,
)
from katta_spark.query import get_details, search, search_sorted
from katta_spark.synth import HOT_TERMS


@pytest.fixture(scope="module")
def idx(spark, tiny_transcripts, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzz_idx"))
    build_index(spark, tiny_transcripts, d, num_shards=4)
    return d


@pytest.fixture(scope="module")
def docs(tiny_transcripts):
    return with_doc_ids(tiny_transcripts, 4).cache()


def test_search_plan_shape(spark, idx):
    hits = search(spark, idx, "hotalpha w00011", k=10)
    audit = audit_search_plan(hits)
    assert audit["pushed_term_filter"], audit["plan"][:2000]
    assert audit["take_ordered"], audit["plan"][:2000]
    # one exchange to group postings by shard; the top-k merge is
    # TakeOrderedAndProject (not a full sort exchange)
    assert audit["n_exchanges"] <= 2, audit["plan"][:2000]


def test_details_plan_broadcasts_topk(spark, idx, tiny_transcripts):
    """J2 at scale: the broadcast (build) side must be the tiny top-k,
    never the corpus (a left join hinted on its preserved side silently
    degrades to a corpus-wide sort-merge join)."""
    hits = search(spark, idx, "hotalpha w00011", k=5)
    details = get_details(spark, hits, tiny_transcripts, fields=["role", "text"])
    audit = audit_details_plan(details)
    assert audit["broadcast_join"], audit["plan"][:2000]
    assert audit["no_smj"], audit["plan"][:2000]
    assert audit["topk_is_build_side"], audit["plan"][:2000]


def test_sorted_search_plan_no_global_sort(spark, idx, tiny_transcripts):
    """T2/T4 at scale: field sort must not first run a global top-(2^31-1)
    score sort through one partition (reference never materializes a global
    score sort either — TopFieldCollector, LuceneServer.java:672-677)."""
    out = search_sorted(
        spark, idx, "hotalpha", tiny_transcripts,
        sort_cols=[F.col("ts").desc()], k=5, track_scores=False,
    )
    audit = audit_sorted_search_plan(out)
    assert audit["take_ordered"], audit["plan"][:2000]
    assert audit["no_single_partition"], audit["plan"][:2000]
    assert audit["no_global_limit"], audit["plan"][:2000]


def test_filtered_search_plan_is_cogrouped(spark, idx, docs):
    """The predicate-shaped filter must reach the kernels as a COGROUP —
    never a driver-side collected list: the plan shows
    FlatMapCoGroupsInPandas with both sides exchanged by shard."""
    from katta_spark.plans import physical_plan

    allowed = docs.where(F.col("role") == "user").select("doc_id")
    hits = search(spark, idx, "hotalpha", k=10, filter_df=allowed)
    plan = physical_plan(hits, mode="simple")
    assert "FlatMapCoGroupsInPandas" in plan, plan[:2000]
    assert "LocalTableScan" not in plan, plan[:2000]


def test_rank_identity_fuzz(spark, idx, docs):
    """12 random queries (hot/mid/rare/absent mixes, duplicates, random k)
    must be rank-identical to the oracle."""
    rng = random.Random(20260816)
    vocab = (
        [f"w{n:05d}" for n in rng.sample(range(10, 2000), 30)]
        + list(HOT_TERMS)
        + ["absentterm"]
    )
    for i in range(12):
        n_terms = rng.randint(1, 5)
        terms = [rng.choice(vocab) for _ in range(n_terms)]
        if rng.random() < 0.3:
            terms.append(terms[0])  # duplicate
        q = " ".join(terms)
        k = rng.choice([1, 3, 10, 40])
        got = search(spark, idx, q, k=k).collect()
        want = bm25_topk(docs, q, k=k, shard_col="shard_id").collect()
        assert [(r.doc_id, r.shard_id) for r in got] == [
            (r.doc_id, r.shard_id) for r in want
        ], f"fuzz #{i}: {q!r} k={k}"
        np.testing.assert_allclose(
            np.array([r.score for r in got], np.float32),
            np.array([r.score for r in want], np.float32),
            rtol=2e-6,
        )


def test_broad_expansion_uses_broadcast_fetch(spark, idx, docs):
    """Past _ISIN_MAX_TERMS the term fetch must switch from a pushed
    In(th, ...) predicate to a broadcast-joined term table: a ~990-term
    wildcard must not inline a thousand literals into the scan, and the
    result must still rank-match the oracle."""
    from katta_spark.plans import physical_plan
    from katta_spark.query import IndexHandle, expand_wildcards

    ix = IndexHandle.open(spark, idx)
    expanded = expand_wildcards(spark, ix, "w00*")
    assert len(expanded) > 64  # the broadcast path threshold
    hits = search(spark, idx, "w00*", k=10)
    plan = physical_plan(hits)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]
    # no giant inlined literal list on the scan
    assert plan.count(",") < 2000, "term literals leaked into the plan"
    got = search(spark, idx, "w00*", k=10, score_dtype="float64").collect()
    want = bm25_topk(
        docs, " ".join(sorted(expanded)), k=10, shard_col="shard_id",
        score_dtype="double",
    ).collect()
    assert [(r.doc_id, round(r.score, 6)) for r in got] == [
        (r.doc_id, round(r.score, 6)) for r in want
    ]


def test_positions_column_pruned_unless_phrase(spark, idx):
    """The v8 positions blobs must be fetched ONLY by phrase queries: a
    flat query's postings ReadSchema excludes positions (and the
    build-time-only cf/sum_dl), a phrase query's includes it."""
    from katta_spark.plans import scan_read_schemas

    flat_scans = scan_read_schemas(search(spark, idx, "hotalpha w00011", k=5))
    post = [s for s in flat_scans if "doc_ids" in s]
    assert post, flat_scans
    assert all("positions" not in s for s in post), post
    assert all("sum_dl" not in s and "cf" not in s for s in post), post

    ph_scans = scan_read_schemas(
        search(spark, idx, '"hotalpha hotbeta"', k=5)
    )
    post = [s for s in ph_scans if "doc_ids" in s]
    assert post and any("positions" in s for s in post), ph_scans


def test_msm_synonym_plan_shape(spark, idx):
    """min_should_match / synonym queries keep the designed scan shape:
    the term predicate (incl. GROUP MEMBERS) stays pushed to the postings
    scan, positions are never fetched, and the merge is still
    TakeOrderedAndProject."""
    from katta_spark.plans import audit_search_plan, scan_read_schemas

    out = search(
        spark, idx, "hotalpha w00011", k=5,
        synonyms={"hotalpha": ["hotbeta"]}, min_should_match=1,
    )
    audit = audit_search_plan(out)
    assert audit["pushed_term_filter"], audit["plan"]
    assert audit["take_ordered"], audit["plan"]
    # the member term's hash is in the pushed In(th, ...) set
    from katta_spark.xxhash import term_hash

    assert str(term_hash("hotbeta")) in audit["plan"]
    post = [s for s in scan_read_schemas(out) if "doc_ids" in s]
    assert post and all("positions" not in s for s in post), post


def test_dv_sorted_plan_shape(spark, tiny_transcripts, tmp_path_factory):
    """Docvalue fast path plan: the sidecar scan is predicate-pushed to
    the named sort column, and the display join broadcasts the merged
    top-k (never the corpus)."""
    from katta_spark.plans import physical_plan, scan_read_schemas

    d = str(tmp_path_factory.mktemp("plan_dv_idx"))
    build_index(
        spark, tiny_transcripts, d, num_shards=4,
        docvalue_cols=("turn_idx",),
    )
    out = search_sorted(
        spark, d, "hotalpha", tiny_transcripts, [("turn_idx", "desc")], k=5
    )
    plan = physical_plan(out)
    assert "EqualTo(col,turn_idx)" in plan or "In(col" in plan, plan[:3000]
    simple = physical_plan(out, mode="simple")
    assert "BroadcastHashJoin" in simple and "SortMergeJoin" not in simple
    # the dv scan reads only the sidecar columns
    dv_scans = [
        s for s in scan_read_schemas(out) if "vals" in s and "bucket" in s
    ]
    assert dv_scans and all("positions" not in s for s in dv_scans)
