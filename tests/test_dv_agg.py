"""In-index docvalue aggregates: facet_ranges + match_stats vs brute force.

facet_ranges is the Lucene facet-module LongRangeFacetCounts /
DoubleRangeFacetCounts analog; match_stats is the Solr StatsComponent
analog. Both are beyond-Katta operators layered over Katta's
scatter-gather shape (the reference leaves per-hit aggregation to the
Lucene consumer): each shard kernel collapses its match set to a
constant-size partial, so nothing per-doc leaves the kernels.
"""

from __future__ import annotations

import math
import statistics

import pytest
from pyspark.sql import functions as F

from katta_spark.build import build_index
from katta_spark.delete import delete_docs
from katta_spark.query import IndexHandle, facet_ranges, match_stats, search
from katta_spark.tokenizer import tokenize_str


@pytest.fixture(scope="module")
def agg_corpus(spark, tiny_transcripts):
    """Transcripts + a nullable double column (NaN-free; NaN ordering is
    covered by the codec tests) and a long column with negatives."""
    return tiny_transcripts.withColumn(
        "fval",
        F.when(
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(7)) == 0, None
        ).otherwise(
            (F.xxhash64("conv_id", "turn_idx", F.lit(3)) % 1000) / 7.0
        ),
    ).withColumn(
        "lval",
        (F.xxhash64("conv_id", "turn_idx", F.lit(9)) % 500) - F.lit(200),
    ).cache()


@pytest.fixture(scope="module")
def aggidx(spark, agg_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dvagg_idx"))
    build_index(
        spark, agg_corpus, d, num_shards=4,
        docvalue_cols=("turn_idx", "fval", "lval", "role"),
    )
    return d


def _matches(rows, terms, conj=False):
    out = []
    for r in rows:
        toks = set(tokenize_str(r["text"] or ""))
        hit = (
            all(t in toks for t in terms) if conj
            else any(t in toks for t in terms)
        )
        if hit:
            out.append(r)
    return out


def _brute_ranges(match, col, ranges):
    want = {}
    for r in ranges:
        lab, lo, hi = r[0], r[1], r[2]
        lo_incl = r[3] if len(r) > 3 else True
        hi_incl = r[4] if len(r) > 4 else False
        n = 0
        for m in match:
            v = m[col]
            if v is None:
                continue
            ok_lo = lo is None or (v >= lo if lo_incl else v > lo)
            ok_hi = hi is None or (v <= hi if hi_incl else v < hi)
            n += ok_lo and ok_hi
        want[str(lab)] = n
    return want


def _terms(corpus, n=2):
    # highest-df terms so the match set is large
    return [
        r[0]
        for r in corpus.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
        ).where(F.length("t") > 0)
        .groupBy("t").count().orderBy(F.desc("count"), "t").take(n)
    ]


def test_facet_ranges_long_vs_brute(spark, aggidx, agg_corpus):
    t1, t2 = _terms(agg_corpus)
    rows = agg_corpus.select("text", "lval").collect()
    ranges = [
        ("neg", None, 0),                 # open bottom, exclusive top
        ("lowmid", -50, 100),             # half-open default
        ("over", 0, 200, False, True),    # exclusive lo, inclusive hi
        ("all", None, None),
        ("point", 17, 17, True, True),    # single-value closed range
    ]
    for mode in ("or", "and"):
        got = {
            r["label"]: r["count"]
            for r in facet_ranges(
                spark, aggidx, f"{t1} {t2}", "lval", ranges, mode=mode
            ).collect()
        }
        want = _brute_ranges(
            _matches(rows, [t1, t2], conj=mode == "and"), "lval", ranges
        )
        assert got == want, mode


def test_facet_ranges_double_and_declaration_order(spark, aggidx, agg_corpus):
    t1, _ = _terms(agg_corpus)
    rows = agg_corpus.select("text", "fval").collect()
    ranges = [
        ("hi", 100.0, None),
        ("lo", None, 50.0),
        ("band", 25.0, 100.0, False, False),
        ("empty", 1e9, None),
    ]
    out = facet_ranges(spark, aggidx, t1, "fval", ranges).collect()
    # every declared range appears, zero counts included, in declaration order
    assert [r["label"] for r in out] == ["hi", "lo", "band", "empty"]
    got = {r["label"]: r["count"] for r in out}
    want = _brute_ranges(_matches(rows, [t1]), "fval", ranges)
    assert got == want
    assert got["empty"] == 0
    # NULL fval rows count in no range, even the fully open one
    n_nonnull = sum(
        1 for m in _matches(rows, [t1]) if m["fval"] is not None
    )
    full = facet_ranges(
        spark, aggidx, t1, "fval", [("all", None, None)]
    ).collect()
    assert full[0]["count"] == n_nonnull


def test_match_stats_double_vs_brute(spark, aggidx, agg_corpus):
    t1, t2 = _terms(agg_corpus)
    rows = agg_corpus.select("text", "fval").collect()
    match = _matches(rows, [t1, t2])
    vals = [m["fval"] for m in match if m["fval"] is not None]
    st = match_stats(spark, aggidx, f"{t1} {t2}", "fval").collect()[0]
    assert st["count"] == len(vals)
    assert st["missing"] == len(match) - len(vals)
    assert st["vmin"] == min(vals) and st["vmax"] == max(vals)
    assert math.isclose(st["vsum"], sum(vals), rel_tol=1e-12)
    assert math.isclose(st["mean"], sum(vals) / len(vals), rel_tol=1e-12)
    assert math.isclose(
        st["stddev"], statistics.stdev(vals), rel_tol=1e-9
    )


def test_match_stats_long_exact_sum(spark, aggidx, agg_corpus):
    t1, _ = _terms(agg_corpus)
    rows = agg_corpus.select("text", "lval").collect()
    vals = [m["lval"] for m in _matches(rows, [t1])]
    st = match_stats(spark, aggidx, t1, "lval").collect()[0]
    assert st["count"] == len(vals) and st["missing"] == 0
    assert st["vmin"] == min(vals) and st["vmax"] == max(vals)
    assert st["vsum"] == sum(vals)  # exact int64 sum, negatives included


def test_filter_and_deletes_compose(spark, agg_corpus, tmp_path_factory):
    # fresh index: the delete below tombstones it, so don't share aggidx
    d = str(tmp_path_factory.mktemp("dvagg_del"))
    build_index(spark, agg_corpus, d, num_shards=2,
                docvalue_cols=("turn_idx",))
    t1, _ = _terms(agg_corpus)
    h = IndexHandle.open(spark, d)
    hits = search(spark, h, t1, k=2**31 - 1, prune=False, ordered=False)
    doc_ids = sorted(r["doc_id"] for r in hits.collect())
    keep = doc_ids[::2]  # allow every other matching doc
    fdf = spark.createDataFrame([(x,) for x in keep], "doc_id long")
    st_all = match_stats(spark, d, t1, "turn_idx").collect()[0]
    st_f = match_stats(spark, d, t1, "turn_idx", filter_df=fdf).collect()[0]
    assert st_f["count"] + st_f["missing"] == len(keep)
    assert st_f["count"] < st_all["count"]
    fr = facet_ranges(
        spark, d, t1, "turn_idx", [("all", None, None)], filter_df=fdf
    ).collect()
    # turn_idx is never NULL, so the open range counts every allowed match
    assert fr[0]["count"] == len(keep)
    # tombstoned docs drop out of both aggregates
    delete_docs(spark, d, [doc_ids[0]])
    st_d = match_stats(spark, d, t1, "turn_idx").collect()[0]
    assert st_d["count"] + st_d["missing"] == len(doc_ids) - 1


def test_multi_index_sums(spark, agg_corpus, tmp_path_factory):
    t1, _ = _terms(agg_corpus)
    half_a = agg_corpus.where(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0)
    half_b = agg_corpus.where(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 1)
    da = str(tmp_path_factory.mktemp("dvagg_a"))
    db = str(tmp_path_factory.mktemp("dvagg_b"))
    build_index(spark, half_a, da, num_shards=2, docvalue_cols=("lval",))
    build_index(spark, half_b, db, num_shards=2, docvalue_cols=("lval",))
    ranges = [("neg", None, 0), ("all", None, None)]
    ga = {r["label"]: r["count"]
          for r in facet_ranges(spark, da, t1, "lval", ranges).collect()}
    gb = {r["label"]: r["count"]
          for r in facet_ranges(spark, db, t1, "lval", ranges).collect()}
    gm = {r["label"]: r["count"]
          for r in facet_ranges(spark, [da, db], t1, "lval", ranges).collect()}
    assert gm == {k: ga[k] + gb[k] for k in ga}
    sa = match_stats(spark, da, t1, "lval").collect()[0]
    sb = match_stats(spark, db, t1, "lval").collect()[0]
    sm = match_stats(spark, [da, db], t1, "lval").collect()[0]
    assert sm["count"] == sa["count"] + sb["count"]
    assert sm["vsum"] == sa["vsum"] + sb["vsum"]
    assert sm["vmin"] == min(sa["vmin"], sb["vmin"])
    assert sm["vmax"] == max(sa["vmax"], sb["vmax"])


def test_zero_match_and_argument_errors(spark, aggidx):
    st = match_stats(spark, aggidx, "zzqqxxnotaterm", "turn_idx").collect()[0]
    assert st["count"] == 0 and st["missing"] == 0 and st["vsum"] == 0
    assert st["vmin"] is None and st["vmax"] is None
    assert st["mean"] is None and st["stddev"] is None
    fr = facet_ranges(
        spark, aggidx, "zzqqxxnotaterm", "turn_idx", [("a", None, None)]
    ).collect()
    assert [(r["label"], r["count"]) for r in fr] == [("a", 0)]
    with pytest.raises(ValueError, match="string docvalue"):
        match_stats(spark, aggidx, "a", "role")
    with pytest.raises(ValueError, match="not in the index"):
        match_stats(spark, aggidx, "a", "nosuchcol")
    with pytest.raises(ValueError, match="at least one range"):
        facet_ranges(spark, aggidx, "a", "turn_idx", [])
    with pytest.raises(ValueError, match="lo.*> hi"):
        facet_ranges(spark, aggidx, "a", "turn_idx", [("bad", 5, 1)])
    with pytest.raises(ValueError, match="NaN"):
        facet_ranges(
            spark, aggidx, "a", "fval", [("nan", float("nan"), None)]
        )
