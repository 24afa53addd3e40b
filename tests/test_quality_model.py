"""Trained quality classifier + Pareto keep rule (GPT-3 filter shape).

No SQL oracle (L-BFGS training is iterative, like BPE/IVF): verified
behaviorally — held-out separation, deterministic scoring and filtering,
and a no-shuffle plan audit on the scoring pass.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from katta_spark.plans import physical_plan
from katta_spark.quality_model import (
    pareto_filter,
    score_quality,
    train_quality_classifier,
)

GOOD = ("curated encyclopedia prose paragraph citation reviewed "
        "grammar structured reference edited").split()
JUNK = ("zzspam clickzz winbig freefree zzads keyword stuffing "
        "zzlorem casino pills").split()
COMMON = "the a of and to in is was".split()


def _mk_docs(ids, vocab):
    rows = []
    for i in ids:
        words = [COMMON[(i + j) % len(COMMON)] for j in range(6)]
        words += [vocab[(i * 7 + j) % len(vocab)] for j in range(14)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def model_and_heldout(spark):
    # even ids train, odd ids held out — same generating process
    train_pos = spark.createDataFrame(_mk_docs(range(0, 400, 2), GOOD))
    train_neg = spark.createDataFrame(_mk_docs(range(400, 800, 2), JUNK))
    model = train_quality_classifier(
        train_pos, train_neg, n_features=1 << 14, max_iter=30
    )
    held_pos = spark.createDataFrame(_mk_docs(range(1, 400, 2), GOOD))
    held_neg = spark.createDataFrame(_mk_docs(range(401, 800, 2), JUNK))
    return model, held_pos, held_neg


def test_separates_held_out(spark, model_and_heldout):
    model, held_pos, held_neg = model_and_heldout
    p = score_quality(model, held_pos).agg(F.avg("quality_prob")).first()[0]
    n = score_quality(model, held_neg).agg(F.avg("quality_prob")).first()[0]
    assert p > 0.9, p
    assert n < 0.1, n


def test_scoring_deterministic_and_bounded(spark, model_and_heldout):
    model, held_pos, _ = model_and_heldout
    a = score_quality(model, held_pos).orderBy("doc_id").collect()
    b = score_quality(model, held_pos).orderBy("doc_id").collect()
    assert [(r.doc_id, r.quality_prob) for r in a] == [
        (r.doc_id, r.quality_prob) for r in b
    ]
    assert all(0.0 <= r.quality_prob <= 1.0 for r in a)
    # schema: input columns survive, internals dropped
    assert set(a[0].asDict()) == {"doc_id", "text", "quality_prob"}
    # reserved-name collision refuses instead of clobbering
    with pytest.raises(ValueError, match="collide"):
        score_quality(model, held_pos.withColumn("prediction", F.lit(1)))


def test_pareto_filter_rates_and_determinism(spark):
    n = 20_000
    base = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(0.0).alias("quality_prob")
    )
    lo = pareto_filter(base).count()
    hi = pareto_filter(
        base.withColumn("quality_prob", F.lit(1.0))
    ).count()
    mid = pareto_filter(
        base.withColumn("quality_prob", F.lit(0.5))
    ).count()
    # score 0 keeps ~2^-9 of docs; score 1 keeps ~all; monotone between
    assert lo < 0.01 * n, lo
    assert hi > 0.95 * n, hi
    assert lo < mid < hi
    # deterministic: same seed -> same rows; different seed -> different set
    s = base.withColumn("quality_prob", F.lit(0.5))
    a = sorted(r.doc_id for r in pareto_filter(s, seed=7).collect())
    b = sorted(r.doc_id for r in pareto_filter(s, seed=7).collect())
    c = sorted(r.doc_id for r in pareto_filter(s, seed=8).collect())
    assert a == b and a != c
    with pytest.raises(ValueError):
        pareto_filter(s, alpha=0)


def test_curate_quality_stage(spark, model_and_heldout):
    """curate(quality=...) adds reason 5 exactly where the Pareto rule
    rejects, and changes nothing else vs the quality-free verdict."""
    from katta_spark.quality_model import pareto_keep_expr
    from katta_spark.textops import curate

    model, held_pos, held_neg = model_and_heldout
    docs = held_pos.unionByName(held_neg)
    scored = score_quality(model, docs).select("doc_id", "quality_prob")
    base = {r.doc_id: (r.keep, r.reason)
            for r in curate(docs, min_tokens=2).collect()}
    got = {r.doc_id: (r.keep, r.reason)
           for r in curate(docs, min_tokens=2, quality=scored).collect()}
    rejected = {
        r.doc_id
        for r in scored.where(~pareto_keep_expr()).collect()
    }
    assert rejected  # junk held-out docs score ~0 -> some rejections
    for d, (keep, reason) in got.items():
        if base[d][1] != 0:  # earlier rules win unchanged
            assert (keep, reason) == base[d]
        elif d in rejected:
            assert (keep, reason) == (False, 5)
        else:
            assert (keep, reason) == (True, 0)


def test_score_and_filter_add_no_exchange(spark, model_and_heldout):
    model, held_pos, _ = model_and_heldout
    out = pareto_filter(score_quality(model, held_pos))
    plan = physical_plan(out)
    assert "Exchange" not in plan, plan
