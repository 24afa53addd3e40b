"""Fixture invariants: determinism, prefix extension, schema, skew shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from katta_spark.schema import TRANSCRIPTS_SCHEMA
from katta_spark.synth import HOT_TERMS, synth_transcripts
from katta_spark.tokenizer import tokenize_col


def test_schema(tiny_transcripts):
    assert [f.name for f in tiny_transcripts.schema.fields] == [
        f.name for f in TRANSCRIPTS_SCHEMA.fields
    ]
    assert dict(tiny_transcripts.dtypes)["turn_idx"] == "int"
    assert dict(tiny_transcripts.dtypes)["ts"] == "timestamp"


def test_deterministic_and_prefix_extending(spark, tiny_transcripts):
    again = synth_transcripts(spark, n_turns=2000, seed=42)
    assert again.exceptAll(tiny_transcripts).count() == 0
    assert tiny_transcripts.exceptAll(again).count() == 0
    # a larger generation prefix-extends: same (conv_id, turn_idx) → same text
    bigger = synth_transcripts(spark, n_turns=3000, seed=42)
    joined = tiny_transcripts.alias("a").join(
        bigger.alias("b"), ["conv_id", "turn_idx"]
    )
    assert joined.count() == 2000
    assert joined.where(F.col("a.text") != F.col("b.text")).count() == 0


def test_primary_key_and_ordering(tiny_transcripts):
    assert (
        tiny_transcripts.groupBy("conv_id", "turn_idx").count().where("count > 1").count()
        == 0
    )
    # ts monotone within conversation
    bad = (
        tiny_transcripts.alias("a")
        .join(tiny_transcripts.alias("b"), "conv_id")
        .where(
            (F.col("a.turn_idx") < F.col("b.turn_idx"))
            & (F.col("a.ts") >= F.col("b.ts"))
        )
    )
    assert bad.count() == 0


def test_skew_shape(tiny_transcripts):
    """Hot terms land in a sizable fraction of turns; tail terms are rare."""
    toks = tiny_transcripts.select(
        "conv_id", "turn_idx", F.explode(tokenize_col(F.col("text"))).alias("term")
    ).distinct()
    n = tiny_transcripts.count()
    df_by_term = dict(
        toks.groupBy("term").count().where(
            F.col("term").isin(list(HOT_TERMS))
        ).collect()
    )
    hot_df = df_by_term.get(HOT_TERMS[0], 0) / n
    assert 0.25 <= hot_df <= 0.85, f"hotalpha df ratio {hot_df}"
    # long tail exists: some terms with df <= 5
    rare = toks.groupBy("term").count().where("count <= 5").count()
    assert rare > 50
    # empty texts exist (zero-length doc edge, KATTA-203 analog)
    assert tiny_transcripts.where(F.col("text") == "").count() > 0
