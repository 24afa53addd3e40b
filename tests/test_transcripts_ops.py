"""Conversation assembly + stats + sessionization.

assemble_conversations is where the north rule's per-turn text-equality
invariant becomes user-visible: the assembled document must reproduce
every turn's text byte-exactly in (conv_id, turn_idx) order under ANY
input partitioning/arrival order. sessionize is the gap-based session
primitive (also gated against a DuckDB window-function oracle via the
windowed_events tagged union).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from katta_spark.textops import sessionize
from katta_spark.transcripts import assemble_conversations, conversation_stats


def test_assemble_reproduces_every_turn(spark, tiny_transcripts):
    """Per-turn text equality: splitting the assembled doc on the
    separator yields exactly the original turn texts in turn_idx order."""
    out = {
        r.conv_id: (r.n_turns, r.text)
        for r in assemble_conversations(
            tiny_transcripts, role_prefix=False
        ).collect()
    }
    src = {}
    for r in tiny_transcripts.collect():
        src.setdefault(r.conv_id, []).append((r.turn_idx, r.text))
    assert set(out) == set(src)
    for cid, turns in src.items():
        texts = [t for _, t in sorted(turns)]
        n, doc = out[cid]
        assert n == len(texts)
        assert doc.split("\n") == texts, cid


def test_assemble_stable_under_input_order(spark, tiny_transcripts):
    """Pure function of conversation content: shuffled + repartitioned
    input assembles byte-identically."""
    a = sorted(
        (r.conv_id, r.text)
        for r in assemble_conversations(tiny_transcripts).collect()
    )
    scrambled = tiny_transcripts.orderBy(F.xxhash64("text", "turn_idx")).repartition(17)
    b = sorted(
        (r.conv_id, r.text) for r in assemble_conversations(scrambled).collect()
    )
    assert a == b


def test_assemble_role_prefix(spark):
    rows = [
        ("c1", 1, "assistant", "hi there", "-", dt.datetime(2024, 1, 1, 0, 0, 30)),
        ("c1", 0, "user", "hello", "-", dt.datetime(2024, 1, 1)),
        ("c1", 2, "user", "", "-", dt.datetime(2024, 1, 1, 0, 1)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = assemble_conversations(df).collect()[0]
    assert got.n_turns == 3
    assert got.text == "user: hello\nassistant: hi there\nuser: "


def test_conversation_windows_hand_checked(spark):
    from katta_spark.transcripts import conversation_windows

    rows = [
        ("c1", i, "user", f"t{i}", "-", dt.datetime(2024, 1, 1, 0, i))
        for i in range(5)
    ] + [("c2", 0, "user", "solo", "-", dt.datetime(2024, 1, 1))]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {
        (r.conv_id, r.window_idx): (r.start_turn, r.n_turns, r.text)
        for r in conversation_windows(
            df, window_turns=3, stride=2, role_prefix=False
        ).collect()
    }
    # c1 (5 turns): starts 0,2,4 -> windows [0,1,2], [2,3,4], [4]
    assert got[("c1", 0)] == (0, 3, "t0\nt1\nt2")
    assert got[("c1", 1)] == (2, 3, "t2\nt3\nt4")
    assert got[("c1", 2)] == (4, 1, "t4")
    assert got[("c2", 0)] == (0, 1, "solo")
    assert len(got) == 4

    # drop_partial removes the short tail but keeps short conversations
    kept = {
        (r.conv_id, r.window_idx)
        for r in conversation_windows(
            df, window_turns=3, stride=2, drop_partial=True
        ).collect()
    }
    assert kept == {("c1", 0), ("c1", 1), ("c2", 0)}


def test_conversation_windows_cover_every_turn(spark, tiny_transcripts):
    """With stride <= window_turns every turn appears in >= 1 window
    (reconstructed by position), and window starts advance by stride."""
    from katta_spark.transcripts import conversation_windows

    w = conversation_windows(
        tiny_transcripts, window_turns=8, stride=8, role_prefix=False
    )
    covered = w.select(
        "conv_id",
        F.explode(
            F.sequence(
                F.col("start_turn"),
                F.col("start_turn") + F.col("n_turns") - 1,
            )
        ).alias("pos"),
    ).distinct()
    n_turns_per_conv = tiny_transcripts.groupBy("conv_id").count()
    got = {
        r.conv_id: r.n for r in covered.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    want = {r.conv_id: r["count"] for r in n_turns_per_conv.collect()}
    assert got == want


def test_conversation_stats_hand_checked(spark):
    rows = [
        ("c1", 0, "user", "abc", "-", dt.datetime(2024, 1, 1, 10, 0, 0)),
        ("c1", 1, "assistant", "defgh", "bash", dt.datetime(2024, 1, 1, 10, 2, 0)),
        ("c1", 2, "assistant", "x", "search", dt.datetime(2024, 1, 1, 10, 5, 0)),
        ("c2", 0, "system", "", None, dt.datetime(2024, 2, 1)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {r.conv_id: r for r in conversation_stats(df).collect()}
    c1 = got["c1"]
    assert (c1.n_turns, c1.n_roles, c1.n_tool_calls, c1.n_chars) == (3, 2, 2, 9)
    assert c1.started_at == dt.datetime(2024, 1, 1, 10, 0, 0)
    assert c1.duration_sec == 300
    c2 = got["c2"]
    assert (c2.n_turns, c2.n_roles, c2.n_tool_calls, c2.n_chars) == (1, 1, 0, 0)
    assert c2.duration_sec == 0


def test_sessionize_hand_checked(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, 100, t0),             # u100 s1
        (2, 100, t0 + 10 * m),    # u100 s1 (gap 10m)
        (3, 100, t0 + 41 * m),    # u100 s2 (gap 31m > 30m)
        (4, 100, t0 + 71 * m),    # u100 s2 (gap exactly 30m -> SAME session)
        (5, 200, t0),             # u200 s1
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r.event_id: (r.user_id, r.session_id, r.session_start)
        for r in sessionize(df, gap="30 minutes").collect()
    }
    assert got[1] == (100, 1, t0)
    assert got[2] == (100, 1, t0)
    assert got[3] == (100, 2, t0 + 41 * m)
    assert got[4] == (100, 2, t0 + 41 * m)
    assert got[5] == (200, 1, t0)


def test_sessionize_tie_and_keep_cols(spark):
    """Equal timestamps order by event_id (deterministic), and keep_cols
    ride through for session-level aggregation without a join."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [(2, 1, t0, 20.0), (1, 1, t0, 10.0)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = sessionize(df, keep_cols=("value",)).collect()
    got = {r.event_id: (r.session_id, r.value) for r in out}
    assert got == {1: (1, 10.0), 2: (1, 20.0)}


def test_sessionize_scales_one_window_exchange(spark, sf_dir):
    """Plan shape: both window passes share one partitioning — a single
    user_id exchange, no extra shuffle for the running sum."""
    import os

    from katta_spark.plans import physical_plan

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    plan = physical_plan(sessionize(ev), mode="simple")
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan  # lag+cumsum share one; session_start one
