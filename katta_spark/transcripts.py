"""Conversation-level operators over the transcripts table.

The engine's input is the BASELINE.json transcripts shape — (conv_id,
turn_idx, role, text, tool, ts), one row per turn — but a training-data
pipeline consumes CONVERSATIONS: assembled multi-turn documents with
stable turn ordering. These operators are that assembly layer, and they
are where the north rule's per-turn invariant is load-bearing: the
assembled text must reproduce every turn's text EXACTLY, in (conv_id,
turn_idx) order, under any input partitioning or arrival order.

Scale shape: each operator is ONE shuffle keyed by conv_id; per-group
state is bounded by a single conversation's turns (input_hint's
turns_per_conv, not corpus size), so a 10^12-turn corpus parallelizes by
its ~10^10-11 conversations. collect_list order is nondeterministic under
shuffle — array_sort over (turn_idx, ...) structs restores the stable
order inside the row, no window or secondary sort needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TURN_SEP = "\n"


def assemble_conversations(
    transcripts: DataFrame,
    role_prefix: bool = True,
    sep: str = TURN_SEP,
) -> DataFrame:
    """(conv_id, n_turns, text): one training document per conversation —
    turns joined in turn_idx order, each rendered ``role: text`` (or the
    bare text with role_prefix=False).

    Turn ordering is restored in-row: array_sort over (turn_idx, role,
    text) structs sorts by turn_idx first (unique within a conversation,
    so the tail fields never tie-break), making the output a pure function
    of the conversation's CONTENT — input order, partitioning, and task
    scheduling cannot change a byte. That is the per-turn text-equality
    invariant the build relies on (build._docs_with_ids), surfaced as a
    user-facing operator.
    """
    turn = F.struct(
        F.col("turn_idx"), F.col("role"), F.col("text")
    )
    rendered = (
        (lambda t: F.concat(t["role"], F.lit(": "), t["text"]))
        if role_prefix
        else (lambda t: t["text"])
    )
    return (
        transcripts.groupBy("conv_id")
        .agg(F.array_sort(F.collect_list(turn)).alias("turns"))
        .select(
            "conv_id",
            F.size("turns").alias("n_turns"),
            F.array_join(F.transform("turns", rendered), sep).alias("text"),
        )
    )


def conversation_windows(
    transcripts: DataFrame,
    window_turns: int = 8,
    stride: int = 4,
    role_prefix: bool = True,
    sep: str = TURN_SEP,
    drop_partial: bool = False,
) -> DataFrame:
    """(conv_id, window_idx, start_turn, n_turns, text): sliding context
    windows over each conversation — the training-sample cutter for
    long multi-turn data (window_turns per sample, advancing by stride).

    Window w covers the turns at sorted positions [w*stride,
    w*stride + window_turns); with drop_partial=True trailing windows
    shorter than window_turns are dropped (except a conversation shorter
    than one window, which keeps its single full-coverage window — every
    conversation yields at least one sample).

    Entirely in-row after the one conv_id shuffle: array_sort restores
    turn order, sequence() enumerates starts, slice() cuts each window —
    no second explode-shuffle, no Python. start_turn is the POSITION in
    the sorted turn order (0-based), robust to non-contiguous turn_idx.
    """
    if window_turns < 1 or stride < 1:
        raise ValueError("window_turns and stride must be >= 1")
    turn = F.struct(F.col("turn_idx"), F.col("role"), F.col("text"))
    rendered = (
        (lambda t: F.concat(t["role"], F.lit(": "), t["text"]))
        if role_prefix
        else (lambda t: t["text"])
    )
    grouped = transcripts.groupBy("conv_id").agg(
        F.array_sort(F.collect_list(turn)).alias("turns")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("turns") - 1, F.lit(0)), F.lit(stride)
    )
    out = grouped.select(
        "conv_id",
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.struct(
                    s.alias("start_turn"),
                    F.slice("turns", s + 1, window_turns).alias("w"),
                ),
            )
        ).alias("window_idx", "win"),
    ).select(
        "conv_id",
        "window_idx",
        F.col("win.start_turn").alias("start_turn"),
        F.size("win.w").alias("n_turns"),
        F.array_join(F.transform("win.w", rendered), sep).alias("text"),
    )
    if drop_partial:
        out = out.where(
            (F.col("n_turns") == window_turns) | (F.col("window_idx") == 0)
        )
    return out


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """(conv_id, n_turns, n_roles, n_tool_calls, n_chars, started_at,
    duration_sec): per-conversation profile — the grouping pass a curation
    pipeline runs before length/balance cuts on multi-turn data.

    n_tool_calls counts turns whose ``tool`` is a real tool (non-null,
    not the '-' placeholder the synthetic corpus uses for none).
    All plain hash aggregates — one shuffle, map-side partials."""
    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("role").alias("n_roles"),
        F.sum(
            (F.col("tool").isNotNull() & (F.col("tool") != "-")).cast("int")
        ).alias("n_tool_calls"),
        F.sum(F.length("text")).alias("n_chars"),
        F.min("ts").alias("started_at"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("duration_sec"),
    )
