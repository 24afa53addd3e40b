"""Streaming-incremental index maintenance.

The reference has NO dataflow streaming (SURVEY.md §2.9) — its online side
is serving, and index updates mean deploying a new index version next to
the old ones (IndexDeployOperation). The Spark-native translation:
Structured Streaming ingests arriving transcript files and each micro-batch
builds an immutable DELTA index (foreachBatch → build_index); queries span
[base + deltas] via search_multi with cross-index stats, which keeps
ranking identical to a monolithic rebuild (tests/test_multi_index.py).

This is exactly Katta's update story — "an index is immutable; add a new
one" — expressed as a stream job.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from katta_spark.build import build_index
from katta_spark.schema import TRANSCRIPTS_SCHEMA


def delta_index_dirs(index_root: str) -> list[str]:
    """All delta indexes under ``index_root`` (sorted by batch id)."""
    if not os.path.isdir(index_root):
        return []
    out = []
    for name in sorted(os.listdir(index_root)):
        d = os.path.join(index_root, name)
        if name.startswith("delta_") and os.path.isdir(d):
            out.append(d)
    return out


def stream_build(
    spark: SparkSession,
    input_dir: str,
    index_root: str,
    num_shards: int = 4,
    available_now: bool = True,
    checkpoint_dir: str | None = None,
    merge_policy: dict | None = None,
):
    """Incrementally index transcript parquet files as they arrive.

    Each micro-batch becomes one immutable delta index
    (``index_root/delta_<epoch>``). ``available_now=True`` drains what is
    currently available and stops (the testable batch-drain mode); a
    production stream would run continuously with the same code.

    The streaming checkpoint makes ingestion exactly-once per file, and
    each delta build is itself resumable (lineage) — end-to-end at-least-
    once build with idempotent commits.

    ``merge_policy`` (a kwargs dict for
    :func:`katta_spark.merge_policy.auto_compact`, e.g. ``{}`` for the
    defaults) runs the tiered merge policy after the drain, bounding the
    live segment count as ingestion continues — Lucene's
    background-merge-after-flush loop. Only valid with
    ``available_now=True`` (a continuous stream would schedule
    ``auto_compact`` out-of-band; merging inside foreachBatch would
    stall the trigger)."""
    os.makedirs(index_root, exist_ok=True)
    checkpoint_dir = checkpoint_dir or os.path.join(index_root, "_checkpoint")

    def handle_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        build_index(
            batch_df.sparkSession,
            batch_df,
            os.path.join(index_root, f"delta_{batch_id:08d}"),
            num_shards=num_shards,
        )

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .parquet(input_dir)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if merge_policy is not None and not available_now:
        raise ValueError(
            "merge_policy requires available_now=True — schedule "
            "auto_compact out-of-band for a continuous stream"
        )
    if available_now:
        q = stream.trigger(availableNow=True).start()
        q.awaitTermination()
        if merge_policy is not None:
            from katta_spark.merge_policy import auto_compact

            auto_compact(spark, index_root, **merge_policy)
        return q
    return stream.start()


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str | None = None,
    id_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    text_col: str = "text",
):
    """Streaming EXACT dedup — the custom stateful operator a training-data
    ingest pipeline runs in front of everything else: only the FIRST
    occurrence of each distinct text ever survives, across all
    micro-batches, forever.

    Implemented with applyInPandasWithState keyed by md5(text): the state
    per key is one boolean ("seen"); a batch's rows for an unseen key emit
    exactly one row (the minimum doc key — deterministic within-batch
    tie-break) and flip the state. State is Spark-managed (checkpointed,
    recoverable); at scale it shards by the hash key across executors —
    nothing global, nothing driver-side.

    Output: parquet rows (text_md5, conv_id, turn_idx, text) of first
    occurrences. Drains what is currently available, then stops
    (availableNow — production would run continuously).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    os.makedirs(output_dir, exist_ok=True)
    checkpoint_dir = checkpoint_dir or os.path.join(output_dir, "_checkpoint")
    c1, c2 = id_cols

    def dedup_fn(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.exists:
            return  # key already emitted in an earlier batch
        best = None
        for pdf in pdfs:
            pdf = pdf.sort_values([c1, c2]).head(1)
            if best is None or (
                (pdf[c1].iloc[0], pdf[c2].iloc[0])
                < (best[c1].iloc[0], best[c2].iloc[0])
            ):
                best = pdf
        state.update((True,))
        if best is not None:
            yield best[["text_md5", c1, c2, text_col]]

    src = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .parquet(input_dir)
        .withColumn("text_md5", F.md5(F.col(text_col)))
        .select("text_md5", c1, c2, text_col)
    )
    out = src.groupBy("text_md5").applyInPandasWithState(
        dedup_fn,
        outputStructType=f"text_md5 string, {c1} string, {c2} int, "
        f"{text_col} string",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Tumbling-window event aggregation under Structured Streaming.

    The SAME windowed expression as the batch operator
    (textops.windowed_event_counts) over readStream, plus a watermark:
    events later than ``watermark`` behind the max seen event time are
    dropped by state eviction; everything else lands in its event-time
    bucket regardless of arrival order. Append output mode — a window's
    row is emitted exactly once, when the watermark passes its end.
    """
    from pyspark.sql import functions as F

    from katta_spark.textops import windowed_event_counts

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    events = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    agg = windowed_event_counts(events, window_len)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return None
    return writer.start()


def stream_session_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Session-window aggregation under Structured Streaming — the
    streaming twin of the batch sessionizer (textops.sessionize →
    session-level groupBy): F.session_window(ts, gap) merges a user's
    events whose inter-event gap stays under ``gap`` into one
    Spark-managed session; the watermark closes a session (and emits its
    single append-mode row) once event time moves ``watermark`` past its
    end, and later-than-watermark stragglers are dropped by state
    eviction.

    Boundary semantics: session_window treats a gap EXACTLY equal to
    ``gap`` as a new session (an event joins while ts < last_ts + gap),
    while the batch sessionize keeps it (new only when ts > prev + gap)
    — they agree on every strict inequality, i.e. everywhere except the
    measure-zero exact-boundary tie.

    Output rows: (session_start, session_end, user_id, n_events,
    sum_value).
    """
    from pyspark.sql import functions as F

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    events = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    agg = (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return None
    return writer.start()
