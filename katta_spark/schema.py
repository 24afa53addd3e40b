"""Fixed declared schemas for every table the engine touches.

The reference is dynamically typed (documents carry arbitrary fields, sort
types detected at runtime — LuceneServer.java:513-516); we invert that:
columnar storage with declared schemas throughout (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table — exact shape from BASELINE.json input_hint.
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# docmap: doc_id = xxhash64(conv_id, turn_idx) — 64-bit because global doc
# count can exceed int32 (Katta clamps at Integer.MAX_VALUE,
# DocumentFrequencyWritable.java:82-88; we don't have to).
DOCMAP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("shard_id", T.IntegerType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("doclen", T.IntegerType(), False),
    ]
)

# postings: one row per (shard, term); arrays are delta+varbyte encoded
# (codec.py); doc_ids sorted ascending within the row. Blocks store RAW
# maxima (max_tf / min_dl), not baked impacts, so bounds can be assembled
# at query time from whichever stats govern the query (global vs
# shard-subset). This is the explicit version of the Lucene posting lists
# Katta consumes via searcher.docFreq (LuceneServer.java:375-379).
# Matches build.ENCODED_SCHEMA + the term string column.
POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType(), False),
        T.StructField("th", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("doclens", T.BinaryType(), False),
        T.StructField("skips", T.BinaryType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("min_dl", T.IntegerType(), False),
        T.StructField("block_max_tf", T.BinaryType(), False),
        T.StructField("block_min_dl", T.BinaryType(), False),
    ]
)

# Global term statistics — the broadcast side table that makes sharded
# ranking identical to unsharded ranking (Katta's DocumentFrequencyWritable
# two-phase protocol, LuceneClient.java:264-286).
STATS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
    ]
)

# Corpus-level scalars stored as a 1-row table next to stats.
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("avgdl", T.DoubleType(), False),
        T.StructField("n_shards", T.IntegerType(), False),
    ]
)

# Per-partition lineage/metrics rows — the resumability checkpoint that
# replaces Katta's ZK-persistent operation queues + watchdog
# (InteractionProtocol.java:490, OperationWatchdog.java:56-93).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("batch_id", T.IntegerType(), False),
        T.StructField("shard_ids", T.ArrayType(T.IntegerType()), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("terms", T.LongType(), False),
        T.StructField("postings", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("elapsed_ms", T.LongType(), False),
    ]
)

# Query result row — the analog of Katta's Hit (lib/lucene/Hit.java:33-68).
HIT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("shard_id", T.IntegerType(), False),
        T.StructField("score", T.FloatType(), False),
    ]
)
