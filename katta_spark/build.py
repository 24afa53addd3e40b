"""Index build job — Katta's offline Hadoop IndexerJob re-created as one
resumable Spark application (reference: IndexerJob.java:51-181 builds one
Lucene index per input split; AbstractIndexOperation + DefaultDistributionPolicy
assign shards to nodes, master/DefaultDistributionPolicy.java:47-123).

Spark-first shape (SURVEY.md §3.3):

    transcripts ──docIDs──▶ tokenize (JVM) ──explode──▶ tf agg (shuffle 1)
        ├──▶ global stats (df, cf, N, avgdl)  ──▶ stats/corpus tables
        └──▶ salted partial postings (shuffle 2, applyInPandas encode)
                 └──▶ per-(shard,term) merge (shuffle 3, bounded by salt)
                          └──▶ postings table partitioned by shard_id

Scale notes (designed for ~100 TB / 1000 executors, tested on local[32]):
- shard_id = pmod(xxhash64(conv_id, turn_idx), num_shards): uniform by
  construction — replaces Katta's capacity-sorted round-robin placement.
  Size num_shards so one shard ≈ 5-15 GB of postings.
- HOT-TERM SKEW is the one real skew risk (a term in 50% of turns). The
  partial stage salts the groupBy key with pmod(doc_id, salt), bounding any
  single group to df/salt postings; the merge stage then sees at most
  ``salt`` pre-encoded segments per (shard, term) instead of raw postings —
  a two-level aggregation exactly like Catalyst's partial/final hash agg,
  but for variable-length arrays.
- Everything before the encode kernels is built-in Spark (codegen'd);
  Python appears only in the two applyInPandas encode/merge kernels, both
  Arrow-batched and numpy-vectorized.
- RESUMABILITY (replaces ZK queues + OperationWatchdog, SURVEY.md §2.10 B6):
  shards are processed in batches; each batch commits its postings
  partitions via dynamic partition overwrite (idempotent) and then appends
  a lineage row. A restarted build skips batches whose lineage row is
  status=committed.
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from katta_spark import scoring
from katta_spark.codec import block_maxima, decode_posting_list, encode_posting_list
from katta_spark.oracle import with_doc_ids
from katta_spark.tokenizer import tokenize_col

PARTIAL_SCHEMA = (
    "shard_id int, term string, salt int, df long, "
    "doc_ids binary, tfs binary, doclens binary"
)
POSTINGS_OUT_SCHEMA = (
    "shard_id int, term string, df long, doc_ids binary, tfs binary, "
    "doclens binary, skips binary, max_impact float, block_max_impact binary"
)


def _paths(index_dir: str) -> dict[str, str]:
    return {
        "corpus": os.path.join(index_dir, "corpus.parquet"),
        "stats": os.path.join(index_dir, "stats.parquet"),
        "postings": os.path.join(index_dir, "postings.parquet"),
        "lineage": os.path.join(index_dir, "lineage.parquet"),
        "shards": os.path.join(index_dir, "shards.parquet"),
    }


def _encode_partial(pdf: pd.DataFrame) -> pd.DataFrame:
    """Stage-A kernel: one (shard, term, salt) group → one encoded segment.

    Sorts by doc_id and emits raw (non-blocked) varbyte buffers; the merge
    stage re-blocks. Runs as applyInPandas — Arrow in, Arrow out.
    """
    shard_id = int(pdf["shard_id"].iloc[0])
    term = pdf["term"].iloc[0]
    salt = int(pdf["salt"].iloc[0])
    doc_ids = pdf["doc_id"].to_numpy(np.int64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    tfs = pdf["tf"].to_numpy(np.int64)[order]
    dls = pdf["doclen"].to_numpy(np.int64)[order]
    d, t, l, _ = encode_posting_list(doc_ids, tfs, dls, block=1 << 30)
    return pd.DataFrame(
        {
            "shard_id": [shard_id],
            "term": [term],
            "salt": [salt],
            "df": [int(doc_ids.size)],
            "doc_ids": [d],
            "tfs": [t],
            "doclens": [l],
        }
    )


def _make_merge_kernel(n_docs: int, avgdl: float, block: int):
    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        """Stage-B kernel: ≤salt segments of one (shard, term) → final row
        with skips + block-max impacts (global stats baked in at build time,
        mirroring Katta's principle that stats are corpus-global)."""
        shard_id = int(pdf["shard_id"].iloc[0])
        term = pdf["term"].iloc[0]
        parts = [
            decode_posting_list(r.doc_ids, r.tfs, r.doclens)
            for r in pdf.itertuples(index=False)
        ]
        doc_ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        dls = np.concatenate([p[2] for p in parts])
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
        df_ = int(doc_ids.size)
        d, t, l, s = encode_posting_list(doc_ids, tfs, dls, block=block)
        max_tf, min_dl = block_maxima(tfs, dls, block=block)
        idf = scoring.idf_np(np.array([df_]), float(n_docs))[0]
        bmi = (
            idf * scoring.tf_norm_np(max_tf, min_dl, avgdl)
        ).astype(np.float32)
        return pd.DataFrame(
            {
                "shard_id": [shard_id],
                "term": [term],
                "df": [df_],
                "doc_ids": [d],
                "tfs": [t],
                "doclens": [l],
                "skips": [s],
                "max_impact": [np.float32(bmi.max()) if bmi.size else np.float32(0)],
                "block_max_impact": [bmi.tobytes()],
            }
        )

    return _merge


def term_frequencies(docs_with_ids: DataFrame) -> DataFrame:
    """(shard_id, doc_id, doclen, term, tf) — all JVM-side until here."""
    toks = docs_with_ids.select(
        "shard_id",
        "doc_id",
        tokenize_col(F.col("text")).alias("tokens"),
    ).withColumn("doclen", F.size("tokens"))
    return (
        toks.select("shard_id", "doc_id", "doclen", F.explode("tokens").alias("term"))
        .groupBy("shard_id", "doc_id", "doclen", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    num_shards: int = 8,
    salt: int = 16,
    block: int = 128,
    shards_per_batch: int | None = None,
    run_id: str | None = None,
    id_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    text_col: str = "text",
    doc_id_col: str | None = None,
) -> dict:
    """Build the full index (postings + stats + corpus + lineage).

    Resumable: re-running with the same index_dir skips committed batches.
    Returns a summary dict (n_docs, avgdl, terms, committed/skipped batches).

    ``doc_id_col``: if the input already has a unique int64 id (e.g. the
    documents table), use it instead of xxhash64(conv_id, turn_idx).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    p = _paths(index_dir)

    if doc_id_col is None:
        docs = with_doc_ids(
            transcripts.select(*id_cols, text_col), num_shards
        ).select("doc_id", "shard_id", F.col(text_col).alias("text"))
    else:
        docs = transcripts.select(
            F.col(doc_id_col).cast("long").alias("doc_id"),
            F.pmod(F.xxhash64(F.col(doc_id_col)), F.lit(num_shards))
            .cast("int")
            .alias("shard_id"),
            F.col(text_col).alias("text"),
        )

    tf = term_frequencies(docs).cache()

    # ---- Phase 1: global statistics (Katta's getDocFreqs phase, done once
    # at build time because the index is immutable — LuceneClient.java:264).
    stats_done = os.path.exists(os.path.join(p["stats"], "_SUCCESS"))
    if not stats_done:
        stats = tf.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        )
        stats.write.mode("overwrite").parquet(p["stats"])
        doclens = tf.groupBy("shard_id", "doc_id").agg(F.first("doclen").alias("dl"))
        corpus_row = doclens.agg(
            F.count(F.lit(1)).alias("n_nonempty"), F.avg("dl").alias("avgdl")
        ).collect()[0]
        n_docs = docs.count()
        avgdl = float(corpus_row["avgdl"] or 1.0)
        spark.createDataFrame(
            [(n_docs, avgdl, num_shards)], "n_docs long, avgdl double, n_shards int"
        ).write.mode("overwrite").parquet(p["corpus"])
        # Per-shard stats: enable shard-subset search with subset-global df
        # (Katta gathers df from exactly the shards being searched —
        # LuceneClient.java:264-286 runs phase 1 over the query's indices).
        per_shard = docs.groupBy("shard_id").agg(F.count(F.lit(1)).alias("n_docs"))
        per_shard_dl = doclens.groupBy("shard_id").agg(
            F.count(F.lit(1)).alias("n_nonempty"), F.sum("dl").alias("sum_dl")
        )
        per_shard.join(per_shard_dl, "shard_id", "left").fillna(0).write.mode(
            "overwrite"
        ).parquet(p["shards"])
    else:
        row = spark.read.parquet(p["corpus"]).collect()[0]
        n_docs, avgdl = int(row["n_docs"]), float(row["avgdl"])
        assert int(row["n_shards"]) == num_shards, "num_shards mismatch on resume"

    # ---- Phase 2: postings, in resumable shard batches.
    committed: set[int] = set()
    if os.path.exists(p["lineage"]):
        for r in spark.read.parquet(p["lineage"]).where(
            F.col("status") == "committed"
        ).collect():
            committed.add(int(r["batch_id"]))

    if shards_per_batch is None:
        shards_per_batch = num_shards
    batches = [
        (bi, list(range(lo, min(lo + shards_per_batch, num_shards))))
        for bi, lo in enumerate(range(0, num_shards, shards_per_batch))
    ]

    merge_kernel = _make_merge_kernel(n_docs, avgdl, block)
    n_committed = n_skipped = 0
    for batch_id, shard_ids in batches:
        if batch_id in committed:
            n_skipped += 1
            continue
        t0 = time.time()
        batch_tf = tf.where(F.col("shard_id").isin(shard_ids))
        partial = (
            batch_tf.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(salt)).cast("int"))
            .groupBy("shard_id", "term", "salt")
            .applyInPandas(_encode_partial, PARTIAL_SCHEMA)
        )
        postings = partial.groupBy("shard_id", "term").applyInPandas(
            merge_kernel, POSTINGS_OUT_SCHEMA
        )
        # Cluster rows by term within files so a query's term predicate can
        # skip row groups via parquet min/max stats.
        (
            postings.repartition("shard_id")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("shard_id")
            .parquet(p["postings"])
        )
        # Lineage row AFTER the data commit — crash between the two replays
        # the batch idempotently (dynamic partition overwrite).
        summary = spark.read.parquet(p["postings"]).where(
            F.col("shard_id").isin(shard_ids)
        ).agg(
            F.count(F.lit(1)).alias("terms"),
            F.sum("df").alias("postings"),
            F.sum(F.length("doc_ids") + F.length("tfs") + F.length("doclens")).alias(
                "bytes"
            ),
        ).collect()[0]
        lineage_row = spark.createDataFrame(
            [
                (
                    run_id,
                    batch_id,
                    shard_ids,
                    "committed",
                    int(summary["terms"] or 0),
                    int(summary["postings"] or 0),
                    int(summary["bytes"] or 0),
                    int((time.time() - t0) * 1000),
                )
            ],
            "run_id string, batch_id int, shard_ids array<int>, status string, "
            "terms long, postings long, bytes long, elapsed_ms long",
        )
        lineage_row.write.mode("append").parquet(p["lineage"])
        n_committed += 1

    tf.unpersist()
    return {
        "run_id": run_id,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "num_shards": num_shards,
        "batches_committed": n_committed,
        "batches_skipped": n_skipped,
    }
