"""Index build job — Katta's offline Hadoop IndexerJob re-created as one
resumable Spark application (reference: IndexerJob.java:51-181 builds one
Lucene index per input split; AbstractIndexOperation + DefaultDistributionPolicy
assign shards to nodes, master/DefaultDistributionPolicy.java:47-123).

Spark-first shape — exactly ONE corpus-sized shuffle (an A/B against a
Lucene-style two-stage segment-merge pipeline showed the single sorted
shuffle is faster here: the segment stage pays an extra Python pass that
only amortizes at vocabulary sizes far beyond the fixtures):

    phase 1 (scan 1): corpus stats — n_docs, avgdl, per-shard sizes
                      (map-side partial aggs only; tiny shuffle)
    phase 2 (scan 2): tokenize (JVM codegen) → explode →
                      salted repartition by (shard_id, xxhash(term) % salt)
                      → sortWithinPartitions(shard_id, term, doc_id)
                      → ONE mapInPandas run-encoder (Arrow batches, numpy):
                        tf by (term, doc) run-length, posting list per
                        (shard, term) run → range-compacted postings
                        partitioned by shard_id
    phase 3: term stats (df, cf) aggregated FROM the postings rows
             (vocab-sized job, not corpus-sized)

Scale notes (designed for ~100 TB / 1000 executors, tested on local[32]):
- shard_id = pmod(xxhash64(conv_id, turn_idx), num_shards): uniform by
  construction — replaces Katta's capacity-sorted round-robin placement
  (the hash-spread of documents is also the primary hot-term defuser: a
  term's postings split evenly across shards).
- The encode shuffle is keyed by (shard_id, xxhash(term) % salt) — the
  salted repartitioning the north rule names. salt (default 1024) is the
  term-slice granularity, deliberately MUCH larger than the partition
  count: each reduce partition owns many random slices, so hash-collision
  imbalance averages out (keys >> partitions is what makes the layout
  straggler-free; keys == partitions gives a Poisson max bucket of 3-4x
  the mean, measured as a 4x straggler before this design). A
  (shard, term) group still lands wholly in one partition.
- The encoder is ONE Python invocation per Arrow batch (mapInPandas), not
  per group: runs are detected vectorized (pd.factorize — C-speed) and
  carried across batch boundaries; every posting list of a batch is
  encoded in one vectorized numpy pass (codec.encode_posting_lists_batch).
- Postings store per-block raw maxima (max_tf, min_dl), NOT baked impacts:
  bounds are assembled at query time from whichever stats govern the query
  (global or shard-subset), so the index is stats-independent.
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
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from katta_spark.codec import encode_posting_lists_batch
from katta_spark.oracle import with_doc_ids
from katta_spark.tokenizer import tokenize_col

# Bump whenever the on-disk postings layout changes: a resumed build over a
# directory with a different version wipes and rebuilds (the analog of
# Katta refusing to serve a shard whose format it cannot read).
FORMAT_VERSION = 3

# Kernel output: term identified by th = xxhash64(term) only; the term
# string is joined back from the vocab-sized dictionary after encoding so
# the corpus-sized shuffle moves fixed-width ints, never strings.
ENCODED_SCHEMA = (
    "shard_id int, th long, df long, cf long, doc_ids binary, tfs binary, "
    "doclens binary, skips binary, max_tf int, min_dl int, "
    "block_max_tf binary, block_min_dl binary"
)
_COLS = [
    "shard_id", "th", "df", "cf", "doc_ids", "tfs", "doclens", "skips",
    "max_tf", "min_dl", "block_max_tf", "block_min_dl",
]


def _paths(index_dir: str) -> dict[str, str]:
    return {
        "corpus": os.path.join(index_dir, "corpus.parquet"),
        "stats": os.path.join(index_dir, "stats.parquet"),
        "postings": os.path.join(index_dir, "postings.parquet"),
        "lineage": os.path.join(index_dir, "lineage.parquet"),
        "shards": os.path.join(index_dir, "shards.parquet"),
    }


def _encode_body(body: pd.DataFrame, block: int) -> pd.DataFrame:
    """Encode all complete (shard, th) runs of a token-row block.

    Input rows: (shard_id, th, doc_id, doclen), sorted by
    (shard_id, th, doc_id), possibly with repeated (th, doc) rows —
    tf is their run length. All columns are fixed-width ints — run
    detection is pure C-speed numpy; the heavy lifting is one vectorized
    multi-list encode (codec.encode_posting_lists_batch).
    """
    shard = body["shard_id"].to_numpy(np.int64)
    th = body["th"].to_numpy(np.int64)
    doc = body["doc_id"].to_numpy(np.int64)
    dl = body["doclen"].to_numpy(np.int64)
    n = len(body)
    # level 1: (shard, th, doc) runs → tf
    chg_doc = np.empty(n, dtype=bool)
    chg_doc[0] = True
    chg_doc[1:] = (doc[1:] != doc[:-1]) | (th[1:] != th[:-1]) | (
        shard[1:] != shard[:-1]
    )
    s_doc = np.flatnonzero(chg_doc)
    tf = np.diff(np.append(s_doc, n))
    doc_r, dl_r = doc[s_doc], dl[s_doc]
    th_r, shard_r = th[s_doc], shard[s_doc]
    # level 2: (shard, th) runs over the reduced arrays
    m = s_doc.size
    chg_t = np.empty(m, dtype=bool)
    chg_t[0] = True
    chg_t[1:] = (th_r[1:] != th_r[:-1]) | (shard_r[1:] != shard_r[:-1])
    starts = np.flatnonzero(chg_t)
    encoded = encode_posting_lists_batch(doc_r, tf, dl_r, starts, block=block)
    out = pd.DataFrame(encoded, columns=_COLS[2:])
    out.insert(0, "th", th_r[starts])
    out.insert(0, "shard_id", shard_r[starts].astype(np.int32))
    return out


def _make_encode_kernel(block: int):
    """mapInPandas kernel over partitions sorted by (shard_id, th, doc_id).

    Emits one postings row per (shard, term) run; a run spanning Arrow batch
    boundaries is carried and stitched. One Python crossing per batch.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            shard = pdf["shard_id"].to_numpy(np.int64)
            th = pdf["th"].to_numpy(np.int64)
            chg = np.empty(len(pdf), dtype=bool)
            chg[0] = True
            chg[1:] = (shard[1:] != shard[:-1]) | (th[1:] != th[:-1])
            starts = np.flatnonzero(chg)
            # last (shard, term) run may continue into the next batch
            last_start = starts[-1]
            carry = pdf.iloc[last_start:]
            body = pdf.iloc[:last_start]
            if len(body):
                yield _encode_body(body, block)
        if carry is not None and len(carry):
            yield _encode_body(carry, block)

    return kernel


def token_rows(docs_with_ids: DataFrame) -> DataFrame:
    """(shard_id, doc_id, doclen, th) — one fixed-width row per token.

    Tokenize + explode entirely JVM-side (whole-stage codegen); the term
    string is immediately replaced by th = xxhash64(term) so the shuffle,
    sort and Arrow pipe move 24-byte int rows, never strings. The
    (th → term) dictionary travels separately (term_dictionary)."""
    toks = docs_with_ids.select(
        "shard_id",
        "doc_id",
        tokenize_col(F.col("text")).alias("tokens"),
    ).withColumn("doclen", F.size("tokens"))
    return toks.select(
        "shard_id", "doc_id", "doclen", F.explode("tokens").alias("term")
    ).select(
        "shard_id", "doc_id", "doclen", F.xxhash64(F.col("term")).alias("th")
    )


def term_dictionary(docs_with_ids: DataFrame) -> DataFrame:
    """(th, term): the vocab-sized dictionary mapping hash → term string.

    Map-side partial aggregation collapses the explode to distinct terms
    per partition before the (tiny) shuffle. Collision check: a th with
    more than one distinct term would silently merge postings — asserted
    against downstream (probability ~ vocab²/2⁶⁴)."""
    toks = docs_with_ids.select(tokenize_col(F.col("text")).alias("tokens"))
    return (
        toks.select(F.explode("tokens").alias("term"))
        .groupBy(F.xxhash64(F.col("term")).alias("th"))
        .agg(F.min("term").alias("term"), F.countDistinct("term").alias("_n"))
    )


def _docs_with_ids(transcripts, num_shards, id_cols, text_col, doc_id_col):
    if doc_id_col is None:
        return with_doc_ids(
            transcripts.select(*id_cols, text_col), num_shards
        ).select("doc_id", "shard_id", F.col(text_col).alias("text"))
    return transcripts.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        F.pmod(F.xxhash64(F.col(doc_id_col)), F.lit(num_shards))
        .cast("int")
        .alias("shard_id"),
        F.col(text_col).alias("text"),
    )


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    num_shards: int = 8,
    salt: int = 1024,
    block: int = 128,
    shards_per_batch: int | None = None,
    encode_partitions: int | None = None,
    run_id: str | None = None,
    id_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    text_col: str = "text",
    doc_id_col: str | None = None,
) -> dict:
    """Build the full index (postings + stats + corpus + shards + lineage).

    Resumable: re-running with the same index_dir skips committed batches.
    Returns a summary dict (n_docs, avgdl, committed/skipped batches).

    ``salt``: term-slice granularity of the salted encode shuffle (slices
    per shard; keep >> encode_partitions for straggler-free balance).
    ``encode_partitions``: reduce-side parallelism of the encode shuffle
    (default: spark.sql.shuffle.partitions).
    ``doc_id_col``: if the input already has a unique int64 id (e.g. the
    documents table), use it instead of xxhash64(conv_id, turn_idx).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    p = _paths(index_dir)
    phase_t: dict[str, float] = {}
    t_start = time.time()
    docs = _docs_with_ids(transcripts, num_shards, id_cols, text_col, doc_id_col)

    # Format check: an existing index of a different on-disk version cannot
    # be resumed — wipe and rebuild from scratch.
    version_file = os.path.join(index_dir, "FORMAT_VERSION")
    if os.path.exists(index_dir) and os.listdir(index_dir):
        stored = None
        if os.path.exists(version_file):
            with open(version_file) as fh:
                stored = fh.read().strip()
        if stored != str(FORMAT_VERSION):
            # Only wipe a directory that demonstrably IS an index of another
            # format — a mistyped path pointing at unknown content must
            # raise, never be recursively deleted.
            looks_like_index = stored is not None or any(
                os.path.exists(p[t]) for t in ("postings", "corpus", "stats")
            )
            if not looks_like_index:
                raise ValueError(
                    f"{index_dir!r} is non-empty but does not look like a "
                    "katta_spark index (no FORMAT_VERSION / postings / "
                    "corpus); refusing to delete it. Pass an empty or "
                    "index-shaped directory."
                )
            import shutil

            shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    with open(version_file, "w") as fh:
        fh.write(str(FORMAT_VERSION))

    # ---- Phase 1: corpus + per-shard stats (one scan, partial aggs only).
    corpus_done = os.path.exists(os.path.join(p["corpus"], "_SUCCESS"))
    if not corpus_done:
        per_shard = (
            docs.select("shard_id", tokenize_col(F.col("text")).alias("t"))
            .select("shard_id", F.size("t").alias("dl"))
            .groupBy("shard_id")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("n_nonempty"),
                F.sum("dl").alias("sum_dl"),
            )
        )
        per_shard.write.mode("overwrite").parquet(p["shards"])
        tot = spark.read.parquet(p["shards"]).agg(
            F.sum("n_docs").alias("n"),
            F.sum("n_nonempty").alias("ne"),
            F.sum("sum_dl").alias("sdl"),
        ).collect()[0]
        n_docs = int(tot["n"] or 0)
        avgdl = float(tot["sdl"] / tot["ne"]) if tot["ne"] else 1.0
        spark.createDataFrame(
            [(n_docs, avgdl, num_shards)], "n_docs long, avgdl double, n_shards int"
        ).write.mode("overwrite").parquet(p["corpus"])
    else:
        row = spark.read.parquet(p["corpus"]).collect()[0]
        n_docs, avgdl = int(row["n_docs"]), float(row["avgdl"])
        assert int(row["n_shards"]) == num_shards, "num_shards mismatch on resume"

    phase_t["phase1_corpus_stats"] = round(time.time() - t_start, 2)
    # ---- Phase 2: postings, in resumable shard batches (the one big
    # shuffle per batch).
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

    kernel = _make_encode_kernel(block)
    n_committed = n_skipped = 0
    tdict = None
    if any(b not in committed for b, _ in batches):
        # (th → term) dictionary, once per build; collision check — a th
        # collision would silently merge two terms' postings.
        tdict = term_dictionary(docs).persist()
        n_collisions = tdict.where(F.col("_n") > 1).count()
        if n_collisions:
            raise RuntimeError(f"xxhash64 term collision(s) detected: {n_collisions}")
        tdict = tdict.drop("_n")
    for batch_id, shard_ids in batches:
        if batch_id in committed:
            n_skipped += 1
            continue
        t0 = time.time()
        batch_docs = docs
        if len(shard_ids) < num_shards:
            batch_docs = docs.where(F.col("shard_id").isin(shard_ids))
        tokens = token_rows(batch_docs)
        # Salted repartition of token rows. The key is (shard_id,
        # xxhash(term) % salt) with salt FINE (default 1024 slices per
        # shard) and the partition count independent of it: each reduce
        # partition owns many random (shard, term-slice) groups, so
        # hash-collision imbalance averages out (keys >> partitions is what
        # makes the layout straggler-free), while every (shard, term)
        # group still lands wholly in one partition. A single pathological
        # term is bounded by its per-shard df because docs are hash-spread
        # across shards first.
        n_encode_parts = encode_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        encoded = (
            tokens.repartition(
                n_encode_parts,
                F.col("shard_id"),
                F.pmod(F.col("th"), F.lit(salt)),
            )
            .sortWithinPartitions("shard_id", "th", "doc_id")
            .mapInPandas(kernel, ENCODED_SCHEMA)
        )
        # Join the term strings back onto the (tiny, vocab x shards)
        # encoded rows. The final rows are tiny: one cheap range exchange
        # gives th-sorted files per shard — clustering lets a query's th
        # predicate skip row groups via parquet min/max stats, and file
        # count stays O(num_shards).
        postings = (
            encoded.join(tdict, "th")
            .repartitionByRange(len(shard_ids), "shard_id", "th")
            .sortWithinPartitions("shard_id", "th")
        )
        (
            postings.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("shard_id")
            .parquet(p["postings"])
        )
        t1 = time.time()
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
        phase_t[f"batch{batch_id}_encode_write"] = round(t1 - t0, 2)
        phase_t[f"batch{batch_id}_summary_lineage"] = round(time.time() - t1, 2)
        n_committed += 1

    t2 = time.time()
    # ---- Phase 3: term stats from postings (vocab-sized, not corpus-sized).
    # Katta's DocumentFrequencyWritable sums per-shard dfs the same way
    # (LuceneClient.java:271-281).
    stats_done = os.path.exists(os.path.join(p["stats"], "_SUCCESS"))
    if not stats_done or n_committed:
        (
            spark.read.parquet(p["postings"])
            .groupBy("term")
            .agg(
                F.sum("df").alias("df"),
                F.sum("cf").alias("cf"),
                F.first("th").alias("th"),
            )
            .write.mode("overwrite")
            .parquet(p["stats"])
        )

    if tdict is not None:
        tdict.unpersist()
    phase_t["phase3_stats"] = round(time.time() - t2, 2)
    return {
        "phase_timings": phase_t,
        "run_id": run_id,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "num_shards": num_shards,
        "batches_committed": n_committed,
        "batches_skipped": n_skipped,
    }
