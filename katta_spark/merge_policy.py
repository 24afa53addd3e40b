"""Tiered merge policy + auto-compaction scheduler for delta indexes.

Reference context: Katta serves IMMUTABLE index versions and swaps a
freshly optimized index in (IndexMetaData.java:12-46 versioning;
IndexerJob.java:118-179 ``optimize()``); the Lucene engine it serves
keeps its segment count bounded with TieredMergePolicy driven by a
background merge scheduler. katta_spark's incremental story —
``streaming.stream_build`` emitting one immutable ``delta_<batch>``
index per micro-batch, ``search_multi`` over the live set,
``compact.compact`` merging a chosen list — was missing the same piece:
the POLICY that decides WHICH segments to merge WHEN, and a crash-safe
executor that swaps merged segments into the live set. Without it the
delta count (and so per-query cost) grows without bound.

Policy (TieredMergePolicy-shaped, simplified and documented):

- segment size = LIVE docs (``n_docs`` minus tombstones), floored at
  ``floor_docs`` — dust-sized deltas all count as one floor unit so they
  merge together instead of each anchoring its own "tier"
  (TieredMergePolicy.setFloorSegmentMB).
- a merge group takes up to ``max_merge_at_once`` size-sorted
  neighbours, subject to (a) merged live docs <= ``max_merged_docs``
  (setMaxMergedSegmentMB) and (b) tier cohesion: largest member <=
  ``tier_ratio`` x smallest member after flooring — a giant base never
  merges with dust deltas, preventing the O(corpus)-rewrite-per-delta
  cascade tiering exists to avoid.
- a segment whose deleted fraction >= ``expunge_deletes_pct`` that no
  group claimed becomes a singleton expunge merge
  (forceMergeDeletes; ``compact()`` accepts a single tombstoned input).
- only CONFIG-COMPATIBLE segments group: ``compact()`` requires equal
  num_shards / sharding fn / keyword_fields / positions / docvalue
  sidecar schema across its inputs, so the planner partitions segments
  by that key first.

Executor crash-safety (one merger at a time, like Lucene's single
IndexWriter): each merge compacts into ``index_root/_tmp_merged_*``,
writes ``_INPUTS.json`` (the consumed segment names), then atomically
renames to ``merged_<gen>``. Readers (:func:`live_index_dirs`) exclude
every segment named in a committed merge's manifest, so a crash after
the rename but before input cleanup can never double-count a document;
stale ``_tmp_*`` dirs are invisible to readers and reaped on the next
run. The merged segment is a plain v-current index — it can itself be
an input to a later, higher-tier merge.

100-TB shape: the plan is computed from per-segment METADATA only
(corpus.parquet is one row; the tombstone table is bounded by the
deleted count) — no Spark job, no postings scan. Each executed merge is
``compact()``'s single postings-sized job, in which single-source
(shard, term) groups pass through without decoding — merging a small
delta into a large base re-encodes only the terms the delta touches.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import pyarrow.parquet as pq

MERGED_PREFIX = "merged_"
TMP_PREFIX = "_tmp_merged_"
MANIFEST = "_INPUTS.json"


@dataclass(frozen=True)
class SegmentInfo:
    """Metadata of one live index segment, read without Spark."""

    index_dir: str
    n_docs: int
    deleted: int = 0
    bytes: int = 0
    # compact()-compatibility key: segments only merge within equal keys
    config: tuple = field(default=(), compare=False)

    @property
    def live_docs(self) -> int:
        return max(self.n_docs - self.deleted, 0)

    @property
    def deletes_pct(self) -> float:
        return self.deleted / self.n_docs if self.n_docs else 0.0


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def segment_info(index_dir: str) -> SegmentInfo:
    """Read one segment's plan-relevant metadata (pyarrow, no Spark —
    this is a driver-side scheduler decision, like Lucene's
    MergePolicy reading SegmentInfos)."""
    tbl = pq.read_table(os.path.join(index_dir, "corpus.parquet"))
    row = {c: tbl.column(c)[0].as_py() for c in tbl.column_names}
    tomb = os.path.join(index_dir, "tombstones.parquet")
    deleted = 0
    if os.path.isdir(tomb) and any(
        f.endswith(".parquet") for f in os.listdir(tomb)
    ):
        # delete.py dedupes on write, so num_rows is the exact count
        deleted = pq.read_table(tomb).num_rows
    dv_meta = None
    dvp = os.path.join(index_dir, "docvalues_meta.json")
    if os.path.exists(dvp):
        with open(dvp) as fh:
            dv_meta = json.dumps(json.load(fh), sort_keys=True)
    config = (
        int(row["n_shards"]),
        row.get("sharding", "pmod_doc_id"),
        tuple(sorted(row.get("keyword_fields") or ())),
        bool(row.get("positions", True)),
        dv_meta,
    )
    return SegmentInfo(
        index_dir=index_dir,
        n_docs=int(row["n_docs"]),
        deleted=deleted,
        bytes=_dir_bytes(os.path.join(index_dir, "postings.parquet")),
        config=config,
    )


def segment_infos(index_dirs: list[str]) -> list[SegmentInfo]:
    return [segment_info(d) for d in index_dirs]


def plan_compaction(
    infos: list[SegmentInfo],
    max_merge_at_once: int = 10,
    floor_docs: int = 1024,
    max_merged_docs: int | None = None,
    tier_ratio: float = 10.0,
    min_merge: int = 2,
    expunge_deletes_pct: float = 0.25,
) -> list[list[str]]:
    """Choose disjoint merge groups (each a list of index dirs for
    ``compact()``). Deterministic in the input metadata: segments sort
    by (floored live size, dir name) and group greedily smallest-first
    under the tier-cohesion / size-cap / fan-in limits above."""
    if max_merge_at_once < 2:
        raise ValueError("max_merge_at_once must be >= 2")
    if min_merge < 2:
        raise ValueError("min_merge must be >= 2 (singleton merges are "
                         "created only by the expunge-deletes rule)")
    if tier_ratio < 1.0:
        raise ValueError("tier_ratio must be >= 1.0")

    by_config: dict[tuple, list[SegmentInfo]] = {}
    for info in infos:
        by_config.setdefault(info.config, []).append(info)

    groups: list[list[str]] = []
    grouped: set[str] = set()
    for segs in by_config.values():
        sized = sorted(
            ((max(s.live_docs, floor_docs), s) for s in segs),
            key=lambda t: (t[0], t[1].index_dir),
        )
        i = 0
        while i < len(sized):
            base_size = sized[i][0]
            total = sized[i][1].live_docs
            j = i + 1
            while (
                j < len(sized)
                and j - i < max_merge_at_once
                and sized[j][0] <= tier_ratio * base_size
                and (
                    max_merged_docs is None
                    or total + sized[j][1].live_docs <= max_merged_docs
                )
            ):
                total += sized[j][1].live_docs
                j += 1
            if j - i >= min_merge:
                groups.append([s.index_dir for _, s in sized[i:j]])
                grouped.update(groups[-1])
                i = j
            else:
                i += 1
    # forceMergeDeletes: heavily-tombstoned segments no group claimed
    # become singleton expunge merges (compact() takes one tombstoned
    # input); fully-empty tombstoned segments qualify too.
    for info in infos:
        if (
            info.index_dir not in grouped
            and info.deleted > 0
            and info.deletes_pct >= expunge_deletes_pct
        ):
            groups.append([info.index_dir])
    return groups


def _committed_merges(index_root: str) -> list[str]:
    return sorted(
        os.path.join(index_root, n)
        for n in os.listdir(index_root)
        if n.startswith(MERGED_PREFIX)
        and os.path.isdir(os.path.join(index_root, n))
        and os.path.exists(os.path.join(index_root, n, MANIFEST))
    )


def _consumed_names(index_root: str) -> set[str]:
    consumed: set[str] = set()
    for m in _committed_merges(index_root):
        with open(os.path.join(m, MANIFEST)) as fh:
            consumed.update(json.load(fh)["inputs"])
    return consumed


def live_index_dirs(index_root: str) -> list[str]:
    """The reader-facing segment list: every ``delta_*`` (from
    stream_build) or ``merged_*`` dir not consumed by a committed merge.
    Crash-safe by construction — a merge is visible only after its
    atomic rename, and from that instant its inputs are excluded via the
    manifest whether or not they are still on disk."""
    if not os.path.isdir(index_root):
        return []
    consumed = _consumed_names(index_root)
    out = []
    for name in sorted(os.listdir(index_root)):
        d = os.path.join(index_root, name)
        if not os.path.isdir(d) or name in consumed:
            continue
        if name.startswith("delta_") or name.startswith(MERGED_PREFIX):
            out.append(d)
    return out


def sweep_consumed(index_root: str) -> list[str]:
    """Delete consumed (manifest-referenced) segment dirs still on disk
    and stale uncommitted ``_tmp_*`` dirs; returns what was removed.
    Run this once no reader can still hold a pre-merge segment list —
    the undeploy-grace sweep (Katta nodes keep serving an old index
    version until the new one is deployed; Lucene's IndexFileDeleter
    refcounts do the same job in-process)."""
    removed = []
    for name in os.listdir(index_root):
        if name.startswith(TMP_PREFIX):
            shutil.rmtree(os.path.join(index_root, name), ignore_errors=True)
            removed.append(name)

    # Deletion ORDER is the crash-safety invariant: a consumed merged_N
    # dir carries the manifest that hides ITS inputs from readers, so it
    # must outlive them on disk. Delete leaf segments first, then merged
    # segments in ascending generation (a merge only ever consumes
    # lower-generation segments) — a crash at any point leaves every
    # still-present consumed dir hidden by a still-present manifest.
    def _order(name: str) -> tuple:
        if name.startswith(MERGED_PREFIX):
            tail = name[len(MERGED_PREFIX):]
            return (1, int(tail) if tail.isdigit() else 0, name)
        return (0, 0, name)

    for name in sorted(_consumed_names(index_root), key=_order):
        p = os.path.join(index_root, name)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
            removed.append(name)
    return removed


def auto_compact(
    spark,
    index_root: str,
    max_rounds: int = 1,
    block: int = 128,
    slices: int = 16,
    remove_inputs: bool = True,
    **policy_kwargs,
) -> dict:
    """Plan and execute merges over ``index_root`` until the policy is
    satisfied (or ``max_rounds`` hit — each round can cascade merged
    segments into a higher tier). Single concurrent merger per root, as
    with Lucene's one IndexWriter; run it after stream_build drains, or
    on any schedule.

    ``remove_inputs=False`` leaves consumed segment dirs on disk —
    readers that listed the live set BEFORE a merge committed can finish
    scanning them (new readers exclude them via the manifest); reclaim
    later with :func:`sweep_consumed` once in-flight queries drain.

    Returns {"rounds": n, "merges": [{out, inputs, n_docs, seconds}],
    "live_before": [...], "live_after": [...]}.
    """
    from katta_spark.compact import compact

    # reap leftovers from a previous crash: stale tmp dirs (never
    # committed — invisible to readers); with remove_inputs also sweep
    # consumed inputs a crashed predecessor left behind
    for name in os.listdir(index_root):
        if name.startswith(TMP_PREFIX):
            shutil.rmtree(os.path.join(index_root, name), ignore_errors=True)
    if remove_inputs:
        sweep_consumed(index_root)

    live_before = live_index_dirs(index_root)
    gen = 0
    for name in os.listdir(index_root):
        if name.startswith(MERGED_PREFIX):
            tail = name[len(MERGED_PREFIX):]
            if tail.isdigit():
                gen = max(gen, int(tail) + 1)

    merges = []
    rounds = 0
    for _ in range(max_rounds):
        live = live_index_dirs(index_root)
        plan = plan_compaction(segment_infos(live), **policy_kwargs)
        if not plan:
            break
        rounds += 1
        for group in plan:
            t0 = time.time()
            tmp = os.path.join(index_root, f"{TMP_PREFIX}{gen}")
            final = os.path.join(index_root, f"{MERGED_PREFIX}{gen}")
            gen += 1
            summary = compact(spark, group, tmp, block=block, slices=slices)
            with open(os.path.join(tmp, MANIFEST), "w") as fh:
                json.dump(
                    {"inputs": [os.path.basename(d) for d in group]}, fh
                )
            os.rename(tmp, final)  # commit point
            if remove_inputs:
                for d in group:
                    shutil.rmtree(d, ignore_errors=True)
            merges.append(
                {
                    "out": final,
                    "inputs": [os.path.basename(d) for d in group],
                    "n_docs": summary["n_docs"],
                    "seconds": round(time.time() - t0, 3),
                }
            )
    return {
        "rounds": rounds,
        "merges": merges,
        "live_before": live_before,
        "live_after": live_index_dirs(index_root),
    }
