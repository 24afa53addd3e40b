"""Per-document sort-value sidecar — the Lucene norms/FieldCache analog.

Katta's TopFieldCollector sorts per shard from values held IN the index
(LuceneServer.java:672-677 caps per-shard work at min(limit, maxDoc);
sort field types WritableType.java:33-35), so a field-sorted search never
touches stored documents until the final merged top-k. This sidecar gives
katta_spark the same property: at build time each declared column is
written per shard as compact (doc_ids, values) blob buckets, and
search_sorted's shard kernels look sort keys up by docID and emit ONLY
their k best rows — ≤ k·shards rows leave the kernels regardless of how
many documents match (the r3 path emitted EVERY match into a join).

Layout: ``docvalues.parquet`` partitioned by shard_id, one row per
(col, bucket of ≤65536 docs): doc_ids = varbyte(deltas of u64-ordered
docIDs, ascending), vals = varbyte(order-preserving u64-mapped values),
nulls = varbyte(bucket-local ordinals of NULL docs). Value mapping is
monotonic (codec.i64_to_u64_order for integral kinds,
codec.f64_to_u64_order for floats), so kernels and the global merge sort
the MAPPED keys and never need the original values — the display columns
come from a final broadcast join of just the merged top-k.

Scale shape: the build is one column-pruned scan of (id, sort cols) + one
shuffle of ~16-24 byte rows per (doc, col) — ~1/avgdl of the token
shuffle; queries read only the searched shards' dv rows for the named
columns (partition-pruned, predicate on col).
"""

from __future__ import annotations

import json
import os
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from katta_spark.codec import (
    f64_to_u64_order,
    i64_to_u64_order,
    vb_decode,
    vb_encode,
)

DV_BUCKET = 1 << 16
DV_SCHEMA = (
    "shard_id int, col string, bucket int, doc_ids binary, vals binary, "
    "nulls binary"
)
_META_FILE = "docvalues_meta.json"


def dv_path(index_dir: str) -> str:
    return os.path.join(index_dir, "docvalues.parquet")


def mapped_expr(df: DataFrame, col: str):
    """(Column mapped to an order-preserving long/double, kind) — or raises
    for kinds the sidecar can't encode (strings fall back to the join
    path; refuse at build so the limitation is explicit)."""
    dtype = dict(df.dtypes)[col]
    if dtype in ("tinyint", "smallint", "int", "bigint", "boolean"):
        return F.col(col).cast("long"), "long"
    if dtype == "date":
        return F.unix_date(F.col(col)).cast("long"), "long"
    if dtype.startswith("timestamp"):
        return F.unix_micros(F.col(col)).cast("long"), "long"
    if dtype in ("float", "double"):
        return F.col(col).cast("double"), "double"
    raise ValueError(
        f"docvalue column {col!r} has unsupported type {dtype!r} (supported:"
        " integral, boolean, date, timestamp, float/double; string sorts"
        " use the source-join path)"
    )


_DV_KEYS = ("shard_id", "col", "bucket", "doc_ids", "vals", "nulls")


def _empty_dv_dict() -> dict:
    return {k: [] for k in _DV_KEYS}


def _empty_dv_frame() -> pd.DataFrame:
    return pd.DataFrame(_empty_dv_dict())


def encode_buckets(
    out: dict,
    shard: int,
    col: str,
    u_sorted: np.ndarray,
    mapped: np.ndarray,
    null_mask: np.ndarray,
) -> None:
    """Append one column's bucket rows (doc-sorted inputs, u64 docIDs)."""
    for b0 in range(0, u_sorted.size, DV_BUCKET):
        hi = min(b0 + DV_BUCKET, u_sorted.size)
        chunk = u_sorted[b0:hi]
        deltas = np.empty(chunk.size, dtype=np.uint64)
        deltas[0] = chunk[0]
        deltas[1:] = chunk[1:] - chunk[:-1]
        out["shard_id"].append(shard)
        out["col"].append(col)
        out["bucket"].append(b0 // DV_BUCKET)
        out["doc_ids"].append(vb_encode(deltas))
        out["vals"].append(vb_encode(mapped[b0:hi]))
        out["nulls"].append(
            vb_encode(np.flatnonzero(null_mask[b0:hi]).astype(np.uint64))
        )


def merge_docvalues_kernel(cols: list[str]):
    """applyInPandas kernel over UNIONED per-shard sidecar rows from
    several source indexes: decode every source's buckets, re-sort by
    docID (inputs are doc-disjoint — compaction refuses duplicates), and
    re-bucket — the docvalue leg of index compaction."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return _empty_dv_frame()
        shard = int(pdf["shard_id"].iloc[0])
        out = _empty_dv_dict()
        for c in cols:
            docs, vals, nulls = decode_shard_column(pdf, c)
            if docs.size == 0:
                continue
            order = np.argsort(docs, kind="stable")
            encode_buckets(
                out, shard, c,
                i64_to_u64_order(docs[order]), vals[order], nulls[order],
            )
        return pd.DataFrame(out)

    return kernel


def write_docvalues(
    spark: SparkSession,
    docs_with_ids: DataFrame,
    index_dir: str,
    docvalue_cols: Iterable[str],
    num_shards: int,
) -> None:
    """Build the sidecar: one pruned scan + one slim per-shard shuffle.

    Nulls travel as an explicit boolean (not NaN) so integral kinds never
    round-trip through float64 (which silently loses precision past 2^53).
    """
    cols = list(docvalue_cols)
    kinds: dict[str, str] = {}
    sel = [F.col("shard_id"), F.col("doc_id")]
    for c in cols:
        expr, kind = mapped_expr(docs_with_ids, c)
        kinds[c] = kind
        sel.append(F.col(c).isNull().alias(f"{c}__n"))
        sel.append(F.coalesce(expr, F.lit(0).cast(
            "double" if kind == "double" else "long")).alias(c))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return _empty_dv_frame()
        shard = int(pdf["shard_id"].iloc[0])
        doc = pdf["doc_id"].to_numpy(np.int64)
        order = np.argsort(doc, kind="stable")
        u = i64_to_u64_order(doc[order])
        out = _empty_dv_dict()
        for c in cols:
            if kinds[c] == "double":
                mapped = f64_to_u64_order(
                    pdf[c].to_numpy(np.float64)[order]
                )
            else:
                mapped = i64_to_u64_order(pdf[c].to_numpy(np.int64)[order])
            nmask = pdf[f"{c}__n"].to_numpy(bool)[order]
            encode_buckets(out, shard, c, u, mapped, nmask)
        return pd.DataFrame(out)

    (
        docs_with_ids.select(*sel)
        .repartition(num_shards, "shard_id")
        .groupBy("shard_id")
        .applyInPandas(kernel, DV_SCHEMA)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(dv_path(index_dir))
    )
    with open(os.path.join(index_dir, _META_FILE), "w") as fh:
        json.dump({"cols": kinds}, fh)


def read_meta(index_dir: str) -> dict[str, str]:
    """col → kind for the index's docvalue sidecar ({} if none)."""
    mf = os.path.join(index_dir, _META_FILE)
    if not os.path.exists(mf):
        return {}
    with open(mf) as fh:
        return json.load(fh).get("cols", {})


def decode_shard_column(dv_pdf: pd.DataFrame, col: str):
    """(sorted doc_ids int64, mapped u64 values, null mask) for one shard's
    column from its cogrouped sidecar rows."""
    from katta_spark.codec import u64_to_i64_order

    rows = dv_pdf[dv_pdf["col"] == col].sort_values("bucket")
    docs_parts, val_parts, null_parts = [], [], []
    for r in rows.itertuples(index=False):
        d = np.cumsum(vb_decode(r.doc_ids), dtype=np.uint64)
        docs_parts.append(u64_to_i64_order(d))
        vals = vb_decode(r.vals)
        val_parts.append(vals)
        nm = np.zeros(vals.size, dtype=bool)
        nm[vb_decode(r.nulls).astype(np.int64)] = True
        null_parts.append(nm)
    if not docs_parts:
        e = np.empty(0, np.int64)
        return e, np.empty(0, np.uint64), np.empty(0, bool)
    return (
        np.concatenate(docs_parts),
        np.concatenate(val_parts),
        np.concatenate(null_parts),
    )
