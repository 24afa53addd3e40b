"""Posting-list codec: delta + variable-byte + block skip pointers.

The reference consumes Lucene's compressed postings (it never implements
them — SURVEY.md §1.1 "Posting list"); the north rule makes them ours:
delta + variable-byte compression with skip pointers. Everything here is
pure numpy, fully vectorized (no per-element Python loops), because these
kernels run inside Arrow/pandas UDFs on the executor hot path.

Layout per posting list (one row of the postings table):

- ``doc_ids``  : varbyte(deltas of order-preserving uint64-mapped docIDs);
                 a continuous delta chain — full decode needs no skips.
- ``tfs``      : varbyte(term frequencies), parallel to doc_ids.
- ``doclens``  : varbyte(document lengths), parallel to doc_ids. Storing
                 dl inline makes the scoring kernel single-pass (the
                 analog of Lucene's per-doc norms file).
- ``skips``    : one record per block of BLOCK docs:
                 (first_doc_u64, byte offsets into the three buffers) —
                 enables decode starting at any block (skip pointers).
- ``block_max_impact`` : float32 per block — BM25 upper bound of any
                 posting in the block (block-max WAND, SURVEY.md §4).

docIDs are int64 (xxhash64 output, possibly negative); they are mapped to
uint64 with an order-preserving XOR of the sign bit so deltas of the sorted
sequence are non-negative.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128

_SIGN = np.uint64(0x8000000000000000)
_SKIP_DTYPE = np.dtype(
    [("first_doc", "<u8"), ("off_docs", "<u4"), ("off_tfs", "<u4"), ("off_dls", "<u4")]
)


def i64_to_u64_order(v: np.ndarray) -> np.ndarray:
    """Order-preserving int64 -> uint64 (flip sign bit)."""
    return v.astype(np.int64).view(np.uint64) ^ _SIGN


def u64_to_i64_order(u: np.ndarray) -> np.ndarray:
    return (u.astype(np.uint64) ^ _SIGN).view(np.int64)


def vb_encode(values: np.ndarray) -> bytes:
    """Variable-byte encode a uint64 array (vectorized).

    7 data bits per byte, little-endian groups; high bit set = continuation.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = np.ones(v.size, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    kmax = int(nb.max())
    ks = np.arange(kmax, dtype=np.uint64)
    mat = ((v[:, None] >> (np.uint64(7) * ks)[None, :]) & np.uint64(0x7F)).astype(np.uint8)
    cont = ks[None, :].astype(np.int64) < (nb - 1)[:, None]
    mat |= cont.astype(np.uint8) << 7
    mask = ks[None, :].astype(np.int64) < nb[:, None]
    return mat[mask].tobytes()


def vb_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a varbyte buffer to uint64 (vectorized via reduceat)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    group_len = ends - starts + 1
    within = np.arange(b.size, dtype=np.uint64) - np.repeat(
        starts.astype(np.uint64), group_len
    )
    vals7 = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * within)
    return np.add.reduceat(vals7, starts)


def encode_posting_list(
    doc_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray, block: int = BLOCK
) -> tuple[bytes, bytes, bytes, bytes]:
    """Encode one (sorted-by-doc_id) posting list.

    Returns (doc_ids_buf, tfs_buf, doclens_buf, skips_buf).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    u = i64_to_u64_order(doc_ids)
    deltas = np.empty(n, dtype=np.uint64)
    if n:
        deltas[0] = u[0]
        deltas[1:] = u[1:] - u[:-1]

    tfs = np.asarray(tfs, dtype=np.uint64)
    doclens = np.asarray(doclens, dtype=np.uint64)

    nblocks = (n + block - 1) // block
    skips = np.zeros(nblocks, dtype=_SKIP_DTYPE)
    docs_parts, tfs_parts, dls_parts = [], [], []
    od = ot = ol = 0
    for bi in range(nblocks):
        lo, hi = bi * block, min((bi + 1) * block, n)
        db = vb_encode(deltas[lo:hi])
        tb = vb_encode(tfs[lo:hi])
        lb = vb_encode(doclens[lo:hi])
        skips[bi] = (u[lo], od, ot, ol)
        docs_parts.append(db)
        tfs_parts.append(tb)
        dls_parts.append(lb)
        od += len(db)
        ot += len(tb)
        ol += len(lb)
    return (
        b"".join(docs_parts),
        b"".join(tfs_parts),
        b"".join(dls_parts),
        skips.tobytes(),
    )


def decode_posting_list(
    doc_ids_buf: bytes, tfs_buf: bytes, doclens_buf: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode (continuous delta chain — skips not needed)."""
    deltas = vb_decode(doc_ids_buf)
    u = np.cumsum(deltas, dtype=np.uint64)
    return (
        u64_to_i64_order(u),
        vb_decode(tfs_buf).astype(np.int64),
        vb_decode(doclens_buf).astype(np.int64),
    )


def read_skips(skips_buf: bytes) -> np.ndarray:
    return np.frombuffer(skips_buf, dtype=_SKIP_DTYPE)


def decode_blocks(
    doc_ids_buf: bytes,
    tfs_buf: bytes,
    doclens_buf: bytes,
    skips_buf: bytes,
    block_idx: np.ndarray,
    n_total: int,
    block: int = BLOCK,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Partial decode of selected blocks via skip pointers.

    ``block_idx``: sorted array of block indices to materialize. This is
    what block-max pruning calls after eliminating blocks whose upper
    bound cannot reach the heap threshold.
    """
    skips = read_skips(skips_buf)
    nblocks = skips.shape[0]
    db = np.frombuffer(doc_ids_buf, dtype=np.uint8)
    tb = np.frombuffer(tfs_buf, dtype=np.uint8)
    lb = np.frombuffer(doclens_buf, dtype=np.uint8)
    out_d, out_t, out_l = [], [], []
    for bi in block_idx:
        bi = int(bi)
        d_lo = skips["off_docs"][bi]
        d_hi = skips["off_docs"][bi + 1] if bi + 1 < nblocks else db.size
        t_lo = skips["off_tfs"][bi]
        t_hi = skips["off_tfs"][bi + 1] if bi + 1 < nblocks else tb.size
        l_lo = skips["off_dls"][bi]
        l_hi = skips["off_dls"][bi + 1] if bi + 1 < nblocks else lb.size
        gaps = vb_decode(db[d_lo:d_hi])
        u = np.cumsum(gaps, dtype=np.uint64) - gaps[0] + skips["first_doc"][bi]
        out_d.append(u64_to_i64_order(u))
        out_t.append(vb_decode(tb[t_lo:t_hi]).astype(np.int64))
        out_l.append(vb_decode(lb[l_lo:l_hi]).astype(np.int64))
    if not out_d:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    return np.concatenate(out_d), np.concatenate(out_t), np.concatenate(out_l)


def block_maxima(
    tfs: np.ndarray, doclens: np.ndarray, block: int = BLOCK
) -> tuple[np.ndarray, np.ndarray]:
    """(max_tf, min_dl) per block — inputs to the block-max impact bound."""
    n = tfs.size
    nblocks = (n + block - 1) // block
    starts = np.arange(nblocks) * block
    max_tf = np.maximum.reduceat(np.asarray(tfs, dtype=np.int64), starts)
    min_dl = np.minimum.reduceat(np.asarray(doclens, dtype=np.int64), starts)
    return max_tf, min_dl
