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
- ``positions``: varbyte(within-doc position deltas), doc-major — tf[i]
                 ascending token positions per doc, the delta chain
                 restarting at each doc (Lucene's .prx file analog).
                 Phrase/slop queries execute against these alone — no
                 stored-text access (LuceneServer.java:682 runs
                 PhraseQuery per shard against the index only).
- ``skips``    : one record per block of BLOCK docs:
                 (first_doc_u64, byte offsets into the three buffers) —
                 enables decode starting at any block (skip pointers).
- ``block_max_tf`` / ``block_min_dl`` : varbyte per block — RAW maxima
                 from which the query assembles block-max score bounds
                 under whichever stats govern it (block-max pruning,
                 SURVEY.md §4).

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


def f64_to_u64_order(v: np.ndarray) -> np.ndarray:
    """Order-preserving float64 -> uint64 (IEEE total order trick):
    negatives get their bits complemented, non-negatives get the sign bit
    set — so uint64 comparison orders like float comparison, with NaN
    sorting above +inf (Spark's NaN-is-largest convention). All NaN bit
    patterns (including negative-sign-bit NaN from 0.0/-0.0 arithmetic)
    are canonicalized to the positive quiet NaN first, so EVERY NaN takes
    the above-+inf encoding — a -NaN must not sort below -inf. -0.0 is
    canonicalized to +0.0 (Spark's NormalizeFloatingNumbers makes them
    compare equal in sort keys; the raw bit trick would order them)."""
    a = np.ascontiguousarray(v, dtype=np.float64)
    if np.isnan(a).any():
        a = np.where(np.isnan(a), np.float64("nan"), a)
    a = a + 0.0  # IEEE: -0.0 + 0.0 == +0.0; every other value unchanged
    b = a.view(np.int64)
    u = b.view(np.uint64).copy()
    neg = b < 0
    u[neg] = ~u[neg]
    u[~neg] |= _SIGN
    return u


def u64_to_f64_order(u: np.ndarray) -> np.ndarray:
    """Inverse of :func:`f64_to_u64_order` (up to that function's NaN/-0.0
    canonicalization, which is lossy by design): recover the float64 a
    mapped sort key encodes — used to DISPLAY numeric group/sort values
    straight from the docvalue sidecar without touching the source table."""
    a = np.ascontiguousarray(u, dtype=np.uint64).copy()
    neg = (a & _SIGN) == 0
    a[neg] = ~a[neg]
    a[~neg] &= ~_SIGN
    return a.view(np.float64).copy()


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


def vb_decode_concat(bufs) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY varbyte buffers in one vectorized pass.

    Concatenates the buffers (varbyte is self-delimiting, so the joined
    stream decodes to the concatenation of the per-buffer values) and
    returns (values uint64, per-buffer value counts). One numpy pass for
    a whole batch of posting lists instead of one vb_decode call per
    list — the per-call numpy setup dominated for short lists."""
    lens = np.fromiter((len(x) for x in bufs), np.int64, count=len(bufs))
    b = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, np.uint64), np.zeros(len(bufs), np.int64)
    vals = vb_decode(b)
    is_last = ((b & 0x80) == 0).astype(np.int64)
    boff = np.concatenate([[0], np.cumsum(lens)[:-1]])
    cnt = np.zeros(len(bufs), np.int64)
    nz = lens > 0
    if nz.any():
        # reduceat only over non-empty buffer starts: equal adjacent
        # offsets (empty buffers) would otherwise corrupt the counts
        cnt[nz] = np.add.reduceat(is_last, boff[nz])
    return vals, cnt


def decode_posting_lists_concat(
    doc_bufs, tf_bufs, dl_bufs
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch decode of many posting lists: returns (doc_ids int64,
    tfs int64, doclens int64, docs-per-list int64) with the lists'
    values concatenated in input order. The per-list delta chains are
    re-based with one segmented cumsum (exact under uint64 wraparound),
    replacing a per-list decode_posting_list loop."""
    deltas, cnt = vb_decode_concat(doc_bufs)
    u = np.cumsum(deltas, dtype=np.uint64)
    voff = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    base = np.where(
        voff > 0, u[np.maximum(voff - 1, 0)], np.uint64(0)
    ).astype(np.uint64)
    docs = u64_to_i64_order(u - np.repeat(base, cnt))
    tfs, _ = vb_decode_concat(tf_bufs)
    dls, _ = vb_decode_concat(dl_bufs)
    return docs, tfs.astype(np.int64), dls.astype(np.int64), cnt


def decode_positions_concat(pos_bufs, tfs: np.ndarray) -> np.ndarray:
    """Batch decode of many positions blobs to ONE flat doc-major
    positions array. ``tfs``: per-doc term frequencies aligned with the
    concatenated doc entries (the delta chain restarts at every doc —
    row boundaries are doc boundaries, so one segmented cumsum covers
    all blobs)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    deltas, _ = vb_decode_concat(pos_bufs)
    if deltas.size == 0:
        return deltas.astype(np.int64)
    d = deltas.astype(np.int64)
    doc_starts = np.concatenate([[0], np.cumsum(tfs)[:-1]])
    cs = np.cumsum(d)
    base = cs[doc_starts] - d[doc_starts]
    return cs - np.repeat(base, tfs)


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


def vb_encode_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Like vb_encode but also returns per-value byte counts (for slicing
    a multi-list encoding by offsets)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nb = np.ones(v.size, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    kmax = int(nb.max())
    ks = np.arange(kmax, dtype=np.uint64)
    mat = ((v[:, None] >> (np.uint64(7) * ks)[None, :]) & np.uint64(0x7F)).astype(np.uint8)
    cont = ks[None, :].astype(np.int64) < (nb - 1)[:, None]
    mat |= cont.astype(np.uint8) << 7
    mask = ks[None, :].astype(np.int64) < nb[:, None]
    return mat[mask].tobytes(), nb


def encode_positions_batch(
    positions: np.ndarray,
    doc_starts: np.ndarray,
    run_starts_occ: np.ndarray,
) -> list[bytes]:
    """Vectorized positions encode for ALL posting lists of a batch.

    ``positions``: occurrence-level token positions, sorted doc-major
    (ascending within each (shard, term, doc) run).
    ``doc_starts``: occurrence indices where a new (shard, term, doc) run
    begins — the delta chain restarts there (first delta = absolute pos).
    ``run_starts_occ``: occurrence index of each (shard, term) run start.
    Returns one varbyte blob per run.
    """
    n = positions.size
    if n == 0:
        return []
    pos = np.asarray(positions, dtype=np.int64)
    pdelta = np.empty(n, dtype=np.int64)
    pdelta[0] = pos[0]
    pdelta[1:] = pos[1:] - pos[:-1]
    pdelta[doc_starts] = pos[doc_starts]
    buf, nb = vb_encode_with_sizes(pdelta.astype(np.uint64))
    cum = np.concatenate([[0], np.cumsum(nb)])
    starts = np.asarray(run_starts_occ, dtype=np.int64)
    ends = np.append(starts[1:], n)
    return [buf[cum[s] : cum[e]] for s, e in zip(starts, ends)]


def decode_positions(pos_buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Decode a positions blob to the flat doc-major positions array.

    ``tfs``: per-doc term frequencies in decode order (sum == number of
    encoded positions). Each doc's positions come back ascending.
    """
    tfs = np.asarray(tfs, dtype=np.int64)
    deltas = vb_decode(pos_buf).astype(np.int64)
    if deltas.size == 0:
        return deltas
    doc_starts = np.concatenate([[0], np.cumsum(tfs)[:-1]])
    cs = np.cumsum(deltas)
    base = cs[doc_starts] - deltas[doc_starts]
    return cs - np.repeat(base, tfs)


def encode_posting_lists_batch(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray,
    run_starts: np.ndarray,
    block: int = BLOCK,
) -> list[tuple]:
    """Vectorized multi-list encode: ALL posting lists of a batch in one
    pass of numpy (one varbyte encode per column for the whole batch),
    then per-run byte-slicing. This is the executor hot path of the index
    build — per-run Python work is reduced to a handful of slice ops.

    ``run_starts``: sorted start indices of each (shard, term) run.
    Returns one tuple per run:
      (df, cf, sum_dl, doc_ids_buf, tfs_buf, doclens_buf, skips_buf,
       max_tf, min_dl, block_max_tf_buf, block_min_dl_buf)
    sum_dl (Σ doclens of the run) makes the doc-marker rows' per-shard
    token totals a pure JVM aggregation at stats time — no blob decode job.
    """
    n = doc_ids.size
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    doclens = np.asarray(doclens, dtype=np.int64)
    run_starts = np.asarray(run_starts, dtype=np.int64)
    run_ends = np.append(run_starts[1:], n)
    run_lens = run_ends - run_starts

    u = i64_to_u64_order(doc_ids)
    deltas = np.empty(n, dtype=np.uint64)
    if n:
        deltas[0] = u[0]
        deltas[1:] = u[1:] - u[:-1]
    deltas[run_starts] = u[run_starts]  # delta chain restarts per run

    dbuf, dnb = vb_encode_with_sizes(deltas)
    tbuf, tnb = vb_encode_with_sizes(tfs.astype(np.uint64))
    lbuf, lnb = vb_encode_with_sizes(doclens.astype(np.uint64))
    dcum = np.concatenate([[0], np.cumsum(dnb)])
    tcum = np.concatenate([[0], np.cumsum(tnb)])
    lcum = np.concatenate([[0], np.cumsum(lnb)])

    # global block starts: run_start + block*j for each run
    nblocks = (run_lens + block - 1) // block
    total_blocks = int(nblocks.sum())
    # offsets within each run: concat(arange(nb_r) * block)
    reps = np.repeat(run_starts, nblocks)
    idx_in_run = np.arange(total_blocks) - np.repeat(
        np.concatenate([[0], np.cumsum(nblocks)[:-1]]), nblocks
    )
    bstarts = reps + idx_in_run * block  # global index of each block start

    b_first = u[bstarts]
    b_max_tf = np.maximum.reduceat(tfs, bstarts) if n else np.empty(0, np.int64)
    b_min_dl = np.minimum.reduceat(doclens, bstarts) if n else np.empty(0, np.int64)
    run_max_tf = np.maximum.reduceat(tfs, run_starts) if n else np.empty(0, np.int64)
    run_min_dl = np.minimum.reduceat(doclens, run_starts) if n else np.empty(0, np.int64)
    run_cf = np.add.reduceat(tfs, run_starts) if n else np.empty(0, np.int64)
    run_sum_dl = np.add.reduceat(doclens, run_starts) if n else np.empty(0, np.int64)

    # per-block byte offsets, relative to the run's buffer start
    run_of_block = np.repeat(np.arange(run_starts.size), nblocks)
    b_off_d = dcum[bstarts] - dcum[run_starts][run_of_block]
    b_off_t = tcum[bstarts] - tcum[run_starts][run_of_block]
    b_off_l = lcum[bstarts] - lcum[run_starts][run_of_block]

    skips_all = np.empty(total_blocks, dtype=_SKIP_DTYPE)
    skips_all["first_doc"] = b_first
    skips_all["off_docs"] = b_off_d
    skips_all["off_tfs"] = b_off_t
    skips_all["off_dls"] = b_off_l
    skips_bytes = skips_all.tobytes()
    ssz = _SKIP_DTYPE.itemsize
    bcum = np.concatenate([[0], np.cumsum(nblocks)])

    out = []
    for r in range(run_starts.size):
        s, e = run_starts[r], run_ends[r]
        bs, be = bcum[r], bcum[r + 1]
        out.append(
            (
                int(run_lens[r]),
                int(run_cf[r]),
                int(run_sum_dl[r]),
                dbuf[dcum[s] : dcum[e]],
                tbuf[tcum[s] : tcum[e]],
                lbuf[lcum[s] : lcum[e]],
                skips_bytes[bs * ssz : be * ssz],
                int(run_max_tf[r]),
                int(run_min_dl[r]),
                vb_encode(b_max_tf[bs:be].astype(np.uint64)),
                vb_encode(b_min_dl[bs:be].astype(np.uint64)),
            )
        )
    return out


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
