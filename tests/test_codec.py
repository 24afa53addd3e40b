"""Codec round-trips on random and adversarial arrays (no Spark needed).

Mirrors the reference's serialization round-trip unit tests
(HitsMapWritableTest.java, QueryWritableTest.java — SURVEY.md §5 cat 1).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from katta_spark.codec import (
    BLOCK,
    block_maxima,
    decode_blocks,
    decode_posting_list,
    encode_posting_list,
    read_skips,
    vb_decode,
    vb_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=400)
)
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)


def test_vb_boundaries():
    # exact 7-bit boundaries where byte count changes
    vals = [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**63, 2**64 - 1]
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_posting_roundtrip(data):
    n = data.draw(st.integers(min_value=0, max_value=700))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    doc_ids = np.unique(rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64))
    tfs = rng.integers(1, 500, size=doc_ids.size)
    dls = rng.integers(1, 5000, size=doc_ids.size)
    d, t, l, s = encode_posting_list(doc_ids, tfs, dls)
    dd, tt, ll = decode_posting_list(d, t, l)
    assert np.array_equal(dd, doc_ids)
    assert np.array_equal(tt, tfs)
    assert np.array_equal(ll, dls)
    # skips: one per block, first_doc matches
    skips = read_skips(s)
    assert skips.shape[0] == (doc_ids.size + BLOCK - 1) // BLOCK


def test_partial_decode_by_skips():
    rng = np.random.default_rng(7)
    doc_ids = np.unique(rng.integers(-(2**62), 2**62, size=1000, dtype=np.int64))
    tfs = rng.integers(1, 9, size=doc_ids.size)
    dls = rng.integers(3, 120, size=doc_ids.size)
    d, t, l, s = encode_posting_list(doc_ids, tfs, dls)
    nblocks = read_skips(s).shape[0]
    # decode every second block; verify exact equality with slices
    sel = np.arange(0, nblocks, 2)
    dd, tt, ll = decode_blocks(d, t, l, s, sel, doc_ids.size)
    expect = np.concatenate(
        [doc_ids[bi * BLOCK : (bi + 1) * BLOCK] for bi in sel]
    )
    assert np.array_equal(dd, expect)
    assert np.array_equal(
        tt, np.concatenate([tfs[bi * BLOCK : (bi + 1) * BLOCK] for bi in sel])
    )
    # empty selection
    e0, e1, e2 = decode_blocks(d, t, l, s, np.array([], dtype=int), doc_ids.size)
    assert e0.size == 0


def test_block_maxima():
    tfs = np.array([1, 9, 2] * 100)
    dls = np.array([50, 3, 120] * 100)
    mt, ml = block_maxima(tfs, dls)
    assert mt.shape[0] == (300 + BLOCK - 1) // BLOCK
    assert (mt == 9).all()
    assert (ml == 3).all()


def test_batch_encode_matches_single(  ):
    """encode_posting_lists_batch == per-list encode_posting_list, bytewise."""
    from katta_spark.codec import encode_posting_lists_batch

    rng = np.random.default_rng(11)
    # 40 runs of wildly varying lengths, including 1-element runs
    lens = np.concatenate([rng.integers(1, 400, size=38), [1, 1]])
    runs = []
    for L in lens:
        d = np.unique(rng.integers(-(2**62), 2**62, size=L, dtype=np.int64))
        runs.append(
            (d, rng.integers(1, 9, size=d.size), rng.integers(1, 200, size=d.size))
        )
    doc = np.concatenate([r[0] for r in runs])
    tf = np.concatenate([r[1] for r in runs])
    dl = np.concatenate([r[2] for r in runs])
    starts = np.cumsum([0] + [r[0].size for r in runs[:-1]])
    got = encode_posting_lists_batch(doc, tf, dl, starts, block=32)
    assert len(got) == len(runs)
    for (d, t, l), row in zip(runs, got):
        df_, cf, sdl, dbuf, tbuf, lbuf, sbuf, mt, md, bmt, bmd = row
        ed, et, el, es = encode_posting_list(d, t, l, block=32)
        assert (dbuf, tbuf, lbuf, sbuf) == (ed, et, el, es)
        assert df_ == d.size and cf == t.sum() and sdl == l.sum()
        assert mt == t.max() and md == l.min()
        emt, emd = block_maxima(t, l, block=32)
        assert np.array_equal(vb_decode(bmt), emt.astype(np.uint64))
        assert np.array_equal(vb_decode(bmd), emd.astype(np.uint64))
        # decodes correctly
        dd, tt, ll = decode_posting_list(dbuf, tbuf, lbuf)
        assert np.array_equal(dd, d)


def test_compression_is_compact():
    """Sanity: gaps of ~dense docIDs compress far below 8 bytes/doc."""
    doc_ids = np.sort(
        np.random.default_rng(1).choice(10**7, size=10**5, replace=False)
    ).astype(np.int64)
    tfs = np.ones(doc_ids.size, dtype=np.int64)
    dls = np.full(doc_ids.size, 40, dtype=np.int64)
    d, t, l, s = encode_posting_list(doc_ids, tfs, dls)
    assert len(d) < 2.5 * doc_ids.size  # avg gap ~100 → ~1-2 bytes
    assert len(t) == doc_ids.size  # tf=1 → 1 byte each


def test_positions_roundtrip():
    """encode_positions_batch / decode_positions: per-doc delta chains,
    doc-major, restart at each doc — the .prx-analog layout."""
    from katta_spark.codec import decode_positions, encode_positions_batch

    rng = np.random.default_rng(5)
    # 12 term-runs; each run = several docs; each doc = ascending positions
    all_pos, doc_starts, run_starts_occ, per_run = [], [], [], []
    occ = 0
    for _ in range(12):
        run_starts_occ.append(occ)
        tfs, flat = [], []
        for _ in range(int(rng.integers(1, 6))):
            tf = int(rng.integers(1, 7))
            pos = np.sort(
                rng.choice(np.arange(0, 5000), size=tf, replace=False)
            )
            doc_starts.append(occ)
            occ += tf
            tfs.append(tf)
            flat.append(pos)
        per_run.append((np.array(tfs), np.concatenate(flat)))
        all_pos.append(per_run[-1][1])
    blobs = encode_positions_batch(
        np.concatenate(all_pos),
        np.array(doc_starts),
        np.array(run_starts_occ),
    )
    assert len(blobs) == 12
    for blob, (tfs, flat) in zip(blobs, per_run):
        got = decode_positions(blob, tfs)
        assert np.array_equal(got, flat)


def test_positions_empty():
    from katta_spark.codec import decode_positions, encode_positions_batch

    assert encode_positions_batch(
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
    ) == []
    assert decode_positions(b"", np.empty(0, np.int64)).size == 0


def test_f64_order_nan_and_zero_canonicalization():
    from katta_spark.codec import f64_to_u64_order

    neg_nan = np.frombuffer(
        np.uint64(0xFFF8000000000000).tobytes(), dtype=np.float64
    )[0]
    assert np.isnan(neg_nan) and np.signbit(neg_nan)
    v = np.array(
        [neg_nan, np.nan, np.inf, -np.inf, -0.0, 0.0, 1.5, -1.5],
        dtype=np.float64,
    )
    u = f64_to_u64_order(v)
    # every NaN bit pattern maps to ONE encoding, above +inf
    assert u[0] == u[1]
    assert u[0] > u[2]
    # -inf is the smallest; -NaN must NOT sort below it
    assert u[3] == u.min()
    # -0.0 and +0.0 compare equal (Spark NormalizeFloatingNumbers)
    assert u[4] == u[5]
    # ordering of ordinary values preserved
    assert u[7] < u[4] < u[6] < u[2]
