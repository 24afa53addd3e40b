"""Pure-numpy property tests of the positional phrase matcher.

_phrase_match_mask implements Lucene's SloppyPhraseMatcher acceptance
(adjusted-position span <= slop over distinct chosen positions). These
tests need no SparkSession: synthetic posting data is generated directly
and checked against an independent brute-force evaluator over the raw
token sequences.
"""

from __future__ import annotations

import random
from itertools import product

import numpy as np

from katta_spark.query import _phrase_match_mask


def _brute(doc_tokens: dict[int, list[str]], cand, tokens, slop):
    out = np.zeros(len(cand), dtype=bool)
    m = len(tokens)
    for ci, did in enumerate(cand):
        toks = doc_tokens[did]
        poss = [[i for i, t in enumerate(toks) if t == w] for w in tokens]
        if any(not p for p in poss):
            continue
        for cfg in product(*poss):
            if len(set(cfg)) < m:
                continue
            adj = [p - i for i, p in enumerate(cfg)]
            if max(adj) - min(adj) <= slop:
                out[ci] = True
                break
    return out


def _pdata_from_docs(doc_tokens: dict[int, list[str]], vocab):
    """term -> (sorted doc_ids, tfs, flat doc-major positions) — the shape
    the kernel hands the matcher."""
    pdata = {}
    for w in vocab:
        docs, tfs, flat = [], [], []
        for did in sorted(doc_tokens):
            pos = [i for i, t in enumerate(doc_tokens[did]) if t == w]
            if pos:
                docs.append(did)
                tfs.append(len(pos))
                flat.extend(pos)
        pdata[w] = (
            np.array(docs, dtype=np.int64),
            np.array(tfs, dtype=np.int64),
            np.array(flat, dtype=np.int64),
        )
    return pdata


def test_phrase_matcher_fuzz():
    rng = random.Random(404)
    vocab = list("abcdef")
    for trial in range(60):
        n_docs = rng.randint(1, 12)
        doc_tokens = {
            # negative and positive doc ids, like xxhash64 output
            (rng.randrange(-(2**62), 2**62)): [
                rng.choice(vocab) for _ in range(rng.randint(1, 30))
            ]
            for _ in range(n_docs)
        }
        m = rng.randint(1, 4)
        tokens = [rng.choice(vocab) for _ in range(m)]
        slop = rng.choice([0, 0, 1, 2, 5])
        pdata = _pdata_from_docs(doc_tokens, set(tokens))
        # candidates: docs containing every phrase token (the kernel's
        # must-intersection), sorted
        cand = np.array(
            sorted(
                d
                for d, toks in doc_tokens.items()
                if all(w in toks for w in tokens)
            ),
            dtype=np.int64,
        )
        got = _phrase_match_mask(cand, tokens, slop, pdata)
        want = _brute(doc_tokens, cand, tokens, slop)
        assert np.array_equal(got, want), (
            trial, tokens, slop,
            {d: doc_tokens[d] for d in cand[got != want]},
        )


def test_phrase_matcher_reordering_costs():
    """Canonical Lucene examples: 'b a' needs slop 2; 'a x b' needs 1."""
    doc_tokens = {1: ["b", "a"], 2: ["a", "x", "b"], 3: ["a", "b"]}
    pdata = _pdata_from_docs(doc_tokens, {"a", "b"})
    cand = np.array([1, 2, 3], dtype=np.int64)
    assert _phrase_match_mask(cand, ["a", "b"], 0, pdata).tolist() == [
        False, False, True,
    ]
    assert _phrase_match_mask(cand, ["a", "b"], 1, pdata).tolist() == [
        False, True, True,
    ]
    assert _phrase_match_mask(cand, ["a", "b"], 2, pdata).tolist() == [
        True, True, True,
    ]


def test_phrase_matcher_repeated_token_distinctness():
    """'a a' requires two DISTINCT occurrences within the window."""
    doc_tokens = {1: ["a", "b", "a"], 2: ["a", "b", "c"]}
    pdata = _pdata_from_docs(doc_tokens, {"a"})
    cand = np.array([1, 2], dtype=np.int64)
    # span of (p0, p1-1): doc1 picks (0,2)->adj (0,1) span 1
    assert _phrase_match_mask(cand, ["a", "a"], 1, pdata).tolist() == [
        True, False,
    ]
    assert _phrase_match_mask(cand, ["a", "a"], 0, pdata).tolist() == [
        False, False,
    ]


def test_phrase_matcher_repeated_token_adversarial():
    """Heavy-repetition phrases (the case the r4 matcher capped at
    _MAX_REPEAT_CONFIGS and enumerated exponentially): the interval-
    matching path must agree with brute force on dense repeated-token
    docs, with no cap to hit."""
    rng = random.Random(99)
    for trial in range(40):
        vocab = ["a", "b"] if trial % 2 else ["a", "b", "c"]
        doc_tokens = {
            did: [rng.choice(vocab) for _ in range(rng.randint(4, 18))]
            for did in range(rng.randint(1, 6))
        }
        m = rng.randint(2, 5)
        # mostly-repeated phrase: token 'a' dominates
        tokens = [rng.choice(["a", "a", "a", "b"]) for _ in range(m)]
        slop = rng.choice([0, 1, 2, 4, 8])
        pdata = _pdata_from_docs(doc_tokens, set(tokens))
        cand = np.array(
            sorted(
                d
                for d, toks in doc_tokens.items()
                if all(w in toks for w in tokens)
            ),
            dtype=np.int64,
        )
        got = _phrase_match_mask(cand, tokens, slop, pdata)
        want = _brute(doc_tokens, cand, tokens, slop)
        assert np.array_equal(got, want), (
            trial, tokens, slop,
            {d: doc_tokens[d] for d in cand[got != want]},
        )


def test_phrase_matcher_no_cap_on_dense_doc():
    """A single pathological doc (40 occurrences of one token, phrase
    'a a a a a a') would have exceeded the old 100k-config cap by orders
    of magnitude; the interval matcher answers directly."""
    doc_tokens = {7: ["a"] * 40}
    pdata = _pdata_from_docs(doc_tokens, {"a"})
    cand = np.array([7], dtype=np.int64)
    tokens = ["a"] * 6
    # consecutive run of 6 'a's exists -> slop 0 matches
    assert _phrase_match_mask(cand, tokens, 0, pdata).tolist() == [True]
    doc_tokens = {7: (["a", "x"] * 20)}
    pdata = _pdata_from_docs(doc_tokens, {"a"})
    # 'a's at even positions: 6 distinct a's need span 10 > slop 4
    assert _phrase_match_mask(cand, tokens, 4, pdata).tolist() == [False]
    assert _phrase_match_mask(cand, tokens, 5, pdata).tolist() == [True]
