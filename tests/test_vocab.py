"""BPE vocabulary induction: reference parity, determinism, encoding."""

from __future__ import annotations

import os
from collections import Counter

import pytest

import katta_spark.vocab as kv
from katta_spark.tokenizer import tokenize_str

SF = "/root/testdata/sf0.001"


def _ref_learn_bpe(texts, n_merges, min_freq=2):
    """Pure-Python Sennrich learn-BPE with the engine's tie-break
    (count DESC, left ASC, right ASC) and left-to-right non-overlapping
    merge application."""
    wf = Counter()
    for t in texts:
        wf.update(tokenize_str(t))
    vocab = {tuple(list(w) + [kv.END_OF_WORD]): c for w, c in wf.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kvp: (-kvp[1], kvp[0]))
        (a, b), cnt = best
        if cnt < min_freq:
            break
        merges.append((a, b, a + b, cnt))
        nv = {}
        for syms, c in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges


@pytest.fixture(scope="module")
def corpus():
    return [
        "lower lower lowest low low low newer newer newest new",
        "wider wide wide widest newer low lower",
        "the newest lowest widest newer newer",
        "",
    ]


def test_learn_bpe_matches_reference(spark, corpus):
    docs = spark.createDataFrame(
        list(enumerate(corpus)), ["doc_id", "text"]
    )
    got = kv.learn_bpe(docs, n_merges=12)
    want = _ref_learn_bpe(corpus, n_merges=12)
    assert got == want
    # merges are well-formed and ranked by the tie-break rule
    assert all(m == a + b for a, b, m, _ in got)
    counts = [c for _, _, _, c in got]
    assert len(got) == 12 and min(counts) >= 2


def test_learn_bpe_partitioning_invariant(spark, corpus):
    """The learned merge list is a pure function of corpus content —
    identical under any input partitioning (the determinism the driver
    loop's tie-break buys)."""
    docs = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    a = kv.learn_bpe(docs, n_merges=8)
    b = kv.learn_bpe(docs.repartition(7), n_merges=8)
    assert a == b


def test_learn_bpe_min_freq_stops_early(spark):
    docs = spark.createDataFrame(
        [(1, "aa ab"), (2, "ba")], ["doc_id", "text"]
    )
    # every adjacent pair occurs at most twice; with min_freq=3 nothing
    # qualifies
    assert kv.learn_bpe(docs, n_merges=5, min_freq=3) == []


def test_apply_bpe_matches_reference_encode(spark, corpus):
    """apply_bpe == per-word rank-order greedy reference; concatenating a
    doc's bpe tokens (sentinel removed) rebuilds its analyzed text."""
    docs = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    merges = kv.learn_bpe(docs, n_merges=10)
    ranks = {(a, b): i for i, (a, b, _, _) in enumerate(merges)}
    rows = {r.doc_id: r for r in kv.apply_bpe(docs, merges).collect()}
    assert set(rows) == set(range(len(corpus)))
    for d, text in enumerate(corpus):
        words = tokenize_str(text)
        want = []
        for w in words:
            want.extend(kv._encode_word(w, ranks))
        r = rows[d]
        assert list(r.bpe_tokens) == want
        assert r.n_words == len(words)
        assert r.n_bpe_tokens == len(want)
        rebuilt = "".join(r.bpe_tokens).replace(kv.END_OF_WORD, " ").split()
        assert rebuilt == words  # lossless over analyzed tokens
        # compression: merges only ever shrink the symbol count
        assert r.n_bpe_tokens <= sum(len(w) + 1 for w in words)


def test_learn_bpe_sample_fraction(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    full = kv.learn_bpe(docs, n_merges=3)
    sampled = kv.learn_bpe(docs, n_merges=3, sample_fraction=0.5)
    assert len(full) == 3 and len(sampled) == 3
    with pytest.raises(ValueError):
        kv.learn_bpe(docs, n_merges=1, sample_fraction=1.5)
