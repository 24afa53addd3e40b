"""SpellChecker-style suggestions + MoreLikeThis over the index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import katta_spark.build as ksb
import katta_spark.query as ksq
from katta_spark.oracle import bm25_topk, with_doc_ids


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    rows = [
        (1, 1, "server serve search searh cluster"),
        (1, 2, "server cluster deploy"),
        (2, 1, "server search index shard"),
        (2, 2, "serverless swerve search"),
        (3, 1, "zookeeper quorum leader election"),
        (3, 2, "rare unique zebra quagga"),
    ]
    docs = spark.createDataFrame(
        [(f"c{c}", t, txt) for c, t, txt in rows],
        "conv_id string, turn_idx int, text string",
    )
    d = str(tmp_path_factory.mktemp("sgst") / "idx")
    ksb.build_index(spark, docs, d, num_shards=2)
    return d, docs


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def test_suggest_terms_matches_reference_ranking(spark, idx):
    d, _ = idx
    h = ksq.IndexHandle.open(spark, d)
    vocab = {
        r["term"]: r["df"]
        for r in h.stats(spark).where(~F.col("term").contains(":")).collect()
    }
    for word, me in (("serve", 1), ("serch", 2), ("sever", 2)):
        want = sorted(
            (
                (t, df, _lev(t, word))
                for t, df in vocab.items()
                if t != word and _lev(t, word) <= me
            ),
            key=lambda x: (x[2], -x[1], x[0]),
        )[:5]
        got = [
            (r.term, r.df, r.distance)
            for r in ksq.suggest_terms(spark, d, word, k=5, max_edits=me).collect()
        ]
        assert got == want, (word, me)


def test_suggest_terms_refusals_and_exclusions(spark, idx):
    d, _ = idx
    # the word itself never appears even when it is in the dictionary
    assert "server" not in {
        r.term for r in ksq.suggest_terms(spark, d, "server", k=50).collect()
    }
    # keyword field:value terms are excluded by construction (none here,
    # but the filter is structural); multi-token input refused
    with pytest.raises(ValueError, match="one analyzed term"):
        ksq.suggest_terms(spark, d, "two words")
    with pytest.raises(ValueError, match="max_edits"):
        ksq.suggest_terms(spark, d, "server", max_edits=3)


def test_more_like_this_finds_the_similar_doc(spark, idx):
    d, docs = idx
    # seed text shares the rare terms of conv 3 turn 2
    hits = ksq.more_like_this(
        spark, d, "the zebra and the quagga are rare and unique", k=3
    ).collect()
    assert hits
    ids = with_doc_ids(docs, num_shards=2)
    rare_doc = ids.where(F.col("text").contains("zebra")).collect()[0].doc_id
    assert hits[0].doc_id == rare_doc


def test_more_like_this_rank_identity_and_exclude(spark, idx):
    """MLT == plain BM25 search over its (deterministic) derived query —
    checked against the brute-force oracle, boosted and unboosted; the
    seed doc drops out with exclude_doc_id."""
    d, docs = idx
    ids = with_doc_ids(docs, num_shards=2)
    seed = ids.where(F.col("text").contains("serverless")).collect()[0]
    for boost in (False, True):
        hits = ksq.more_like_this(
            spark, d, seed.text, k=4, boost=boost
        ).collect()
        # derive the same query the operator derives
        h = ksq.IndexHandle.open(spark, d)
        import math
        from collections import Counter

        from katta_spark.tokenizer import tokenize_str

        tf = Counter(tokenize_str(seed.text))
        dfs = {
            r["term"]: r["df"]
            for r in h.stats(spark).where(F.col("term").isin(list(tf))).collect()
        }
        scored = sorted(
            ((t, tf[t] * math.log(h.n_docs / dfs[t]))
             for t in tf if 0 < dfs.get(t, 0) < h.n_docs),
            key=lambda x: (-x[1], x[0]),
        )[:16]
        q = (
            " ".join(f"{t}^{w:.6f}" for t, w in scored)
            if boost else " ".join(t for t, _ in scored)
        )
        want = [
            (r.doc_id, round(r.score, 4))
            for r in bm25_topk(ids, q, k=4, shard_col="shard_id").collect()
        ]
        assert [(r.doc_id, round(r.score, 4)) for r in hits] == want, boost
    ex = ksq.more_like_this(
        spark, d, seed.text, k=4, exclude_doc_id=seed.doc_id
    ).collect()
    assert seed.doc_id not in {r.doc_id for r in ex}


def test_more_like_this_empty_and_unknown_text(spark, idx):
    d, _ = idx
    assert ksq.more_like_this(spark, d, "").count() == 0
    # terms absent from the index -> empty result, not an error
    assert ksq.more_like_this(spark, d, "qqq zzz xxx").count() == 0


def test_term_vectors_match_source_tokens(spark, idx):
    """Full export == tokenizing the source (tf, dl per (doc, term));
    tfidf = tf*ln(N/df); bounded doc_ids fetch == the full export's
    slice; keyword terms excluded by default."""
    import math
    from collections import Counter

    from katta_spark.tokenizer import tokenize_str

    d, docs = idx
    ids = with_doc_ids(docs, num_shards=2)
    rows = ids.select("doc_id", "text").collect()
    n_docs = len(rows)
    tfs: dict[tuple[int, str], int] = {}
    dls: dict[int, int] = {}
    dfc: Counter = Counter()
    for r in rows:
        toks = tokenize_str(r.text)
        dls[r.doc_id] = len(toks)
        c = Counter(toks)
        dfc.update(c.keys())
        for t, n in c.items():
            tfs[(r.doc_id, t)] = n
    want = {
        (doc, t): (n, dls[doc], round(n * math.log(n_docs / dfc[t]), 4))
        for (doc, t), n in tfs.items()
    }
    got = {
        (r.doc_id, r.term): (r.tf, r.dl, r.tfidf)
        for r in ksq.term_vectors(spark, d).collect()
    }
    assert got == want
    # bounded fetch: exactly the requested docs' rows
    some = [rows[0].doc_id, rows[3].doc_id]
    sub = {
        (r.doc_id, r.term): (r.tf, r.dl, r.tfidf)
        for r in ksq.term_vectors(spark, d, doc_ids=some).collect()
    }
    assert sub == {k: v for k, v in want.items() if k[0] in set(some)}
    assert ksq.term_vectors(spark, d, doc_ids=[]).count() == 0


def test_term_vectors_keyword_flag(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "alpha", "fr")],
        "doc_id long, text string, lang string",
    )
    d = str(tmp_path / "kwidx")
    ksb.build_index(
        spark, docs, d, num_shards=2, doc_id_col="doc_id",
        keyword_cols=("lang",),
    )
    plain = {r.term for r in ksq.term_vectors(spark, d).collect()}
    assert plain == {"alpha", "beta"}
    kw = {
        r.term
        for r in ksq.term_vectors(spark, d, keyword_terms=True).collect()
    }
    assert kw == {"alpha", "beta", "lang:en", "lang:fr"}
