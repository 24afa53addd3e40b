"""Field-qualified queries over multi-field (keyword) postings.

Reference: Katta parses ``field:term`` with a KeywordAnalyzer QueryParser
(Katta.java:825-826); documents carry NOT_ANALYZED keyword fields next to
the analyzed text (tool/SampleIndexGenerator.java:75-78), and
field-restricted search is exercised throughout LuceneClientTest.java
(e.g. :562-617). Here: ``role``/``tool`` are keyword fields of the
transcripts corpus, indexed as ``field:value`` terms with tf=1, dl=1 and
their own df/idf — scored by the same BM25 kernels, verified against the
brute-force DataFrame oracle with identical field semantics.
"""

from __future__ import annotations

import numpy as np
import pytest

from katta_spark.build import build_index
from katta_spark.oracle import bm25_topk, with_doc_ids
from katta_spark.query import count_matches, parse_query, search

KW = ("role", "tool")


@pytest.fixture(scope="module")
def fidx(spark, tiny_transcripts, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("field_idx"))
    build_index(spark, tiny_transcripts, d, num_shards=4, keyword_cols=KW)
    return d


@pytest.fixture(scope="module")
def docs(tiny_transcripts):
    return with_doc_ids(tiny_transcripts, 4).cache()


def test_parse_query_field_terms():
    qw = parse_query("role:user hotalpha role:user w00011", KW)
    assert qw == {"role:user": 2.0, "hotalpha": 1.0, "w00011": 1.0}
    # field values are matched verbatim, case preserved (KeywordAnalyzer)
    assert parse_query("role:USER", KW) == {"role:USER": 1.0}
    # a colon token whose prefix is NOT a declared keyword field falls back
    # to the analyzer — 'http://example.com' must not become an unmatchable
    # verbatim term (it would empty AND-mode queries)
    assert parse_query("http://example.com", KW) == {
        "http": 1.0, "example": 1.0, "com": 1.0,
    }
    assert parse_query("role:user", ()) == {"role": 1.0, "user": 1.0}


@pytest.mark.parametrize(
    "query",
    [
        "role:user hotalpha",
        "role:tool w00011 hotbeta",
        "role:user role:user hotalpha",  # duplicated field term, 2x weight
        "role:nosuchrole hotalpha",  # absent field value
        "role:user",  # field-only query
    ],
)
def test_field_query_rank_identity(spark, fidx, docs, query):
    got = search(spark, fidx, query, k=10).collect()
    want = bm25_topk(
        docs, query, k=10, shard_col="shard_id", keyword_cols=KW
    ).collect()
    assert [(r.doc_id, r.shard_id) for r in got] == [
        (r.doc_id, r.shard_id) for r in want
    ], query
    np.testing.assert_allclose(
        np.array([r.score for r in got], np.float32),
        np.array([r.score for r in want], np.float32),
        rtol=2e-6,
    )


def test_field_conjunctive_restricts(spark, fidx, docs, tiny_transcripts):
    """AND-mode with a field term = field-restricted search: every hit has
    the field value."""
    hits = search(spark, fidx, "role:user hotalpha", k=50, mode="and")
    joined = hits.join(docs, ["doc_id", "shard_id"])
    rows = joined.select("role").collect()
    assert rows and all(r.role == "user" for r in rows)


def test_field_count_matches(spark, fidx, docs):
    n = count_matches(spark, fidx, "role:user")
    want = docs.where(docs.role == "user").count()
    assert n == want


def test_resume_with_different_keyword_cols_refuses(spark, fidx, tiny_transcripts):
    """A fully-committed index resumed with different keyword_cols would
    serve stale postings — the build must refuse."""
    with pytest.raises(ValueError, match="keyword_cols"):
        build_index(spark, tiny_transcripts, fidx, num_shards=4)  # no fields


def test_partial_resume_with_different_keyword_cols_refuses(
    spark, tiny_transcripts, tmp_path_factory
):
    """The guard must fire for a PARTIAL build too: parameters are persisted
    at build START (BUILD_META.json), so a crashed build resumed with
    different keyword_cols refuses before mixing batches — not only after
    all batches are done."""
    import os
    import shutil

    d = str(tmp_path_factory.mktemp("partial_idx"))
    build_index(spark, tiny_transcripts, d, num_shards=4, keyword_cols=KW)
    # simulate a crash after batch commits but before phase 3 finished
    shutil.rmtree(os.path.join(d, "stats.parquet"))
    with pytest.raises(ValueError, match="keyword_cols"):
        build_index(spark, tiny_transcripts, d, num_shards=4)  # no fields


def test_avgdl_zero_guard(spark, tmp_path_factory):
    """All-empty analyzed text + non-null keyword fields: avgdl would be 0
    and keyword-term scores would divide by zero — the build persists
    avgdl=1.0 (mirroring the oracle's guard) and field search stays finite."""
    import math
    import os

    d = str(tmp_path_factory.mktemp("empty_text_idx"))
    rows = [(f"c{i}", 0, "", "user") for i in range(20)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, role string"
    )
    build_index(spark, df, d, num_shards=2, keyword_cols=("role",))
    row = spark.read.parquet(os.path.join(d, "corpus.parquet")).collect()[0]
    assert row["avgdl"] == 1.0
    hits = search(spark, d, "role:user", k=5).collect()
    assert hits and all(math.isfinite(r.score) and r.score > 0 for r in hits)


def test_avgdl_excludes_keyword_fields(spark, fidx, tiny_transcripts, tmp_path_factory):
    """Keyword postings must not shift avgdl: an index with and without
    keyword fields reports the same corpus scalars."""
    import os

    from pyspark.sql import functions as F

    d2 = str(tmp_path_factory.mktemp("nofield_idx"))
    build_index(spark, tiny_transcripts, d2, num_shards=4)
    a = spark.read.parquet(os.path.join(fidx, "corpus.parquet")).collect()[0]
    b = spark.read.parquet(os.path.join(d2, "corpus.parquet")).collect()[0]
    assert a["n_docs"] == b["n_docs"]
    assert a["avgdl"] == pytest.approx(b["avgdl"], rel=1e-12)
    assert list(a["keyword_fields"]) == ["role", "tool"]


# ---- term-range queries (Lucene QueryParser field:[lo TO hi] — the full
# parser surface Katta exposes, Katta.java:825-826; TermRangeQuery compares
# term text lexicographically)


def test_expand_ranges_inclusive_exclusive_open(spark, fidx):
    from katta_spark.query import IndexHandle, expand_ranges

    ix = IndexHandle.open(spark, fidx)
    # roles present: assistant, system, tool, user (lexicographic order)
    assert expand_ranges(spark, ix, "role:[system TO user]") == {
        "role:system": 1.0, "role:tool": 1.0, "role:user": 1.0,
    }
    assert expand_ranges(spark, ix, "role:{system TO user}") == {
        "role:tool": 1.0,
    }
    assert expand_ranges(spark, ix, "role:[tool TO *]") == {
        "role:tool": 1.0, "role:user": 1.0,
    }
    # bare range = analyzed default field; plain terms compose
    qw = expand_ranges(spark, ix, "[w00010 TO w00012] hotalpha")
    assert qw == {
        "w00010": 1.0, "w00011": 1.0, "w00012": 1.0, "hotalpha": 1.0,
    }


def test_range_query_rank_identity(spark, fidx, docs):
    got = search(spark, fidx, "role:[system TO user] hotalpha", k=10).collect()
    want = bm25_topk(
        docs, "role:system role:tool role:user hotalpha", k=10,
        shard_col="shard_id", keyword_cols=KW,
    ).collect()
    assert [(r.doc_id, r.shard_id) for r in got] == [
        (r.doc_id, r.shard_id) for r in want
    ]
    np.testing.assert_allclose(
        np.array([r.score for r in got], np.float32),
        np.array([r.score for r in want], np.float32),
        rtol=2e-6,
    )


def test_range_guards(spark, fidx):
    from katta_spark.query import IndexHandle, expand_ranges

    ix = IndexHandle.open(spark, fidx)
    with pytest.raises(ValueError, match="unknown keyword field"):
        expand_ranges(spark, ix, "lang:[a TO z]")
    with pytest.raises(ValueError, match="more than 1 terms"):
        expand_ranges(spark, ix, "role:[a TO z]", max_expansions=1)


def test_pattern_wildcards(spark, fidx):
    """General WildcardQuery patterns: mid-pattern * and single-char ?;
    leading wildcards refused like Lucene's QueryParser default."""
    import re

    from katta_spark.query import IndexHandle, expand_wildcards

    ix = IndexHandle.open(spark, fidx)
    vocab = [
        r["term"]
        for r in ix.stats(spark).select("term").collect()
        if ":" not in r["term"]
    ]
    for pat in ("w00*1", "w0001?", "h?talpha", "w*9*"):
        rx = re.compile(
            "^" + pat.replace("*", "[a-z0-9]*").replace("?", "[a-z0-9]") + "$"
        )
        got = set(expand_wildcards(spark, ix, pat))
        want = {t for t in vocab if rx.fullmatch(t)}
        assert got == want, (pat, got ^ want)
        assert want, pat  # each pattern matches something in the fixture
    with pytest.raises(ValueError, match="leading wildcard"):
        expand_wildcards(spark, ix, "*alpha")
    with pytest.raises(ValueError, match="leading wildcard"):
        expand_wildcards(spark, ix, "?otalpha")


def test_invalid_fuzzy_distance_refused(spark, fidx):
    """ADVICE r3: 'term~3' / malformed rewrite clauses must error, never
    silently tokenize ('term~3' would otherwise score the literal token
    '3' — Lucene rejects maxEdits > 2)."""
    from katta_spark.query import IndexHandle, expand_wildcards

    ix = IndexHandle.open(spark, fidx)
    for bad in ("hotalpha~3", "hotalpha~12", "hot~alpha", "a~b*c"):
        with pytest.raises(ValueError, match="invalid wildcard/fuzzy"):
            expand_wildcards(spark, ix, bad)
    # valid forms still parse: explicit distance and default-2 shorthand
    assert expand_wildcards(spark, ix, "hotalpha~0") == {"hotalpha": 1.0}
    assert "hotalpha" in expand_wildcards(spark, ix, "hotalpha~")


def test_range_remainder_inherits_cap(spark, fidx):
    """ADVICE r3: the non-range remainder of a range query must honor the
    caller's max_expansions (it used to fall back to the default cap)."""
    from katta_spark.query import IndexHandle, expand_ranges

    ix = IndexHandle.open(spark, fidx)
    with pytest.raises(ValueError, match="more than 1 terms"):
        # 'w*' expands to many terms; the cap must reach the wildcard
        expand_ranges(spark, ix, "role:[user TO user] w*", max_expansions=1)


def test_field_grouping_residue_refused(spark, fidx):
    """Plain field groups distribute (test_field_group_distribution);
    the UNDISTRIBUTED residue — nested-group members — must still raise,
    not score the WORD 'role' as a term (ADVICE r3 guard, narrowed)."""
    from katta_spark.query import parse_tree_query

    with pytest.raises(ValueError, match="field grouping"):
        parse_tree_query("role:((user) admin)", KW)


def test_spaced_field_colon_lucene_parity(spark, fidx):
    """Lucene's QueryParser accepts whitespace after the field colon — the
    reference's own tests query exactly "foo: bar" / "content: the" /
    "foo: b*" (LuceneServerTest.java, LuceneClientTest.java) — so every
    spaced form must parse and rank identically to the folded one."""
    from katta_spark.query import fold_spaced_fields, parse_bool_query

    # parser-level
    assert parse_query("role: user hotalpha", KW) == parse_query(
        "role:user hotalpha", KW
    )
    assert parse_bool_query("+role: user -tool: web", KW) == parse_bool_query(
        "+role:user -tool:web", KW
    )
    # unknown field: fold then analyzed fallback == unfolded tokens
    assert parse_query("nosuch: thing", KW) == {"nosuch": 1.0, "thing": 1.0}
    # folding onto a quote feeds the field-quoted-value branch; for an
    # UNDECLARED field the fallback re-emits the prefix, so semantics are
    # unchanged vs the unfolded parse
    assert fold_spaced_fields('say: "a b"') == 'say:"a b"'
    assert parse_bool_query('say:"a b"', KW) == parse_bool_query(
        'say: "a b"', KW
    )
    qw, must, must_not, phrases = parse_bool_query('say:"a b"', KW)
    assert "say" in qw and phrases == [(["a", "b"], 0)]
    # idempotent
    q = "role: user tool: web*"
    assert fold_spaced_fields(fold_spaced_fields(q)) == fold_spaced_fields(q)

    # end-to-end rank identity: spaced == unspaced through search()
    spaced = search(spark, fidx, "role: user hotalpha", k=10).collect()
    tight = search(spark, fidx, "role:user hotalpha", k=10).collect()
    assert [(r.doc_id, r.score) for r in spaced] == [
        (r.doc_id, r.score) for r in tight
    ]
    # wildcard rewrite through the spaced form ("foo: b*" shape)
    sp = search(spark, fidx, "role: use*", k=10).collect()
    ti = search(spark, fidx, "role:use*", k=10).collect()
    assert [(r.doc_id, r.score) for r in sp] == [(r.doc_id, r.score) for r in ti]
    # count path
    assert count_matches(spark, fidx, "role: user") == count_matches(
        spark, fidx, "role:user"
    )


def test_field_qualified_wildcard_fuzzy(spark, fidx, docs):
    """Field-qualified rewrites — the reference's own 'foo: b*' shape
    (LuceneServerTest.java): prefix, pattern, and fuzzy expansion over
    one keyword field's verbatim terms, rank-identical to querying the
    expanded terms directly."""
    want = search(spark, fidx, "role:user hotalpha", k=10).collect()

    for q in ("role:use* hotalpha", "role: use* hotalpha",
              "role:us?r hotalpha", "role:usr~1 hotalpha",
              "role:user~0 hotalpha"):
        got = search(spark, fidx, q, k=10).collect()
        assert [(r.doc_id, r.score) for r in got] == [
            (r.doc_id, r.score) for r in want
        ], q

    # expansion is scoped to the field: role:* must not leak tool: terms
    from katta_spark.query import IndexHandle, expand_wildcards

    h = IndexHandle.open(spark, fidx)
    qw = expand_wildcards(spark, h, "role:u*")
    assert qw and all(t.startswith("role:") for t in qw)
    # leading wildcard in the value refused, like the analyzed branch
    with pytest.raises(ValueError, match="leading wildcard"):
        expand_wildcards(spark, h, "role:*ser")
    # malformed fuzzy distance refused
    with pytest.raises(ValueError, match="invalid field-qualified"):
        expand_wildcards(spark, h, "role:user~3")


def test_keyword_quoted_value(spark, tmp_path_factory):
    """KeywordAnalyzer semantics for quoted field values — the only way
    to query keyword values containing whitespace: tool:"web search" is
    ONE verbatim term (no positions needed), +/- occur flags apply, and
    undeclared-field quotes keep the analyzed-phrase fallback."""
    from pyspark.sql import functions as F

    from katta_spark.oracle import with_doc_ids
    from katta_spark.query import parse_bool_query
    from katta_spark.synth import synth_transcripts

    base = synth_transcripts(spark, 60, seed=11)
    docs = base.withColumn(
        "tool",
        F.when(F.col("turn_idx") % 3 == 0, F.lit("web search")).otherwise(
            F.lit("calc"),
        ),
    )
    d = str(tmp_path_factory.mktemp("kwq_idx"))
    build_index(spark, docs, d, num_shards=2, keyword_cols=("tool",))

    ids = with_doc_ids(docs, 2)
    want = {r.doc_id for r in ids.where("tool = 'web search'").collect()}

    # parser: one verbatim term, spaces+case preserved
    qw, must, must_not, ph = parse_bool_query('tool:"web search"', ("tool",))
    assert qw == {"tool:web search": 1.0} and not must and not ph

    hits = {r.doc_id for r in search(
        spark, d, 'tool:"web search"', k=100).collect()}
    assert hits == want
    # spaced form identical
    hits2 = {r.doc_id for r in search(
        spark, d, 'tool: "web search"', k=100).collect()}
    assert hits2 == want
    # MUST_NOT excludes exactly those docs
    neg = {r.doc_id for r in search(
        spark, d, 'hotalpha -tool:"web search"', k=1000).collect()}
    assert neg and not (neg & want)
    # MUST composes with text terms
    pos = {r.doc_id for r in search(
        spark, d, '+tool:"web search" hotalpha', k=1000).collect()}
    assert pos <= want
    # slop on a keyword value is refused
    with pytest.raises(ValueError, match="slop on keyword field value"):
        search(spark, d, 'tool:"web search"~2', k=10)
    # count path agrees
    assert count_matches(spark, d, 'tool:"web search"') == len(want)


def test_field_group_distribution(spark, fidx, docs):
    """Lucene field grouping: role:(user assistant) distributes the field
    over the group, flags and group boosts carried onto each member."""
    from katta_spark.query import fold_spaced_fields

    assert fold_spaced_fields("role:(user assistant)") == (
        "(role:user role:assistant)"
    )
    assert fold_spaced_fields("role:(user OR assistant)^2") == (
        "(role:user^2 OR role:assistant^2)"
    )
    assert fold_spaced_fields("role:(+user -tool)") == (
        "(+role:user -role:tool)"
    )
    # member's own boost wins over the group's
    assert fold_spaced_fields("role:(user^3 assistant)^2") == (
        "(role:user^3 role:assistant^2)"
    )
    # quoted bodies and nested parens are left alone
    assert fold_spaced_fields('role:("a b" c)') == 'role:("a b" c)'
    # spaced colon before the group folds first
    assert fold_spaced_fields("role: (user assistant)") == (
        "(role:user role:assistant)"
    )

    # end-to-end: group == explicit OR tree == flat two-term query ranks
    want = search(spark, fidx, "(role:user OR role:assistant)", k=10).collect()
    got = search(spark, fidx, "role:(user assistant)", k=10).collect()
    assert [(r.doc_id, r.score) for r in got] == [
        (r.doc_id, r.score) for r in want
    ]
    got2 = search(spark, fidx, "role:(user OR assistant)", k=10).collect()
    assert [(r.doc_id, r.score) for r in got2] == [
        (r.doc_id, r.score) for r in want
    ]


def test_snippets_kwic(spark, fidx, tiny_transcripts):
    """Keyword-in-context snippets on getDetails output — hand-checked
    window, case-insensitivity, no-match empty, end-to-end join shape."""
    from katta_spark.query import get_snippets, snippet_col, search

    df = spark.createDataFrame(
        [
            (1, "one two three four TARGET five six seven eight"),
            (2, "TaRgEt leads here"),
            (3, "no match at all"),
            (4, "tail words then target"),
        ],
        ["i", "text"],
    )
    out = {r.i: r.s for r in df.select(
        "i", snippet_col(["target"], before=2, after=2).alias("s")
    ).collect()}
    assert out[1] == "three four TARGET five six"
    assert out[2] == "TaRgEt leads here"
    assert out[3] == ""
    assert out[4] == "words then target"

    # keyword field terms are ignored; empty term list -> empty column
    assert df.select(
        snippet_col(["role:user"]).alias("s")
    ).collect()[0].s == ""

    # end-to-end: snippet contains a query term for every hit
    hits = search(spark, fidx, "hotalpha w00011", k=5)
    snip = get_snippets(
        spark, fidx, "hotalpha w00011", hits, tiny_transcripts
    ).collect()
    assert len(snip) == 5
    for r in snip:
        low = r.snippet.lower()
        assert "hotalpha" in low or "w00011" in low
