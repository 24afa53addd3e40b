"""Property fuzz over the QueryParser canonicalization layer (r5).

Pure-parser tests — no SparkSession — so hypothesis can afford many
examples. Invariants: fold idempotence, spaced==tight parse equality,
field-group distribution == manual expansion, and no parser ever
crashes on grammar-generated input.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from katta_spark.query import (
    fold_spaced_fields,
    parse_bool_query,
    parse_query,
    parse_tree_query,
)

KW = ("role", "tool")

word = st.sampled_from(
    ["user", "assistant", "web", "calc", "hotalpha", "w00011", "the", "Abc9"]
)
fieldname = st.sampled_from(["role", "tool", "nosuch"])
sign = st.sampled_from(["", "+", "-"])
boost = st.sampled_from(["", "^2", "^0.5"])
gap = st.sampled_from(["", " ", "  "])


@st.composite
def clause(draw):
    kind = draw(st.integers(0, 4))
    if kind == 0:
        return draw(word) + draw(boost)
    if kind == 1:  # fielded term, possibly spaced colon
        return (
            draw(sign) + draw(fieldname) + ":" + draw(gap) + draw(word)
            + draw(boost)
        )
    if kind == 2:  # quoted value / phrase, possibly fielded
        fld = draw(st.sampled_from(["", "role:", "tool:", "nosuch:"]))
        body = " ".join(draw(st.lists(word, min_size=1, max_size=3)))
        return draw(st.sampled_from(["", "+"])) + fld + f'"{body}"'
    if kind == 3:  # field group
        members = " ".join(
            draw(sign) + draw(word) + draw(boost)
            for _ in range(draw(st.integers(1, 3)))
        )
        return draw(fieldname) + ":" + draw(gap) + f"({members})" + draw(boost)
    return draw(sign) + draw(word)


queries = st.lists(clause(), min_size=1, max_size=4).map(" ".join)


@settings(max_examples=300, deadline=None)
@given(queries)
def test_fold_idempotent_and_parsers_total(q):
    folded = fold_spaced_fields(q)
    assert fold_spaced_fields(folded) == folded
    # parsers are total on grammar output (ValueError allowed, crash not)
    for fn in (parse_query, parse_bool_query):
        try:
            a = fn(q, KW)
            b = fn(folded, KW)
        except ValueError:
            continue
        assert a == b, (q, folded)
    try:
        ta, _ = parse_tree_query(q, KW)
        tb, _ = parse_tree_query(folded, KW)
        assert ta == tb, (q, folded)
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(["role", "tool"]),
    st.lists(word, min_size=1, max_size=4),
    boost,
)
def test_group_distribution_equals_manual(fld, members, b):
    grouped = f"{fld}:({' '.join(members)}){b}"
    manual = "(" + " ".join(f"{fld}:{m}{b}" for m in members) + ")"
    assert fold_spaced_fields(grouped) == manual
    ta, qa = parse_tree_query(grouped, KW)
    tb, qb = parse_tree_query(manual, KW)
    assert ta == tb and qa == qb


@settings(max_examples=200, deadline=None)
@given(st.sampled_from(["role", "tool"]), st.lists(word, min_size=1,
                                                   max_size=3))
def test_keyword_quoted_value_verbatim(fld, words):
    body = " ".join(words)
    qw, must, must_not, phrases = parse_bool_query(f'{fld}:"{body}"', KW)
    assert qw == {f"{fld}:{body}": 1.0} and not phrases
    # negation routes to must_not, never a negated phrase
    qw2, _, mn2, ph2 = parse_bool_query(f'-{fld}:"{body}"', KW)
    assert mn2 == {f"{fld}:{body}"} and not qw2 and not ph2
