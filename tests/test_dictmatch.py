"""Aho-Corasick dictionary matching (operators/dictmatch.py): counts
equal the brute-force all-position scan (overlaps included), overlap/
suffix-chain cases, refusals, and the Spark mapInPandas path."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_demo_spark.operators.dictmatch import (
    build_automaton,
    count_matches,
    dictionary_match,
)


def _brute(text: str, terms: list[str]) -> list[int]:
    return [
        sum(
            1
            for i in range(len(text) - len(t) + 1)
            if text[i : i + len(t)] == t
        )
        for t in terms
    ]


def _ac(text: str, terms: list[str]) -> list[int]:
    goto, out = build_automaton(terms)
    return count_matches(text, goto, out, len(terms))


def test_overlaps_and_suffix_chains():
    terms = ["aa", "aaa", "ab", "b", "ba"]
    text = "aaaabab"
    assert _ac(text, terms) == _brute(text, terms)
    # the textbook case: overlapping self-similar term
    assert _ac("aaaa", ["aa"]) == [3]
    # term that is a suffix of another must fire through the fail chain
    assert _ac("xhers", ["he", "she", "his", "hers"]) == [1, 0, 0, 1]


def test_no_match_and_empty_text():
    assert _ac("", ["ab"]) == [0]
    assert _ac("zzz", ["ab"]) == [0]


def test_refusals():
    with pytest.raises(ValueError):
        build_automaton([])
    with pytest.raises(ValueError):
        build_automaton(["a", ""])
    with pytest.raises(ValueError):
        build_automaton(["a", "a"])


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=4),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    st.text(alphabet="abc", max_size=60),
)
def test_matches_brute_force(terms, text):
    assert _ac(text, terms) == _brute(text, terms)


def test_spark_dictionary_match(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "the table scan"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["term"]): r["n"]
        for r in dictionary_match(docs, ["aa", "table", "a"]).collect()
    }
    assert got == {
        (1, "aa"): 3,
        (1, "a"): 4,
        (2, "table"): 1,
        (2, "a"): 2,  # 'table' + 'scan'
    }
