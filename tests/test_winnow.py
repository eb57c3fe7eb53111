"""Winnowing fingerprints (operators/winnow.py): parity with a python
reference implementation of Schleimer et al. 2003, the w+k−1 shared-
substring guarantee, tie/short-text edges, and refusals."""

import random

import pytest

from data_pipeline_demo_spark.operators.winnow import winnow_fingerprints

MOD = 1_000_000_007


def _ref(text: str, k: int, w: int) -> set[tuple[int, int]]:
    n = len(text) - k + 1
    if n < 1:
        return set()
    hs = []
    for i in range(n):
        acc = 0
        for ch in text[i : i + k]:
            acc = (acc * 31 + ord(ch)) % MOD
        hs.append(acc)
    sels = set()
    for t in range(max(n - w + 1, 1)):
        win = hs[t : t + w]
        m = min(win)
        pos = t + max(j for j, h in enumerate(win) if h == m)
        sels.add((pos, hs[pos]))
    return sels


def _got(spark, texts, k, w):
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        out.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    return out


def test_matches_reference_across_shapes(spark):
    random.seed(11)
    texts = [
        (1, "abracadabra abracadabra xyz"),
        (2, "aaaaaaa"),          # all-tie windows: rightmost-min rule
        (3, "ab"),               # shorter than k: no fingerprints
        (4, ""),                 # empty
    ] + [
        (10 + i, "".join(random.choice("abcd ") for _ in range(random.randint(0, 50))))
        for i in range(25)
    ]
    for k, w in ((3, 4), (5, 4), (2, 9), (1, 1)):
        got = _got(spark, texts, k, w)
        for did, t in texts:
            assert got.get(did, set()) == _ref(t, k, w), (did, k, w)


def test_shared_substring_guarantee(spark):
    """The paper's theorem: two documents sharing a substring of length
    >= w + k - 1 share at least one fingerprint VALUE."""
    k, w = 5, 4
    random.seed(3)
    shared = "the quick brown fox jumped over it"  # len 34 >= 8
    texts = [
        (1, "PREFIXA " + shared + " SUFFIXB"),
        (2, "zzz" + shared + "qqqqqqq"),
    ]
    got = _got(spark, texts, k, w)
    fps1 = {fp for _, fp in got[1]}
    fps2 = {fp for _, fp in got[2]}
    assert fps1 & fps2
    # and two documents with no shared >= k substring share nothing
    got2 = _got(spark, [(1, "aaaabbbb"), (2, "ccccdddd")], k, w)
    assert not ({fp for _, fp in got2[1]} & {fp for _, fp in got2[2]})


def test_density_bound(spark):
    """Selected fingerprints per doc are far fewer than k-gram count
    (expected ~2/(w+1) of positions) but at least n/w (every window
    selects something)."""
    text = "the quick brown fox jumps over the lazy dog " * 10
    got = _got(spark, [(1, text)], 5, 8)
    n_grams = len(text) - 5 + 1
    n_sel = len(got[1])
    assert n_sel <= n_grams // 2
    assert n_sel >= (n_grams - 8 + 1) // 8


def test_refuses_bad_params(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)
