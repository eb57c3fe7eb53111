"""Word n-gram counting and conditional LM (operators/textstats.py:
ngram_counts / ngram_lm): hand-computed parity on a tiny corpus,
distribution properties, and the short-doc guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators import textstats


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the cat ran"),
            (2, "a dog sat"),
            (3, "single"),
            (4, ""),
        ],
        "doc_id long, text string",
    )


def test_bigram_counts_by_hand(docs):
    got = {
        r["ngram"]: r["c"]
        for r in textstats.ngram_counts(docs, n=2).collect()
    }
    assert got == {
        "the cat": 2,
        "cat sat": 1,
        "sat on": 1,
        "on the": 1,
        "the mat": 1,
        "cat ran": 1,
        "a dog": 1,
        "dog sat": 1,
    }


def test_unigram_counts_include_short_docs(docs):
    got = {
        r["ngram"]: r["c"]
        for r in textstats.ngram_counts(docs, n=1).collect()
    }
    assert got["the"] == 3 and got["single"] == 1
    # the empty doc tokenizes to [""] — one empty token, counted as-is
    assert got.get("", 0) == 1


def test_trigram_counts(docs):
    got = {
        r["ngram"]: r["c"]
        for r in textstats.ngram_counts(docs, n=3).collect()
    }
    assert got["the cat sat"] == 1 and got["cat sat on"] == 1
    assert "the cat ran" in got and "a dog sat" in got
    assert len(got) == 6  # docs 3/4 too short to contribute


def test_lm_is_proper_distribution(docs):
    lm = textstats.ngram_lm(docs, n=2).collect()
    by_prefix: dict = {}
    for r in lm:
        by_prefix.setdefault(r["prefix"], []).append(r)
    # "the" continues with cat(2) and mat(1): p = 2/3, 1/3
    the = {r["word"]: r["p"] for r in by_prefix["the"]}
    assert the == {"cat": pytest.approx(2 / 3), "mat": pytest.approx(1 / 3)}
    for rows in by_prefix.values():
        assert sum(r["p"] for r in rows) == pytest.approx(1.0)
        assert all(r["c_prefix"] == sum(x["c"] for x in rows) for r in rows)


def test_min_count_prunes_after_normalization(docs):
    lm = textstats.ngram_lm(docs, n=2, min_count=2).collect()
    assert [(r["prefix"], r["word"], r["c"], r["p"]) for r in lm] == [
        ("the", "cat", 2, pytest.approx(2 / 3))
    ]  # p keeps the pre-cut denominator


def test_plan_is_udf_free(docs):
    plan = textstats.ngram_lm(docs, n=2)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_compression_ratio_separates_entropy_bands(spark):
    """Repetitive boilerplate compresses hard, random hex refuses to,
    prose sits between — the two-sided band the filter gates on."""
    import random

    random.seed(5)
    rep = "click here to win " * 60
    prose = (
        "The committee reviewed the proposal in detail and concluded "
        "that further analysis of the revenue projections was required "
        "before any commitment could be made to the expanded program."
    ) * 4
    noise = "".join(random.choice("0123456789abcdef") for _ in range(1000))
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, noise), (4, None), (5, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["cr"]
        for r in df.select(
            "doc_id", textstats.compression_ratio("text").alias("cr")
        ).collect()
    }
    assert got[1] < got[2] < got[3]
    assert got[1] < 0.15 and got[3] > 0.5
    assert got[4] is None and got[5] is None


def _brute_rouge2(ta: str, tb: str):
    from collections import Counter

    def bg(t):
        w = t.split()
        return Counter(tuple(w[i : i + 2]) for i in range(len(w) - 1))

    ca, cb = bg(ta), bg(tb)
    ov = sum(min(ca[g], cb[g]) for g in ca.keys() & cb.keys())
    ta_n, tb_n = sum(ca.values()), sum(cb.values())
    p, r = ov / tb_n, ov / ta_n
    f1 = 0.0 if ov == 0 else 2 * p * r / (p + r)
    return ov, round(p, 6), round(r, 6), round(f1, 6)


def test_rouge_n_pairs_matches_bruteforce(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on a mat"),
        (2, "a dog ran far away today"),
        (3, "the cat sat on the mat"),  # exact dup of 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): (
            r["overlap"], r["rouge_p"], r["rouge_r"], r["rouge_f1"]
        )
        for r in textstats.rouge_n_pairs(docs, pairs, n=2).collect()
    }
    text = dict(rows)
    assert set(got) == {(0, 1), (0, 2), (0, 3)}
    for a, b in got:
        assert got[(a, b)] == _brute_rouge2(text[a], text[b])
    # identical docs → perfect scores; disjoint docs → zeros
    assert got[(0, 3)][1:] == (1.0, 1.0, 1.0)
    assert got[(0, 2)] == (0, 0.0, 0.0, 0.0)


def test_rouge_drops_pairs_without_bigrams(spark):
    docs = spark.createDataFrame(
        [(0, "two words"), (1, "single")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    # doc 1 has no bigrams: the pair has no defined ROUGE-2 → dropped,
    # mirroring the oracle's inner join on per-doc totals
    assert textstats.rouge_n_pairs(docs, pairs, n=2).count() == 0


def test_zipf_profile_counts_by_hand(spark):
    docs = spark.createDataFrame(
        [
            (0, "a a a a b b c"),
            (1, "a b d"),
        ],
        "doc_id long, text string",
    )
    row = textstats.zipf_profile(docs).collect()[0]
    # tokens: a×5 b×3 c×1 d×1 → vocab 4, total 10, hapax 2
    assert row["vocab_size"] == 4
    assert row["total_tokens"] == 10
    assert row["hapax_count"] == 2
    assert row["ttr"] == 0.4
    # ranks: a(1,5) b(2,3) c(3,1) d(4,1) — slope must be negative
    assert row["zipf_slope"] < 0


def test_zipf_profile_natural_corpus_slope(spark, sf_dir):
    from data_pipeline_demo_spark.sources.tables import table

    row = textstats.zipf_profile(table(spark, sf_dir, "documents")).collect()[0]
    assert row["vocab_size"] > 0 and row["hapax_count"] >= 0
    assert 0 < row["ttr"] < 1
    assert row["zipf_slope"] < 0  # frequency decays with rank
