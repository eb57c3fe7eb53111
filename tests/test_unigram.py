"""Unigram-LM (SentencePiece-style) tokenizer: EM training, Viterbi
segmentation, coverage and determinism invariants."""

import math

import pytest

from data_pipeline_demo_spark.operators.unigram import (
    _em_step,
    _forward_backward,
    _normalize,
    unigram_token_frequencies,
    unigram_tokenize,
    unigram_train,
    viterbi_segment,
)


def _corpus(spark):
    rows = [
        ("d1", "low low low low low"),
        ("d2", "lower lower newer newer newer"),
        ("d3", "newest newest widest widest"),
        ("d4", "low newer newest wider"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_forward_backward_hand_computed():
    # word "ab" with pieces a, b, ab: two segmentations.
    logp = _normalize({"a": 1.0, "b": 1.0, "ab": 2.0})
    exp, ll = _forward_backward("ab", logp, max_len=2)
    pa, pb, pab = (math.exp(logp[p]) for p in ("a", "b", "ab"))
    want_ll = math.log(pa * pb + pab)
    assert ll == pytest.approx(want_ll, rel=1e-12)
    post_split = pa * pb / (pa * pb + pab)
    assert exp["a"] == pytest.approx(post_split, rel=1e-12)
    assert exp["b"] == pytest.approx(post_split, rel=1e-12)
    assert exp["ab"] == pytest.approx(1 - post_split, rel=1e-12)


def test_em_monotonically_improves_likelihood():
    words = [("abab", 3), ("ab", 5), ("ba", 2)]
    logp = _normalize({"a": 1.0, "b": 1.0, "ab": 1.0, "ba": 1.0, "abab": 1.0})
    lls = []
    for _ in range(5):
        logp, ll = _em_step(words, logp, max_len=4)
        lls.append(ll)
    for prev, nxt in zip(lls, lls[1:]):
        assert nxt >= prev - 1e-9  # the EM guarantee


def test_train_roundtrip_and_frequent_words_become_pieces(spark):
    df = _corpus(spark)
    model = unigram_train(df, vocab_size=40, max_piece_len=6, em_iters=2)
    pieces = model["pieces"]
    assert 0 < len(pieces)
    # single-char coverage of the training alphabet is structural
    alphabet = set("lowernstwid")
    assert alphabet <= {p for p in pieces if len(p) == 1}
    # 'low' appears 6x — with 40 slots the model keeps it whole
    assert "low" in pieces
    # round-trip: every training word's pieces concatenate back
    for w in ["low", "lower", "newer", "newest", "widest", "wider"]:
        segs = viterbi_segment(w, pieces, model["max_piece_len"])
        assert "".join(segs) == w
    # probabilities form a distribution
    assert sum(math.exp(lp) for lp in pieces.values()) == pytest.approx(
        1.0, rel=1e-9
    )


def test_train_deterministic(spark):
    df = _corpus(spark)
    m1 = unigram_train(df, vocab_size=30)
    m2 = unigram_train(df, vocab_size=30)
    assert m1 == m2


def test_vocab_size_respected(spark):
    df = _corpus(spark)
    model = unigram_train(df, vocab_size=15, max_piece_len=6)
    pieces = model["pieces"]
    n_chars = sum(1 for p in pieces if len(p) == 1)
    # chars are never pruned; multi-char pieces fit the remaining slots
    assert len(pieces) <= max(15, n_chars)


def test_tokenize_matches_driver_viterbi_and_memoizes(spark):
    df = _corpus(spark)
    model = unigram_train(df, vocab_size=40, max_piece_len=6)
    out = {
        r.doc_id: r.tokens
        for r in unigram_tokenize(df, model).collect()
    }
    for r in df.collect():
        want = []
        for w in r.text.lower().split():
            want.extend(
                viterbi_segment(w, model["pieces"], model["max_piece_len"])
            )
        assert out[r.doc_id] == want, r.doc_id
        assert "".join(out[r.doc_id]) == r.text.lower().replace(" ", "")


def test_unseen_characters_fall_back_per_char(spark):
    df = _corpus(spark)
    model = unigram_train(df, vocab_size=30)
    probe = spark.createDataFrame([("x", "low zq")], "doc_id string, text string")
    toks = unigram_tokenize(probe, model).first().tokens
    assert "".join(toks) == "lowzq"
    assert "z" in toks and "q" in toks  # unseen chars segment singly


def test_token_frequencies_and_guards(spark):
    df = _corpus(spark)
    model = unigram_train(df, vocab_size=40)
    freq = {
        r.token: r.n
        for r in unigram_token_frequencies(df, model, top_k=5).collect()
    }
    assert len(freq) == 5
    assert max(freq.values()) == freq[max(freq, key=freq.get)]
    with pytest.raises(ValueError, match="vocab_size"):
        unigram_train(df, vocab_size=0)
    with pytest.raises(ValueError, match="prune_ratio"):
        unigram_train(df, vocab_size=10, prune_ratio=1.5)


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id string, text string")
    model = unigram_train(df, vocab_size=10)
    assert model["pieces"] == {}
