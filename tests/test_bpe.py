"""BPE vocabulary induction + subword tokenization (operators/bpe.py):
hand-computed merge sequence on the classic Sennrich-style corpus,
greedy-rank tokenization, text recoverability, determinism, edges."""

from data_pipeline_demo_spark.operators import bpe


def _corpus(spark):
    # word counts: low x3, lower x2, newest x4, widest x1
    return spark.createDataFrame(
        [
            (1, "low low low"),
            (2, "lower lower newest newest"),
            (3, "newest newest widest"),
        ],
        "doc_id long, text string",
    )


def test_bpe_merge_sequence_hand_computed(spark):
    """First five merges derived by hand from the pair-count table
    (ties break lexicographically): (w,e) 6; (l,o) 5 over the st/t-eow
    tie; (s,t); (st,</w>); (e,we)."""
    model = bpe.bpe_train(_corpus(spark), num_merges=5)
    assert model["merges"] == [
        ["w", "e"],
        ["l", "o"],
        ["s", "t"],
        ["st", "</w>"],
        ["e", "we"],
    ]


def test_bpe_tokenize_greedy_ranks_and_roundtrip(spark):
    df = _corpus(spark)
    model = bpe.bpe_train(df, num_merges=5)
    tok = bpe.bpe_tokenize(df, model)
    rows = {r["doc_id"]: r for r in tok.collect()}
    # greedy lowest-rank application, traced by hand for "newest"
    assert rows[3]["tokens"][:3] == ["n", "ewe", "st</w>"]
    # recoverability: tokens concatenated and split on the EOW marker
    # reproduce the (lowercased) words of every document
    for r in rows.values():
        words = "".join(r["tokens"]).split("</w>")
        assert [w for w in words if w] == r["text"].lower().split()


def test_bpe_deterministic_and_early_stop(spark):
    df = _corpus(spark)
    assert bpe.bpe_train(df, num_merges=5) == bpe.bpe_train(df, num_merges=5)
    # asking for far more merges than repeating pairs exist: early stop,
    # and every learned merge still has its two sides
    model = bpe.bpe_train(df, num_merges=10_000)
    assert len(model["merges"]) < 100
    assert all(len(m) == 2 for m in model["merges"])


def test_bpe_unseen_chars_and_empty_text(spark):
    df = _corpus(spark)
    model = bpe.bpe_train(df, num_merges=5)
    odd = spark.createDataFrame(
        [(1, "zzz"), (2, ""), (3, "newest ZZZ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["tokens"] for r in bpe.bpe_tokenize(odd, model).collect()}
    assert rows[1] == ["z", "z", "z", "</w>"]  # no merges apply, chars survive
    assert rows[2] == []
    assert rows[3][:3] == ["n", "ewe", "st</w>"]  # lowercased then merged


def test_bpe_token_frequencies(spark, sf_dir):
    from data_pipeline_demo_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents")
    model = bpe.bpe_train(docs, num_merges=30)
    freq = bpe.token_frequencies(docs, model, top_k=10)
    rows = freq.collect()
    assert len(rows) == 10
    assert rows[0]["n"] >= rows[-1]["n"]  # ordered
    # the corpus re-tokenized under its own vocabulary must conserve
    # characters: sum over tokens of len(token without EOW) == chars
    import pyspark.sql.functions as F

    tok = bpe.bpe_tokenize(docs, model)
    got = tok.select(
        F.aggregate(
            F.transform(
                "tokens",
                lambda t: F.length(F.replace(t, F.lit("</w>"), F.lit(""))),
            ),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("tok_chars"),
        F.length(F.regexp_replace(F.lower("text"), r"\s+", "")).alias("raw_chars"),
    )
    bad = got.filter(F.col("tok_chars") != F.col("raw_chars")).count()
    assert bad == 0
