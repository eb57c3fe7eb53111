"""End-to-end corpus preparation: every stage must leave its fingerprint
on a corpus engineered to trigger all six."""

from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators import corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and it is a fine day "
    "in the park with many words to read and enjoy together"
)


def _docs(spark):
    rows = [
        # near-dup pair: differ only in a PII email -> scrub collapses
        # them to EXACT dups; min id 1 survives
        (1, GOOD + " contact alice@example.com now"),
        (2, GOOD + " contact bob@sample.org now"),
        # exact dup of 4 (min id 4 survives); text shares no shingles
        # with the GOOD family so it is NOT a near-dup of group 1
        (4, "one small step for a man and one giant leap for all of the "
            "kind people who watch the night sky from their quiet homes"),
        (5, "one small step for a man and one giant leap for all of the "
            "kind people who watch the night sky from their quiet homes"),
        # independent survivor
        (6, GOOD + " a genuinely different ending about ships and the sea"),
        # low quality: too short -> dropped by the gate
        (7, "tiny."),
        # non-English -> dropped by the gate
        (8, "el rapido zorro marron salta sobre el perro perezoso y es un "
            "buen dia en el parque con muchas palabras para leer"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prepare_training_corpus_stages(spark):
    out = corpus.prepare_training_corpus(
        _docs(spark), corpus.CorpusConfig(pack_budget=64, num_shards=2)
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {1, 4, 6}
    # PII was scrubbed in the surviving text
    assert "alice@example.com" not in by_id[1]["text"]
    assert "<EMAIL>" in by_id[1]["text"]
    # packing fields present and consistent: offsets start below budget
    for r in out:
        assert r["n_tokens"] > 0
        assert r["pack_id"] is not None and r["pack_offset"] >= 0


def test_prepare_corpus_sampling_is_subset_and_deterministic(spark):
    cfg_all = corpus.CorpusConfig(pack_budget=64, num_shards=2)
    cfg_half = corpus.CorpusConfig(
        sample_fraction=0.5, pack_budget=64, num_shards=2
    )
    full = {r["doc_id"] for r in
            corpus.prepare_training_corpus(_docs(spark), cfg_all).collect()}
    half1 = {r["doc_id"] for r in
             corpus.prepare_training_corpus(_docs(spark), cfg_half).collect()}
    half2 = {r["doc_id"] for r in
             corpus.prepare_training_corpus(_docs(spark), cfg_half).collect()}
    assert half1 == half2  # replay-safe
    assert half1 <= full


def test_exact_dedup_rows_keeps_full_row(spark):
    df = spark.createDataFrame(
        [(3, "same text", "x"), (1, "same text", "y"), (2, "other", "z")],
        "doc_id long, text string, extra string",
    )
    got = {
        r["doc_id"]: r["extra"]
        for r in __import__(
            "data_pipeline_demo_spark.operators.dedup", fromlist=["dedup"]
        ).exact_dedup_rows(df).collect()
    }
    assert got == {1: "y", 2: "z"}


def test_refresh_equals_full_prepare_on_id_sets(spark, tmp_path):
    """Incremental refresh ≡ full re-run on planted-copy data: prepare
    the low-id docs, index them, refresh with the high-id batch — the
    union of surviving ids (and their token counts) must equal one full
    prepare over everything. New ids are all larger than old ids, so
    the full run's min-id canonicalization has the same keep-old
    preference the refresh hard-codes."""
    from data_pipeline_demo_spark.operators import dedup
    from data_pipeline_demo_spark.sources.tables import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    cut = docs.approxQuantile("doc_id", [0.8], 0.0)[0]
    old_docs = docs.filter(F.col("doc_id") < cut)
    new_docs = docs.filter(F.col("doc_id") >= cut)

    cfg = corpus.CorpusConfig(pack_budget=512, num_shards=8)
    full = corpus.prepare_training_corpus(docs, cfg)

    prepared_old = corpus.prepare_training_corpus(old_docs, cfg)
    idx = str(tmp_path / "corpus_idx")
    dedup.minhash_index_write(prepared_old, idx)
    increment = corpus.refresh_training_corpus(new_docs, prepared_old, idx, cfg)

    def id_tokens(df):
        return {(r["doc_id"], r["n_tokens"]) for r in df.collect()}

    got = id_tokens(prepared_old) | id_tokens(increment)
    want = id_tokens(full)
    assert got == want
    assert len(id_tokens(increment)) > 0  # the batch contributed docs

    # the index now covers the increment: refreshing the SAME batch
    # again yields nothing new (its texts are exact dups of corpus)
    again = corpus.refresh_training_corpus(
        new_docs, prepared_old.unionByName(increment.select(prepared_old.columns)),
        idx, cfg, update_index=False,
    )
    assert again.count() == 0


def test_decontaminate_flags_ngram_overlap(spark):
    bench = spark.createDataFrame(
        [(1, "what is the capital of the country of france and why does "
             "it matter for the history of europe in the modern era")],
        "q_id long, text string",
    )
    shared = "what is the capital of the country of france and why does it matter"
    training = spark.createDataFrame(
        [
            # contains a >=13-token run from the benchmark -> contaminated
            (10, "intro text then " + shared + " trailing words here"),
            # paraphrase: overlapping vocabulary, no 13-token run -> clean
            (11, "france has a capital city and europe has a long history "
                 "which matters in the modern era for many reasons indeed"),
            # unrelated -> clean
            (12, "a completely different document about cooking pasta with "
                 "fresh tomatoes olive oil and a little bit of basil"),
            # shorter than 13 tokens -> never flagged
            (13, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["contaminated"]
           for r in corpus.decontaminate(training, bench).collect()}
    assert out == {10: True, 11: False, 12: False, 13: False}
    clean = corpus.decontaminate(training, bench).filter("NOT contaminated")
    assert clean.count() == 3


def test_decontaminate_semantic_drops_planted_neighbors(spark):
    """Semantic decontamination: corpus rows that are near-copies of a
    benchmark vector drop; orthogonal rows survive untouched; zero-norm
    rows are kept (cosine undefined); replay is deterministic."""
    import math

    from data_pipeline_demo_spark.operators.corpus import (
        decontaminate_semantic,
    )

    dim = 8

    def unit(axis):
        v = [0.0] * dim
        v[axis] = 1.0
        return v

    # benchmark: axes 0 and 1
    bench = spark.createDataFrame(
        [(1000, unit(0)), (1001, unit(1))],
        "vec_id long, embedding array<float>",
    )
    # corpus: 2 near-copies of benchmark axes (cos≈0.995), 3 orthogonal
    # rows, 1 zero vector
    near0 = [x + 0.1 * math.sin(i + 1) for i, x in enumerate(unit(0))]
    near1 = [x + 0.1 * math.cos(i + 2) for i, x in enumerate(unit(1))]
    corpus = spark.createDataFrame(
        [
            (1, near0),
            (2, near1),
            (3, unit(4)),
            (4, unit(5)),
            (5, unit(6)),
            (6, [0.0] * dim),
        ],
        "vec_id long, embedding array<float>",
    )
    kept = decontaminate_semantic(corpus, bench, threshold=0.9)
    ids = {r["vec_id"] for r in kept.collect()}
    assert ids == {3, 4, 5, 6}
    # survivors are the original rows, untouched
    assert set(kept.columns) == {"vec_id", "embedding"}
    # replay determinism
    again = {
        r["vec_id"]
        for r in decontaminate_semantic(corpus, bench, threshold=0.9).collect()
    }
    assert again == ids
    # a permissive threshold keeps everything except exact hits
    all_kept = {
        r["vec_id"]
        for r in decontaminate_semantic(corpus, bench, threshold=1.01).collect()
    }
    assert all_kept == {1, 2, 3, 4, 5, 6}


def test_duplicate_span_removal_hand_cases(spark):
    """Hand-traced exact-substring dedup: a cross-document boilerplate
    span is cut from both docs, a within-document repeat merges its
    overlapping islands, short docs pass through."""
    from data_pipeline_demo_spark.operators import corpus

    df = spark.createDataFrame(
        [
            (1, "x x x boiler plate spam spam y"),
            (2, "z boiler plate spam spam q"),
            (3, "a b c d a b c d"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_tokens_removed"])
        for r in corpus.remove_duplicate_spans(df, w=4).collect()
    }
    assert got[1] == ("x x x y", 4)
    assert got[2] == ("z q", 4)
    # "a b c d" occurs at 0 and 4; islands [0,3]+[4,7] cover everything
    assert got[3] == ("", 8)
    assert got[4] == ("tiny doc", 0)


def test_duplicate_spans_detection_counts(spark):
    from data_pipeline_demo_spark.operators import corpus

    df = spark.createDataFrame(
        [(1, "p q r s t"), (2, "p q r s u"), (3, "only unique words here")],
        "doc_id long, text string",
    )
    spans = corpus.duplicate_spans(df, w=4).collect()
    # only "p q r s" repeats (docs 1 and 2, offset 0)
    assert sorted((r["doc_id"], r["span_start"], r["span_end"]) for r in spans) == [
        (1, 0, 3),
        (2, 0, 3),
    ]
    # min_dup above the occurrence count: nothing flagged
    assert corpus.duplicate_spans(df, w=4, min_dup=3).count() == 0


def test_remove_duplicate_spans_output_is_clean(spark, sf_dir):
    """Fixed-point-ish property on the real corpus: after removal, no
    w-token span may still occur >= min_dup times... except spans newly
    CREATED by splicing cut edges together — so assert the much
    stronger corpus-level invariant that every originally-duplicated
    span instance is gone, plus conservation of uncut tokens."""
    import pyspark.sql.functions as F

    from data_pipeline_demo_spark.operators import corpus
    from data_pipeline_demo_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents").limit(200)
    w = 8
    cleaned = corpus.remove_duplicate_spans(docs, w=w)
    # conservation: kept + removed == original token count
    joined = docs.join(cleaned, "doc_id").select(
        F.size(F.split(F.trim("text"), r"\s+")).alias("orig"),
        (
            F.when(F.col("cleaned_text") == "", 0).otherwise(
                F.size(F.split("cleaned_text", " "))
            )
            + F.col("n_tokens_removed")
        ).alias("acc"),
    )
    assert joined.filter(F.col("orig") != F.col("acc")).count() == 0
    # every flagged span's tokens were actually removed: re-detect on
    # the cleaned text against the ORIGINAL duplicated span texts
    flagged = corpus.duplicate_spans(docs, w=w)
    n_flagged_docs = flagged.select("doc_id").distinct().count()
    assert n_flagged_docs > 0  # the synthetic corpus has boilerplate
    originals = (
        docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
        .join(flagged, "doc_id")
        .select(
            F.array_join(
                F.slice("t", F.col("span_start") + 1, w), " "
            ).alias("span_text")
        )
        .distinct()
    )
    hits = (
        cleaned.crossJoin(F.broadcast(originals))
        .filter(F.col("cleaned_text").contains(F.col("span_text")))
        .count()
    )
    assert hits == 0


def test_compression_band_gates_both_paths(spark):
    """The optional zlib-entropy band drops boilerplate/noise in BOTH
    the full run and the incremental refresh (one shared gate)."""
    from data_pipeline_demo_spark.operators.corpus import (
        CorpusConfig,
        _quality_gate,
    )

    prose = (
        "the committee is reviewing the analysis and the report of the "
        "first quarter which is a detailed study of the trends in it"
    )
    # repetitive but English-passing (stopwords keep lang-ID = en), so
    # ONLY the compression band can tell it apart from prose
    boiler = "the offer is the best and it is a deal in the sale " * 20
    df = spark.createDataFrame(
        [(1, prose), (2, boiler)], "doc_id long, text string"
    )
    cfg_off = CorpusConfig(min_quality=0.0, langs=("en",))
    cfg_on = CorpusConfig(
        min_quality=0.0, langs=("en",), compression_band=(0.2, 0.9)
    )
    kept_off = {r["doc_id"] for r in df.filter(_quality_gate(cfg_off, "text")).collect()}
    kept_on = {r["doc_id"] for r in df.filter(_quality_gate(cfg_on, "text")).collect()}
    assert 2 in kept_off        # without the band the boilerplate passes
    assert kept_on == {1}       # with it, only prose survives
