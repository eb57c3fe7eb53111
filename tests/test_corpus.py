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
