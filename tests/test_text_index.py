"""Persisted inverted text index (operators/text_index.py): indexed
BM25 ≡ the scan-path bm25_topk, Bloom pruning provably engaged, and
CDC refresh ≡ from-scratch rebuild across insert/update/delete."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators.text_index import (
    bm25_query_indexed,
    build_text_index,
    text_index_refresh_from_txtable,
)
from data_pipeline_demo_spark.operators.textstats import bm25_topk
from data_pipeline_demo_spark.sinks.txlog import (
    read_txtable,
    txlog_delete,
    txlog_upsert,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick red fox"),
    (3, "lazy dogs sleep all day long in the sun"),
    (4, "quick quick quick brown foxes"),
    (5, "an unrelated document about spark sql engines"),
    (6, "dog dog dog dog"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ranked(df):
    return [(r["doc_id"], r["bm25"], r["rk"]) for r in df.collect()]


def test_indexed_equals_scan_path(spark, tmp_path):
    root = str(tmp_path / "tix")
    docs = _docs(spark)
    build_text_index(spark, docs, root, num_buckets=8)
    for terms in (["quick", "fox"], ["dog"], ["lazy", "sun", "spark"]):
        want = _ranked(bm25_topk(docs, terms, k=5))
        got = _ranked(bm25_query_indexed(spark, root, terms, k=5))
        assert got == want, terms


def test_bloom_pruning_engaged(spark, tmp_path):
    """Corrupting every bucket the query's terms do NOT probe must not
    affect the query — proof the read opens only probed buckets."""
    import json

    root = str(tmp_path / "tix")
    build_text_index(spark, _docs(spark), root, num_buckets=16)
    want = _ranked(bm25_query_indexed(spark, root, ["spark"], k=3))
    from data_pipeline_demo_spark.sources.pushdown import (
        bloom_might_contain,
        bloom_probe_positions,
    )

    m = json.loads(
        sorted((tmp_path / "tix/postings/_commits").glob("*.json"))[-1]
        .read_text()
    )
    pos = bloom_probe_positions("spark", int(m.get("bloom_bits", 1024)))
    blooms = m.get("bucket_blooms", {})
    keep = {
        b
        for b in m["buckets"]
        if (hx := blooms.get(b, {}).get("term")) is None
        or bloom_might_contain(hx, pos)
    }
    corrupted = 0
    for b, rels in m["buckets"].items():
        if b not in keep:
            for rel in rels:
                (tmp_path / "tix/postings" / rel).write_bytes(b"GARBAGE")
                corrupted += 1
    assert corrupted > 0  # the probe really pruned something
    assert _ranked(bm25_query_indexed(spark, root, ["spark"], k=3)) == want


def test_refresh_equals_rebuild(spark, tmp_path):
    docs_root = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    txlog_upsert(
        spark, _docs(spark), docs_root, key="doc_id", num_buckets=4
    )
    v0 = 0
    build_text_index(
        spark,
        read_txtable(spark, docs_root),
        idx,
        num_buckets=8,
        table_version=v0,
    )
    # commit 1: update doc 2 (loses 'red', gains new terms), insert 7
    txlog_upsert(
        spark,
        _docs(
            spark,
            [(2, "slow green turtle crawls"), (7, "brand new dog document")],
        ),
        docs_root,
    )
    # commit 2: delete doc 3
    txlog_delete(
        spark,
        docs_root,
        keys=spark.createDataFrame([(3,)], "doc_id long"),
    )
    n, v = text_index_refresh_from_txtable(spark, idx, docs_root, v0)
    assert n == 3 and v == 2
    # refreshed index ≡ index built from scratch on the current snapshot
    fresh = str(tmp_path / "fresh")
    build_text_index(
        spark, read_txtable(spark, docs_root), fresh, num_buckets=8
    )
    a = sorted(
        map(
            tuple,
            read_txtable(spark, idx + "/postings")
            .select("doc_id", "term", "c", "dl")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            read_txtable(spark, fresh + "/postings")
            .select("doc_id", "term", "c", "dl")
            .collect(),
        )
    )
    assert a == b
    sa = read_txtable(spark, idx + "/stats").collect()[0]
    sb = read_txtable(spark, fresh + "/stats").collect()[0]
    assert (sa["n_docs"], sa["sum_dl"]) == (sb["n_docs"], sb["sum_dl"])
    # old term of the updated doc is gone from the index
    assert (
        read_txtable(spark, idx + "/postings")
        .filter((F.col("term") == "red") & (F.col("doc_id") == 2))
        .count()
        == 0
    )
    # queries against the refreshed index match the scan path
    cur = read_txtable(spark, docs_root)
    assert _ranked(bm25_query_indexed(spark, idx, ["dog"], k=5)) == _ranked(
        bm25_topk(cur, ["dog"], k=5)
    )
    # same-version call is a no-op
    assert text_index_refresh_from_txtable(spark, idx, docs_root, v) == (0, v)


def test_separator_in_token_keys_distinct(spark, tmp_path):
    root = str(tmp_path / "tix")
    rows = [(1, "a:b c"), (2, "a b:c")]
    build_text_index(spark, _docs(spark, rows), root, num_buckets=4)
    got = sorted(
        map(
            tuple,
            read_txtable(spark, root + "/postings")
            .select("doc_id", "term")
            .collect(),
        )
    )
    assert got == [(1, "a:b"), (1, "c"), (2, "a"), (2, "b:c")]


def test_query_guards(spark, tmp_path):
    with pytest.raises(ValueError, match="no text index"):
        bm25_query_indexed(spark, str(tmp_path / "nope"), ["x"])
    root = str(tmp_path / "tix")
    build_text_index(spark, _docs(spark), root, num_buckets=4)
    with pytest.raises(ValueError, match="empty"):
        bm25_query_indexed(spark, root, [])


def test_streaming_maintenance_and_redelivery(spark, tmp_path):
    """Callback-driven streaming maintenance: change-feed slices applied
    per trigger converge the index to the rebuild state; a REDELIVERED
    slice (same batch id — the foreachBatch crash-recovery case) leaves
    postings AND stats unchanged."""
    from data_pipeline_demo_spark.sinks.txlog import txtable_changes
    from data_pipeline_demo_spark.streaming.jobs import (
        make_text_index_batch_fn,
    )

    docs_root = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    txlog_upsert(spark, _docs(spark), docs_root, key="doc_id", num_buckets=4)
    build_text_index(
        spark, read_txtable(spark, docs_root), idx, num_buckets=8
    )
    fn = make_text_index_batch_fn(idx)
    # commit 1: update + insert; commit 2: delete
    txlog_upsert(
        spark,
        _docs(spark, [(2, "slow green turtle"), (8, "another dog text")]),
        docs_root,
    )
    fn(txtable_changes(spark, docs_root, 0, 1, include_preimages=True), 0)
    txlog_delete(
        spark, docs_root, keys=spark.createDataFrame([(5,)], "doc_id long")
    )
    slice2 = txtable_changes(spark, docs_root, 1, 2, include_preimages=True)
    fn(slice2, 1)

    def _snapshot():
        postings = sorted(
            map(
                tuple,
                read_txtable(spark, idx + "/postings")
                .select("doc_id", "term", "c", "dl")
                .collect(),
            )
        )
        s = read_txtable(spark, idx + "/stats").collect()[0]
        return postings, (s["n_docs"], s["sum_dl"])

    before = _snapshot()
    fn(slice2, 1)  # redelivered slice: must be a converged no-op
    assert _snapshot() == before
    # maintained index ≡ rebuild on the current snapshot
    fresh = str(tmp_path / "fresh")
    build_text_index(
        spark, read_txtable(spark, docs_root), fresh, num_buckets=8
    )
    fb = sorted(
        map(
            tuple,
            read_txtable(spark, fresh + "/postings")
            .select("doc_id", "term", "c", "dl")
            .collect(),
        )
    )
    sb = read_txtable(spark, fresh + "/stats").collect()[0]
    assert before == (fb, (sb["n_docs"], sb["sum_dl"]))
