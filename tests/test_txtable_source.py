"""The txtable Python data source (PySpark 4 DataSource API): batch
snapshot reads (+ time travel, schema evolution) and the streaming
change feed, against tables committed by sinks.txlog."""

import time

import pytest

from data_pipeline_demo_spark.sinks.txlog import txlog_delete, txlog_upsert
from data_pipeline_demo_spark.sources.txtable_source import (
    register_txtable_source,
)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "id long, v string")


def _as_dict(df):
    return {r["id"]: r["v"] for r in df.collect()}


@pytest.fixture()
def registered(spark):
    register_txtable_source(spark)
    return spark


def test_txtable_format_batch_read_and_time_travel(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "tx")
    txlog_upsert(spark, _rows(spark, [(1, "a"), (2, "b")]), root, num_buckets=4)
    txlog_upsert(spark, _rows(spark, [(2, "B"), (3, "c")]), root)

    got = _as_dict(spark.read.format("txtable").load(root))
    assert got == {1: "a", 2: "B", 3: "c"}
    # time travel to the first snapshot
    v0 = _as_dict(spark.read.format("txtable").option("version", "0").load(root))
    assert v0 == {1: "a", 2: "b"}
    # file:// URI accepted
    got = _as_dict(spark.read.format("txtable").load("file://" + root))
    assert got == {1: "a", 2: "B", 3: "c"}


def test_txtable_format_schema_evolution(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "tx")
    txlog_upsert(spark, _rows(spark, [(1, "a")]), root, num_buckets=2)
    wide = spark.createDataFrame(
        [(2, "b", "extra")], "id long, v string, note string"
    )
    txlog_upsert(spark, wide, root)
    df = spark.read.format("txtable").load(root)
    assert set(df.columns) == {"id", "v", "note"}
    got = {r["id"]: (r["v"], r["note"]) for r in df.collect()}
    assert got == {1: ("a", None), 2: ("b", "extra")}


def test_txtable_format_rejects_remote_scheme(registered, tmp_path):
    spark = registered
    with pytest.raises(Exception, match="fsspec|local"):
        spark.read.format("txtable").load("s3a://bucket/tbl").collect()


def test_txtable_change_feed_stream(registered, tmp_path):
    """startingVersion=0 replays history as insert/update rows on the
    first micro-batch; a commit made while the stream runs surfaces as
    the next batch's changes (update + delete here)."""
    spark = registered
    root = str(tmp_path / "tx")
    txlog_upsert(spark, _rows(spark, [(1, "a"), (2, "b")]), root, num_buckets=4)
    txlog_upsert(spark, _rows(spark, [(2, "B"), (3, "c")]), root)

    q = (
        spark.readStream.format("txtable")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load(root)
        .writeStream.format("memory")
        .queryName("t_cdc")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    def wait_for(n, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if spark.table("t_cdc").count() >= n:
                return
            time.sleep(1)
        raise AssertionError(
            f"change feed produced {spark.table('t_cdc').count()} rows, "
            f"wanted {n}"
        )

    try:
        wait_for(2)  # replay of v0 -> v1: update(2), insert(3)
        first = {
            (r["id"], r["_change_type"], r["v"])
            for r in spark.table("t_cdc").collect()
        }
        assert first == {(2, "update", "B"), (3, "insert", "c")}

        # live commits: one update-ish upsert and one delete
        txlog_upsert(spark, _rows(spark, [(1, "A2")]), root)
        txlog_delete(spark, root, keys=_rows(spark, [(3, None)]))
        wait_for(4)
        got = {
            (r["id"], r["_change_type"], r["v"])
            for r in spark.table("t_cdc").collect()
        }
        assert (1, "update", "A2") in got
        assert (3, "delete", "c") in got
    finally:
        q.stop()


def test_txtable_batch_parallelizes_per_bucket(registered, tmp_path):
    """The batch reader plans one input partition per live bucket (the
    manifest's parallel grain) — not one, not per-file."""
    spark = registered
    root = str(tmp_path / "tx")
    txlog_upsert(
        spark,
        spark.createDataFrame([(i, f"v{i}") for i in range(200)], "id long, v string"),
        root,
        num_buckets=8,
    )
    import json as _json
    from pathlib import Path

    m = _json.loads(
        sorted((Path(root) / "_commits").glob("0*.json"))[-1].read_text()
    )
    n_live = len(m["buckets"])
    df = spark.read.format("txtable").load(root)
    assert df.rdd.getNumPartitions() == n_live
    assert df.count() == 200


def test_txtable_batch_change_feed(registered, tmp_path):
    """Batch CDF: startingVersion/endingVersion window the diff; one
    partition per changed bucket; missing startingVersion raises; an
    empty diff returns zero rows."""
    spark = registered
    root = str(tmp_path / "tx")
    txlog_upsert(spark, _rows(spark, [(1, "a"), (2, "b")]), root, num_buckets=4)
    txlog_upsert(spark, _rows(spark, [(2, "B"), (3, "c")]), root)
    txlog_delete(spark, root, keys=_rows(spark, [(1, None)]))

    def cdf(a, b=None):
        r = (
            spark.read.format("txtable")
            .option("readChangeFeed", "true")
            .option("startingVersion", str(a))
        )
        if b is not None:
            r = r.option("endingVersion", str(b))
        return {
            (x["id"], x["_change_type"], x["v"]) for x in r.load(root).collect()
        }

    assert cdf(0, 1) == {(2, "update", "B"), (3, "insert", "c")}
    assert cdf(1) == {(1, "delete", "a")}
    assert cdf(0) == {(2, "update", "B"), (3, "insert", "c"), (1, "delete", "a")}
    assert cdf(2, 2) == set()  # empty diff

    with pytest.raises(Exception, match="startingVersion"):
        spark.read.format("txtable").option("readChangeFeed", "true").load(
            root
        ).collect()
