"""ANALYZE TABLE (sinks/txlog.py:analyze_txtable + the SQL verb):
retrofitting zone-map / Bloom pruning metadata onto existing tables —
backfill correctness, pruned reads staying exact, incremental
maintenance by later writes, physical-rows semantics under deletion
vectors, refusals, and the history stamp."""

import json

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.sinks.sql_dml import txtable_sql
from data_pipeline_demo_spark.sinks.txlog import (
    analyze_txtable,
    read_txtable,
    txlog_delete,
    txlog_upsert,
    txtable_history,
)


def _manifest(root, version):
    import pathlib

    return json.loads(
        (pathlib.Path(root) / "_commits" / f"{version:020d}.json").read_text()
    )


@pytest.fixture
def t(spark, tmp_path):
    root = str(tmp_path / "az")
    df = spark.range(400).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("x"),
        F.concat(F.lit("tag"), (F.col("id") % 7).cast("string")).alias("tag"),
    )
    txlog_upsert(spark, df, root, key="k", num_buckets=8)  # NO stats/bloom
    return root


def test_retrofit_zone_maps_and_blooms(spark, t):
    m0 = _manifest(t, 0)
    assert m0.get("stats_columns", []) == [] and not m0.get("bucket_stats")
    v = analyze_txtable(spark, t, stats_columns=["x"], bloom_columns=["tag"])
    assert v == 1
    m1 = _manifest(t, 1)
    assert m1["stats_columns"] == ["x"]
    assert set(m1["bucket_stats"]) == set(m1["buckets"])
    assert m1["bloom_columns"] == ["tag"]
    assert set(m1["bucket_blooms"]) == set(m1["buckets"])
    assert m1["operation"] == "ANALYZE"
    # zone-pruned read is exact
    got = sorted(
        r["k"]
        for r in read_txtable(
            spark, t, prune_between={"x": (0, 30)}
        ).collect()
    )
    assert got == list(range(11))
    # bloom-pruned point read is exact
    got = [
        r["k"]
        for r in read_txtable(spark, t, bloom_eq={"tag": "tag3"}).collect()
    ]
    assert sorted(got) == [k for k in range(400) if k % 7 == 3]


def test_sql_analyze_and_later_writes_maintain(spark, t):
    v = txtable_sql(
        spark,
        f"ANALYZE TABLE txtable.`{t}` COMPUTE STATISTICS "
        "FOR COLUMNS x BLOOM (tag)",
    )
    assert v == 1
    # a later write maintains the retrofitted columns incrementally
    txlog_upsert(
        spark,
        spark.createDataFrame([(1000, 9999, "tag0")],
                              "k long, x long, tag string"),
        t,
    )
    m2 = _manifest(t, 2)
    assert m2["stats_columns"] == ["x"]
    hits = [
        bs for bs, st in m2["bucket_stats"].items() if st["x"][1] == 9999
    ]
    assert len(hits) == 1  # the touched bucket's zone map sees the new max
    got = [
        r["k"]
        for r in read_txtable(
            spark, t, prune_between={"x": (9000, None)}
        ).collect()
    ]
    assert got == [1000]


def test_recompute_in_place_and_drop(spark, t):
    analyze_txtable(spark, t, stats_columns=["x"])
    # bare recompute keeps the sets
    v = txtable_sql(spark, f"ANALYZE TABLE txtable.`{t}` COMPUTE STATISTICS")
    assert _manifest(t, v)["stats_columns"] == ["x"]
    # explicit [] drops
    v = analyze_txtable(spark, t, stats_columns=[])
    m = _manifest(t, v)
    assert m["stats_columns"] == [] and not m["bucket_stats"]


def test_physical_semantics_under_dvs(spark, t):
    # delete the high-x rows merge-on-read, then analyze: zone maps
    # stay physical (deleted rows may widen ranges — conservative,
    # never wrong), and pruned reads remain exact on live rows
    txlog_delete(spark, t, where="x > 900", mode="merge-on-read")
    analyze_txtable(spark, t, stats_columns=["x"])
    got = [
        r["k"]
        for r in read_txtable(
            spark, t, prune_between={"x": (600, None)}
        ).collect()
    ]
    assert sorted(got) == list(range(200, 301))  # x=3k in [600,900]


def test_unknown_column_refuses(spark, t):
    with pytest.raises(ValueError):
        analyze_txtable(spark, t, stats_columns=["nope"])


def test_history_stamp(spark, t):
    analyze_txtable(spark, t, stats_columns=["x"])
    hist = txtable_history(spark, t)
    assert hist[-1]["operation"] == "ANALYZE"
    # metadata-only: logical rows unchanged
    assert hist[-1]["rows"] == hist[-2]["rows"]
