"""Manifest bloom index (Delta bloom-filter-index role): JVM↔python
hash-position parity, metadata-only pruning proven by corrupting
prunable buckets, no-false-negative guarantee, DML maintenance, the
python writer's conservative bloom drop, and restore carry."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.sinks.txlog import (
    BLOOM_BITS,
    _bloom_probe_positions,
    read_txtable,
    restore_txtable,
    txlog_delete,
    txlog_update,
    txlog_upsert,
)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "id long, v string")


def _manifest(tmp_path, name, version):
    return json.loads(
        (tmp_path / name / "_commits" / f"{version:020d}.json").read_text()
    )


def test_probe_positions_match_jvm(spark):
    """The python probe must reproduce pmod(xxhash64(cast(col as
    string), j), BLOOM_BITS) bit-for-bit — the parity everything else
    rests on. Covers strings, ints, unicode, dates."""
    import datetime as dt

    vals = ["a", "payment-123", "日本語", "", "42"]
    df = spark.createDataFrame([(v,) for v in vals], "c string")
    for j in range(3):
        want = [
            r[0]
            for r in df.select(
                F.pmod(
                    F.xxhash64(F.col("c").cast("string"), F.lit(j)),
                    F.lit(BLOOM_BITS),
                )
            ).collect()
        ]
        got = [_bloom_probe_positions(v)[j] for v in vals]
        assert got == want, (j, got, want)
    # int and date literals hash through their canonical string form
    di = spark.createDataFrame(
        [(7,), (123456789,), (-5,)], "c long"
    ).select(
        F.pmod(F.xxhash64(F.col("c").cast("string"), F.lit(0)), F.lit(BLOOM_BITS))
    )
    assert [r[0] for r in di.collect()] == [
        _bloom_probe_positions(v)[0] for v in (7, 123456789, -5)
    ]
    dd = spark.createDataFrame(
        [(dt.date(2024, 3, 1),)], "c date"
    ).select(
        F.pmod(F.xxhash64(F.col("c").cast("string"), F.lit(1)), F.lit(BLOOM_BITS))
    )
    assert dd.first()[0] == _bloom_probe_positions(dt.date(2024, 3, 1))[1]


@pytest.fixture()
def bloom_table(spark, tmp_path):
    root = str(tmp_path / "bl_tx")
    # distinct v per row, ids spread over 8 buckets
    txlog_upsert(
        spark,
        _rows(spark, [(i, f"val-{i}") for i in range(200)]),
        root,
        key="id",
        num_buckets=8,
        bloom_columns=["v"],
    )
    return root


def test_bloom_pruning_never_opens_excluded_buckets(spark, tmp_path, bloom_table):
    """Point lookup on the bloom column: buckets whose filter excludes
    the value are corrupted on disk — the read must succeed anyway
    (metadata-only skip) and return exactly the matching row."""
    root = bloom_table
    m = _manifest(tmp_path, "bl_tx", 0)
    assert m["bloom_columns"] == ["v"]
    target = "val-77"
    positions = _bloom_probe_positions(target)
    from data_pipeline_demo_spark.sinks.txlog import _bloom_might_contain

    keep = {
        b
        for b, bl in m["bucket_blooms"].items()
        if _bloom_might_contain(bl["v"], positions)
    }
    assert keep and len(keep) < len(m["buckets"])  # pruning is real
    for b, rels in m["buckets"].items():
        if b not in keep:
            for rel in rels:
                (tmp_path / "bl_tx" / rel).write_bytes(b"NOT PARQUET")
    got = read_txtable(spark, root, bloom_eq={"v": target}).collect()
    assert [(r.id, r.v) for r in got] == [(77, "val-77")]


def test_everything_pruned_read_is_scan_free(spark, bloom_table):
    """An absent-value probe that prunes every bucket must plan with NO
    file scan at all (metadata-only fast path, built JVM-side — the
    python createDataFrame([], schema) construction cost ~0.35s per
    probe, more than the small-table scan it skipped), while keeping
    the table's recorded schema."""
    df = read_txtable(spark, bloom_table, bloom_eq={"v": "nope-absent"})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan, plan[:500]
    assert df.count() == 0
    full = read_txtable(spark, bloom_table)
    assert [f.name for f in df.schema.fields] == [
        f.name for f in full.schema.fields
    ]
    assert [f.dataType for f in df.schema.fields] == [
        f.dataType for f in full.schema.fields
    ]


def test_bloom_no_false_negatives(spark, bloom_table):
    """Every present value must survive pruning — Bloom filters never
    exclude a member. Checked for all 200 values."""
    spark_vals = [f"val-{i}" for i in range(200)]
    for v in spark_vals[::13] + spark_vals[:3]:  # sample incl. edges
        got = read_txtable(spark, bloom_table, bloom_eq={"v": v}).count()
        assert got == 1, v


def test_bloom_maintained_by_update_delete_restore(spark, tmp_path, bloom_table):
    root = bloom_table
    # UPDATE rewrites matched buckets -> their blooms now contain the
    # NEW value and the lookup finds it
    txlog_update(spark, root, set={"v": "'replaced-7'"}, where="id = 7")
    got = read_txtable(spark, root, bloom_eq={"v": "replaced-7"}).collect()
    assert [(r.id, r.v) for r in got] == [(7, "replaced-7")]
    # the OLD value is gone (its bucket's rebuilt filter may or may not
    # exclude it, but the residual predicate guarantees correctness)
    assert read_txtable(spark, root, bloom_eq={"v": "val-7"}).count() == 0
    # DELETE keeps correctness too
    txlog_delete(spark, root, where="v = 'val-11'")
    assert read_txtable(spark, root, bloom_eq={"v": "val-11"}).count() == 0
    # RESTORE carries the restored snapshot's blooms
    restore_txtable(spark, root, version=0)
    assert read_txtable(spark, root, bloom_eq={"v": "val-7"}).count() == 1
    m = _manifest(tmp_path, "bl_tx", 3)
    assert m["bloom_columns"] == ["v"] and m["bucket_blooms"]


def test_python_writer_append_maintains_touched_blooms(spark, tmp_path, bloom_table):
    """Round 7: the python writer MAINTAINS manifest blooms on append —
    the touched bucket's filter gains the new value's bits (it is a
    superset of the old filter, append ORs and never clears), untouched
    buckets' filters are byte-identical, and the new value is findable
    through a bloom-pruned read."""
    from data_pipeline_demo_spark.sources.txtable_source import (
        register_txtable_source,
    )

    register_txtable_source(spark)
    root = bloom_table
    m0 = _manifest(tmp_path, "bl_tx", 0)
    (
        _rows(spark, [(1000, "brand-new")])
        .write.format("txtable")
        .mode("append")
        .save(root)
    )
    m1 = _manifest(tmp_path, "bl_tx", 1)
    from data_pipeline_demo_spark.sinks.upsert import _bucket_of, BUCKET_COL

    b = (
        _rows(spark, [(1000, "x")])
        .withColumn(BUCKET_COL, _bucket_of("id", m0["num_buckets"]))
        .first()[BUCKET_COL]
    )
    # the appended bucket's filter is KEPT and now covers the new value:
    # it must be a strict-or-equal superset of the old bits ...
    new_bl = m1["bucket_blooms"][str(b)]["v"]
    old_bl = m0["bucket_blooms"].get(str(b), {}).get("v", {})
    for k, hx in old_bl.items():
        assert int(new_bl.get(k, "0"), 16) & int(hx, 16) == int(hx, 16)
    from data_pipeline_demo_spark.sinks.txlog import _bloom_might_contain

    assert _bloom_might_contain(new_bl, _bloom_probe_positions("brand-new"))
    # ... and untouched buckets keep theirs byte-identical
    untouched = set(m0["bucket_blooms"]) - {str(b)}
    assert untouched and all(
        m1["bucket_blooms"][x] == m0["bucket_blooms"][x] for x in untouched
    )
    # the bloom-pruned lookup finds the appended value
    got = read_txtable(spark, root, bloom_eq={"v": "brand-new"}).collect()
    assert [(r.id, r.v) for r in got] == [(1000, "brand-new")]


def test_bloom_pushdown_prunes_datasource_partitions(spark, tmp_path, bloom_table):
    """The format('txtable') reader's planning-time pushdown uses the
    manifest bloom index too: an equality on a bloom column plans
    exactly the buckets whose filters might contain the value (reader-
    level partitions() assertion, same harness as the key/zone-map
    tiers), and the end-to-end filtered read returns the right row."""
    from pyspark.sql.datasource import EqualTo

    from data_pipeline_demo_spark.sinks.txlog import _bloom_might_contain
    from data_pipeline_demo_spark.sources.txtable_source import (
        TxTableDataSource,
        _TxTablePushdownBatchReader,
        register_txtable_source,
    )

    register_txtable_source(spark)
    root = bloom_table
    m = _manifest(tmp_path, "bl_tx", 0)
    target = "val-42"
    positions = _bloom_probe_positions(target)
    keep = {
        b
        for b, bl in m["bucket_blooms"].items()
        if _bloom_might_contain(bl["v"], positions)
    }
    assert keep and len(keep) < len(m["buckets"])  # pruning is real

    ds = TxTableDataSource({"path": root})
    reader = ds.reader(ds.schema())
    assert isinstance(reader, _TxTablePushdownBatchReader)
    assert len(reader.partitions()) == len(m["buckets"])  # unfiltered
    ds2 = TxTableDataSource({"path": root})
    r2 = ds2.reader(ds2.schema())
    handed_back = list(r2.pushFilters([EqualTo(("v",), target)]))
    assert len(handed_back) == 1  # filter re-applied by Spark: exact
    assert len(r2.partitions()) == len(keep)

    got = (
        spark.read.format("txtable")
        .load(root)
        .filter(F.col("v") == target)
        .collect()
    )
    assert [(r.id, r.v) for r in got] == [(42, "val-42")]


def test_bloom_guards(spark, tmp_path, bloom_table):
    with pytest.raises(ValueError, match="bloom_columns"):
        txlog_upsert(
            spark,
            _rows(spark, [(1, "x")]),
            bloom_table,
            bloom_columns=["other"],
        )
    with pytest.raises(ValueError, match="no bloom index"):
        read_txtable(spark, bloom_table, bloom_eq={"id": 5})
    with pytest.raises(ValueError, match="NULL"):
        read_txtable(spark, bloom_table, bloom_eq={"v": None})
    with pytest.raises(ValueError, match="cannot reproduce"):
        read_txtable(spark, bloom_table, bloom_eq={"v": 1.5})
    # a table created WITHOUT blooms refuses bloom_eq
    plain = str(tmp_path / "plain_tx")
    txlog_upsert(spark, _rows(spark, [(1, "x")]), plain, num_buckets=2)
    with pytest.raises(ValueError, match="no bloom index"):
        read_txtable(spark, plain, bloom_eq={"v": "x"})
