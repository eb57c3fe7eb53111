"""Identity columns (Delta's ``GENERATED {ALWAYS|BY DEFAULT} AS
IDENTITY``, `sinks/txlog.py:_allocate_identity_columns`): the table
allocates BIGINT surrogate keys deterministically in key order against
a manifest-carried high-water mark. Covers allocation determinism,
write-once preservation through MERGE (plain and conditional), ALWAYS
vs BY DEFAULT semantics incl. the high-water sync, the mark's carry
through every commit shape (UPDATE/DELETE/TRUNCATE/RESTORE/CLONE/
compact/rebucket), the SQL grammar + SHOW CREATE round-trip, the DSv2
writer feature gate + concurrent-allocation conflict detection, and
COPY INTO / INSERT OVERWRITE behavior."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.sinks.merge import (
    MatchedClause,
    NotMatchedClause,
    txlog_merge,
)
from data_pipeline_demo_spark.sinks.sql_dml import (
    UnsupportedSqlError,
    txtable_sql,
)
from data_pipeline_demo_spark.sinks.txlog import (
    _latest_manifest,
    compact_txtable,
    deep_clone_txtable,
    read_txtable,
    rebucket_txtable,
    restore_txtable,
    set_table_constraint,
    shallow_clone_txtable,
    truncate_txtable,
    txlog_add_column,
    txlog_delete,
    txlog_drop_column,
    txlog_rename_column,
    txlog_update,
    txlog_upsert,
)


def _root(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"ident-{tag}-") + "/t"


def _mk(spark, root, rows, always=True, start=100, step=3):
    df = spark.createDataFrame(rows, "k string, v double").withColumn(
        "rid", F.lit(None).cast("long")
    )
    return txlog_upsert(
        spark,
        df,
        root,
        key="k",
        num_buckets=4,
        identity_columns={
            "rid": {"start": start, "step": step, "always": always}
        },
    )


def _ids(spark, root):
    return {
        r["k"]: r["rid"]
        for r in read_txtable(spark, root).select("k", "rid").collect()
    }


def test_allocation_in_key_order(spark):
    root = _root("alloc")
    _mk(spark, root, [("c", 3.0), ("a", 1.0), ("b", 2.0)])
    assert _ids(spark, root) == {"a": 100, "b": 103, "c": 106}
    man = _latest_manifest(spark, root)
    assert man["identity_high_water"] == {"rid": 106}
    assert man["identity_columns"]["rid"] == {
        "start": 100,
        "step": 3,
        "always": True,
    }


def test_merge_preserves_matched_allocates_new(spark):
    root = _root("merge")
    _mk(spark, root, [("a", 1.0), ("b", 2.0)])
    txlog_upsert(
        spark,
        spark.createDataFrame(
            [("b", 20.0), ("d", 4.0), ("c", 3.0)], "k string, v double"
        ),
        root,
    )
    # b keeps its id; c/d allocate in key order from the mark
    assert _ids(spark, root) == {"a": 100, "b": 103, "c": 106, "d": 109}
    # idempotent re-delivery: same batch again changes nothing
    txlog_upsert(
        spark,
        spark.createDataFrame(
            [("b", 20.0), ("d", 4.0), ("c", 3.0)], "k string, v double"
        ),
        root,
    )
    assert _ids(spark, root) == {"a": 100, "b": 103, "c": 106, "d": 109}
    assert _latest_manifest(spark, root)["identity_high_water"] == {
        "rid": 109
    }


def test_always_refuses_fresh_values_accepts_restatement(spark):
    root = _root("always")
    _mk(spark, root, [("a", 1.0)])
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        txlog_upsert(
            spark,
            spark.createDataFrame(
                [("z", 9.0, 999)], "k string, v double, rid long"
            ),
            root,
        )
    # re-stating the STORED value null-safely passes (re-delivery)
    txlog_upsert(
        spark,
        spark.createDataFrame(
            [("a", 1.5, 100)], "k string, v double, rid long"
        ),
        root,
    )
    assert _ids(spark, root) == {"a": 100}
    # reassigning an existing row's id refuses
    with pytest.raises(ValueError, match="write-once"):
        txlog_upsert(
            spark,
            spark.createDataFrame(
                [("a", 1.5, 200)], "k string, v double, rid long"
            ),
            root,
        )


def test_by_default_honors_and_syncs(spark):
    root = _root("bydef")
    df = spark.createDataFrame(
        [("a", 1.0, None), ("b", 2.0, 500)], "k string, v double, rid long"
    )
    txlog_upsert(
        spark,
        df,
        root,
        key="k",
        num_buckets=4,
        identity_columns={"rid": {"always": False}},
    )
    assert _ids(spark, root) == {"a": 1, "b": 500}
    assert _latest_manifest(spark, root)["identity_high_water"] == {
        "rid": 500
    }
    txlog_upsert(
        spark, spark.createDataFrame([("c", 3.0)], "k string, v double"), root
    )
    assert _ids(spark, root)["c"] == 501
    # BY DEFAULT is still write-once for existing rows
    with pytest.raises(ValueError, match="write-once"):
        txlog_upsert(
            spark,
            spark.createDataFrame(
                [("a", 1.0, 42)], "k string, v double, rid long"
            ),
            root,
        )


def test_negative_step(spark):
    root = _root("neg")
    _mk(spark, root, [("a", 1.0), ("b", 2.0)], start=-10, step=-5)
    assert _ids(spark, root) == {"a": -10, "b": -15}


def test_creation_validation(spark):
    # non-BIGINT type
    with pytest.raises(ValueError, match="must be BIGINT"):
        txlog_upsert(
            spark,
            spark.createDataFrame([("a", 1)], "k string, rid int"),
            _root("vint"),
            key="k",
            identity_columns={"rid": {}},
        )
    # identity as key
    with pytest.raises(ValueError, match="bucketing KEY"):
        txlog_upsert(
            spark,
            spark.createDataFrame([(1, "a")], "rid long, k string"),
            _root("vkey"),
            key="rid",
            identity_columns={"rid": {}},
        )
    # zero step
    with pytest.raises(ValueError, match="INCREMENT BY"):
        txlog_upsert(
            spark,
            spark.createDataFrame([("a", 1)], "k string, rid long"),
            _root("vstep"),
            key="k",
            identity_columns={"rid": {"step": 0}},
        )
    # column not in schema
    with pytest.raises(ValueError, match="not in the table schema"):
        txlog_upsert(
            spark,
            spark.createDataFrame([("a",)], "k string"),
            _root("vmiss"),
            key="k",
            identity_columns={"rid": {}},
        )
    # generated expression referencing the identity column
    with pytest.raises(ValueError, match="references identity"):
        txlog_upsert(
            spark,
            spark.createDataFrame(
                [("a", 1, 2)], "k string, rid long, twice long"
            ),
            _root("vgen"),
            key="k",
            identity_columns={"rid": {}},
            generated_columns={"twice": "rid * 2"},
        )
    # both identity and generated on one column
    with pytest.raises(ValueError, match="one generation rule"):
        txlog_upsert(
            spark,
            spark.createDataFrame([("a", 1)], "k string, rid long"),
            _root("vboth"),
            key="k",
            identity_columns={"rid": {}},
            generated_columns={"rid": "1"},
        )


def test_config_fixed_after_creation(spark):
    root = _root("fixed")
    _mk(spark, root, [("a", 1.0)])
    with pytest.raises(ValueError, match="fixed at table creation"):
        txlog_upsert(
            spark,
            spark.createDataFrame([("b", 2.0)], "k string, v double"),
            root,
            identity_columns={"rid": {"start": 1, "step": 1}},
        )


def test_update_set_refuses_identity(spark):
    root = _root("upd")
    _mk(spark, root, [("a", 1.0)])
    with pytest.raises(ValueError, match="write-once"):
        txlog_update(spark, root, {"rid": "7"}, where="k = 'a'")
    # updating OTHER columns keeps ids
    txlog_update(spark, root, {"v": "v + 1"}, where="k = 'a'")
    assert _ids(spark, root) == {"a": 100}


def test_conditional_merge_identity(spark):
    root = _root("cmerge")
    _mk(spark, root, [("a", 1.0), ("b", 2.0)])
    res = txlog_merge(
        spark,
        spark.createDataFrame(
            [("a", 9.0), ("c", 3.0)], "k string, v double"
        ),
        root,
        matched=[MatchedClause(action="update", assignments={"v": "s.v"})],
        not_matched=[
            NotMatchedClause(columns=["k", "v"], values=["s.k", "s.v"])
        ],
    )
    assert res.rows_updated == 1 and res.rows_inserted == 1
    assert _ids(spark, root) == {"a": 100, "b": 103, "c": 106}
    with pytest.raises(ValueError, match="write-once"):
        txlog_merge(
            spark,
            spark.createDataFrame([("a", 1.0)], "k string, v double"),
            root,
            matched=[
                MatchedClause(action="update", assignments={"rid": "5"})
            ],
        )


def test_mark_survives_delete_truncate_compact_rebucket(spark):
    root = _root("carry")
    _mk(spark, root, [("a", 1.0), ("b", 2.0), ("c", 3.0)])
    txlog_delete(spark, root, where="k = 'b'")
    assert _latest_manifest(spark, root)["identity_high_water"] == {
        "rid": 106
    }
    compact_txtable(spark, root)
    assert _latest_manifest(spark, root)["identity_high_water"] == {
        "rid": 106
    }
    rebucket_txtable(spark, root, 8)
    assert _latest_manifest(spark, root)["identity_high_water"] == {
        "rid": 106
    }
    truncate_txtable(spark, root)
    man = _latest_manifest(spark, root)
    assert man["identity_high_water"] == {"rid": 106}
    # deleted/truncated ids are never re-issued
    txlog_upsert(
        spark, spark.createDataFrame([("z", 9.0)], "k string, v double"), root
    )
    assert _ids(spark, root) == {"z": 109}


def test_restore_never_regresses_mark(spark):
    root = _root("restore")
    _mk(spark, root, [("a", 1.0)])  # v0, hwm 100
    txlog_upsert(
        spark, spark.createDataFrame([("b", 2.0)], "k string, v double"), root
    )  # v1, hwm 103
    restore_txtable(spark, root, version=0)
    man = _latest_manifest(spark, root)
    assert man["identity_high_water"] == {"rid": 103}  # kept, not 100
    txlog_upsert(
        spark, spark.createDataFrame([("c", 3.0)], "k string, v double"), root
    )
    assert _ids(spark, root) == {"a": 100, "c": 106}


def test_clone_carries_identity(spark):
    root = _root("clone")
    _mk(spark, root, [("a", 1.0)])
    sc = _root("clone-s")
    shallow_clone_txtable(spark, root, sc)
    man = _latest_manifest(spark, sc)
    assert man["identity_columns"]["rid"]["start"] == 100
    assert man["identity_high_water"] == {"rid": 100}
    txlog_upsert(
        spark, spark.createDataFrame([("b", 2.0)], "k string, v double"), sc
    )
    assert _ids(spark, sc) == {"a": 100, "b": 103}
    dc = _root("clone-d")
    deep_clone_txtable(spark, root, dc)
    assert _latest_manifest(spark, dc)["identity_high_water"] == {
        "rid": 100
    }


def test_drop_and_rename_identity_column(spark):
    root = _root("alter")
    _mk(spark, root, [("a", 1.0)])
    txlog_rename_column(spark, root, "rid", "doc_sid")
    man = _latest_manifest(spark, root)
    assert "doc_sid" in man["identity_columns"]
    assert man["identity_high_water"] == {"doc_sid": 100}
    txlog_upsert(
        spark, spark.createDataFrame([("b", 2.0)], "k string, v double"), root
    )
    assert {
        r["k"]: r["doc_sid"]
        for r in read_txtable(spark, root).select("k", "doc_sid").collect()
    } == {"a": 100, "b": 103}
    txlog_drop_column(spark, root, "doc_sid")
    man = _latest_manifest(spark, root)
    assert not man.get("identity_columns")
    assert "doc_sid" not in read_txtable(spark, root).columns


def test_add_column_then_constraint_refusal(spark):
    root = _root("cons")
    _mk(spark, root, [("a", 1.0)])
    with pytest.raises(ValueError, match="identity column"):
        set_table_constraint(spark, root, "rid_pos", "rid > 0")
    # constraints on other columns still fine
    set_table_constraint(spark, root, "v_pos", "v > 0")
    # and still enforced post-identity-fill commits
    with pytest.raises(ValueError, match="v_pos"):
        txlog_upsert(
            spark,
            spark.createDataFrame([("b", -2.0)], "k string, v double"),
            root,
        )


def test_sql_lifecycle_and_show_create_round_trip(spark):
    root = _root("sql")
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{root}` (k STRING, v DOUBLE, rid BIGINT "
        "GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 10)) "
        "KEY k BUCKETS 4",
    )
    txtable_sql(
        spark, f"INSERT INTO txtable.`{root}` VALUES ('b', 2.0), ('a', 1.0)"
    )
    rows = {
        r["k"]: r["rid"]
        for r in txtable_sql(
            spark, f"SELECT k, rid FROM txtable.`{root}`"
        ).collect()
    }
    assert rows == {"a": 10, "b": 20}
    script = txtable_sql(spark, f"SHOW CREATE TABLE txtable.`{root}`")
    assert "GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 10)" in (
        script
    )
    clone_root = _root("sql2")
    for stmt in script.replace(root, clone_root).split(";\n"):
        txtable_sql(spark, stmt)
    txtable_sql(spark, f"INSERT INTO txtable.`{clone_root}` VALUES ('q', 9.0)")
    got = txtable_sql(
        spark, f"SELECT rid FROM txtable.`{clone_root}`"
    ).collect()
    assert got[0]["rid"] == 10  # fresh table restarts at START WITH


def test_sql_by_default_and_overwrite(spark):
    root = _root("sqldef")
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{root}` (k STRING, sid BIGINT GENERATED "
        "BY DEFAULT AS IDENTITY) KEY k BUCKETS 2",
    )
    txtable_sql(spark, f"INSERT INTO txtable.`{root}` (k, sid) VALUES ('x', 700)")
    txtable_sql(spark, f"INSERT INTO txtable.`{root}` VALUES ('y')")
    rows = {
        r["k"]: r["sid"]
        for r in txtable_sql(
            spark, f"SELECT k, sid FROM txtable.`{root}`"
        ).collect()
    }
    assert rows == {"x": 700, "y": 701}
    # OVERWRITE replaces rows but the mark stays monotone
    txtable_sql(spark, f"INSERT OVERWRITE txtable.`{root}` VALUES ('m'), ('n')")
    rows = {
        r["k"]: r["sid"]
        for r in txtable_sql(
            spark, f"SELECT k, sid FROM txtable.`{root}`"
        ).collect()
    }
    assert rows == {"m": 702, "n": 703}
    d = txtable_sql(spark, f"DESCRIBE DETAIL txtable.`{root}`")
    assert d["identity_high_water"] == {"sid": 703}
    assert d["identity_columns"]["sid"]["always"] is False


def test_dsv2_writer_gate_and_conflict(spark):
    from data_pipeline_demo_spark.sources.txtable_source import (
        register_txtable_source,
    )
    from data_pipeline_demo_spark.sources.txtable_writer import write_txtable

    root = _root("gate")
    _mk(spark, root, [("a", 1.0)])
    register_txtable_source(spark)
    with pytest.raises(Exception, match="identity"):
        write_txtable(
            spark.createDataFrame([("w", 5.0)], "k string, v double"),
            root,
            key="k",
            num_buckets=4,
        )
    # stale-base conflict: allocation based on marks the table has
    # moved past must refuse, not replay
    df = spark.createDataFrame(
        [("w", 5.0, 200)], "k string, v double, rid long"
    )
    with pytest.raises(Exception, match="high-water mark moved"):
        write_txtable(
            df,
            root,
            key="k",
            num_buckets=4,
            identity_handled=True,
            identity_high_water={"rid": 200},
            identity_high_water_base={"rid": 97},  # stale: table is at 100
        )


def test_copy_into_identity(spark, tmp_path):
    root = _root("copy")
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{root}` (k STRING, cid BIGINT GENERATED "
        "ALWAYS AS IDENTITY) KEY k BUCKETS 2",
    )
    land = str(tmp_path / "land")
    spark.createDataFrame([("p2",), ("p1",)], "k string").write.parquet(land)
    txtable_sql(
        spark,
        f"COPY INTO txtable.`{root}` FROM '{land}' FILEFORMAT = PARQUET",
    )
    rows = {
        r["k"]: r["cid"]
        for r in txtable_sql(
            spark, f"SELECT k, cid FROM txtable.`{root}`"
        ).collect()
    }
    assert rows == {"p1": 1, "p2": 2}
    # exactly-once skip: no re-load, no re-allocation
    txtable_sql(
        spark,
        f"COPY INTO txtable.`{root}` FROM '{land}' FILEFORMAT = PARQUET",
    )
    d = txtable_sql(spark, f"DESCRIBE DETAIL txtable.`{root}`")
    assert d["identity_high_water"] == {"cid": 2}


def test_replace_resets_identity_unless_respecified(spark):
    root = _root("repl")
    _mk(spark, root, [("a", 1.0)])
    txlog_upsert(
        spark,
        spark.createDataFrame([("x", 1.0)], "k string, v double"),
        root,
        key="k",
        num_buckets=4,
        replace=True,
    )
    man = _latest_manifest(spark, root)
    assert not man.get("identity_columns")
    # CREATE OR REPLACE with a fresh identity declaration restarts it
    txtable_sql(
        spark,
        f"CREATE OR REPLACE TABLE txtable.`{root}` (k STRING, rid BIGINT "
        "GENERATED ALWAYS AS IDENTITY) KEY k BUCKETS 4",
    )
    txtable_sql(spark, f"INSERT INTO txtable.`{root}` VALUES ('z')")
    got = txtable_sql(spark, f"SELECT rid FROM txtable.`{root}`").collect()
    assert got[0]["rid"] == 1


def test_positional_insert_excludes_identity(spark):
    root = _root("pos")
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{root}` (k STRING, v DOUBLE, rid BIGINT "
        "GENERATED ALWAYS AS IDENTITY) KEY k BUCKETS 2",
    )
    # width check counts only caller-insertable columns
    with pytest.raises(UnsupportedSqlError, match="use an explicit"):
        txtable_sql(
            spark, f"INSERT INTO txtable.`{root}` VALUES ('a', 1.0, 5)"
        )
    # explicit list naming the ALWAYS column refuses at allocation
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        txtable_sql(
            spark,
            f"INSERT INTO txtable.`{root}` (k, v, rid) VALUES ('a', 1.0, 5)",
        )


def test_allocation_determinism_at_scale(spark):
    # 20k keys across real shuffle partitions: allocated ids must equal
    # EXACTLY start + step*(rank-1) in key order — the property the
    # q249 oracle replays, exercised here at a size where the two-pass
    # rank genuinely spans partitions (counts/offsets/local ranks must
    # share one exchange; a boundary mismatch would misnumber whole
    # partitions)
    root = _root("scale")
    df = (
        spark.range(20000)
        .select(
            F.concat(F.lit("k"), F.format_string("%06d", F.col("id")))
            .alias("k"),
            F.rand(seed=7).alias("v"),
        )
    )
    txlog_upsert(
        spark,
        df.withColumn("rid", F.lit(None).cast("long")),
        root,
        key="k",
        num_buckets=16,
        identity_columns={"rid": {"start": 1000, "step": 2}},
    )
    got = (
        read_txtable(spark, root)
        .select("k", "rid")
        .orderBy("k")
        .collect()
    )
    assert [r["rid"] for r in got] == [1000 + 2 * i for i in range(20000)]
    # second batch: 5k new interleaved keys continue densely
    df2 = (
        spark.range(5000)
        .select(
            F.concat(F.lit("k"), F.format_string("%06d", F.col("id") * 4 + 1))
            .alias("k2"),
        )
        .select(F.concat(F.col("k2"), F.lit("x")).alias("k"))
    )
    txlog_upsert(
        spark, df2.withColumn("v", F.lit(0.0)), root
    )
    man = _latest_manifest(spark, root)
    assert man["identity_high_water"] == {"rid": 1000 + 2 * 24999}
    new = (
        read_txtable(spark, root)
        .filter(F.col("k").endswith("x"))
        .orderBy("k")
        .collect()
    )
    assert [r["rid"] for r in new] == [
        1000 + 2 * (20000 + i) for i in range(5000)
    ]


def test_txn_replay_never_double_allocates(spark):
    # the streaming bridge's exactly-once contract composes with
    # identity: a replayed foreachBatch delivery is skipped by the
    # txn watermark BEFORE allocation runs, so the high-water mark
    # does not advance and no id is burned
    root = _root("txn")
    df = spark.createDataFrame(
        [("a", 1.0)], "k string, v double"
    ).withColumn("rid", F.lit(None).cast("long"))
    txlog_upsert(
        spark, df, root, key="k", num_buckets=4,
        identity_columns={"rid": {}},
        txn_app_id="stream-1", txn_version=1,
    )
    assert _latest_manifest(spark, root)["identity_high_water"] == {"rid": 1}
    # replay of version 1: skipped, mark unchanged
    txlog_upsert(
        spark,
        spark.createDataFrame([("b", 2.0)], "k string, v double"),
        root, txn_app_id="stream-1", txn_version=1,
    )
    man = _latest_manifest(spark, root)
    assert man["identity_high_water"] == {"rid": 1}
    assert _ids(spark, root) == {"a": 1}
    # next version allocates normally
    txlog_upsert(
        spark,
        spark.createDataFrame([("b", 2.0)], "k string, v double"),
        root, txn_app_id="stream-1", txn_version=2,
    )
    assert _ids(spark, root) == {"a": 1, "b": 2}
