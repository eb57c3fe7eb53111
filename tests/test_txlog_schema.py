"""Per-version schema tracking on the transactional table
(sinks/txlog.py): Delta's schema-on-log model — the manifest records
each version's logical schema, writes ENFORCE it (evolution is an
explicit opt-in, type conflicts always raise), reads use it as the
authority (explicit-schema scan: no mergeSchema footer sweep, metadata
-added columns surface as nulls, dropped columns project away), and
time travel returns each version's OWN schema.

Reference scope: the reference pipeline has no schema management at all
— pd.read_csv infers and mutates in place (/root/reference/
data_pipeline.py:299,:372-377); this suite covers the lakehouse surface
a 100 TB table needs (ALTER without rewriting a petabyte of files).
"""

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.sinks.txlog import (
    read_txtable,
    restore_txtable,
    shallow_clone_txtable,
    txlog_add_column,
    txlog_drop_column,
    txlog_update,
    txlog_upsert,
    txtable_changes,
)


def _base(spark, tmp_path, name="t"):
    root = str(tmp_path / name)
    txlog_upsert(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        root,
        num_buckets=4,
    )
    return root


def test_new_column_requires_evolve_opt_in(spark, tmp_path):
    root = _base(spark, tmp_path)
    batch = spark.createDataFrame([(3, "c", 1.5)], "id long, v string, w double")
    with pytest.raises(ValueError, match="evolve_schema"):
        txlog_upsert(spark, batch, root)
    # evolution: column lands, untouched rows read null
    txlog_upsert(spark, batch, root, evolve_schema=True)
    got = {r["id"]: (r["v"], r["w"]) for r in read_txtable(spark, root).collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 1.5)}
    # schema order: new column appended last
    assert read_txtable(spark, root).columns == ["id", "v", "w"]


def test_time_travel_keeps_each_versions_schema(spark, tmp_path):
    root = _base(spark, tmp_path)
    txlog_upsert(
        spark,
        spark.createDataFrame([(3, "c", 7)], "id long, v string, n long"),
        root,
        evolve_schema=True,
    )
    assert read_txtable(spark, root, version=0).columns == ["id", "v"]
    assert read_txtable(spark, root, version=1).columns == ["id", "v", "n"]


def test_type_conflict_always_raises(spark, tmp_path):
    root = _base(spark, tmp_path)
    bad = spark.createDataFrame([(3, 9)], "id long, v long")
    with pytest.raises(ValueError, match="schema conflict"):
        txlog_upsert(spark, bad, root)
    with pytest.raises(ValueError, match="schema conflict"):
        txlog_upsert(spark, bad, root, evolve_schema=True)


def test_missing_columns_null_fill_and_keep_schema(spark, tmp_path):
    root = _base(spark, tmp_path)
    txlog_upsert(spark, spark.createDataFrame([(5,)], "id long"), root)
    got = {r["id"]: r["v"] for r in read_txtable(spark, root).collect()}
    assert got == {1: "a", 2: "b", 5: None}
    assert read_txtable(spark, root).columns == ["id", "v"]


def test_add_column_is_metadata_only(spark, tmp_path):
    import json
    import pathlib

    root = _base(spark, tmp_path)
    files_before = {
        str(p) for p in pathlib.Path(root).rglob("*.parquet")
    }
    v = txlog_add_column(spark, root, "score", "double")
    assert v == 1
    # zero data IO: not one new file
    assert {str(p) for p in pathlib.Path(root).rglob("*.parquet")} == files_before
    df = read_txtable(spark, root)
    assert df.columns == ["id", "v", "score"]
    assert df.filter(F.col("score").isNull()).count() == 2
    # the change feed between the versions is empty (no row changed)
    assert txtable_changes(spark, root, from_version=0).count() == 0
    # manifests agree: same file refs carried forward
    m0 = json.loads((pathlib.Path(root) / "_commits").glob("*00.json").__iter__().__next__().read_text())
    m1 = json.loads(next((pathlib.Path(root) / "_commits").glob("*01.json")).read_text())
    assert m0["buckets"] == m1["buckets"]


def test_added_column_is_updatable_and_mergeable(spark, tmp_path):
    root = _base(spark, tmp_path)
    txlog_add_column(spark, root, "score", "double")
    # UPDATE can SET the column even though no live file contains it
    n = txlog_update(spark, root, set={"score": "2.5"}, where="id = 1")
    assert n == 1
    got = {r["id"]: r["score"] for r in read_txtable(spark, root).collect()}
    assert got == {1: 2.5, 2: None}
    # MERGE writes it naturally now
    txlog_upsert(
        spark,
        spark.createDataFrame([(2, "B", 9.0)], "id long, v string, score double"),
        root,
    )
    got = {r["id"]: r["score"] for r in read_txtable(spark, root).collect()}
    assert got == {1: 2.5, 2: 9.0}


def test_drop_column_logical_and_tombstoned(spark, tmp_path):
    root = _base(spark, tmp_path)
    txlog_drop_column(spark, root, "v")
    assert read_txtable(spark, root).columns == ["id"]
    # old version still time-travels to it
    assert read_txtable(spark, root, version=0).columns == ["id", "v"]
    # the WRITE-evolution path keeps refusing the tombstoned name
    # (schema changes through writes stay conservative; re-adding is
    # an explicit ALTER, which mints a fresh physical — round 10)
    with pytest.raises(ValueError, match="previously dropped"):
        txlog_upsert(
            spark,
            spark.createDataFrame([(9, "z")], "id long, v string"),
            root,
            evolve_schema=True,
        )
    # key + declared index columns can't drop
    with pytest.raises(ValueError, match="table key"):
        txlog_drop_column(spark, root, "id")


def test_drop_then_readd_reads_null_not_old_values(spark, tmp_path):
    """Round-10 column mapping: re-adding a dropped name mints a FRESH
    physical column, so existing rows read NULL — the old file bytes
    under the tombstoned physical can never resurrect."""
    root = _base(spark, tmp_path)
    txlog_drop_column(spark, root, "v")
    txlog_add_column(spark, root, "v", "string")
    got = {r["id"]: r["v"] for r in read_txtable(spark, root).collect()}
    assert got == {1: None, 2: None}  # NOT the original 'a'/'b'
    # the minted physical is recorded and distinct from the tombstone
    import json
    import pathlib

    man = json.loads(
        sorted((pathlib.Path(root) / "_commits").glob("*.json"))[-1]
        .read_text()
    )
    fld = next(f for f in man["schema"] if f["name"] == "v")
    assert fld["metadata"]["physical"] != "v"
    assert "v" in man["dropped_columns"]
    # and the re-added column is fully writable
    n = txlog_update(spark, root, set={"v": "'fresh'"}, where="id = 2")
    assert n == 1
    got = {r["id"]: r["v"] for r in read_txtable(spark, root).collect()}
    assert got == {1: None, 2: "fresh"}
    # time travel: each version reads its own schema and values
    assert {
        r["id"]: r["v"] for r in read_txtable(spark, root, version=0).collect()
    } == {1: "a", 2: "b"}
    assert read_txtable(spark, root, version=1).columns == ["id"]


def test_lossless_upcasts_accepted_data_cast_up(spark, tmp_path):
    root = str(tmp_path / "up")
    txlog_upsert(
        spark,
        spark.createDataFrame([(1, 1.5)], "id long, amount double"),
        root,
        num_buckets=4,
    )
    # int id + decimal-literal amount (the SQL-source shape) cast UP;
    # the table schema is unchanged
    batch = spark.createDataFrame([(2, 9)], "id int, amount int").select(
        "id", F.col("amount").cast("decimal(3,1)").alias("amount")
    )
    txlog_upsert(spark, batch, root)
    df = read_txtable(spark, root)
    assert dict(df.dtypes) == {"id": "bigint", "amount": "double"}
    assert {r["id"]: r["amount"] for r in df.collect()} == {1: 1.5, 2: 9.0}
    # lossy direction still refuses: long into an int column
    root2 = str(tmp_path / "down")
    txlog_upsert(
        spark, spark.createDataFrame([(1, 1)], "id long, n int"), root2
    )
    with pytest.raises(ValueError, match="schema conflict"):
        txlog_upsert(
            spark, spark.createDataFrame([(2, 2)], "id long, n long"), root2
        )


def test_restore_reverts_schema(spark, tmp_path):
    root = _base(spark, tmp_path)
    txlog_add_column(spark, root, "extra", "long")
    assert read_txtable(spark, root).columns == ["id", "v", "extra"]
    restore_txtable(spark, root, version=0)
    assert read_txtable(spark, root).columns == ["id", "v"]


def test_clone_copies_schema(spark, tmp_path):
    root = _base(spark, tmp_path)
    txlog_add_column(spark, root, "extra", "long")
    tgt = str(tmp_path / "clone")
    shallow_clone_txtable(spark, root, tgt)
    assert read_txtable(spark, tgt).columns == ["id", "v", "extra"]


def test_python_writer_enforces_and_evolves(spark, tmp_path):
    root = str(tmp_path / "pyw")
    spark.createDataFrame([(1, "a")], "id long, v string").write.format(
        "txtable"
    ).option("numBuckets", "4").mode("append").save(root)
    wider = spark.createDataFrame([(2, "b", 5)], "id long, v string, n long")
    with pytest.raises(Exception, match="evolveSchema|lacks"):
        wider.write.format("txtable").mode("append").save(root)
    wider.write.format("txtable").option("evolveSchema", "true").mode(
        "append"
    ).save(root)
    df = read_txtable(spark, root)
    assert df.columns == ["id", "v", "n"]
    assert {r["id"]: r["n"] for r in df.collect()} == {1: None, 2: 5}
    # the DSv2 python reader agrees (manifest schema is the authority)
    pr = spark.read.format("txtable").load(root)
    assert pr.columns == ["id", "v", "n"]
    assert {r["id"]: r["n"] for r in pr.collect()} == {1: None, 2: 5}
    # ... including under time travel
    assert (
        spark.read.format("txtable").option("version", "0").load(root).columns
        == ["id", "v"]
    )


def test_python_writer_overwrite_replaces_schema(spark, tmp_path):
    root = str(tmp_path / "pyo")
    spark.createDataFrame([(1, "a")], "id long, v string").write.format(
        "txtable"
    ).mode("append").save(root)
    spark.createDataFrame([(1, 2.0)], "id long, w double").write.format(
        "txtable"
    ).mode("overwrite").save(root)
    assert read_txtable(spark, root).columns == ["id", "w"]


def test_dsv2_reader_sees_metadata_added_column(spark, tmp_path):
    root = _base(spark, tmp_path)
    txlog_add_column(spark, root, "score", "double")
    pr = spark.read.format("txtable").load(root)
    assert pr.columns == ["id", "v", "score"]
    assert pr.filter(F.col("score").isNull()).count() == 2


def test_jvm_and_python_agree_after_drop(spark, tmp_path):
    root = _base(spark, tmp_path)
    txlog_drop_column(spark, root, "v")
    assert spark.read.format("txtable").load(root).columns == ["id"]


# --- GENERATED ALWAYS AS columns (Delta's generated-column surface) --------


def _gen_table(spark, tmp_path):
    root = str(tmp_path / "gen")
    txlog_upsert(
        spark,
        spark.createDataFrame(
            [(1, "2024-03-05 10:00:00", 2.0), (2, "2024-03-06 11:00:00", 3.5)],
            "id long, ts string, amount double",
        ),
        root,
        num_buckets=4,
        generated_columns={"day": "CAST(ts AS DATE)", "cents": "CAST(amount * 100 AS BIGINT)"},
    )
    return root


def test_generated_columns_computed_at_creation_and_on_merge(spark, tmp_path):
    import datetime as dt

    root = _gen_table(spark, tmp_path)
    got = {r["id"]: (r["day"], r["cents"]) for r in read_txtable(spark, root).collect()}
    assert got == {
        1: (dt.date(2024, 3, 5), 200),
        2: (dt.date(2024, 3, 6), 350),
    }
    # a later MERGE without the generated columns computes them too
    txlog_upsert(
        spark,
        spark.createDataFrame(
            [(3, "2024-03-07 09:00:00", 1.25)], "id long, ts string, amount double"
        ),
        root,
    )
    got = {r["id"]: r["cents"] for r in read_txtable(spark, root).collect()}
    assert got[3] == 125


def test_generated_column_provided_values_validate(spark, tmp_path):
    root = _gen_table(spark, tmp_path)
    import datetime as dt

    ok = spark.createDataFrame(
        [(4, "2024-03-08 08:00:00", 2.0, dt.date(2024, 3, 8), 200)],
        "id long, ts string, amount double, day date, cents long",
    )
    txlog_upsert(spark, ok, root)  # matching values pass
    bad = spark.createDataFrame(
        [(5, "2024-03-09 08:00:00", 2.0, dt.date(2024, 3, 9), 999)],
        "id long, ts string, amount double, day date, cents long",
    )
    with pytest.raises(ValueError, match="generated column 'cents'"):
        txlog_upsert(spark, bad, root)


def test_generated_columns_recompute_on_update(spark, tmp_path):
    root = _gen_table(spark, tmp_path)
    # updating an INPUT recomputes the generated value
    txlog_update(spark, root, set={"amount": "amount * 2"}, where="id = 1")
    got = {r["id"]: r["cents"] for r in read_txtable(spark, root).collect()}
    assert got == {1: 400, 2: 350}
    # direct SET of a generated column refuses
    with pytest.raises(ValueError, match="generated column"):
        txlog_update(spark, root, set={"cents": "1"}, where="id = 1")


def test_generated_columns_fixed_at_creation(spark, tmp_path):
    root = _gen_table(spark, tmp_path)
    with pytest.raises(ValueError, match="generated_columns"):
        txlog_upsert(
            spark,
            spark.createDataFrame(
                [(9, "2024-03-09 00:00:00", 1.0)],
                "id long, ts string, amount double",
            ),
            root,
            generated_columns={"other": "1"},
        )


def test_python_writer_refuses_generated_tables(spark, tmp_path):
    root = _gen_table(spark, tmp_path)
    df = spark.createDataFrame(
        [(9, "2024-03-09 00:00:00", 1.0)], "id long, ts string, amount double"
    )
    with pytest.raises(Exception, match="generated"):
        df.write.format("txtable").mode("append").save(root)


def test_drop_generated_and_referenced_columns(spark, tmp_path):
    root = _gen_table(spark, tmp_path)
    # dropping an INPUT of a live generated column refuses
    with pytest.raises(ValueError, match="reference it"):
        txlog_drop_column(spark, root, "amount")
    # dropping the generated column itself drops the rule; its input
    # then becomes droppable
    txlog_drop_column(spark, root, "cents")
    txlog_drop_column(spark, root, "amount")
    cols = read_txtable(spark, root).columns
    assert "cents" not in cols and "amount" not in cols
    # MERGE afterwards: remaining generated column still computes
    txlog_upsert(
        spark,
        spark.createDataFrame(
            [(7, "2024-03-10 00:00:00")], "id long, ts string"
        ),
        root,
    )
    import datetime as dt

    got = {r["id"]: r["day"] for r in read_txtable(spark, root).collect()}
    assert got[7] == dt.date(2024, 3, 10)
