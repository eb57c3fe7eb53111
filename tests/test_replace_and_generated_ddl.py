"""Round-12 judge directives #3 (GENERATED ALWAYS AS in the CREATE
grammar + SHOW CREATE round-trip) and #9 (CREATE OR REPLACE TABLE:
atomic redefinition preserving history), plus the round-12 advisor's
SHOW CREATE identifier-quoting finding."""

from __future__ import annotations

import pytest

from data_pipeline_demo_spark.sinks.sql_dml import (
    UnsupportedSqlError,
    txtable_sql,
)
from data_pipeline_demo_spark.sinks.txlog import (
    _latest_manifest,
    read_txtable,
    restore_txtable,
    table_constraints,
    table_properties,
    txlog_upsert,
)


# ---------------------------------------------------------------------------
# GENERATED ALWAYS AS in CREATE TABLE
# ---------------------------------------------------------------------------


def test_create_table_generated_column_computes_on_insert(spark, tmp_path):
    t = str(tmp_path / "g1")
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{t}` (id BIGINT, ts TIMESTAMP, "
        "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)), "
        "cents BIGINT GENERATED ALWAYS AS (CAST(id * 100 AS BIGINT))) "
        "KEY id BUCKETS 2",
    )
    man = _latest_manifest(spark, t)
    assert man["generated_columns"] == {
        "day": "CAST(ts AS DATE)",
        "cents": "CAST(id * 100 AS BIGINT)",
    }
    txtable_sql(
        spark,
        f"INSERT INTO txtable.`{t}` (id, ts) VALUES "
        "(3, TIMESTAMP '2026-02-01 10:30:00')",
    )
    [r] = read_txtable(spark, t).collect()
    assert str(r.day) == "2026-02-01" and r.cents == 300


def test_generated_expr_with_literal_and_nested_commas(spark, tmp_path):
    """The expression may contain string literals (masked — a literal
    'GENERATED ALWAYS AS (' cannot confuse the scan), commas inside
    calls, and comparisons; sibling columns with decimal/struct type
    parameters still split correctly."""
    t = str(tmp_path / "g2")
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{t}` ("
        "id BIGINT, amt DECIMAL(10,2), meta STRUCT<a:INT,b:STRING>, "
        "tag STRING GENERATED ALWAYS AS "
        "(CASE WHEN amt < 5 THEN concat('lo, GENERATED ALWAYS AS (', "
        "CAST(id AS STRING)) ELSE 'hi' END)) KEY id BUCKETS 2",
    )
    man = _latest_manifest(spark, t)
    assert "CASE WHEN amt < 5" in man["generated_columns"]["tag"]
    txtable_sql(
        spark,
        f"INSERT INTO txtable.`{t}` (id, amt, meta) VALUES "
        "(1, 2.00, CAST(named_struct('a', 1, 'b', 'x') "
        "AS STRUCT<a:INT,b:STRING>)), "
        "(2, 9.00, CAST(named_struct('a', 2, 'b', 'y') "
        "AS STRUCT<a:INT,b:STRING>))",
    )
    got = {r.id: r.tag for r in read_txtable(spark, t).collect()}
    assert got[1] == "lo, GENERATED ALWAYS AS (1" and got[2] == "hi"


def test_generated_key_refuses(spark, tmp_path):
    t = str(tmp_path / "g3")
    with pytest.raises(UnsupportedSqlError, match="KEY column"):
        txtable_sql(
            spark,
            f"CREATE TABLE txtable.`{t}` "
            "(id BIGINT GENERATED ALWAYS AS (1), v DOUBLE) KEY id",
        )


def test_show_create_quotes_identifiers(spark, tmp_path):
    """Advisor finding: a column named with a space / reserved word
    must emit backticked and re-parse through the round-trip."""
    t = str(tmp_path / "q1")
    txlog_upsert(
        spark,
        spark.createDataFrame(
            [(1, 2.0)], "`order id` long, `select` double"
        ),
        t,
        key="order id",
        num_buckets=2,
        stats_columns=["select"],
    )
    script = txtable_sql(spark, f"SHOW CREATE TABLE txtable.`{t}`")
    assert "`order id` BIGINT" in script and "KEY `order id`" in script
    assert "STATS (`select`)" in script
    dst = str(tmp_path / "q2")
    txtable_sql(spark, script.replace(t, dst))
    man = _latest_manifest(spark, dst)
    assert man["key"] == "order id"
    assert man.get("stats_columns") == ["select"]


# ---------------------------------------------------------------------------
# CREATE OR REPLACE TABLE
# ---------------------------------------------------------------------------


def test_create_or_replace_lifecycle_with_time_travel(spark, tmp_path):
    """create -> insert -> REPLACE with a new shape -> old versions
    still time-travelable, RESTORE brings the old table back."""
    t = str(tmp_path / "r1")
    txtable_sql(
        spark, f"CREATE TABLE txtable.`{t}` (id BIGINT, v DOUBLE) KEY id"
    )
    txtable_sql(spark, f"INSERT INTO txtable.`{t}` VALUES (1, 10.0), (2, 20.0)")
    txtable_sql(
        spark,
        f"CREATE OR REPLACE TABLE txtable.`{t}` "
        "(k STRING, n BIGINT) KEY k BUCKETS 4",
    )
    man = _latest_manifest(spark, t)
    assert man["operation"] == "REPLACE"
    assert man["key"] == "k" and man["num_buckets"] == 4
    assert read_txtable(spark, t).count() == 0
    # pre-replace version readable under its own schema
    old = txtable_sql(
        spark, f"SELECT * FROM txtable.`{t}` VERSION AS OF 1"
    )
    assert {r.id: r.v for r in old.collect()} == {1: 10.0, 2: 20.0}
    # new shape accepts writes on the new key
    txtable_sql(spark, f"INSERT INTO txtable.`{t}` VALUES ('a', 1)")
    assert read_txtable(spark, t).count() == 1
    # RESTORE to the pre-replace snapshot brings the old table back
    restore_txtable(spark, t, version=1)
    got = {r.id: r.v for r in read_txtable(spark, t).collect()}
    assert got == {1: 10.0, 2: 20.0}


def test_create_or_replace_resets_constraints_and_properties(
    spark, tmp_path
):
    t = str(tmp_path / "r2")
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{t}` (id BIGINT, amt DOUBLE) KEY id "
        "TBLPROPERTIES ('owner' = 'etl')",
    )
    txtable_sql(
        spark,
        f"ALTER TABLE txtable.`{t}` ADD CONSTRAINT pos CHECK (amt >= 0)",
    )
    txtable_sql(
        spark,
        f"CREATE OR REPLACE TABLE txtable.`{t}` (id BIGINT, amt DOUBLE) "
        "KEY id",
    )
    assert table_properties(spark, t) == {}
    assert table_constraints(spark, t) == {}
    # the old constraint no longer gates writes
    txtable_sql(spark, f"INSERT INTO txtable.`{t}` VALUES (1, -5.0)")
    assert read_txtable(spark, t).count() == 1


def test_create_or_replace_on_missing_table_is_plain_create(spark, tmp_path):
    t = str(tmp_path / "r3")
    txtable_sql(
        spark, f"CREATE OR REPLACE TABLE txtable.`{t}` (id BIGINT) KEY id"
    )
    man = _latest_manifest(spark, t)
    assert man["version"] == 0 and man["operation"] == "CREATE"


def test_create_or_replace_as_select(spark, tmp_path):
    t = str(tmp_path / "r4")
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{t}` AS SELECT id, id * 2.0 AS v "
        "FROM range(3)",
    )
    txtable_sql(
        spark,
        f"CREATE OR REPLACE TABLE txtable.`{t}` KEY name AS "
        "SELECT concat('u', id) AS name, id AS n FROM range(5)",
    )
    df = read_txtable(spark, t)
    assert df.count() == 5 and set(df.columns) == {"name", "n"}
    assert _latest_manifest(spark, t)["key"] == "name"


def test_plain_create_still_refuses_existing(spark, tmp_path):
    t = str(tmp_path / "r5")
    txtable_sql(spark, f"CREATE TABLE txtable.`{t}` (id BIGINT) KEY id")
    with pytest.raises(FileExistsError):
        txtable_sql(spark, f"CREATE TABLE txtable.`{t}` (id BIGINT) KEY id")


def test_replace_resets_copy_history_and_app_txns(spark, tmp_path):
    """REPLACE starts a logically-new table: writer-idempotency
    watermarks and COPY INTO load history must not leak through (a
    retained watermark would silently skip the new table's first
    delivery; retained load history would skip its landing files)."""
    import pandas as pd

    t = str(tmp_path / "r6")
    land = tmp_path / "land"
    land.mkdir()
    pd.DataFrame({"id": [1, 2], "v": [1.0, 2.0]}).to_parquet(
        land / "a.parquet"
    )
    txtable_sql(
        spark, f"CREATE TABLE txtable.`{t}` (id BIGINT, v DOUBLE) KEY id"
    )
    txtable_sql(
        spark,
        f"COPY INTO txtable.`{t}` FROM '{land}' FILEFORMAT = PARQUET",
    )
    txlog_upsert(
        spark,
        spark.createDataFrame([(9, 9.0)], "id long, v double"),
        t,
        txn_app_id="app",
        txn_version=5,
    )
    txtable_sql(
        spark,
        f"CREATE OR REPLACE TABLE txtable.`{t}` (id BIGINT, v DOUBLE) "
        "KEY id",
    )
    man = _latest_manifest(spark, t)
    assert man.get("app_txns", {}) == {}
    assert not man.get("copy_log") and not man.get("copy_files")
    # the same landing file loads again into the replaced table
    txtable_sql(
        spark,
        f"COPY INTO txtable.`{t}` FROM '{land}' FILEFORMAT = PARQUET",
    )
    assert read_txtable(spark, t).count() == 2
    # and the old watermark no longer skips app deliveries
    txlog_upsert(
        spark,
        spark.createDataFrame([(9, 9.0)], "id long, v double"),
        t,
        txn_app_id="app",
        txn_version=5,
    )
    assert read_txtable(spark, t).count() == 3


def test_create_or_replace_shallow_clone(spark, tmp_path):
    """CREATE OR REPLACE ... CLONE: the target is redefined as a
    zero-copy clone of the source in one commit; target history
    (including its pre-replace contents) stays time-travelable, and
    the source's properties/constraints REPLACE the target's."""
    from data_pipeline_demo_spark.sinks.txlog import (
        read_txtable,
        table_properties,
        txtable_history,
    )

    src = str(tmp_path / "csrc")
    dst = str(tmp_path / "cdst")
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{src}` AS SELECT id, id * 2.0 AS v "
        "FROM range(10)",
    )
    txtable_sql(
        spark,
        f"ALTER TABLE txtable.`{src}` SET TBLPROPERTIES "
        "('origin' = 'src')",
    )
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{dst}` AS SELECT id, 'old' AS tag "
        "FROM range(3)",
    )
    txtable_sql(
        spark,
        f"ALTER TABLE txtable.`{dst}` SET TBLPROPERTIES "
        "('origin' = 'dst')",
    )
    n = txtable_sql(
        spark,
        f"CREATE OR REPLACE TABLE txtable.`{dst}` CLONE txtable.`{src}`",
    )
    assert n == 10
    df = read_txtable(spark, dst)
    assert df.count() == 10 and set(df.columns) == {"id", "v"}
    assert table_properties(spark, dst) == {"origin": "src"}
    ops = [h["operation"] for h in txtable_history(spark, dst)]
    assert ops[-1] == "REPLACE CLONE"
    # pre-replace contents still time-travelable
    old = txtable_sql(
        spark, f"SELECT * FROM txtable.`{dst}` VERSION AS OF 0"
    )
    assert {r.tag for r in old.collect()} == {"old"}
    # plain CLONE still refuses an existing target
    with pytest.raises(FileExistsError):
        txtable_sql(
            spark, f"CREATE TABLE txtable.`{dst}` CLONE txtable.`{src}`"
        )


def test_create_or_replace_deep_clone(spark, tmp_path):
    from data_pipeline_demo_spark.sinks.txlog import read_txtable

    src = str(tmp_path / "dsrc")
    dst = str(tmp_path / "ddst")
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{src}` AS SELECT id, id + 0.5 AS v "
        "FROM range(7)",
    )
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{dst}` AS SELECT id, 'x' AS t FROM range(2)",
    )
    n = txtable_sql(
        spark,
        f"CREATE OR REPLACE TABLE txtable.`{dst}` DEEP CLONE "
        f"txtable.`{src}`",
    )
    assert n == 7
    df = read_txtable(spark, dst)
    assert df.count() == 7 and set(df.columns) == {"id", "v"}
    # deep clone detaches: source removal cannot break the target
    import shutil

    shutil.rmtree(src)
    assert read_txtable(spark, dst).count() == 7
