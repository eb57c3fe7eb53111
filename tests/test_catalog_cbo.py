"""Catalog + cost-based-optimizer surface: managed tables via
``saveAsTable``, ``ANALYZE TABLE`` statistics, and CBO consuming them.

At 100 TB the catalog stats are what let Catalyst choose broadcast vs
shuffle joins WITHOUT the hint crutch (tests/test_plan_properties.py
covers the manual hints) — a table whose size statistics say "tiny"
broadcasts even when the session's default threshold would not have
guessed it from file sizes alone.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def eng_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS eng LOCATION '{tmp_path}/wh'")
    yield "eng"
    spark.sql("DROP DATABASE IF EXISTS eng CASCADE")


def test_save_as_table_and_analyze_stats(spark, eng_db, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.write.mode("overwrite").saveAsTable("eng.nation_t")
    spark.sql("ANALYZE TABLE eng.nation_t COMPUTE STATISTICS FOR ALL COLUMNS")
    # table readable through SQL with catalog identity
    n = spark.sql("SELECT COUNT(*) AS n FROM eng.nation_t").first().n
    assert n == nation.count() > 0
    # row-count statistic landed in the catalog
    desc = {
        r.col_name: r.data_type
        for r in spark.sql("DESCRIBE TABLE EXTENDED eng.nation_t").collect()
    }
    assert "Statistics" in desc and "rows" in desc["Statistics"]
    # column-level stats present (distinct count for the key)
    col = {
        r.info_name: r.info_value
        for r in spark.sql(
            "DESCRIBE EXTENDED eng.nation_t n_nationkey"
        ).collect()
    }
    assert col.get("distinct_count") not in (None, "NULL")


def test_cbo_broadcasts_from_catalog_stats(spark, eng_db, sf_dir):
    """With CBO on and ANALYZE'd stats, the small catalog table
    broadcasts in a join planned purely from statistics."""
    spark.read.parquet(f"{sf_dir}/customer.parquet").write.mode(
        "overwrite"
    ).saveAsTable("eng.customer_t")
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.mode(
        "overwrite"
    ).saveAsTable("eng.nation_t2")
    spark.sql("ANALYZE TABLE eng.customer_t COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE eng.nation_t2 COMPUTE STATISTICS")
    old = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        j = spark.sql(
            """
            SELECT c.c_custkey, n.n_name
            FROM eng.customer_t c JOIN eng.nation_t2 n
              ON c.c_nationkey = n.n_nationkey
            """
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old)
