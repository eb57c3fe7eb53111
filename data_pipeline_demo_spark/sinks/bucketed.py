"""Bucketed-table layout for shuffle-free co-located joins (the 100 TB
join strategy SURVEY.md §2.2 and plans/relational.py:11 document).

A fact-fact equi-join (q04's orders ⋈ lineitem) shuffles BOTH sides on
the key every time it runs. At 100 TB that shuffle dominates the job —
and it repeats for every query joining the same tables. Bucketing
amortizes it: pay one clustered write per table, then every join on the
bucket key is a zero-exchange sort-merge of co-located buckets.

Spark's bucketing rides the catalog (`DataFrameWriter.bucketBy` +
``saveAsTable``): bucket membership is recorded in table metadata, and
the planner drops the Exchange when both sides report the same bucket
spec (`spark.sql.sources.bucketing.enabled`, on by default). Bucket
counts must match (or divide evenly with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).

``tests/test_bucketed_join.py`` asserts the plan property itself: the
bucketed join's physical plan contains NO shuffle exchange, while the
same join over plain parquet contains two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a catalog table clustered (and optionally
    sorted) by ``bucket_col``. Sorting within buckets lets the join skip
    its sort too — the merge phase reads both sides in key order."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def cojoin(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-spec catalog tables on their bucket key.
    With matching bucket counts the optimizer plans a sort-merge join
    with no Exchange on either side — co-located, shuffle-free."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
