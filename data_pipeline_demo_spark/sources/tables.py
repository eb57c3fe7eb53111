"""Parquet table catalog over the synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under a scale-
factor directory. Parquet carries its own schema; we rely on Catalyst
column pruning + filter pushdown (verify with ``.explain``: ``ReadSchema``
should list only referenced columns, ``PushedFilters`` the predicates).

At 100 TB these would be partitioned datasets (e.g. lineitem partitioned by
ship month); the loader takes any Hadoop-FS path so the same code reads a
directory tree of parquet with partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should be broadcast in joins against facts.
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table from ``sf_dir``."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Events carries TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos as raw int64 and
    truncate to microseconds (floor-division, matching DuckDB's
    TIMESTAMP_NS→TIMESTAMP cast) so `ts` is a first-class TimestampType
    for window/watermark operators."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(path)
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` text queries
    (the engine's SQL surface) can run against the catalog."""
    for n in TABLE_NAMES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
