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
    """Events carries TIMESTAMP(NANOS) parquet. Depending on the Spark
    version the column surfaces as raw int64 nanos (with the legacy
    ``nanosAsLong`` conf, ≤3.x behavior) or as TIMESTAMP_NTZ (4.x reads
    nanos natively, truncating to micros). Normalize both to a session-
    zone TimestampType — the session is pinned UTC (session.py) so the
    NTZ→TZ cast is deterministic — because window/watermark operators
    accept either but ``unix_micros`` and the epoch arithmetic in
    streaming/jobs.py require TIMESTAMP."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(path)
    dtype = dict(raw.dtypes).get("ts")
    if dtype == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` text queries
    (the engine's SQL surface) can run against the catalog."""
    for n in TABLE_NAMES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
