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
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` text queries
    (the engine's SQL surface) can run against the catalog."""
    for n in TABLE_NAMES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
