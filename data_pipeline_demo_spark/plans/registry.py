"""Query registry: the engine's oracle-checked capability surface.

Every operator the engine claims (SURVEY.md §2) registers one named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus, when SQL-expressible, an
ANSI-SQL oracle string DuckDB runs on the same parquet tables. The driver
hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json); queries without
an oracle get a rows-only check.

Column-name parity rule: every computed column is aliased identically in
the DataFrame code and the oracle SQL — the driver sorts columns by name
before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
