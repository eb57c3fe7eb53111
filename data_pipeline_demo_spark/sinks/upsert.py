"""Idempotent upsert sink + ingest ledger (SURVEY.md §2.1 K3/K5, P4/O1).

The reference's core sink is a chunked PostgREST ``upsert(on_conflict=
"id")`` with retry + dead-letter (`/root/reference/data_pipeline.py:
501-572`). The engine provides the same semantics three ways:

- **Parquet merge-on-write** (`upsert_parquet`): anti-join the target's
  superseded keys, union the new rows, atomic directory swap. Works
  anywhere Spark writes files; used by tests. (On a lakehouse this is
  exactly what Delta/Iceberg ``MERGE INTO`` does with transaction-log
  atomicity — swap in `delta.tables.DeltaTable.merge` when the runtime
  ships Delta.)
- **JDBC upsert SQL builder** (`upsert_sql`): the per-partition
  ``INSERT … ON CONFLICT (id) DO UPDATE`` statement a
  ``df.foreachPartition`` writer executes against Postgres — the direct
  analog of the reference's endpoint, minus the 5,000-row single-thread
  bottleneck (each partition streams independently).
- **Ledger guard** (`new_files`): the duplicate-run check
  (`data_pipeline.py:138-142,:213-238`) as ONE set-based anti-join per
  batch instead of one LIMIT-1 probe per file.

Spark task retries subsume the reference's re-chunk-at-1000 retry (K4);
rows that still fail schema/cast validation quarantine explicitly
(`sources.csv_ingest.read_csv_with_quarantine` + `write_quarantine`).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    target_path: str,
    key: str = "id",
) -> int:
    """MERGE semantics onto a parquet target: matched keys take the
    update row, unmatched insert; re-running the same batch is a no-op
    row-count-wise (idempotent re-delivery, FIXTURES.md upsert contract).

    Within one batch, duplicate keys keep an arbitrary single row
    (dropDuplicates) — matching the reference, whose last chunk wins.
    Returns the post-merge row count.
    """
    updates = updates.dropDuplicates([key])
    if os.path.isdir(target_path):
        current = spark.read.parquet(target_path)
        keep = current.join(updates.select(key), on=key, how="left_anti")
        merged = keep.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates
    tmp = f"{target_path}.__stage_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    # Atomic-ish swap (single-FS rename); a lakehouse MERGE gets true
    # transactionality from its commit log instead.
    if os.path.isdir(target_path):
        shutil.rmtree(target_path)
    os.rename(tmp, target_path)
    return spark.read.parquet(target_path).count()


def upsert_sql(table: str, columns: list[str], key: str = "id") -> str:
    """Render the per-batch Postgres upsert a foreachPartition writer
    executes — the reference's `on_conflict="id"` (data_pipeline.py:515)
    in plain SQL. Placeholders are %s for psycopg-style drivers."""
    collist = ", ".join(columns)
    placeholders = ", ".join(["%s"] * len(columns))
    sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in columns if c != key)
    return (
        f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
        f"ON CONFLICT ({key}) DO UPDATE SET {sets}"
    )


def append_ledger(
    spark: SparkSession,
    ledger_path: str,
    filename: str,
    filedate: str,
    num_rows: int,
    subject: str,
) -> None:
    """K5: one ledger row per ingested file (data_pipeline.py:241-261)."""
    row = spark.createDataFrame(
        [(filename, filedate, int(num_rows), subject)],
        "filename string, filedate string, num_rows long, subject string",
    )
    row.write.mode("append").parquet(ledger_path)


def new_files(candidates: DataFrame, ledger: DataFrame) -> DataFrame:
    """P4 generalized: files not yet in the ledger, by (filedate,
    filename) — one anti-join for the whole batch."""
    return candidates.join(ledger, on=["filedate", "filename"], how="left_anti")


def write_quarantine(quarantine: DataFrame, path: str, reason: str = "schema") -> None:
    """K4 dead-letter: persist poison rows as a queryable table (the
    reference writes a timestamped CSV, data_pipeline.py:559-570)."""
    quarantine.withColumn("_reason", F.lit(reason)).write.mode("append").parquet(path)
