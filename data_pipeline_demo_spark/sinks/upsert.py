"""Idempotent upsert sink + ingest ledger (SURVEY.md §2.1 K3/K5, P4/O1).

The reference's core sink is a chunked PostgREST ``upsert(on_conflict=
"id")`` with retry + dead-letter (`/root/reference/data_pipeline.py:
501-572`). The engine provides the same semantics three ways:

- **Bucketed parquet merge** (`upsert_parquet`): the target is
  hash-partitioned on the key into ``__bucket=N`` directories; a batch
  rewrites ONLY the buckets its keys touch (Spark dynamic partition
  overwrite), so merge cost is O(touched buckets), not O(table). This
  is the file-layout analog of Delta/Iceberg ``MERGE INTO`` — swap in
  a real lakehouse MERGE when the runtime ships one; the commit then
  gets log-backed atomicity instead of per-partition directory swaps.
- **JDBC upsert executor** (`upsert_jdbc` around `upsert_sql`): each
  partition streams batched ``INSERT … ON CONFLICT (id) DO UPDATE``
  statements through a DB-API connection — the direct analog of the
  reference's endpoint, minus the 5,000-row single-thread bottleneck.
- **Ledger guard** (`new_files`): the duplicate-run check
  (`data_pipeline.py:138-142,:213-238`) as ONE set-based anti-join per
  batch instead of one LIMIT-1 probe per file.

Spark task retries subsume the reference's re-chunk-at-1000 retry (K4);
rows that still fail schema/cast validation quarantine explicitly
(`sources.csv_ingest.read_csv_with_quarantine` + `write_quarantine`).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterable, Iterator, Sequence
from itertools import chain

from pyspark.sql import Column, DataFrame, Row, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"
BUCKET_SPEC = "_upsert_bucket_spec.json"


def _bucket_of(key: str, num_buckets: int) -> Column:
    """Stable key → bucket id; null keys land in bucket 0 so every row
    has a concrete partition directory."""
    return F.coalesce(
        F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)), F.lit(0)
    ).cast("int")


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    target_path: str,
    key: str = "id",
    num_buckets: int = 32,
) -> int:
    """MERGE semantics onto a hash-bucketed parquet target: matched keys
    take the update row, unmatched insert; re-running the same batch is
    a no-op row-count-wise (idempotent re-delivery, FIXTURES.md upsert
    contract). Within one batch, duplicate keys keep an arbitrary single
    row (dropDuplicates) — matching the reference, whose last chunk wins.

    Scale shape: only the buckets containing this batch's keys are read,
    anti-joined, and rewritten (dynamic partition overwrite); untouched
    bucket files are never opened for data. Returns the post-merge row
    count — touched rows from the in-hand merged DataFrame plus a
    column-less (footer-only) count of the pruned untouched buckets,
    never a full re-read of what was just written.

    The bucket modulus is fixed at table creation and recorded in a
    ``_upsert_bucket_spec.json`` sidecar (a lakehouse keeps this in its
    table metadata); later calls use the recorded value so differing
    ``num_buckets`` arguments can never split one key across buckets.
    """
    spec_path = os.path.join(target_path, BUCKET_SPEC)
    if os.path.isfile(spec_path):
        with open(spec_path) as fh:
            num_buckets = json.load(fh)["num_buckets"]
    updates = updates.dropDuplicates([key]).withColumn(
        BUCKET_COL, _bucket_of(key, num_buckets)
    )
    untouched_n = 0
    dynamic = False
    if os.path.isdir(target_path):
        current = spark.read.parquet(target_path)
        if BUCKET_COL in current.columns:
            # Incremental path: prune to touched buckets only.
            touched = [
                r[0] for r in updates.select(BUCKET_COL).distinct().collect()
            ]
            untouched = current.filter(~F.col(BUCKET_COL).isin(touched))
            untouched_n = untouched.count()
            current = current.filter(F.col(BUCKET_COL).isin(touched))
            dynamic = True
        else:
            # Legacy flat layout: one-time full rewrite into buckets —
            # existing rows need bucket ids too, or the union would land
            # them all in the null (__HIVE_DEFAULT_PARTITION__) dir.
            current = current.withColumn(BUCKET_COL, _bucket_of(key, num_buckets))
        keep = current.join(updates.select(key), on=key, how="left_anti")
        merged = keep.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates

    merged = merged.persist()
    try:
        n_merged = merged.count()
        writer = merged.write.mode("overwrite").partitionBy(BUCKET_COL)
        if dynamic:
            writer = writer.option("partitionOverwriteMode", "dynamic")
        writer.parquet(target_path)
    finally:
        merged.unpersist()
    if not os.path.isfile(spec_path):
        with open(spec_path, "w") as fh:
            json.dump({"num_buckets": num_buckets, "key": key}, fh)
    return untouched_n + n_merged


def upsert_sql(table: str, columns: Sequence[str], key: str = "id") -> str:
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


def upsert_jdbc(
    df: DataFrame,
    table: str,
    connection_factory: Callable[[], object],
    key: str = "id",
    batch_size: int = 1000,
) -> None:
    """Execute the upsert against a relational target: one DB-API
    connection per partition, `executemany` in `batch_size` slices, one
    commit per partition (K3, data_pipeline.py:501-542).

    ``connection_factory`` must be picklable (a module-level callable or
    functools.partial) — it runs inside the executors' Python workers,
    so each partition opens its own connection; nothing is shared with
    the driver. Partitions stream independently: N partitions give N
    concurrent upsert streams where the reference had one thread.
    Spark task retry re-runs a failed partition; ON CONFLICT makes the
    replay idempotent.
    """
    cols = list(df.columns)
    sql = upsert_sql(table, cols, key)

    def _write_partition(rows: Iterator[Row]) -> None:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return  # empty partition: never open a connection
        conn = connection_factory()
        try:
            cur = conn.cursor()
            buf: list[tuple] = []
            for row in chain([first], it):
                buf.append(tuple(row[c] for c in cols))
                if len(buf) >= batch_size:
                    cur.executemany(sql, buf)
                    buf = []
            if buf:
                cur.executemany(sql, buf)
            conn.commit()
        except BaseException:
            conn.rollback()
            raise
        finally:
            conn.close()

    df.foreachPartition(_write_partition)


def append_ledger(
    spark: SparkSession,
    ledger_path: str,
    filename: str,
    filedate: str,
    num_rows: int,
    subject: str,
) -> None:
    """K5: one ledger row per ingested file (data_pipeline.py:241-261)."""
    append_ledger_rows(spark, ledger_path, [(filename, filedate, int(num_rows), subject)])


def append_ledger_rows(
    spark: SparkSession,
    ledger_path: str,
    rows: Iterable[tuple[str, str, int, str]],
) -> None:
    """K5 batched: all of a run's ledger rows in one append — one write
    job for N files instead of N."""
    rows = list(rows)
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "filename string, filedate string, num_rows long, subject string"
    )
    df.write.mode("append").parquet(ledger_path)


def new_files(candidates: DataFrame, ledger: DataFrame) -> DataFrame:
    """P4 generalized: files not yet in the ledger, by (filedate,
    filename) — one anti-join for the whole batch."""
    return candidates.join(ledger, on=["filedate", "filename"], how="left_anti")


def write_quarantine(
    quarantine: DataFrame, path: str, reason: str | Column = "schema"
) -> None:
    """K4 dead-letter: persist poison rows as a queryable table (the
    reference writes a timestamped CSV, data_pipeline.py:559-570).
    ``reason`` may be a per-row Column (e.g. derived from the source
    file) or a constant string."""
    r = F.lit(reason) if isinstance(reason, str) else reason
    quarantine.withColumn("_reason", r).write.mode("append").parquet(path)
