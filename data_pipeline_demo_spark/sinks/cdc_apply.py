"""APPLY CHANGES INTO — CDC application for the transactional table.

The standard lakehouse ingestion shape (Delta Live Tables' ``APPLY
CHANGES INTO``, Debezium sink semantics): a change feed arrives as rows
``(key, data..., op, sequence)`` where ``op`` marks upserts vs deletes
and ``sequence`` (a timestamp, LSN, or offset) orders changes to the
SAME key — possibly out of order and with duplicates, because upstream
replication makes no ordering promise. Applying the feed must produce
the state as of each key's HIGHEST sequence, exactly once.

Algorithm (one window + the engine's two bucket-pruned verbs):

1. keep each key's latest change: ``row_number() over (partition by
   key order by sequence desc, <deterministic tie-break>) = 1`` —
   WindowGroupLimit keeps the shuffle to one row per key;
2. latest = delete → ``txlog_delete(keys=...)``; latest = upsert →
   ``txlog_upsert`` of the data columns. The two sets are disjoint by
   construction, so application order between them is immaterial.

Sequence ties break deterministically: deletes win over upserts (the
conservative reading — a tie usually means the upstream emitted a
delete+reinsert in one transaction and lost ordering; keeping the
delete never resurrects data), then ``xxhash64`` of the row as a final
total-order tie-break so replays pick the same winner.

Exactly-once under replay: pass ``txn_app_id``/``txn_version`` — the
MERGE records the watermark in the manifest and a replayed batch is a
log-level no-op (the delete phase checks the same watermark BEFORE the
merge phase writes it, so a partially-applied crash replays cleanly:
delete keys are re-deleted — idempotent — and the merge re-runs).

Scale: cost is O(changed keys + touched buckets) — the net-effect
window reduces the feed before any table IO, so a million-row feed
touching one key costs one bucket rewrite.

Reference scope: the reference's only ingestion is whole-file replace
(`/root/reference/data_pipeline.py:501-542`); this module is that
surface generalized to ordered row-level change capture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .txlog import (
    _latest_manifest,
    txlog_delete,
    txlog_upsert,
)


def net_changes(
    feed: DataFrame,
    key: str,
    sequence_col: str,
    op_col: str,
    delete_op: str = "delete",
) -> DataFrame:
    """Reduce a CDC feed to one NET row per key — the key's
    highest-sequence change (deterministic tie-break: deletes first,
    then row hash). Exposed separately so tests and backfills can
    inspect the net effect without applying it."""
    data_cols = [
        c for c in feed.columns if c not in (sequence_col, op_col)
    ]
    is_delete = (F.col(op_col) == delete_op).cast("int")
    w = Window.partitionBy(key).orderBy(
        F.col(sequence_col).desc(),
        is_delete.desc(),
        F.xxhash64(*[F.col(c) for c in feed.columns]).asc(),
    )
    return (
        feed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*data_cols, F.col(op_col).alias("__op"))
    )


def apply_changes(
    spark: SparkSession,
    feed: DataFrame,
    root_path: str,
    key: str | None = None,
    sequence_col: str = "sequence",
    op_col: str = "op",
    delete_op: str = "delete",
    num_buckets: int | None = None,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> dict:
    """Apply a CDC feed to the txtable at ``root_path`` (module
    docstring). Returns ``{"upserted": n_keys, "deleted": n_keys,
    "skipped_replay": bool}``."""
    m = _latest_manifest(spark, root_path)
    if key is None:
        if m is None:
            raise ValueError(
                "apply_changes on a new table needs an explicit key="
            )
        key = m["key"]
    if txn_app_id is not None and txn_version is None:
        raise ValueError("txn_app_id requires txn_version")
    if (
        txn_app_id is not None
        and m is not None
        and m.get("app_txns", {}).get(txn_app_id, -1) >= txn_version
    ):
        return {"upserted": 0, "deleted": 0, "skipped_replay": True}
    net = net_changes(feed, key, sequence_col, op_col, delete_op).persist()
    try:
        deletes = net.filter(F.col("__op") == delete_op).select(key)
        upserts = net.filter(F.col("__op") != delete_op).drop("__op")
        n_del = deletes.count()
        n_up = upserts.count()
        # delete phase first and WITHOUT the watermark: key-deletes are
        # idempotent, so a crash between the phases replays safely (the
        # merge phase below is what commits the watermark)
        if n_del:
            txlog_delete(spark, root_path, keys=deletes)
        if n_up:
            txlog_upsert(
                spark,
                upserts,
                root_path,
                key=key,
                num_buckets=num_buckets,
                txn_app_id=txn_app_id,
                txn_version=txn_version,
            )
        elif txn_app_id is not None and n_del:
            # delete-only batch still needs its watermark recorded:
            # merge an empty frame (commits app_txns, no data change)
            txlog_upsert(
                spark,
                upserts,
                root_path,
                key=key,
                num_buckets=num_buckets,
                txn_app_id=txn_app_id,
                txn_version=txn_version,
            )
        return {"upserted": n_up, "deleted": n_del, "skipped_replay": False}
    finally:
        net.unpersist()
