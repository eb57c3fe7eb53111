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


SCD2_KEY = "__scd_key"


def scd2_apply_changes(
    spark: SparkSession,
    feed: DataFrame,
    root_path: str,
    key: str,
    sequence_col: str = "sequence",
    op_col: str = "op",
    delete_op: str = "delete",
    num_buckets: int | None = None,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    suppress_unchanged: bool = False,
) -> dict:
    """APPLY CHANGES ... STORED AS SCD TYPE 2 (the Delta Live Tables
    surface): maintain a full-history dimension from a CDC feed. Every
    applied change OPENS a version row ``[valid_from, valid_to)`` and
    CLOSES its predecessor; deletes close the open row without opening
    a new one (the key's absence interval has no covering row);
    ``is_current`` marks each key's open row. ``suppress_unchanged=
    True`` is DLT's TRACK HISTORY behavior restricted to real changes:
    an upsert whose data columns equal its predecessor's (null-safe)
    opens no version.

    The history table is a txtable keyed by the SYNTHETIC
    ``__scd_key = key || '@' || valid_from`` (an SCD2 table is
    multi-row per business key, so the business key cannot be the
    MERGE key) with a manifest Bloom index ON the business key — the
    read path below depends on it.

    Algorithm, one atomic commit per batch:

    1. dedupe the feed at (key, sequence) grain (delete wins ties,
       then row hash — the ``net_changes`` convention);
    2. read each dirty key's OPEN row via ``read_txtable(bloom_in=
       {key: dirty})`` — manifest-pruned to the buckets that can hold
       those keys, never a table scan; the dirty-key list is driver-
       side and batch-sized (same contract as the join-view refresh);
    3. drop STALE changes (sequence <= the open row's valid_from —
       the cross-batch ordering contract: later batches carry later
       sequences; out-of-order arrivals WITHIN a batch are fine);
    4. chain per key (open row + surviving changes ordered by
       sequence): LEAD(valid_from) is each version's valid_to, the
       last non-delete row is current, delete rows close their
       predecessor and vanish;
    5. one ``txlog_upsert`` on the synthetic key writes re-closed open
       rows and new versions together — atomic, and exactly-once under
       replay via the ``txn_app_id``/``txn_version`` watermark.

    Returns ``{"versions_written": n, "skipped_replay": bool}``.
    """
    if key in (sequence_col, op_col):
        raise ValueError("key must differ from sequence/op columns")
    m = _latest_manifest(spark, root_path)
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be set together")
    if (
        txn_app_id is not None
        and m is not None
        and m.get("app_txns", {}).get(txn_app_id, -1) >= txn_version
    ):
        return {"versions_written": 0, "skipped_replay": True}

    data_cols = [
        c for c in feed.columns if c not in (key, sequence_col, op_col)
    ]
    if feed.filter(F.col(key).isNull() | F.col(sequence_col).isNull()).limit(
        1
    ).count():
        raise ValueError(
            "scd2_apply_changes: NULL business keys / sequences are not "
            "supported (the synthetic version key and the Bloom index "
            "both require non-null values)"
        )

    # 1. (key, sequence)-grain dedupe — delete wins, then row hash
    w_dup = Window.partitionBy(key, sequence_col).orderBy(
        (F.col(op_col) == delete_op).cast("int").desc(),
        F.xxhash64(*[F.col(c) for c in feed.columns]).asc(),
    )
    changes = (
        feed.withColumn("__rn", F.row_number().over(w_dup))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(key),
            *data_cols,
            F.col(sequence_col).alias("valid_from"),
            (F.col(op_col) == delete_op).alias("__is_del"),
        )
        .persist()
    )
    try:
        dirty = [r[0] for r in changes.select(key).distinct().collect()]
        if not dirty:
            return {"versions_written": 0, "skipped_replay": False}

        # 2. open rows for dirty keys, Bloom-pruned
        if m is not None:
            from .txlog import read_txtable

            snap = read_txtable(spark, root_path, bloom_in={key: dirty})
            open_rows = snap.filter(F.col("is_current")).select(
                F.col(key),
                *data_cols,
                F.col("valid_from"),
                F.lit(False).alias("__is_del"),
            )
        else:
            open_rows = changes.limit(0)

        # 3. stale-change guard (cross-batch ordering contract)
        floor = open_rows.select(
            F.col(key).alias("__fk"), F.col("valid_from").alias("__floor")
        )
        fresh = (
            changes.join(floor, changes[key] == F.col("__fk"), "left")
            .filter(
                F.col("__floor").isNull()
                | (F.col("valid_from") > F.col("__floor"))
            )
            .drop("__fk", "__floor")
        )

        # 4. chain: open row + fresh changes, ordered by valid_from
        chain = open_rows.withColumn(
            "__from_feed", F.lit(False)
        ).unionByName(fresh.withColumn("__from_feed", F.lit(True)))
        # only keys with at least one surviving feed change rewrite
        active = fresh.select(key).distinct()
        chain = chain.join(active, key, "left_semi")

        w_seq = Window.partitionBy(key).orderBy("valid_from")
        if suppress_unchanged:
            prev_del = F.lag("__is_del").over(w_seq)
            same = F.lit(True)
            for c in data_cols:
                same = same & F.col(c).eqNullSafe(F.lag(c).over(w_seq))
            noop = (
                F.col("__from_feed")
                & ~F.col("__is_del")
                & prev_del.eqNullSafe(F.lit(False))
                & same
            )
            chain = chain.withColumn("__noop", noop).filter(
                ~F.col("__noop")
            ).drop("__noop")

        closed = chain.select(
            F.col(key),
            *data_cols,
            "valid_from",
            "__is_del",
            F.lead("valid_from").over(w_seq).alias("valid_to"),
        )
        versions = closed.filter(~F.col("__is_del")).select(
            F.col(key),
            *data_cols,
            "valid_from",
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
            F.concat_ws(
                "@", F.col(key).cast("string"),
                F.col("valid_from").cast("string"),
            ).alias(SCD2_KEY),
        )

        n = versions.count()
        if n:
            txlog_upsert(
                spark,
                versions,
                root_path,
                key=SCD2_KEY,
                num_buckets=num_buckets,
                bloom_columns=[key] if m is None else None,
                txn_app_id=txn_app_id,
                txn_version=txn_version,
            )
        elif txn_app_id is not None:
            txlog_upsert(
                spark,
                versions,
                root_path,
                key=SCD2_KEY,
                num_buckets=num_buckets,
                txn_app_id=txn_app_id,
                txn_version=txn_version,
            )
        return {"versions_written": n, "skipped_replay": False}
    finally:
        changes.unpersist()
