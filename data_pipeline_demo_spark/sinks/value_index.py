"""Hyperspace-style value index for the txlog table: exact bucket
pruning for equality predicates on NON-key columns.

Zone maps (``bucket_stats``) prune RANGES on declared stats columns,
and key-bucket hashing prunes point lookups on THE key — but an
equality filter on any other column still scans every bucket. This
module maintains a secondary txtable mapping each distinct value of an
indexed column to the data buckets containing it (the shape of
Microsoft Hyperspace's covering-index idea, reduced to the
bucket-pruning core — public system, SIGMOD 2021), so
``lookup(value)`` reads exactly the buckets that can hold a match.

Design points:

- **The index IS a txtable** (rows ``(pair_key, value, bucket)``,
  keyed by the value⊕bucket pair), so it inherits snapshot isolation,
  time travel, CDC, vacuum — and stores its own CONSUMER WATERMARK in
  the commit log (``app_txns["value-index"] = source version``), making
  refresh self-describing and replay-safe.
- **Maintenance is CDC-driven and bucket-scoped**: the source change
  feed names the changed buckets (a key's bucket never changes — it is
  ``pmod(xxhash64(key), n)``); refresh recomputes the (value, bucket)
  pairs for ONLY those buckets from the current snapshot, deletes index
  rows those buckets no longer justify, and MERGEs the rest —
  O(changed buckets), never O(table). The recompute is idempotent, so
  a crash between the delete and the merge re-runs cleanly.
- **Staleness can never produce wrong answers**: lookups compare the
  index watermark against the table's latest version and FALL BACK to
  a full scan when behind (exact, just unpruned) unless the caller
  demands pruning with ``require_fresh=True``.

Reference scope: the reference re-reads whole CSVs for every equality
probe (`/root/reference/data_pipeline.py:219-238`); this is that probe
with metadata-bounded IO at any table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .txlog import (
    _latest_manifest,
    _read_buckets_logical,
    _read_manifest,
    read_txtable,
    txlog_delete,
    txlog_upsert,
    txtable_changes,
)
from .upsert import _bucket_of

INDEX_APP = "value-index"


def _pairs_for_buckets(
    spark: SparkSession,
    table_root: str,
    manifest: dict,
    col: str,
    buckets: list[int],
) -> DataFrame:
    """Distinct (value, bucket) pairs currently present in the given
    source buckets — reads ONLY those buckets' files."""
    key = manifest["key"]
    nb = manifest["num_buckets"]
    # LOGICAL bucket rows: merge-on-read deletion vectors anti-apply,
    # so the index never records a (value, bucket) pair whose only
    # evidence is a deleted row
    rows = _read_buckets_logical(spark, table_root, manifest, buckets)
    if rows is None:
        return spark.createDataFrame([], f"value string, bucket int")
    return rows.select(
        F.col(col).cast("string").alias("value"),
        _bucket_of(key, nb).alias("bucket"),
    ).distinct()


def _with_pair_key(pairs: DataFrame) -> DataFrame:
    return pairs.withColumn(
        "pair_key",
        F.concat_ws("\x1f", F.coalesce(F.col("value"), F.lit("\x00null")), F.col("bucket")),
    ).select("pair_key", "value", "bucket")


def _target_str(value) -> str:
    """Python rendering of a lookup value that matches the index's
    build-time ``CAST(col AS STRING)``: bool renders Spark-style
    lowercase; str/int/date render identically in both; float/Decimal
    renderings can diverge (exponent forms, trailing zeros) — pass the
    exact Spark CAST string instead."""
    import datetime as _dt

    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (str, int)) or (
        isinstance(value, _dt.date) and not isinstance(value, _dt.datetime)
    ):
        return str(value)
    raise ValueError(
        f"index lookup value {value!r} ({type(value).__name__}) cannot "
        "reproduce Spark's CAST(col AS STRING) rendering; pass the "
        "exact string Spark produces (e.g. '5.0' for a double)"
    )


def index_watermark(spark: SparkSession, index_root: str) -> int | None:
    """Source version the index has consumed, or None before any build."""
    m = _latest_manifest(spark, index_root)
    if m is None:
        return None
    v = m.get("app_txns", {}).get(INDEX_APP)
    return int(v) if v is not None else None


def refresh_value_index(
    spark: SparkSession,
    table_root: str,
    index_root: str,
    col: str,
) -> int:
    """Bring the index up to the source's latest version. First call
    builds from the full table; later calls are CDC-driven over the
    changed buckets only. Same-version call is a no-op. Returns the
    consumed source version."""
    manifest = _latest_manifest(spark, table_root)
    if manifest is None:
        raise FileNotFoundError(f"no committed txtable at {table_root}")
    latest = manifest["version"]
    since = index_watermark(spark, index_root)
    if since is not None and since >= latest:
        return latest
    key = manifest["key"]
    nb = manifest["num_buckets"]
    rebuilt = False
    if since is not None and (
        _read_manifest(spark, table_root, since)["num_buckets"] != nb
    ):
        # bucket-count evolution (rebucket_txtable) invalidates EVERY
        # stored bucket id: the CDC feed across it is empty (rows
        # unchanged), so detect the modulus change from the watermark
        # manifest and rebuild the whole index under the new modulus
        rebuilt = True
    if since is None or rebuilt:
        touched = sorted(int(b) for b in manifest["buckets"])
    else:
        feed = txtable_changes(spark, table_root, since, latest)
        touched = sorted(
            r[0]
            for r in feed.select(
                _bucket_of(key, nb).alias("b")
            ).distinct().collect()
        )
        if not touched:
            # metadata-only source commits (restore, compaction) move
            # files without changing rows: advance the watermark with an
            # empty merge (commits a manifest carrying the new app_txns,
            # touches no data files)
            empty = spark.createDataFrame(
                [], "pair_key string, value string, bucket int"
            )
            txlog_upsert(
                spark, empty, index_root, key="pair_key",
                txn_app_id=INDEX_APP, txn_version=latest,
            )
            return latest
    new_pairs = _with_pair_key(
        _pairs_for_buckets(spark, table_root, manifest, col, touched)
    )
    if since is not None:
        # index rows for touched buckets that the recompute no longer
        # justifies → delete (value vanished from that bucket); a
        # modulus rebuild sweeps the WHOLE index (old-modulus bucket
        # ids are meaningless now, whatever their value)
        stale = read_txtable(spark, index_root)
        if not rebuilt:
            stale = stale.filter(
                F.col("bucket").isin([int(b) for b in touched])
            )
        stale = stale.join(
            new_pairs.select("pair_key"), "pair_key", "left_anti"
        ).select("pair_key")
        if not stale.isEmpty():
            txlog_delete(spark, index_root, keys=stale)
    txlog_upsert(
        spark,
        new_pairs,
        index_root,
        key="pair_key",
        num_buckets=8,
        txn_app_id=INDEX_APP,
        txn_version=latest,
    )
    return latest


def _stale_scan_buckets(
    spark: SparkSession,
    table_root: str,
    index_root: str,
    wm: int,
    latest: dict,
    value,
) -> list[int] | None:
    """Bucket set a STALE lookup must read to stay exact, or None when
    index pruning cannot help.

    A bucket untouched since the watermark holds exactly the values
    the index recorded for it (keys never move buckets while the
    modulus is fixed), so the index remains authoritative there; any
    bucket whose file list or deletion-vector list changed since the
    watermark must be scanned outright. Result:
    ``(index hits ∪ changed buckets) ∩ live buckets`` — the changed
    set bounds the extra IO by the table's staleness, not its size.

    Returns None (→ caller full-scans) when the watermark manifest is
    gone (vacuumed) or the bucket modulus changed (old bucket ids are
    meaningless after ``rebucket_txtable``)."""
    try:
        m_wm = _read_manifest(spark, table_root, wm)
    except Exception:
        return None
    if m_wm["num_buckets"] != latest["num_buckets"]:
        return None

    def _sig(m, b):
        return (m["buckets"].get(b), m.get("bucket_dvs", {}).get(b))

    changed = {
        int(b)
        for b in set(m_wm["buckets"]) | set(latest["buckets"])
        if _sig(m_wm, b) != _sig(latest, b)
    }
    hits = set(index_selected_buckets(spark, index_root, value))
    live = {int(b) for b in latest["buckets"]}
    return sorted((hits | changed) & live)


def lookup_with_index(
    spark: SparkSession,
    table_root: str,
    index_root: str,
    col: str,
    value,
    require_fresh: bool = False,
) -> DataFrame:
    """Equality read ``WHERE col = value`` through the index: resolves
    the bucket set holding the value from the index (metadata-sized
    read), then scans ONLY those buckets with the filter re-applied
    (results exact by construction). A stale index (source committed
    past the watermark) degrades to a HYBRID scan — index-pruned
    untouched buckets plus a full read of only the buckets that
    changed since the watermark, O(staleness) not O(table) — and only
    falls all the way back to a full scan when pruning is impossible
    (no watermark yet, watermark manifest vacuumed away, or a
    rebucket changed the modulus). ``require_fresh`` raises instead."""
    manifest = _latest_manifest(spark, table_root)
    if manifest is None:
        raise FileNotFoundError(f"no committed txtable at {table_root}")
    wm = index_watermark(spark, index_root)
    pred = F.col(col).eqNullSafe(F.lit(value))
    if wm is None or wm < manifest["version"]:
        if require_fresh:
            raise ValueError(
                f"value index at {index_root} is at source version {wm}, "
                f"table is at {manifest['version']} — refresh_value_index first"
            )
        scan = (
            None
            if wm is None
            else _stale_scan_buckets(spark, table_root, index_root, wm,
                                     manifest, value)
        )
        if scan is None:
            return read_txtable(spark, table_root).filter(pred)
        rows = _read_buckets_logical(spark, table_root, manifest, scan)
        if rows is None:
            return read_txtable(spark, table_root).filter(pred).limit(0)
        return rows.filter(pred)
    target = (
        F.lit(None).cast("string")
        if value is None
        else F.lit(_target_str(value))
    )
    buckets = [
        r["bucket"]
        for r in read_txtable(spark, index_root)
        .filter(F.col("value").eqNullSafe(target))
        .select("bucket")
        .collect()
    ]
    # logical read: a merge-on-read-deleted row must never surface in
    # a lookup result (the vectors anti-apply before the predicate)
    rows = _read_buckets_logical(
        spark, table_root, manifest, sorted(buckets)
    )
    if rows is None:
        return read_txtable(spark, table_root).filter(pred).limit(0)
    return rows.filter(pred)


def index_selected_buckets(
    spark: SparkSession, index_root: str, value
) -> list[int]:
    """The bucket set a lookup would scan — exposed so tests (and
    operators) can assert pruning without touching data files."""
    target = (
        F.lit(None).cast("string")
        if value is None
        else F.lit(_target_str(value))
    )
    return sorted(
        r["bucket"]
        for r in read_txtable(spark, index_root)
        .filter(F.col("value").eqNullSafe(target))
        .select("bucket")
        .collect()
    )
