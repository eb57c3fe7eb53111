"""Log-backed transactional bucketed table — a dependency-free
Delta/Iceberg-style commit protocol behind the K3 upsert seam.

`sinks.upsert.upsert_parquet` publishes by renaming staged bucket
directories over live ones; that swap is atomic per bucket on a real
filesystem but not on S3-like object stores (README "Limits"). This
module closes that seam the way lakehouse formats do (reference sink
semantics: `/root/reference/data_pipeline.py:501-542`, the chunked
``upsert(on_conflict="id")``):

- **Data files are immutable.** Every commit writes its rows into a
  fresh ``data/<commit-uuid>/`` directory and never renames, rewrites,
  or deletes a live file.
- **The manifest is the table.** ``_commits/<version>.json`` lists, per
  hash bucket, exactly the data files that make up that snapshot, plus
  per-bucket row counts and the table's key/bucket parameters. Readers
  resolve a manifest and read exactly those files — no directory
  listing, no partition discovery, and manifest-level file pruning
  replaces directory-level partition pruning.
- **Commit = one atomic file creation.** The next manifest is written
  with create-no-overwrite; two writers racing to the same version
  produce exactly one winner and one ``ConcurrentCommitError`` (the
  loser's data files are orphans, later vacuumed — never visible).
  Create-no-overwrite is atomic on HDFS and local filesystems; on S3
  it maps to a conditional PUT (or an external log coordinator, as
  Delta uses) — but unlike the rename protocol the uncommitted window
  is a single metadata operation on a file readers only discover
  *after* it exists, so readers can never observe a half-published
  table.

MERGE cost stays O(touched buckets): the merge reads only the manifest
entries for buckets the batch's keys hash into, anti-joins, and writes
replacements; untouched buckets carry their file lists and row counts
forward in the new manifest without a single file open.

Snapshot isolation falls out: a reader that resolved version N keeps a
consistent file list even while version N+1 commits, and
``read_txtable(..., version=N)`` time-travels explicitly.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import BUCKET_COL, _bucket_of, _hadoop_fs

COMMITS_DIR = "_commits"
DATA_DIR = "data"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first. The table is intact
    at the winner's snapshot; re-run the merge against it to retry."""


def _commit_path(jvm, root, version: int):
    return jvm.org.apache.hadoop.fs.Path(root, f"{COMMITS_DIR}/{version:020d}.json")


def _latest_manifest(spark: SparkSession, root_path: str) -> dict | None:
    """Resolve the highest committed version's manifest, or None for a
    table that does not exist yet. One directory listing of _commits/ —
    metadata-sized regardless of table size."""
    jvm = spark._jvm
    fs, root = _hadoop_fs(spark, root_path)
    commits = jvm.org.apache.hadoop.fs.Path(root, COMMITS_DIR)
    if not fs.exists(commits):
        return None
    best = -1
    for st in fs.listStatus(commits):
        name = st.getPath().getName()
        if name.endswith(".json"):
            try:
                best = max(best, int(name[:-5]))
            except ValueError:
                continue
    if best < 0:
        return None
    return _read_manifest(spark, root_path, best)


def _read_manifest(spark: SparkSession, root_path: str, version: int) -> dict:
    jvm = spark._jvm
    fs, root = _hadoop_fs(spark, root_path)
    p = _commit_path(jvm, root, version)
    if not fs.exists(p):
        raise FileNotFoundError(
            f"txtable {root_path} has no committed version {version}"
        )
    stream = fs.open(p)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def _commit_manifest(
    spark: SparkSession, root_path: str, manifest: dict
) -> None:
    """Atomically create ``_commits/<version>.json``; raise
    ConcurrentCommitError if that version already exists."""
    jvm = spark._jvm
    fs, root = _hadoop_fs(spark, root_path)
    commits = jvm.org.apache.hadoop.fs.Path(root, COMMITS_DIR)
    if not fs.exists(commits):
        fs.mkdirs(commits)
    p = _commit_path(jvm, root, manifest["version"])
    if fs.exists(p):  # fast path; the create below is the real gate
        raise ConcurrentCommitError(str(p))
    try:
        out = fs.create(p, False)  # overwrite=False: the atomic claim
    except Exception as e:  # py4j wraps FileAlreadyExistsException
        raise ConcurrentCommitError(str(p)) from e
    try:
        out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        out.close()


def _abs(root_path: str, rel: str) -> str:
    return root_path.rstrip("/") + "/" + rel


def txlog_upsert(
    spark: SparkSession,
    updates: DataFrame,
    root_path: str,
    key: str = "id",
    num_buckets: int = 32,
) -> int:
    """MERGE a batch into the log-backed table; returns the post-merge
    row count (touched rows counted from the merge output, untouched
    rows summed from manifest bookkeeping — no table re-read).

    Same contract as `upsert.upsert_parquet`: matched keys take the
    update row (null-safe, so a null key supersedes rather than
    duplicates), unmatched insert, duplicate keys within a batch keep an
    arbitrary single row, re-delivery of the same batch is idempotent.
    Key and bucket modulus are fixed at table creation and read from
    the manifest thereafter.

    Crash safety: every write lands in a fresh ``data/<uuid>/`` dir; a
    crash anywhere before the manifest create leaves the table bit-for-
    bit at the previous snapshot and the partial files invisible (and
    vacuum-able). Concurrent writers: exactly one claims the next
    version; the loser raises ConcurrentCommitError and must re-merge
    against the winner's snapshot (no partial state to clean first).
    """
    prev = _latest_manifest(spark, root_path)
    version = 0
    buckets: dict[str, list[str]] = {}
    row_counts: dict[str, int] = {}
    if prev is not None:
        version = prev["version"] + 1
        key = prev["key"]
        num_buckets = prev["num_buckets"]
        buckets = dict(prev["buckets"])
        row_counts = dict(prev["row_counts"])

    updates = updates.dropDuplicates([key]).withColumn(
        BUCKET_COL, _bucket_of(key, num_buckets)
    )
    touched = sorted(
        r[0] for r in updates.select(BUCKET_COL).distinct().collect()
    )
    prior_files = [
        _abs(root_path, rel) for b in touched for rel in buckets.get(str(b), [])
    ]
    if prior_files:
        current = (
            spark.read.option("mergeSchema", "true").parquet(*prior_files)
        ).withColumn(BUCKET_COL, _bucket_of(key, num_buckets))
        upd_keys = updates.select(F.col(key).alias("__upd_key"))
        keep = current.join(
            upd_keys, F.col(key).eqNullSafe(F.col("__upd_key")), "left_anti"
        )
        merged = keep.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates

    commit_id = uuid.uuid4().hex
    out_rel = f"{DATA_DIR}/{commit_id}"
    out_dir = _abs(root_path, out_rel)
    merged = merged.persist()  # perf only: one compute for counts + write
    try:
        per_bucket = {
            str(r[0]): r[1]
            for r in merged.groupBy(BUCKET_COL).count().collect()
        }
        merged.write.mode("error").partitionBy(BUCKET_COL).parquet(out_dir)
    finally:
        merged.unpersist()

    jvm = spark._jvm
    fs, root = _hadoop_fs(spark, root_path)
    for b in touched:
        sub = jvm.org.apache.hadoop.fs.Path(root, f"{out_rel}/{BUCKET_COL}={b}")
        files = []
        if fs.exists(sub):
            files = sorted(
                f"{out_rel}/{BUCKET_COL}={b}/" + st.getPath().getName()
                for st in fs.listStatus(sub)
                if st.isFile() and st.getPath().getName().endswith(".parquet")
            )
        if files:
            buckets[str(b)] = files
            row_counts[str(b)] = int(per_bucket.get(str(b), 0))
        else:
            buckets.pop(str(b), None)
            row_counts.pop(str(b), None)

    _commit_manifest(
        spark,
        root_path,
        {
            "version": version,
            "key": key,
            "num_buckets": num_buckets,
            "buckets": buckets,
            "row_counts": row_counts,
        },
    )
    return sum(row_counts.values())


def read_txtable(
    spark: SparkSession, root_path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot: the latest committed version, or an explicit
    ``version`` for time travel. The file list comes entirely from the
    manifest — uncommitted data directories are invisible by
    construction."""
    manifest = (
        _latest_manifest(spark, root_path)
        if version is None
        else _read_manifest(spark, root_path, version)
    )
    if manifest is None:
        raise FileNotFoundError(f"no committed txtable at {root_path}")
    files = [
        _abs(root_path, rel)
        for b in sorted(manifest["buckets"], key=int)
        for rel in manifest["buckets"][b]
    ]
    if not files:
        raise FileNotFoundError(
            f"txtable {root_path} version {manifest['version']} is empty"
        )
    return spark.read.option("mergeSchema", "true").parquet(*files)


def txtable_history(spark: SparkSession, root_path: str) -> list[dict]:
    """All committed versions, oldest first: version, buckets touched
    count, total rows — the audit trail a lakehouse DESCRIBE HISTORY
    gives."""
    jvm = spark._jvm
    fs, root = _hadoop_fs(spark, root_path)
    commits = jvm.org.apache.hadoop.fs.Path(root, COMMITS_DIR)
    if not fs.exists(commits):
        return []
    versions = sorted(
        int(st.getPath().getName()[:-5])
        for st in fs.listStatus(commits)
        if st.getPath().getName().endswith(".json")
    )
    out = []
    for v in versions:
        m = _read_manifest(spark, root_path, v)
        out.append(
            {
                "version": v,
                "num_buckets_live": len(m["buckets"]),
                "rows": sum(m["row_counts"].values()),
            }
        )
    return out


def vacuum_txtable(
    spark: SparkSession, root_path: str, keep_last: int = 1
) -> int:
    """Garbage-collect: keep the newest ``keep_last`` manifests, delete
    older manifests and every data file no kept manifest references
    (aborted-commit orphans included). Returns files deleted.

    Single-writer assumption (same as the lakehouse equivalents without
    a retention window): run vacuum only when no merge is in flight,
    or an in-flight commit's not-yet-referenced files would be swept.
    """
    jvm = spark._jvm
    fs, root = _hadoop_fs(spark, root_path)
    commits = jvm.org.apache.hadoop.fs.Path(root, COMMITS_DIR)
    if not fs.exists(commits):
        return 0
    versions = sorted(
        int(st.getPath().getName()[:-5])
        for st in fs.listStatus(commits)
        if st.getPath().getName().endswith(".json")
    )
    if not versions:
        return 0
    keep = set(versions[-max(1, keep_last):])
    live: set[str] = set()
    for v in keep:
        m = _read_manifest(spark, root_path, v)
        for rels in m["buckets"].values():
            live.update(rels)
    deleted = 0
    data = jvm.org.apache.hadoop.fs.Path(root, DATA_DIR)
    if fs.exists(data):
        # data/<commit-uuid>/__bucket=N/file.parquet
        for commit_st in fs.listStatus(data):
            if not commit_st.isDirectory():
                continue
            commit_name = commit_st.getPath().getName()
            any_kept = False
            for bucket_st in fs.listStatus(commit_st.getPath()):
                if not bucket_st.isDirectory():
                    continue
                bname = bucket_st.getPath().getName()
                for file_st in fs.listStatus(bucket_st.getPath()):
                    rel = f"{DATA_DIR}/{commit_name}/{bname}/" + file_st.getPath().getName()
                    if rel in live:
                        any_kept = True
                    elif file_st.isFile():
                        fs.delete(file_st.getPath(), False)
                        deleted += 1
            if not any_kept:
                deleted += int(
                    fs.getContentSummary(commit_st.getPath()).getFileCount()
                )
                fs.delete(commit_st.getPath(), True)
    for v in versions:
        if v not in keep:
            fs.delete(_commit_path(jvm, root, v), False)
    return deleted


def compact_txtable(
    spark: SparkSession,
    root_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> int:
    """OPTIMIZE for the log-backed table: rewrite buckets whose file
    count exceeds what their byte size warrants into size-appropriate
    files, and commit the new layout as a snapshot version. Rows are
    untouched; readers on the old version keep working (old files stay
    until vacuum); a crash mid-compaction is invisible (no manifest =
    no change). Returns the number of buckets compacted.

    Pairs with the streaming bridge: micro-batch commits accumulate
    small files per touched bucket; run this on a maintenance cadence
    and vacuum afterwards.
    """
    manifest = _latest_manifest(spark, root_path)
    if manifest is None:
        return 0
    jvm = spark._jvm
    fs, root = _hadoop_fs(spark, root_path)
    todo: dict[str, list[str]] = {}
    for b, rels in manifest["buckets"].items():
        if len(rels) < max(2, min_files):
            continue
        nbytes = 0
        for rel in rels:
            p = jvm.org.apache.hadoop.fs.Path(root, rel)
            nbytes += fs.getFileStatus(p).getLen()
        want = max(1, -(-nbytes // target_file_bytes))
        if len(rels) > want:
            todo[b] = rels
    if not todo:
        return 0
    commit_id = uuid.uuid4().hex
    out_rel = f"{DATA_DIR}/{commit_id}"
    buckets = dict(manifest["buckets"])
    for b, rels in todo.items():
        files = [_abs(root_path, rel) for rel in rels]
        nbytes = sum(
            fs.getFileStatus(jvm.org.apache.hadoop.fs.Path(root, rel)).getLen()
            for rel in rels
        )
        want = max(1, -(-nbytes // target_file_bytes))
        bucket_rel = f"{out_rel}/{BUCKET_COL}={b}"
        (
            spark.read.option("mergeSchema", "true")
            .parquet(*files)
            .repartition(int(want))
            .write.mode("error")
            .parquet(_abs(root_path, bucket_rel))
        )
        sub = jvm.org.apache.hadoop.fs.Path(root, bucket_rel)
        buckets[b] = sorted(
            bucket_rel + "/" + st.getPath().getName()
            for st in fs.listStatus(sub)
            if st.isFile() and st.getPath().getName().endswith(".parquet")
        )
    _commit_manifest(
        spark,
        root_path,
        {
            "version": manifest["version"] + 1,
            "key": manifest["key"],
            "num_buckets": manifest["num_buckets"],
            "buckets": buckets,
            "row_counts": manifest["row_counts"],
        },
    )
    return len(todo)
