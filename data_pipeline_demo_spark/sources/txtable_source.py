"""The log-backed transactional table as a first-class Spark data
source (PySpark 4 Python Data Source API): ``spark.read.format
("txtable")`` for manifest-driven batch snapshots (with time travel),
``spark.readStream.format("txtable")`` for a change-data feed.

Why a data source and not just ``sinks.txlog.read_txtable``: the format
boundary makes the table consumable by ANY Spark job — SQL
(``CREATE TABLE ... USING``), other pipelines, the streaming runtime —
without importing this package's internals, the way Delta/Iceberg
tables are consumed. The reference's consumers poll a REST table
(`/root/reference/data_pipeline.py:219-238`); this is that surface
engine-grade.

Design constraints of the Python DS API honored here:

- ``schema()``/``partitions()`` run driver-side WITHOUT a
  SparkSession; ``read(partition)`` runs in executor Python workers.
  Everything therefore reads manifests with plain IO and data files
  with pyarrow — no Spark-on-Spark.
- Batch reads parallelize one partition per live bucket and yield
  Arrow RecordBatches (zero row-at-a-time Python); schema evolution is
  honored by aligning every file to the union schema (missing columns
  → nulls), mirroring ``mergeSchema``.
- The change feed's offsets are manifest versions — exactly the
  commit-log positions, so restart-resume is exact. Each micro-batch
  emits insert/update/delete rows between two versions, computed from
  ONLY the buckets whose immutable file lists differ (the
  ``txtable_changes`` pruning argument). The simple-reader variant
  computes driver-side: right for the change-feed shape (a commit's
  delta is metadata-bucket-sized), not for full-table replays.

Local and ``file://`` paths are supported; other filesystems would
need an fsspec bridge here (the JVM-side readers in ``sinks.txlog``
already speak any Hadoop FS) — a declared seam, raised loudly.

SQL access: ``spark.read.format("txtable").load(root)
.createOrReplaceTempView("t")`` then query ``t``. ``CREATE TABLE …
USING txtable`` resolves the schema but this Spark version does not
deliver the DDL OPTIONS to the Python reader at scan time (observed:
``self.options == {}`` in ``reader()``), so persisted-catalog DDL is
not supported yet.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

COMMITS_DIR = "_commits"
CHANGE_COL = "_change_type"


def _local_root(path: str) -> str:
    # accept every local spelling Spark produces: /x, file:/x, file://x,
    # file:///x (SQL DDL normalizes OPTIONS paths to the file:/ form)
    from urllib.parse import urlparse

    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        return parsed.path or path
    raise NotImplementedError(
        f"txtable data source reads local/file:// paths; for {path!r} "
        "use sinks.txlog.read_txtable (Hadoop FS) or add an fsspec bridge"
    )


def _manifest_versions(root: str) -> list[int]:
    commits = os.path.join(root, COMMITS_DIR)
    if not os.path.isdir(commits):
        raise FileNotFoundError(f"no committed txtable at {root}")
    out = []
    for name in os.listdir(commits):
        if name.startswith(".") or not name.endswith(".json"):
            continue
        try:
            out.append(int(name[:-5]))
        except ValueError:
            continue
    if not out:
        raise FileNotFoundError(f"no committed txtable at {root}")
    return sorted(out)


def _read_manifest(root: str, version: int) -> dict:
    p = os.path.join(root, COMMITS_DIR, f"{version:020d}.json")
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def _latest_version(root: str) -> int:
    return _manifest_versions(root)[-1]


def _union_arrow_schema(files: list[str]):
    """mergeSchema semantics: union of the files' footers, field order =
    first appearance."""
    import pyarrow.parquet as pq

    fields: dict[str, object] = {}
    for f in files:
        for field in pq.read_schema(f):
            if field.name not in fields:
                fields[field.name] = field
    import pyarrow as pa

    return pa.schema(list(fields.values()))


def _aligned_table(path: str, schema):
    """Read one parquet file aligned to the union schema: missing
    columns null-filled, order normalized."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    n = t.num_rows
    cols = []
    for field in schema:
        if field.name in t.column_names:
            col = t.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
        else:
            col = pa.nulls(n, type=field.type)
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)


class _BucketPartition(InputPartition):
    def __init__(self, files: list[str]):
        self.files = files


class _TxTableBatchReader(DataSourceReader):
    def __init__(self, root: str, version: int):
        self.root = root
        self.manifest = _read_manifest(root, version)
        files = [
            os.path.join(root, rel)
            for b in sorted(self.manifest["buckets"], key=int)
            for rel in self.manifest["buckets"][b]
        ]
        self.arrow_schema = _union_arrow_schema(files) if files else None

    def partitions(self) -> list[InputPartition]:
        # one partition per live bucket: the same parallel grain the
        # JVM reader gets from the manifest, no directory listing
        return [
            _BucketPartition(
                [os.path.join(self.root, rel) for rel in rels]
            )
            for _, rels in sorted(
                self.manifest["buckets"].items(), key=lambda kv: int(kv[0])
            )
        ]

    def read(self, partition: _BucketPartition) -> Iterator:
        for f in partition.files:
            for batch in _aligned_table(f, self.arrow_schema).to_batches():
                yield batch


def _changed_buckets(m_from: dict, m_to: dict) -> list[str]:
    return sorted(
        (
            b
            for b in set(m_from["buckets"]) | set(m_to["buckets"])
            if m_from["buckets"].get(b) != m_to["buckets"].get(b)
        ),
        key=int,
    )


def _bucket_rows(root: str, manifest: dict, b: str, key: str) -> dict:
    files = [os.path.join(root, rel) for rel in manifest["buckets"].get(b, [])]
    if not files:
        return {}
    schema = _union_arrow_schema(files)
    rows = {}
    for f in files:
        for r in _aligned_table(f, schema).to_pylist():
            k = r.get(key)
            if k is None:
                raise ValueError(
                    "txtable change feed requires non-null keys "
                    "(the JVM-side txtable_changes handles null keys)"
                )
            rows[k] = r
    return rows


def _bucket_change_rows(
    root: str, m_from: dict, m_to: dict, b: str, columns: list[str], key: str
):
    """insert/update/delete tuples for ONE bucket between two
    manifests. Exact python-object comparison (pyarrow ``to_pylist`` —
    no float coercion)."""
    old = _bucket_rows(root, m_from, b, key)
    new = _bucket_rows(root, m_to, b, key)
    for k, row in new.items():
        if k not in old:
            yield tuple(row.get(c) for c in columns) + ("insert",)
        elif any(row.get(c) != old[k].get(c) for c in columns):
            yield tuple(row.get(c) for c in columns) + ("update",)
    for k, row in old.items():
        if k not in new:
            yield tuple(row.get(c) for c in columns) + ("delete",)


def _changes_rows(root: str, from_v: int, to_v: int, columns: list[str]):
    """All buckets' change tuples, reading only buckets whose file
    lists differ (driver-side form for the streaming reader)."""
    m_from, m_to = _read_manifest(root, from_v), _read_manifest(root, to_v)
    key = m_to["key"]
    for b in _changed_buckets(m_from, m_to):
        yield from _bucket_change_rows(root, m_from, m_to, b, columns, key)


class _ChangesPartition(InputPartition):
    def __init__(self, bucket: str):
        self.bucket = bucket


class _TxTableChangesBatchReader(DataSourceReader):
    """Batch change-feed read (Delta CDF shape):
    ``spark.read.format("txtable").option("readChangeFeed", "true")
    .option("startingVersion", a)[.option("endingVersion", b)]`` —
    one executor partition per CHANGED bucket."""

    def __init__(self, root: str, from_v: int, to_v: int):
        self.root = root
        self.from_v = from_v
        self.to_v = to_v
        self.m_from = _read_manifest(root, from_v)
        self.m_to = _read_manifest(root, to_v)
        self.key = self.m_to["key"]
        files = [
            os.path.join(root, rel)
            for b in self.m_to["buckets"]
            for rel in self.m_to["buckets"][b]
        ] or [
            os.path.join(root, rel)
            for b in self.m_from["buckets"]
            for rel in self.m_from["buckets"][b]
        ]
        self.columns = [f.name for f in _union_arrow_schema(files)]

    def partitions(self) -> list[InputPartition]:
        changed = _changed_buckets(self.m_from, self.m_to)
        # the API needs >=1 partition; an empty diff reads as no rows
        return [_ChangesPartition(b) for b in changed] or [
            _ChangesPartition("")
        ]

    def read(self, partition: _ChangesPartition) -> Iterator:
        if not partition.bucket:
            return
        yield from _bucket_change_rows(
            self.root,
            self.m_from,
            self.m_to,
            partition.bucket,
            self.columns,
            self.key,
        )


class _TxTableChangeFeedReader(SimpleDataSourceStreamReader):
    def __init__(self, root: str, starting_version: int | None):
        self.root = root
        self.starting_version = starting_version
        manifest = _read_manifest(root, _latest_version(root))
        files = [
            os.path.join(root, rel)
            for b in manifest["buckets"]
            for rel in manifest["buckets"][b]
        ]
        schema = _union_arrow_schema(files)
        self.columns = [f.name for f in schema]

    def initialOffset(self) -> dict:
        # default: emit changes made AFTER stream start (Delta CDF
        # shape); startingVersion replays history from that snapshot
        v = (
            self.starting_version
            if self.starting_version is not None
            else _latest_version(self.root)
        )
        return {"version": v}

    def read(self, start: dict):
        # materialized list, not a generator: the streaming runtime
        # caches and copy()s the iterator for prefetch/replay
        latest = _latest_version(self.root)
        if latest <= start["version"]:
            return iter([]), start
        rows = list(
            _changes_rows(self.root, start["version"], latest, self.columns)
        )
        return iter(rows), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            list(
                _changes_rows(
                    self.root, start["version"], end["version"], self.columns
                )
            )
        )


class TxTableDataSource(DataSource):
    """``format("txtable")``. Options: ``path`` (or ``load(path)``),
    ``version`` (batch time travel), ``startingVersion`` (stream
    replay-from)."""

    @classmethod
    def name(cls) -> str:
        return "txtable"

    def _root(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("txtable requires a path: load(<table root>)")
        return _local_root(path)

    def _is_cdf(self) -> bool:
        return self.options.get("readchangefeed", "").lower() == "true"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        root = self._root()
        if self._is_cdf():
            ev = self.options.get("endingversion")
            v = int(ev) if ev is not None else _latest_version(root)
        else:
            version = self.options.get("version")
            v = int(version) if version is not None else _latest_version(root)
        manifest = _read_manifest(root, v)
        files = [
            os.path.join(root, rel)
            for b in manifest["buckets"]
            for rel in manifest["buckets"][b]
        ]
        if not files:
            raise FileNotFoundError(f"txtable {root} version {v} is empty")
        schema = from_arrow_schema(_union_arrow_schema(files))
        if self._is_cdf():
            from pyspark.sql.types import StringType, StructField

            return StructType(
                schema.fields + [StructField(CHANGE_COL, StringType())]
            )
        return schema

    def reader(self, schema: StructType) -> DataSourceReader:
        root = self._root()
        if self._is_cdf():
            sv = self.options.get("startingversion")
            if sv is None:
                raise ValueError(
                    "batch readChangeFeed requires "
                    '.option("startingVersion", <v>)'
                )
            ev = self.options.get("endingversion")
            to_v = int(ev) if ev is not None else _latest_version(root)
            return _TxTableChangesBatchReader(root, int(sv), to_v)
        version = self.options.get("version")
        v = int(version) if version is not None else _latest_version(root)
        return _TxTableBatchReader(root, v)

    def simpleStreamReader(self, schema: StructType):
        if self.options.get("readchangefeed", "").lower() != "true":
            raise ValueError(
                "streaming txtable is a change feed: set "
                '.option("readChangeFeed", "true") so the schema carries '
                f"{CHANGE_COL}"
            )
        root = self._root()
        sv = self.options.get("startingversion")
        return _TxTableChangeFeedReader(
            root, int(sv) if sv is not None else None
        )


def register_txtable_source(spark) -> None:
    """Make ``format("txtable")`` resolvable in this session."""
    spark.dataSource.register(TxTableDataSource)
