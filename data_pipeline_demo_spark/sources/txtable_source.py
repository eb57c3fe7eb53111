"""The log-backed transactional table as a first-class Spark data
source (PySpark 4 Python Data Source API): ``spark.read.format
("txtable")`` for manifest-driven batch snapshots (with time travel
and a batch change feed), ``spark.readStream.format("txtable")`` for a
streaming change-data feed.

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
- Change feeds (batch AND streaming) plan one partition per CHANGED
  bucket — only buckets whose immutable file lists differ between the
  two manifests are ever opened (the ``txtable_changes`` pruning
  argument) — and the per-bucket insert/update/delete diff runs
  EXECUTOR-side as a vectorized Arrow key-compare. The driver touches
  manifests only (metadata-sized at any table size).
- The streaming feed's offsets are manifest versions — exactly the
  commit-log positions, so restart-resume is exact.

Filesystems: local paths and every ``file:`` spelling are read with
plain os/pyarrow IO. Any OTHER scheme (s3://, gs://, memory://, …) is
bridged through ``fsspec`` when it is importable — reader options
prefixed ``fs.`` are passed to ``fsspec.filesystem(scheme, **opts)``,
e.g. ``.option("fs.anon", "true")``. Without fsspec the old loud
NotImplementedError stands (the JVM-side readers in ``sinks.txlog``
speak any Hadoop FS regardless). Manifest file references are
root-relative normally, but a shallow clone's manifest carries
ABSOLUTE refs into its source table (``sinks.txlog._abs`` contract);
those are resolved against the REF's own scheme, not joined onto the
clone root.

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
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

COMMITS_DIR = "_commits"
CHANGE_COL = "_change_type"

# ---------------------------------------------------------------------------
# Filesystem tier: local fast path + fsspec bridge for remote schemes.
# Instances are carried inside InputPartitions, so they must pickle
# cheaply and reconstruct any live handle lazily per process.
# ---------------------------------------------------------------------------


class _LocalFS:
    """Direct os/pyarrow IO for local and ``file:`` paths."""

    def list_names(self, path: str) -> list[str]:
        return os.listdir(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def open_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def parquet_table(self, path: str):
        import pyarrow.parquet as pq

        return pq.read_table(path)

    def parquet_schema(self, path: str):
        import pyarrow.parquet as pq

        return pq.read_schema(path)

    def __eq__(self, other) -> bool:  # dedupes refs in tests
        return isinstance(other, _LocalFS)

    def __hash__(self) -> int:
        return hash(_LocalFS)


class _FsspecFS:
    """Any non-local scheme via ``fsspec.filesystem(scheme, **options)``.

    The live filesystem object is constructed lazily in whichever
    process needs it (driver for manifests, executor workers for data
    files) — only ``(scheme, options)`` cross the pickle boundary.
    Parquet reads try pyarrow's native ``filesystem=`` integration
    (range reads — the right shape for object stores) and fall back to
    a whole-object fetch through ``fs.open`` for minimal filesystem
    implementations (mocks, odd schemes).
    """

    def __init__(self, scheme: str, options: dict):
        self.scheme = scheme
        self.options = dict(options)
        self._fs = None

    def __getstate__(self):
        return {"scheme": self.scheme, "options": self.options}

    def __setstate__(self, state):
        self.scheme = state["scheme"]
        self.options = state["options"]
        self._fs = None

    def fs(self):
        if self._fs is None:
            import fsspec

            self._fs = fsspec.filesystem(self.scheme, **self.options)
        return self._fs

    def list_names(self, path: str) -> list[str]:
        return [p.rstrip("/").rsplit("/", 1)[-1] for p in self.fs().ls(path, detail=False)]

    def isdir(self, path: str) -> bool:
        try:
            return bool(self.fs().isdir(path))
        except FileNotFoundError:
            return False

    def open_bytes(self, path: str) -> bytes:
        with self.fs().open(path, "rb") as f:
            return f.read()

    def parquet_table(self, path: str):
        import pyarrow as pa
        import pyarrow.parquet as pq

        try:
            return pq.read_table(path, filesystem=self.fs())
        except (TypeError, ValueError, NotImplementedError, AttributeError):
            return pq.read_table(pa.BufferReader(self.open_bytes(path)))

    def parquet_schema(self, path: str):
        import pyarrow as pa
        import pyarrow.parquet as pq

        try:
            return pq.read_schema(path, filesystem=self.fs())
        except (TypeError, ValueError, NotImplementedError, AttributeError):
            return pq.read_schema(pa.BufferReader(self.open_bytes(path)))

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, _FsspecFS)
            and other.scheme == self.scheme
            and other.options == self.options
        )

    def __hash__(self) -> int:
        return hash((self.scheme, tuple(sorted(self.options.items()))))


def _fs_root(path: str, fs_options: dict) -> tuple[object, str]:
    """Resolve a table root (or an absolute manifest ref) to
    ``(filesystem adapter, fs-native path)``. Accepts every local
    spelling Spark produces: /x, file:/x, file://x, file:///x (SQL DDL
    normalizes OPTIONS paths to the file:/ form)."""
    from urllib.parse import urlparse

    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        return _LocalFS(), (parsed.path or path)
    try:
        import fsspec  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"txtable data source reads local/file:// paths natively and "
            f"other schemes through fsspec, which is not importable; for "
            f"{path!r} use sinks.txlog.read_txtable (Hadoop FS) or install "
            "fsspec"
        ) from None
    return _FsspecFS(parsed.scheme, fs_options), path


def _resolve_ref(fs, root: str, rel: str, fs_options: dict) -> tuple[object, str]:
    """Resolve one manifest file reference. Mirrors
    ``sinks.txlog._abs``: normally root-relative; a shallow clone's
    manifest carries absolute refs (leading '/', a scheme, or the
    'file:' form) into its source table's immutable files — those
    resolve against their OWN filesystem, never joined onto root."""
    if rel.startswith("/") or "://" in rel or rel.startswith("file:"):
        return _fs_root(rel, fs_options)
    return fs, root.rstrip("/") + "/" + rel


# ---------------------------------------------------------------------------
# Manifest IO (driver-side: metadata-sized at any table scale).
# ---------------------------------------------------------------------------


def _manifest_versions(fs, root: str) -> list[int]:
    commits = root.rstrip("/") + "/" + COMMITS_DIR
    if not fs.isdir(commits):
        raise FileNotFoundError(f"no committed txtable at {root}")
    out = []
    for name in fs.list_names(commits):
        if name.startswith(".") or not name.endswith(".json"):
            continue
        try:
            out.append(int(name[:-5]))
        except ValueError:
            continue
    if not out:
        raise FileNotFoundError(f"no committed txtable at {root}")
    return sorted(out)


# table features the python DataSource implements end-to-end (snapshot
# read, pushdown read, batch CDC, streaming CDC)
_SUPPORTED_FEATURES = frozenset({"deletion-vectors", "manifest-shards"})


def _check_manifest_features(manifest: dict) -> None:
    """Protocol gate (Delta table-features model): a manifest carrying
    ``requires`` tokens this reader does not implement must be REFUSED,
    not half-read — silently ignoring a feature like deletion vectors
    would resurrect deleted rows."""
    req = sorted(set(manifest.get("requires", [])) - _SUPPORTED_FEATURES)
    if req:
        raise NotImplementedError(
            f"txtable manifest version {manifest.get('version')} requires "
            f"table feature(s) {req} the python DataSource does not "
            "support; read via the JVM-path sinks.txlog verbs"
        )


SHARDS_DIR = "_manifest_shards"


def _read_manifest(
    fs, root: str, version: int, check_features: bool = True
) -> dict:
    p = root.rstrip("/") + f"/{COMMITS_DIR}/{version:020d}.json"
    m = json.loads(fs.open_bytes(p).decode("utf-8"))
    if check_features:
        _check_manifest_features(m)
    return _inflate_manifest(fs, root, m)


def _inflate_manifest(fs, root: str, m: dict) -> dict:
    """Python-side mirror of ``sinks.txlog._inflate_manifest``: a
    sharded root (``manifest_shards`` group → rel-path pointers) gets
    its bucket file lists reassembled from the immutable shard files;
    the ``manifest-shards`` requires-token drops (this reader just
    satisfied it). Unsharded manifests pass through untouched."""
    ptrs = m.get("manifest_shards")
    if ptrs is None:
        return m
    buckets: dict[str, list] = {}
    for g in sorted(ptrs, key=int):
        payload = json.loads(
            fs.open_bytes(root.rstrip("/") + "/" + ptrs[g]).decode("utf-8")
        )
        for b, rels in payload.get("buckets", {}).items():
            buckets[b] = list(rels)
    m["buckets"] = buckets
    req = [r for r in m.get("requires", []) if r != "manifest-shards"]
    if req:
        m["requires"] = req
    else:
        m.pop("requires", None)
    return m


def _manifest_or_empty(fs, root: str, version: int, template: dict) -> dict:
    """Version ``-1`` is the synthetic empty base (before the table's
    first commit) — it makes the first commit's own inserts replayable
    by the change feed (startingTimestamp before table creation)."""
    if version < 0:
        return {"version": -1, "key": template["key"], "buckets": {}}
    return _read_manifest(fs, root, version)


def _latest_version(fs, root: str) -> int:
    return _manifest_versions(fs, root)[-1]


def _version_before_timestamp(fs, root: str, ts_ms: int) -> int:
    """Greatest committed version whose commit time is strictly before
    ``ts_ms`` — the change-feed base for ``startingTimestamp`` (feed =
    every change committed at-or-after the timestamp). ``-1`` when the
    timestamp predates the table: the full history replays, first
    commit's inserts included."""
    base = -1
    for v in _manifest_versions(fs, root):
        # metadata-only probe: the eventual snapshot/CDC read re-checks
        if _read_manifest(fs, root, v, check_features=False).get(
            "committed_at_ms", 0
        ) < ts_ms:
            base = v
        else:
            break
    return base


def _parse_timestamp_ms(raw: str) -> int:
    """Epoch millis, or an ISO datetime string (naive → UTC)."""
    try:
        return int(raw)
    except ValueError:
        pass
    dt = datetime.fromisoformat(raw)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def _snapshot_refs(fs, root: str, manifest: dict, fs_options: dict) -> list[tuple]:
    return [
        _resolve_ref(fs, root, rel, fs_options)
        for b in sorted(manifest["buckets"], key=int)
        for rel in manifest["buckets"][b]
    ]


def _bucket_refs(fs, root: str, manifest: dict, b: str, fs_options: dict) -> list[tuple]:
    return [
        _resolve_ref(fs, root, rel, fs_options)
        for rel in manifest["buckets"].get(b, [])
    ]


# ---------------------------------------------------------------------------
# Arrow-side helpers (schema union, alignment, vectorized CDC compare).
# ---------------------------------------------------------------------------


def _manifest_arrow_schema(manifest: dict):
    """The manifest's recorded per-version schema as an Arrow schema
    (the read authority when present: time travel returns each
    version's OWN schema, metadata-added columns surface as nulls,
    dropped columns project away), or None for legacy manifests."""
    fields = manifest.get("schema")
    if not fields:
        return None
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    return to_arrow_schema(
        StructType.fromJson({"type": "struct", "fields": fields})
    )


def _union_arrow_schema(refs: list[tuple]):
    """mergeSchema semantics: union of the files' footers, field order =
    first appearance."""
    import pyarrow as pa

    fields: dict[str, object] = {}
    for fs, path in refs:
        for field in fs.parquet_schema(path):
            if field.name not in fields:
                fields[field.name] = field
    return pa.schema(list(fields.values()))


def _mapping_from_manifest(manifest: dict) -> dict[str, str]:
    """logical → PHYSICAL (in-file) column name, for fields where they
    differ (column mapping, Delta's name-mode — agreement with the JVM
    reader's ``sinks/txlog.py:_mapping_of``). Empty = inactive."""
    out = {}
    for f in manifest.get("schema", []):
        phys = (f.get("metadata") or {}).get("physical") or f["name"]
        if phys != f["name"]:
            out[f["name"]] = phys
    return out


def _aligned_table(ref: tuple, schema, mapping: dict | None = None):
    """Read one parquet file aligned to the union schema: missing
    columns null-filled, order normalized. ``mapping`` (logical →
    physical) routes each LOGICAL field to the in-file column that
    actually holds its bytes — renamed columns keep reading their
    original physical name; re-added columns read their fresh minted
    name (absent from old files → null, never the tombstoned data)."""
    import pyarrow as pa

    fs, path = ref
    t = fs.parquet_table(path)
    n = t.num_rows
    cols = []
    for field in schema:
        src = (mapping or {}).get(field.name, field.name)
        if src in t.column_names:
            col = t.column(src)
            if col.type != field.type:
                col = col.cast(field.type)
        else:
            col = pa.nulls(n, type=field.type)
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)


def _empty_table(schema):
    import pyarrow as pa

    return pa.Table.from_arrays(
        [pa.nulls(0, f.type) for f in schema], schema=schema
    )


def _concat_aligned(refs: list[tuple], schema, mapping: dict | None = None):
    import pyarrow as pa

    if not refs:
        return _empty_table(schema)
    return pa.concat_tables(
        [_aligned_table(r, schema, mapping) for r in refs]
    )


def _concat_aligned_logical(
    refs: list[tuple],
    rels: list[str],
    dv_refs: list[tuple],
    schema,
    mapping: dict | None = None,
):
    """One snapshot side's LOGICAL rows: each file anti-filtered by its
    deletion-vector positions BEFORE concatenation (positions are
    per-file, so the filter must run at file grain)."""
    import pyarrow as pa

    if not refs:
        return _empty_table(schema)
    if not dv_refs:
        return _concat_aligned(refs, schema, mapping)
    dv_positions = _load_dv_positions(dv_refs)
    return pa.concat_tables(
        [
            _dv_anti_filter(
                _aligned_table(r, schema, mapping), rel, dv_positions
            )
            for r, rel in zip(refs, rels)
        ]
    )


def _neq_null_safe(a, b):
    """Vectorized null-safe per-row inequality of two columns; python
    fallback only for types Arrow cannot compare (nested)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        ne = pc.fill_null(pc.not_equal(a, b), False)
    except pa.lib.ArrowNotImplementedError:
        return pa.array(
            [x != y for x, y in zip(a.to_pylist(), b.to_pylist())], pa.bool_()
        )
    return pc.or_(pc.xor(pc.is_null(a), pc.is_null(b)), ne)


def _changed_buckets(m_from: dict, m_to: dict) -> list[str]:
    # a bucket changed iff its FILE list or its DELETION-VECTOR list
    # differs: a merge-on-read DELETE touches no data file but changes
    # the bucket's logical rows all the same
    def sig(m, b):
        return (m["buckets"].get(b), m.get("bucket_dvs", {}).get(b))

    return sorted(
        (
            b
            for b in set(m_from["buckets"]) | set(m_to["buckets"])
            if sig(m_from, b) != sig(m_to, b)
        ),
        key=int,
    )


def _bucket_change_batches(
    old_refs: list[tuple],
    new_refs: list[tuple],
    schema,
    key: str,
    include_preimages: bool = False,
    old_side: tuple = ((), ()),
    new_side: tuple = ((), ()),
    old_mapping: dict | None = None,
    new_mapping: dict | None = None,
) -> Iterator:
    """insert/update/delete Arrow batches for ONE bucket between two
    snapshots: a hash key-compare (``index_in``) plus vectorized
    null-safe column diffs — no per-row Python objects, O(bucket) Arrow
    memory bounded per executor task. ``include_preimages`` switches
    updates to the Delta-CDF shape (``update_preimage`` with the OLD
    values + ``update_postimage`` with the new) — algebraically
    complete for consumers that must retract old contributions
    (join-view/aggregate maintenance), matching the JVM reader's
    ``txtable_changes(include_preimages=True)``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    old = _concat_aligned_logical(
        old_refs, old_side[0], old_side[1], schema, old_mapping
    )
    new = _concat_aligned_logical(
        new_refs, new_side[0], new_side[1], schema, new_mapping
    )
    for t in (old, new):
        if t.num_rows and pc.any(pc.is_null(t.column(key))).as_py():
            raise ValueError(
                "txtable change feed requires non-null keys "
                "(the JVM-side txtable_changes handles null keys)"
            )
    pre = new.slice(0, 0)
    if old.num_rows == 0 or new.num_rows == 0:
        inserts, updates, deletes = new, new.slice(0, 0), old
    else:
        ok = old.column(key).combine_chunks()
        nk = new.column(key).combine_chunks()
        idx = pc.index_in(nk, value_set=ok)
        inserts = new.filter(pc.is_null(idx))
        matched_new = new.filter(pc.is_valid(idx))
        matched_old = old.take(idx.drop_null())
        diff = None
        for name in schema.names:
            ne = _neq_null_safe(
                matched_new.column(name), matched_old.column(name)
            )
            diff = ne if diff is None else pc.or_(diff, ne)
        updates = (
            matched_new.filter(diff) if diff is not None else matched_new
        )
        if include_preimages:
            # row-aligned with matched_new, so the same diff mask selects
            # exactly the preimages of the emitted postimages
            pre = (
                matched_old.filter(diff) if diff is not None else matched_old
            )
        deletes = old.filter(pc.is_null(pc.index_in(ok, value_set=nk)))
    update_tag = "update_postimage" if include_preimages else "update"
    emit = (
        (inserts, "insert"),
        (pre, "update_preimage"),
        (updates, update_tag),
        (deletes, "delete"),
    )
    for tbl, tag in emit:
        if tbl.num_rows:
            out = tbl.append_column(
                CHANGE_COL, pa.array([tag] * tbl.num_rows, pa.string())
            )
            yield from out.to_batches()


# ---------------------------------------------------------------------------
# Batch snapshot reader.
# ---------------------------------------------------------------------------


class _BucketPartition(InputPartition):
    """One bucket's resolved data refs, plus — for deletion-vector
    tables — the manifest rel string per ref (the DV files identify
    rows by manifest reference, spelling-independently) and the
    bucket's resolved DV refs."""

    def __init__(
        self,
        refs: list[tuple],
        rels: list[str] | None = None,
        dv_refs: list[tuple] | None = None,
    ):
        self.refs = refs
        self.rels = rels or []
        self.dv_refs = dv_refs or []


def _dv_anti_filter(table, rel: str, dv_positions: dict):
    """Drop the rows of ``table`` (read from manifest ref ``rel``)
    whose positions appear in the deletion vectors. numpy boolean mask
    over the file's row range — O(rows + deletes), vectorized."""
    pos = dv_positions.get(rel)
    if pos is None or table.num_rows == 0:
        return table
    import numpy as np
    import pyarrow as pa

    keep = np.ones(table.num_rows, dtype=bool)
    idx = np.asarray(pos, dtype=np.int64)
    idx = idx[(idx >= 0) & (idx < table.num_rows)]
    keep[idx] = False
    return table.filter(pa.array(keep))


def _load_dv_positions(dv_refs: list[tuple]) -> dict:
    """{manifest data-file ref: np.array of deleted row positions}
    from a bucket's deletion-vector parquet sidecars. Vectorized:
    dictionary-encode the file column (positions stay numpy); the only
    python materialization is the DICTIONARY — file-count-sized
    metadata, never the per-row vector."""
    import numpy as np
    import pyarrow.compute as pc

    out: dict = {}
    for fs, path in dv_refs:
        t = fs.parquet_table(path)
        enc = pc.dictionary_encode(t.column("__dv_file").combine_chunks())
        files = enc.dictionary.to_pylist()  # unique file refs only
        codes = enc.indices.to_numpy(zero_copy_only=False)
        poss = t.column("__dv_pos").to_numpy(zero_copy_only=False)
        for i, f in enumerate(files):
            out.setdefault(f, []).append(poss[codes == i])
    return {
        f: np.concatenate(p).astype(np.int64) for f, p in out.items()
    }


class _TxTableBatchReader(DataSourceReader):
    def __init__(self, fs, root: str, version: int, fs_options: dict):
        self.fs = fs
        self.root = root
        self.fs_options = fs_options
        self.manifest = _read_manifest(fs, root, version)
        self.arrow_schema = _manifest_arrow_schema(self.manifest)
        self.mapping = _mapping_from_manifest(self.manifest)
        if self.arrow_schema is None:  # legacy manifest: union of footers
            refs = _snapshot_refs(fs, root, self.manifest, fs_options)
            self.arrow_schema = _union_arrow_schema(refs) if refs else None

    def _partition_for(self, b: str) -> _BucketPartition:
        rels = self.manifest["buckets"].get(b, [])
        dv_rels = self.manifest.get("bucket_dvs", {}).get(b, [])
        return _BucketPartition(
            [
                _resolve_ref(self.fs, self.root, rel, self.fs_options)
                for rel in rels
            ],
            rels=rels,
            dv_refs=[
                _resolve_ref(self.fs, self.root, rel, self.fs_options)
                for rel in dv_rels
            ],
        )

    def partitions(self) -> list[InputPartition]:
        # one partition per live bucket: the same parallel grain the
        # JVM reader gets from the manifest, no directory listing.
        # A fully-emptied table needs one no-op partition — Spark
        # replaces an EMPTY list with a default None partition that
        # read() cannot handle (same guard as the pushdown reader)
        return [
            self._partition_for(b)
            for b in sorted(self.manifest["buckets"], key=int)
        ] or [_BucketPartition([])]

    def read(self, partition: _BucketPartition) -> Iterator:
        dv_positions = (
            _load_dv_positions(partition.dv_refs)
            if partition.dv_refs
            else {}
        )
        for i, ref in enumerate(partition.refs):
            t = _aligned_table(ref, self.arrow_schema, self.mapping)
            if dv_positions:
                t = _dv_anti_filter(t, partition.rels[i], dv_positions)
            yield from t.to_batches()


class _TxTablePushdownBatchReader(_TxTableBatchReader):
    """Snapshot reader + planning-time partition pruning from the query's
    pushed predicates (``sources/pushdown.py``): manifest zone maps plus
    writer-parity key-bucket hashing.  Every filter is returned unhandled
    so Spark re-applies it — pruning only skips buckets that provably
    hold no match; results stay exact.

    Defining ``pushFilters`` makes Spark REQUIRE
    ``spark.sql.python.filterPushdown.enabled=true`` (the engine session
    factory sets it); sessions that can't flip the conf opt out with
    ``.option("pushdown", "false")``, which selects the base reader."""

    def __init__(self, fs, root: str, version: int, fs_options: dict):
        super().__init__(fs, root, version, fs_options)
        self._kept: list[str] | None = None

    def pushFilters(self, filters):
        from .pushdown import prune_bucket_ids

        filters = list(filters)
        self._kept = prune_bucket_ids(
            self.manifest, filters, self.arrow_schema
        )
        return filters  # all re-applied by Spark: pruning is metadata-only

    def partitions(self) -> list[InputPartition]:
        ids = (
            self._kept
            if self._kept is not None
            else sorted(self.manifest["buckets"], key=int)
        )
        parts = [self._partition_for(b) for b in ids]
        # everything pruned: Spark replaces an EMPTY partition list with a
        # single default None partition, so hand it one no-op partition
        return parts or [_BucketPartition([])]


# ---------------------------------------------------------------------------
# Change feed: shared partition shape, batch reader, stream reader.
# ---------------------------------------------------------------------------


class _ChangesPartition(InputPartition):
    """One CHANGED bucket's worth of work, fully self-contained: the
    executor gets resolved file refs + the alignment schema + key, so
    ``read()`` needs no manifest or driver state."""

    def __init__(
        self,
        old_refs: list[tuple],
        new_refs: list[tuple],
        schema,
        key: str,
        pre: bool = False,
        old_side: tuple = ((), ()),
        new_side: tuple = ((), ()),
        old_mapping: dict | None = None,
        new_mapping: dict | None = None,
    ):
        self.old_refs = old_refs
        self.new_refs = new_refs
        self.schema = schema
        self.key = key
        self.pre = pre
        # (manifest rels aligned with refs, resolved DV refs) per side —
        # empty for DV-free snapshots
        self.old_side = old_side
        self.new_side = new_side
        # logical→physical column mapping per side (column mapping)
        self.old_mapping = old_mapping
        self.new_mapping = new_mapping


def _bucket_side(fs, root: str, m: dict, b: str, fs_options: dict):
    """(refs, rels, dv_refs) for one bucket of one snapshot side."""
    rels = m["buckets"].get(b, [])
    dv_rels = m.get("bucket_dvs", {}).get(b, [])
    return (
        [_resolve_ref(fs, root, rel, fs_options) for rel in rels],
        rels,
        [_resolve_ref(fs, root, rel, fs_options) for rel in dv_rels],
    )


def _change_partitions(
    fs,
    root: str,
    m_from: dict,
    m_to: dict,
    schema,
    fs_options: dict,
    pre: bool = False,
) -> list[_ChangesPartition]:
    key = m_to["key"]
    if (
        m_from.get("num_buckets") is not None
        and m_from["num_buckets"] != m_to["num_buckets"]
    ):
        # a rebucket moved keys ACROSS buckets: this reader diffs each
        # bucket id independently, which would emit spurious
        # delete+insert pairs for unmoved rows. The JVM
        # txtable_changes joins old vs new globally and handles it.
        raise NotImplementedError(
            f"txtable change feed across a bucket-count change "
            f"({m_from['num_buckets']} -> {m_to['num_buckets']}, "
            f"versions {m_from.get('version')} -> {m_to.get('version')}) "
            "is not supported by the python DataSource; read it via "
            "sinks.txlog.txtable_changes, or restart the feed from the "
            "rebucketed version"
        )
    changed = _changed_buckets(m_from, m_to)
    if changed:
        # CDC across a column RENAME is ambiguous (which name does the
        # feed report?) — refuse, matching the JVM txtable_changes and
        # Delta's CDF-vs-column-mapping policy. Rename-only windows
        # have no changed buckets and fall through to the empty feed.
        by_phys: dict[str, set] = {}
        for mm in (m_from, m_to):
            for f in mm.get("schema", []):
                phys = (f.get("metadata") or {}).get("physical") or f["name"]
                by_phys.setdefault(phys, set()).add(f["name"])
        conflicted = sorted(
            p for p, names in by_phys.items() if len(names) > 1
        )
        if conflicted:
            raise ValueError(
                f"cannot read changes across a column rename (physical "
                f"column(s) {conflicted} carry different names between "
                f"versions {m_from.get('version')} and "
                f"{m_to.get('version')}); read each side with time "
                "travel instead"
            )
    old_mapping = _mapping_from_manifest(m_from)
    new_mapping = _mapping_from_manifest(m_to)
    parts = []
    for b in changed:
        o_refs, o_rels, o_dvs = _bucket_side(fs, root, m_from, b, fs_options)
        n_refs, n_rels, n_dvs = _bucket_side(fs, root, m_to, b, fs_options)
        parts.append(
            _ChangesPartition(
                o_refs,
                n_refs,
                schema,
                key,
                pre,
                old_side=(o_rels, o_dvs),
                new_side=(n_rels, n_dvs),
                old_mapping=old_mapping,
                new_mapping=new_mapping,
            )
        )
    # the API needs >=1 partition; an empty diff reads as no rows
    return parts or [_ChangesPartition([], [], schema, key, pre)]


def _cdf_arrow_schema(fs, root: str, m_from: dict, m_to: dict, fs_options: dict):
    """Alignment schema for a change window: the UNION of the two
    snapshots' RECORDED schemas (evolution-safe — a column only one
    side has reads null on the other; a column DROPPED by version
    `to` is projected away exactly like the snapshot reader does, so
    tombstoned data never resurrects through the change feed). A
    legacy side with no recorded schema contributes its file-footer
    union instead; a fully-empty legacy window (no schema, no files)
    cannot describe its own rows and raises."""
    import pyarrow as pa

    sides = []
    for m in (m_to, m_from):
        a = _manifest_arrow_schema(m)
        if a is None:
            refs = _snapshot_refs(fs, root, m, fs_options)
            a = _union_arrow_schema(refs) if refs else None
        if a is not None:
            sides.append(a)
    if not sides:
        raise FileNotFoundError(
            f"txtable {root}: both change-window snapshots are empty"
        )
    fields: dict[str, object] = {}
    for a in sides:
        for field in a:
            fields.setdefault(field.name, field)
    return pa.schema(list(fields.values()))


class _TxTableChangesBatchReader(DataSourceReader):
    """Batch change-feed read (Delta CDF shape):
    ``spark.read.format("txtable").option("readChangeFeed", "true")
    .option("startingVersion", a)[.option("endingVersion", b)]`` —
    one executor partition per CHANGED bucket, diff computed
    executor-side."""

    def __init__(
        self,
        fs,
        root: str,
        from_v: int,
        to_v: int,
        fs_options: dict,
        pre: bool = False,
    ):
        self.m_to = _read_manifest(fs, root, to_v)
        self.m_from = _manifest_or_empty(fs, root, from_v, self.m_to)
        self.arrow_schema = _cdf_arrow_schema(
            fs, root, self.m_from, self.m_to, fs_options
        )
        self._parts = _change_partitions(
            fs, root, self.m_from, self.m_to, self.arrow_schema, fs_options,
            pre,
        )

    def partitions(self) -> list[InputPartition]:
        return self._parts

    def read(self, partition: _ChangesPartition) -> Iterator:
        yield from _bucket_change_batches(
            partition.old_refs,
            partition.new_refs,
            partition.schema,
            partition.key,
            getattr(partition, "pre", False),
            getattr(partition, "old_side", ((), ())),
            getattr(partition, "new_side", ((), ())),
            getattr(partition, "old_mapping", None),
            getattr(partition, "new_mapping", None),
        )


class _TxTableStreamReader(DataSourceStreamReader):
    """Streaming change feed, partition-based: offsets are manifest
    versions; each micro-batch plans one partition per changed bucket
    and the per-bucket diff runs in executor workers (the
    SimpleDataSourceStreamReader predecessor materialized every batch's
    rows on the driver — a ceiling at 100× bucket size; this reader's
    driver footprint is manifests only)."""

    def __init__(
        self,
        fs,
        root: str,
        starting_version: int | None,
        fs_options: dict,
        pre: bool = False,
    ):
        self.fs = fs
        self.root = root
        self.fs_options = fs_options
        self.starting_version = starting_version
        self.pre = pre

    def initialOffset(self) -> dict:
        # default: emit changes made AFTER stream start (Delta CDF
        # shape); startingVersion/startingTimestamp replay history
        # from that base snapshot (-1 = before the first commit)
        v = (
            self.starting_version
            if self.starting_version is not None
            else _latest_version(self.fs, self.root)
        )
        return {"version": v}

    def latestOffset(self) -> dict:
        return {"version": _latest_version(self.fs, self.root)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        m_to = _read_manifest(self.fs, self.root, end["version"])
        m_from = _manifest_or_empty(self.fs, self.root, start["version"], m_to)
        schema = _cdf_arrow_schema(
            self.fs, self.root, m_from, m_to, self.fs_options
        )
        return _change_partitions(
            self.fs, self.root, m_from, m_to, schema, self.fs_options,
            self.pre,
        )

    def read(self, partition: _ChangesPartition) -> Iterator:
        yield from _bucket_change_batches(
            partition.old_refs,
            partition.new_refs,
            partition.schema,
            partition.key,
            getattr(partition, "pre", False),
            getattr(partition, "old_side", ((), ())),
            getattr(partition, "new_side", ((), ())),
            getattr(partition, "old_mapping", None),
            getattr(partition, "new_mapping", None),
        )

    def commit(self, end: dict) -> None:
        pass  # offsets are durable manifest versions; nothing to ack


# ---------------------------------------------------------------------------
# The DataSource.
# ---------------------------------------------------------------------------


class TxTableDataSource(DataSource):
    """``format("txtable")``. Options: ``path`` (or ``load(path)``),
    ``version`` (batch time travel), ``readChangeFeed`` +
    ``startingVersion``/``startingTimestamp`` (+ batch
    ``endingVersion``) for change feeds, ``includePreimages`` for the
    Delta-CDF update_preimage/update_postimage shape (algebraic
    completeness for retraction-based consumers — join-view/aggregate
    maintenance), ``fs.*`` passed to ``fsspec.filesystem`` for
    non-local schemes."""

    @classmethod
    def name(cls) -> str:
        return "txtable"

    def _fs_options(self) -> dict:
        return {
            k[3:]: v
            for k, v in self.options.items()
            if k.startswith("fs.") and len(k) > 3
        }

    def _fs_root(self) -> tuple[object, str]:
        path = self.options.get("path")
        if not path:
            raise ValueError("txtable requires a path: load(<table root>)")
        return _fs_root(path, self._fs_options())

    def _is_cdf(self) -> bool:
        return self.options.get("readchangefeed", "").lower() == "true"

    def _include_preimages(self) -> bool:
        return self.options.get("includepreimages", "").lower() == "true"

    def _starting_version(self, fs, root: str) -> int | None:
        """Resolve startingVersion xor startingTimestamp (Delta reader
        option shape). Timestamp → greatest version committed strictly
        before it, so the feed carries every change committed at or
        after the timestamp; -1 replays the whole history."""
        sv = self.options.get("startingversion")
        st = self.options.get("startingtimestamp")
        if sv is not None and st is not None:
            raise ValueError(
                "set at most one of startingVersion and startingTimestamp"
            )
        if sv is not None:
            return int(sv)
        if st is not None:
            return _version_before_timestamp(fs, root, _parse_timestamp_ms(st))
        return None

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        fs, root = self._fs_root()
        if self._is_cdf():
            ev = self.options.get("endingversion")
            to_v = int(ev) if ev is not None else _latest_version(fs, root)
            m_to = _read_manifest(fs, root, to_v)
            sv = self._starting_version(fs, root)
            m_from = _manifest_or_empty(
                fs, root, sv if sv is not None else to_v, m_to
            )
            arrow = _cdf_arrow_schema(fs, root, m_from, m_to, self._fs_options())
            from pyspark.sql.types import StringType, StructField

            return StructType(
                from_arrow_schema(arrow).fields
                + [StructField(CHANGE_COL, StringType())]
            )
        version = self.options.get("version")
        v = int(version) if version is not None else _latest_version(fs, root)
        # schema resolution is metadata-only; the snapshot reader below
        # enforces its own feature policy (deletion vectors supported)
        manifest = _read_manifest(fs, root, v, check_features=False)
        fields = manifest.get("schema")
        if fields:  # schema-tracked: the manifest is the authority
            return StructType.fromJson({"type": "struct", "fields": fields})
        refs = _snapshot_refs(fs, root, manifest, self._fs_options())
        if not refs:
            raise FileNotFoundError(f"txtable {root} version {v} is empty")
        return from_arrow_schema(_union_arrow_schema(refs))

    def reader(self, schema: StructType) -> DataSourceReader:
        fs, root = self._fs_root()
        if self._is_cdf():
            sv = self._starting_version(fs, root)
            if sv is None:
                raise ValueError(
                    "batch readChangeFeed requires "
                    '.option("startingVersion", <v>) or '
                    '.option("startingTimestamp", <ts>)'
                )
            ev = self.options.get("endingversion")
            to_v = int(ev) if ev is not None else _latest_version(fs, root)
            return _TxTableChangesBatchReader(
                fs, root, sv, to_v, self._fs_options(),
                self._include_preimages(),
            )
        version = self.options.get("version")
        v = int(version) if version is not None else _latest_version(fs, root)
        if str(self.options.get("pushdown", "true")).lower() == "false":
            return _TxTableBatchReader(fs, root, v, self._fs_options())
        return _TxTablePushdownBatchReader(fs, root, v, self._fs_options())

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if not self._is_cdf():
            raise ValueError(
                "streaming txtable is a change feed: set "
                '.option("readChangeFeed", "true") so the schema carries '
                f"{CHANGE_COL}"
            )
        fs, root = self._fs_root()
        return _TxTableStreamReader(
            fs, root, self._starting_version(fs, root), self._fs_options(),
            self._include_preimages(),
        )

    def writer(self, schema: StructType, overwrite: bool):
        """``df.write.format("txtable")`` — blind insert-only append or
        snapshot overwrite with writer-parity bucketing; MERGE stays the
        ``sinks.txlog.txlog_upsert`` API (Delta's split between
        ``df.write`` and ``MERGE INTO``). See ``txtable_writer.py``."""
        from .txtable_writer import make_batch_writer

        return make_batch_writer(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        """``df.writeStream.format("txtable")`` — append-only streaming
        sink, exactly-once via the manifest's ``app_txns`` watermark
        (option ``txnAppId``, default ``txtable-stream-sink``)."""
        from .txtable_writer import make_stream_writer

        return make_stream_writer(self.options, schema, overwrite)


def register_txtable_source(spark) -> None:
    """Make ``format("txtable")`` resolvable in this session.

    Also flips ``spark.sql.python.filterPushdown.enabled`` (a runtime
    SQL conf) on: the snapshot reader implements ``pushFilters`` for
    zone-map/key-bucket pruning, and Spark 4.1 refuses a
    pushFilters-bearing reader outright when the conf is off — so a
    session registered here must never hit that error by default."""
    spark.dataSource.register(TxTableDataSource)
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        # a build where this conf is immutable still works via
        # .option("pushdown", "false")
        pass
