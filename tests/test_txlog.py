"""Log-backed transactional table (sinks/txlog.py): commit-protocol
guarantees the rename-based upsert cannot give — snapshot atomicity,
time travel, concurrent-writer safety, vacuum."""

import json

import pytest

from data_pipeline_demo_spark.sinks.txlog import (
    ConcurrentCommitError,
    read_txtable,
    txlog_upsert,
    txtable_history,
    vacuum_txtable,
)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "id long, v string")


def _as_dict(df):
    return {r["id"]: r["v"] for r in df.collect()}


def test_txlog_idempotent_and_update_wins(spark, tmp_path):
    root = str(tmp_path / "tx")
    batch = _rows(spark, [(1, "a"), (2, "b"), (3, "c")])
    n = txlog_upsert(spark, batch, root, num_buckets=4)
    assert n == 3
    # re-delivery of the same batch: row count unchanged
    assert txlog_upsert(spark, batch, root) == 3
    # update wins, insert lands
    n = txlog_upsert(spark, _rows(spark, [(2, "B"), (4, "d")]), root)
    assert n == 4
    assert _as_dict(read_txtable(spark, root)) == {
        1: "a",
        2: "B",
        3: "c",
        4: "d",
    }


def test_txlog_untouched_files_never_rewritten(spark, tmp_path):
    root = str(tmp_path / "tx")
    txlog_upsert(
        spark, _rows(spark, [(i, f"v{i}") for i in range(40)]), root, num_buckets=8
    )
    m1 = json.loads((tmp_path / "tx/_commits" / f"{0:020d}.json").read_text())
    # second commit touches only id=1's bucket
    txlog_upsert(spark, _rows(spark, [(1, "NEW")]), root)
    m2 = json.loads((tmp_path / "tx/_commits" / f"{1:020d}.json").read_text())
    changed = [b for b in m1["buckets"] if m1["buckets"][b] != m2["buckets"][b]]
    assert len(changed) == 1  # exactly one bucket replaced its file list
    for b in m1["buckets"]:
        if b not in changed:
            # same physical files carried forward — not rewritten copies
            assert m2["buckets"][b] == m1["buckets"][b]
            assert m2["row_counts"][b] == m1["row_counts"][b]


def test_txlog_merge_never_opens_untouched_buckets(spark, tmp_path):
    root = str(tmp_path / "tx")
    txlog_upsert(
        spark, _rows(spark, [(i, f"v{i}") for i in range(40)]), root, num_buckets=8
    )
    m1 = json.loads((tmp_path / "tx/_commits" / f"{0:020d}.json").read_text())
    # corrupt every data file in buckets id=1 does NOT hash into;
    # a merge that prunes by manifest never opens them and still works
    probe = _rows(spark, [(1, "NEW")])
    touched_rel = set()
    from data_pipeline_demo_spark.sinks.upsert import _bucket_of, BUCKET_COL  # noqa

    b1 = (
        probe.withColumn(BUCKET_COL, _bucket_of("id", m1["num_buckets"]))
        .select(BUCKET_COL)
        .first()[0]
    )
    for b, rels in m1["buckets"].items():
        if b != str(b1):
            for rel in rels:
                (tmp_path / "tx" / rel).write_bytes(b"NOT PARQUET")
        else:
            touched_rel.update(rels)
    n = txlog_upsert(spark, probe, root)
    assert n == 40  # untouched counts summed from the manifest, no read


def test_txlog_time_travel_and_history(spark, tmp_path):
    root = str(tmp_path / "tx")
    txlog_upsert(spark, _rows(spark, [(1, "old"), (2, "x")]), root, num_buckets=2)
    txlog_upsert(spark, _rows(spark, [(1, "new")]), root)
    assert _as_dict(read_txtable(spark, root, version=0))[1] == "old"
    assert _as_dict(read_txtable(spark, root))[1] == "new"
    hist = txtable_history(spark, root)
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[0]["rows"] == 2 and hist[1]["rows"] == 2


def test_txlog_uncommitted_files_invisible(spark, tmp_path):
    root = str(tmp_path / "tx")
    txlog_upsert(spark, _rows(spark, [(1, "a")]), root, num_buckets=2)
    # simulate a crashed writer: data files exist, manifest never created
    orphan = tmp_path / "tx/data/deadbeef/__bucket=0"
    orphan.mkdir(parents=True)
    _rows(spark, [(99, "GHOST")]).write.parquet(str(orphan / "junk"))
    assert _as_dict(read_txtable(spark, root)) == {1: "a"}
    # vacuum sweeps the orphans, snapshot intact
    deleted = vacuum_txtable(spark, root)
    assert deleted > 0
    assert _as_dict(read_txtable(spark, root)) == {1: "a"}
    assert not orphan.exists()


def test_txlog_concurrent_commit_loses_cleanly(spark, tmp_path):
    root = str(tmp_path / "tx")
    txlog_upsert(spark, _rows(spark, [(1, "a")]), root, num_buckets=2)
    # two writers race for version 1: one wins the create-no-overwrite
    claim = tmp_path / "tx/_commits" / f"{1:020d}.json"
    m0 = json.loads((tmp_path / "tx/_commits" / f"{0:020d}.json").read_text())
    claim.write_text(json.dumps({**m0, "version": 1}))
    from data_pipeline_demo_spark.sinks.txlog import _commit_manifest

    with pytest.raises(ConcurrentCommitError):
        _commit_manifest(spark, root, {**m0, "version": 1})
    # the winner's claim is untouched and the table reads consistently
    assert json.loads(claim.read_text())["version"] == 1
    assert _as_dict(read_txtable(spark, root, version=0)) == {1: "a"}
    # a writer that instead re-reads the log sees the winner and moves on
    assert txlog_upsert(spark, _rows(spark, [(2, "b")]), root) == 2


def test_txlog_vacuum_drops_old_versions(spark, tmp_path):
    root = str(tmp_path / "tx")
    for i in range(3):
        txlog_upsert(spark, _rows(spark, [(1, f"v{i}")]), root, num_buckets=2)
    assert _as_dict(read_txtable(spark, root, version=0))[1] == "v0"
    deleted = vacuum_txtable(spark, root, keep_last=1)
    assert deleted >= 2  # v0/v1's superseded files
    assert _as_dict(read_txtable(spark, root))[1] == "v2"
    with pytest.raises(FileNotFoundError):
        read_txtable(spark, root, version=0)


def test_txlog_null_key_supersedes(spark, tmp_path):
    root = str(tmp_path / "tx")
    txlog_upsert(
        spark, _rows(spark, [(None, "first"), (1, "a")]), root, num_buckets=2
    )
    n = txlog_upsert(spark, _rows(spark, [(None, "second")]), root)
    assert n == 2
    assert _as_dict(read_txtable(spark, root)) == {None: "second", 1: "a"}


def test_txlog_schema_evolution_new_column(spark, tmp_path):
    root = str(tmp_path / "tx")
    txlog_upsert(spark, _rows(spark, [(1, "a"), (2, "b")]), root, num_buckets=2)
    wide = spark.createDataFrame(
        [(2, "B", "extra")], "id long, v string, note string"
    )
    assert txlog_upsert(spark, wide, root) == 2
    got = {r["id"]: (r["v"], r["note"]) for r in read_txtable(spark, root).collect()}
    assert got == {1: ("a", None), 2: ("B", "extra")}


def test_txlog_file_uri(spark, tmp_path):
    root = "file://" + str(tmp_path / "tx")
    txlog_upsert(spark, _rows(spark, [(1, "a")]), root, num_buckets=2)
    assert _as_dict(read_txtable(spark, root)) == {1: "a"}
    assert txlog_upsert(spark, _rows(spark, [(2, "b")]), root) == 2


def test_txlog_compact_preserves_rows_and_history(spark, tmp_path):
    from data_pipeline_demo_spark.sinks.txlog import compact_txtable

    root = str(tmp_path / "tx")
    # several commits into the same bucket accumulate small files
    for i in range(4):
        txlog_upsert(
            spark, _rows(spark, [(k, f"b{i}") for k in range(i * 5, i * 5 + 5)]),
            root, num_buckets=1,
        )
    m_before = json.loads(
        (tmp_path / "tx/_commits" / f"{3:020d}.json").read_text()
    )
    files_before = len(m_before["buckets"]["0"])
    assert files_before >= 2
    before = _as_dict(read_txtable(spark, root))

    n = compact_txtable(spark, root)
    assert n == 1
    m_after = json.loads(
        (tmp_path / "tx/_commits" / f"{4:020d}.json").read_text()
    )
    assert len(m_after["buckets"]["0"]) < files_before
    assert m_after["row_counts"] == m_before["row_counts"]
    # rows identical; pre-compaction snapshot still readable (time travel)
    assert _as_dict(read_txtable(spark, root)) == before
    assert _as_dict(read_txtable(spark, root, version=3)) == before
    # idempotent: nothing left to compact
    assert compact_txtable(spark, root) == 0
    # vacuum then: old layout gone, current intact
    vacuum_txtable(spark, root, keep_last=1)
    assert _as_dict(read_txtable(spark, root)) == before
