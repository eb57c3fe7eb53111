"""APPLY CHANGES INTO (sinks/cdc_apply.py): out-of-order + duplicated
CDC feeds converge to per-key latest-sequence state; delete wins ties;
replay is a log-level no-op; delete-only batches still watermark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.sinks.cdc_apply import apply_changes, net_changes
from data_pipeline_demo_spark.sinks.txlog import read_txtable, txlog_upsert


def _feed(spark, rows):
    return spark.createDataFrame(
        rows, "id long, val string, op string, sequence long"
    )


@pytest.fixture()
def t(spark, tmp_path):
    root = str(tmp_path / "cdc_tx")
    txlog_upsert(
        spark,
        spark.createDataFrame(
            [(1, "base1"), (2, "base2"), (3, "base3")], "id long, val string"
        ),
        root,
        key="id",
        num_buckets=4,
    )
    return root


def _state(spark, root):
    return {r.id: r.val for r in read_txtable(spark, root).collect()}


def test_out_of_order_feed_converges(spark, t):
    # key 1: upserts arrive out of order — seq 30 wins
    # key 2: delete at 20 then (earlier) upsert at 10 — delete wins
    # key 4: brand new key, single insert
    feed = _feed(
        spark,
        [
            (1, "v30", "upsert", 30),
            (1, "v10", "upsert", 10),
            (1, "v20", "upsert", 20),
            (2, None, "delete", 20),
            (2, "late-but-old", "upsert", 10),
            (4, "new", "upsert", 5),
        ],
    )
    stats = apply_changes(spark, feed, t)
    assert stats == {"upserted": 2, "deleted": 1, "skipped_replay": False}
    assert _state(spark, t) == {1: "v30", 3: "base3", 4: "new"}


def test_shuffled_feed_equals_sorted_feed(spark, t, tmp_path):
    """Net effect is order-independent: applying a shuffled feed and a
    sequence-sorted feed to twin tables yields identical state."""
    rows = [
        (1, f"v{s}", "upsert", s) for s in (5, 3, 9, 1, 7)
    ] + [(2, None, "delete", 4), (2, "re", "upsert", 6), (3, None, "delete", 8)]
    import random

    shuffled = rows[:]
    random.Random(7).shuffle(shuffled)

    root2 = str(tmp_path / "cdc_tx2")
    txlog_upsert(
        spark,
        spark.createDataFrame(
            [(1, "base1"), (2, "base2"), (3, "base3")], "id long, val string"
        ),
        root2,
        key="id",
        num_buckets=4,
    )
    apply_changes(spark, _feed(spark, rows), t)
    apply_changes(spark, _feed(spark, shuffled), root2)
    assert _state(spark, t) == _state(spark, root2) == {1: "v9", 2: "re"}


def test_sequence_tie_delete_wins(spark, t):
    feed = _feed(
        spark, [(1, "resurrect", "upsert", 10), (1, None, "delete", 10)]
    )
    apply_changes(spark, feed, t)
    assert 1 not in _state(spark, t)  # conservative: delete wins the tie


def test_replay_is_noop(spark, t):
    feed = _feed(spark, [(1, "v2", "upsert", 2), (2, None, "delete", 3)])
    s1 = apply_changes(
        spark, feed, t, txn_app_id="cdc-app", txn_version=7
    )
    assert not s1["skipped_replay"]
    before = _state(spark, t)
    s2 = apply_changes(
        spark, feed, t, txn_app_id="cdc-app", txn_version=7
    )
    assert s2 == {"upserted": 0, "deleted": 0, "skipped_replay": True}
    assert _state(spark, t) == before == {1: "v2", 3: "base3"}
    # a HIGHER version applies again
    s3 = apply_changes(
        spark,
        _feed(spark, [(1, "v3", "upsert", 9)]),
        t,
        txn_app_id="cdc-app",
        txn_version=8,
    )
    assert not s3["skipped_replay"]
    assert _state(spark, t)[1] == "v3"


def test_delete_only_batch_watermarks(spark, t):
    feed = _feed(spark, [(3, None, "delete", 1)])
    apply_changes(spark, feed, t, txn_app_id="d-app", txn_version=1)
    assert 3 not in _state(spark, t)
    s2 = apply_changes(spark, feed, t, txn_app_id="d-app", txn_version=1)
    assert s2["skipped_replay"]


def test_net_changes_window_is_group_limited(spark):
    """The net-effect reduction must group-limit below the exchange —
    map tasks ship one candidate row per key, not the whole feed."""
    feed = _feed(
        spark, [(i % 10, f"v{i}", "upsert", i) for i in range(1000)]
    )
    net = net_changes(feed, "id", "sequence", "op")
    plan = net._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert net.count() == 10


def test_stream_apply_changes_batches(spark, t, tmp_path):
    """Streaming APPLY CHANGES: CDC rows delivered across several
    micro-batches (one file per trigger) converge the table to the
    same state a single batch application produces, and a replayed
    batch id is a log-level no-op."""
    from data_pipeline_demo_spark.streaming.jobs import (
        make_apply_changes_batch_fn,
    )

    fn = make_apply_changes_batch_fn(t, txn_app_id="cdc-stream")
    # trigger 0: upserts; trigger 1: a delete + an out-of-order upsert
    b0 = _feed(spark, [(1, "s1", "upsert", 10), (4, "s4", "upsert", 1)])
    b1 = _feed(spark, [(2, None, "delete", 5), (1, "late", "upsert", 3)])
    fn(b0, 0)
    fn(b1, 1)
    # batch 1's seq-3 upsert for key 1 arrived in a LATER batch: the
    # verbs overwrite, so batch order wins (the documented contract)
    assert _state(spark, t) == {1: "late", 3: "base3", 4: "s4"}
    # replaying batch 1 changes nothing (watermark)
    before = _state(spark, t)
    fn(b1, 1)
    assert _state(spark, t) == before
    # empty batch short-circuits (no version churn)
    from data_pipeline_demo_spark.sinks.txlog import txtable_history

    n_versions = len(txtable_history(spark, t))
    fn(_feed(spark, []), 2)
    assert len(txtable_history(spark, t)) == n_versions


def test_new_table_needs_key(spark, tmp_path):
    feed = _feed(spark, [(1, "v", "upsert", 1)])
    with pytest.raises(ValueError, match="key"):
        apply_changes(spark, feed, str(tmp_path / "nope"))
    # with an explicit key the table is created
    root = str(tmp_path / "fresh")
    apply_changes(spark, feed, root, key="id", num_buckets=2)
    assert _state(spark, root) == {1: "v"}


# ---------------------------------------------------------------- SCD2


def _hist(spark, root):
    from data_pipeline_demo_spark.sinks.cdc_apply import SCD2_KEY

    rows = read_txtable(spark, root).drop(SCD2_KEY).collect()
    return sorted(
        (r["id"], r["val"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in rows
    )


def test_scd2_insert_update_delete_chain(spark, tmp_path):
    from data_pipeline_demo_spark.sinks.cdc_apply import scd2_apply_changes

    root = str(tmp_path / "scd2")
    # three batches: insert @1, update @3, delete @5
    for i, rows in enumerate(
        [
            [(1, "a", "upsert", 1)],
            [(1, "b", "upsert", 3)],
            [(1, None, "delete", 5)],
        ]
    ):
        scd2_apply_changes(
            spark, _feed(spark, rows), root, key="id", num_buckets=4
        )
    assert _hist(spark, root) == [
        (1, "a", 1, 3, False),
        (1, "b", 3, 5, False),
    ]


def test_scd2_multi_version_single_batch_and_reinsert(spark, tmp_path):
    from data_pipeline_demo_spark.sinks.cdc_apply import scd2_apply_changes

    root = str(tmp_path / "scd2")
    # one batch carries a whole chain incl. delete + re-insert
    feed = _feed(
        spark,
        [
            (1, "a", "upsert", 1),
            (1, "b", "upsert", 2),
            (1, None, "delete", 4),
            (1, "c", "upsert", 7),
            (2, "x", "upsert", 5),
        ],
    )
    r = scd2_apply_changes(spark, feed, root, key="id", num_buckets=4)
    assert r["versions_written"] == 4
    assert _hist(spark, root) == [
        (1, "a", 1, 2, False),
        (1, "b", 2, 4, False),  # closed by the delete; gap 4..7 uncovered
        (1, "c", 7, None, True),
        (2, "x", 5, None, True),
    ]


def test_scd2_batch_split_invariance(spark, tmp_path):
    from data_pipeline_demo_spark.sinks.cdc_apply import scd2_apply_changes

    rows = [
        (1, "a", "upsert", 1),
        (1, "b", "upsert", 3),
        (2, "p", "upsert", 2),
        (1, None, "delete", 6),
        (2, "q", "upsert", 8),
        (3, "z", "upsert", 4),
        (1, "c", "upsert", 9),
    ]
    one = str(tmp_path / "one")
    scd2_apply_changes(spark, _feed(spark, rows), one, key="id", num_buckets=4)
    split = str(tmp_path / "split")
    # same changes over three sequence-ordered batches
    for lo, hi in [(0, 3), (3, 5), (5, 99)]:
        batch = [r for r in rows if lo <= r[3] < hi]
        scd2_apply_changes(
            spark, _feed(spark, batch), split, key="id", num_buckets=4
        )
    assert _hist(spark, one) == _hist(spark, split)


def test_scd2_suppress_unchanged_and_stale(spark, tmp_path):
    from data_pipeline_demo_spark.sinks.cdc_apply import scd2_apply_changes

    root = str(tmp_path / "scd2")
    scd2_apply_changes(
        spark,
        _feed(spark, [(1, "a", "upsert", 1)]),
        root,
        key="id",
        num_buckets=4,
    )
    # no-op update (same val) suppressed; stale seq <= open valid_from dropped
    r = scd2_apply_changes(
        spark,
        _feed(spark, [(1, "a", "upsert", 3), (1, "old", "upsert", 1)]),
        root,
        key="id",
        num_buckets=4,
        suppress_unchanged=True,
    )
    assert _hist(spark, root) == [(1, "a", 1, None, True)]
    # a REAL change after a suppressed one chains to the surviving row
    scd2_apply_changes(
        spark,
        _feed(spark, [(1, "b", "upsert", 5)]),
        root,
        key="id",
        num_buckets=4,
        suppress_unchanged=True,
    )
    assert _hist(spark, root) == [
        (1, "a", 1, 5, False),
        (1, "b", 5, None, True),
    ]


def test_scd2_replay_is_noop(spark, tmp_path):
    from data_pipeline_demo_spark.sinks.cdc_apply import scd2_apply_changes

    root = str(tmp_path / "scd2")
    feed = _feed(spark, [(1, "a", "upsert", 1), (2, "b", "upsert", 2)])
    scd2_apply_changes(
        spark, feed, root, key="id", num_buckets=4,
        txn_app_id="app", txn_version=7,
    )
    before = _hist(spark, root)
    r = scd2_apply_changes(
        spark,
        _feed(spark, [(1, "EVIL", "upsert", 99)]),
        root,
        key="id",
        num_buckets=4,
        txn_app_id="app",
        txn_version=7,  # same watermark: must skip
    )
    assert r["skipped_replay"] is True
    assert _hist(spark, root) == before


def test_scd2_null_key_refused(spark, tmp_path):
    from data_pipeline_demo_spark.sinks.cdc_apply import scd2_apply_changes

    with pytest.raises(ValueError, match="NULL"):
        scd2_apply_changes(
            spark,
            _feed(spark, [(None, "a", "upsert", 1)]),
            str(tmp_path / "scd2"),
            key="id",
            num_buckets=4,
        )


def test_bloom_in_prunes_and_stays_exact(spark, tmp_path):
    root = str(tmp_path / "btx")
    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(64)], "id long, name string"
    )
    txlog_upsert(
        spark, df, root, key="id", num_buckets=8, bloom_columns=["name"]
    )
    got = read_txtable(
        spark, root, bloom_in={"name": ["name3", "name40"]}
    ).collect()
    assert sorted(r["id"] for r in got) == [3, 40]
    # absent values prune everything -> empty frame with real schema
    empty = read_txtable(spark, root, bloom_in={"name": ["nope"]})
    assert empty.count() == 0
    with pytest.raises(ValueError, match="empty"):
        read_txtable(spark, root, bloom_in={"name": []})
    with pytest.raises(ValueError, match="NULL"):
        read_txtable(spark, root, bloom_in={"name": ["x", None]})
    with pytest.raises(ValueError, match="no bloom index"):
        read_txtable(spark, root, bloom_in={"id": [1]})


def test_stream_scd2_maintenance_batches(spark, tmp_path):
    """Streaming SCD2: CDC rows across micro-batch callbacks build the
    same history a single batch application produces; replayed batch
    ids are log-level no-ops; empty batches cause no version churn."""
    from data_pipeline_demo_spark.streaming.jobs import make_scd2_batch_fn

    root = str(tmp_path / "scd2s")
    fn = make_scd2_batch_fn(root, key="id", txn_app_id="scd2-stream")
    fn(_feed(spark, [(1, "a", "upsert", 1), (2, "x", "upsert", 2)]), 0)
    fn(_feed(spark, [(1, "b", "upsert", 4)]), 1)
    fn(_feed(spark, [(1, None, "delete", 6), (2, "y", "upsert", 7)]), 2)
    assert _hist(spark, root) == [
        (1, "a", 1, 4, False),
        (1, "b", 4, 6, False),
        (2, "x", 2, 7, False),
        (2, "y", 7, None, True),
    ]
    before = _hist(spark, root)
    fn(_feed(spark, [(1, "EVIL", "upsert", 99)]), 2)  # replayed id
    assert _hist(spark, root) == before
    from data_pipeline_demo_spark.sinks.txlog import txtable_history

    n_versions = len(txtable_history(spark, root))
    fn(_feed(spark, []), 3)
    assert len(txtable_history(spark, root)) == n_versions
