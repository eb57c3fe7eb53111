"""Incrementally-maintained join view (sinks/join_view.py): the
refreshed materialization must equal a from-scratch rebuild of
A ⋈ B after every DML round, with dirty keys taken from the REAL
txtable change feeds (preimages included, so join-key moves dirty both
the old and the new key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_demo_spark.sinks.join_view import (
    VIEW_KEY,
    build_join_view,
    dirty_join_keys,
    refresh_join_view,
)
from data_pipeline_demo_spark.sinks.txlog import (
    read_txtable,
    txlog_delete,
    txlog_upsert,
    txtable_changes,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, k long, val string")


def _view_rows(spark, root):
    try:
        df = read_txtable(spark, root)
    except FileNotFoundError as e:
        if "is empty" not in str(e):
            raise
        return set()  # fully-emptied view: semantically zero rows
    return {
        tuple(r)
        for r in df.drop(VIEW_KEY)
        .select("k", "a_id", "a_val", "b_id", "b_val")
        .collect()
    }


def _expected(a, b):
    return {
        tuple(r)
        for r in a.selectExpr("k", "id AS a_id", "val AS a_val")
        .join(b.selectExpr("k", "id AS b_id", "val AS b_val"), "k")
        .select("k", "a_id", "a_val", "b_id", "b_val")
        .collect()
    }


def test_view_key_null_distinct_and_separator_safe(spark):
    """The composite view key must be INJECTIVE: rows differing only in
    which of (on, a_id, b_id) is NULL, or ids containing the \\x1f
    separator, must map to distinct keys — concat_ws's null-skipping
    made them collide so one MERGE row silently overwrote another
    (round-6 advisor finding)."""
    from data_pipeline_demo_spark.sinks.join_view import (
        VIEW_KEY,
        _with_view_key,
    )

    rows = [
        ("5", None, "x"),       # null a_id
        (None, "5", "x"),       # null on — same non-null values, shifted
        ("5", "x", None),       # null b_id
        ("5\x1fx", None, None), # separator inside a value
        ("5", "x", "\x00N"),    # value that spells the null marker
        ("5", "x", None),       # ACTUAL null in the same position: distinct
    ]
    df = spark.createDataFrame(rows, "on string, a string, b string")
    keys = [
        r[VIEW_KEY]
        for r in _with_view_key(df, "on", "a", "b").collect()
    ]
    # rows 2 and 5 are identical inputs -> identical keys; all OTHER
    # distinct inputs -> distinct keys
    assert keys[2] == keys[5]
    distinct_inputs = [keys[i] for i in (0, 1, 2, 3, 4)]
    assert len(set(distinct_inputs)) == 5


def test_join_view_refresh_equals_rebuild_across_dml(spark, tmp_path):
    a_root = str(tmp_path / "a_tx")
    b_root = str(tmp_path / "b_tx")
    v_root = str(tmp_path / "view_tx")

    a0 = _df(spark, [(1, 10, "a1"), (2, 10, "a2"), (3, 20, "a3"), (4, 30, "a4")])
    b0 = _df(spark, [(101, 10, "b1"), (102, 20, "b2"), (103, 40, "b3")])
    txlog_upsert(spark, a0, a_root, key="id", num_buckets=4)
    txlog_upsert(spark, b0, b_root, key="id", num_buckets=4)

    def snap(root):
        return read_txtable(spark, root).select("id", "k", "val")

    def viewify(df, side):
        return df.selectExpr(
            "k", f"id AS {side}_id", f"val AS {side}_val"
        )

    build_join_view(
        spark,
        v_root,
        viewify(snap(a_root), "a"),
        viewify(snap(b_root), "b"),
        on="k",
        a_id="a_id",
        b_id="b_id",
        num_buckets=4,
    )
    assert _view_rows(spark, v_root) == _expected(snap(a_root), snap(b_root))

    # round 1: A update (join-key MOVE 10 -> 20), A insert, B delete
    txlog_upsert(
        spark, _df(spark, [(2, 20, "a2x"), (5, 40, "a5")]), a_root
    )
    txlog_delete(spark, b_root, where="id = 102")
    a_ch = txtable_changes(spark, a_root, 0, 1, include_preimages=True)
    b_ch = txtable_changes(spark, b_root, 0, 1, include_preimages=True)
    dirty = dirty_join_keys("k", a_ch, b_ch)
    # the key-move update must dirty BOTH keys via pre+postimage rows
    assert {r.k for r in dirty.collect()} >= {10, 20, 40}
    refresh_join_view(
        spark,
        v_root,
        viewify(snap(a_root), "a"),
        viewify(snap(b_root), "b"),
        dirty,
        on="k",
        a_id="a_id",
        b_id="b_id",
    )
    assert _view_rows(spark, v_root) == _expected(snap(a_root), snap(b_root))

    # round 2: B gains a key matching the moved row; A loses a row
    txlog_upsert(spark, _df(spark, [(104, 40, "b4"), (105, 30, "b5")]), b_root)
    txlog_delete(spark, a_root, where="id = 1")
    a_ch2 = txtable_changes(spark, a_root, 1, 2, include_preimages=True)
    b_ch2 = txtable_changes(spark, b_root, 1, 2, include_preimages=True)
    refresh_join_view(
        spark,
        v_root,
        viewify(snap(a_root), "a"),
        viewify(snap(b_root), "b"),
        dirty_join_keys("k", a_ch2, b_ch2),
        on="k",
        a_id="a_id",
        b_id="b_id",
    )
    assert _view_rows(spark, v_root) == _expected(snap(a_root), snap(b_root))


def test_refresh_untouched_keys_never_rewritten(spark, tmp_path):
    """A refresh whose dirty set misses a join key leaves that key's
    view rows byte-identical (no spurious delete/upsert churn)."""
    a_root = str(tmp_path / "a2_tx")
    b_root = str(tmp_path / "b2_tx")
    v_root = str(tmp_path / "v2_tx")
    a0 = _df(spark, [(1, 10, "a1"), (2, 20, "a2")])
    b0 = _df(spark, [(101, 10, "b1"), (102, 20, "b2")])
    txlog_upsert(spark, a0, a_root, key="id", num_buckets=2)
    txlog_upsert(spark, b0, b_root, key="id", num_buckets=2)

    def viewify(df, side):
        return df.selectExpr("k", f"id AS {side}_id", f"val AS {side}_val")

    def snap(root):
        return read_txtable(spark, root).select("id", "k", "val")

    build_join_view(
        spark, v_root, viewify(snap(a_root), "a"), viewify(snap(b_root), "b"),
        on="k", a_id="a_id", b_id="b_id", num_buckets=2,
    )
    txlog_upsert(spark, _df(spark, [(1, 10, "a1x")]), a_root)
    stats = refresh_join_view(
        spark, v_root, viewify(snap(a_root), "a"), viewify(snap(b_root), "b"),
        dirty_join_keys("k", txtable_changes(spark, a_root, 0, 1, include_preimages=True)),
        on="k", a_id="a_id", b_id="b_id",
    )
    # nothing under key 20 was deleted or re-derived stale
    assert stats["deleted"] == 0
    assert _view_rows(spark, v_root) == _expected(snap(a_root), snap(b_root))


def test_stream_join_view_maintenance_batches(spark, tmp_path):
    """The streaming maintenance callback, fed REAL change-feed slices
    (preimages included), keeps the view equal to a from-scratch join
    after every trigger — including a join-key move."""
    from data_pipeline_demo_spark.sources.txtable_source import (
        register_txtable_source,
    )
    from data_pipeline_demo_spark.streaming.jobs import (
        make_join_view_batch_fn,
    )

    register_txtable_source(spark)
    a_root = str(tmp_path / "sa_tx")
    b_root = str(tmp_path / "sb_tx")
    v_root = str(tmp_path / "sv_tx")
    txlog_upsert(
        spark,
        _df(spark, [(1, 10, "a1"), (2, 20, "a2")]),
        a_root,
        key="id",
        num_buckets=4,
    )
    txlog_upsert(
        spark,
        _df(spark, [(101, 10, "b1"), (102, 20, "b2"), (103, 30, "b3")]),
        b_root,
        key="id",
        num_buckets=4,
    )

    def viewify(df, side):
        return df.selectExpr("k", f"id AS {side}_id", f"val AS {side}_val")

    def a_current():
        return viewify(read_txtable(spark, a_root).select("id", "k", "val"), "a")

    def b_current():
        return viewify(read_txtable(spark, b_root).select("id", "k", "val"), "b")

    build_join_view(
        spark, v_root, a_current(), b_current(),
        on="k", a_id="a_id", b_id="b_id", num_buckets=4,
    )
    fn = make_join_view_batch_fn(
        v_root, a_current, b_current, on="k", a_id="a_id", b_id="b_id"
    )

    def feed(from_v, to_v, batch_id):
        slice_df = (
            spark.read.format("txtable")
            .option("readChangeFeed", "true")
            .option("startingVersion", str(from_v))
            .option("endingVersion", str(to_v))
            .option("includePreimages", "true")
            .load(a_root)
        )
        fn(slice_df, batch_id)

    # trigger 1: key move 10 -> 30 plus an insert
    txlog_upsert(spark, _df(spark, [(1, 30, "a1x"), (3, 20, "a3")]), a_root)
    feed(0, 1, 0)
    a_now = read_txtable(spark, a_root).select("id", "k", "val")
    b_now = read_txtable(spark, b_root).select("id", "k", "val")
    assert _view_rows(spark, v_root) == _expected(a_now, b_now)

    # trigger 2: delete
    txlog_delete(spark, a_root, where="id = 2")
    feed(1, 2, 1)
    a_now = read_txtable(spark, a_root).select("id", "k", "val")
    assert _view_rows(spark, v_root) == _expected(a_now, b_now)


def test_join_view_maintenance_retries_commit_race(
    spark, tmp_path, monkeypatch
):
    """A lost view-commit race (two-sided maintenance racing the same
    view root) must not kill the streaming query: the foreachBatch
    callback catches ConcurrentCommitError and re-runs the key-scoped
    refresh against the winner's snapshot, converging to the correct
    view (round-6 advisor finding)."""
    import data_pipeline_demo_spark.sinks.join_view as jv_mod
    from data_pipeline_demo_spark.sinks.txlog import ConcurrentCommitError
    from data_pipeline_demo_spark.sources.txtable_source import (
        register_txtable_source,
    )
    from data_pipeline_demo_spark.streaming.jobs import (
        make_join_view_batch_fn,
    )

    register_txtable_source(spark)
    a_root = str(tmp_path / "ra_tx")
    b_root = str(tmp_path / "rb_tx")
    v_root = str(tmp_path / "rv_tx")
    txlog_upsert(
        spark, _df(spark, [(1, 10, "a1")]), a_root, key="id", num_buckets=4
    )
    txlog_upsert(
        spark, _df(spark, [(101, 10, "b1")]), b_root, key="id", num_buckets=4
    )

    def viewify(df, side):
        return df.selectExpr("k", f"id AS {side}_id", f"val AS {side}_val")

    def a_current():
        return viewify(read_txtable(spark, a_root).select("id", "k", "val"), "a")

    def b_current():
        return viewify(read_txtable(spark, b_root).select("id", "k", "val"), "b")

    build_join_view(
        spark, v_root, a_current(), b_current(),
        on="k", a_id="a_id", b_id="b_id", num_buckets=4,
    )
    real_refresh = jv_mod.refresh_join_view
    calls = {"n": 0}

    def flaky_refresh(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConcurrentCommitError("simulated lost view-commit race")
        return real_refresh(*args, **kwargs)

    monkeypatch.setattr(jv_mod, "refresh_join_view", flaky_refresh)
    fn = make_join_view_batch_fn(
        v_root, a_current, b_current, on="k", a_id="a_id", b_id="b_id"
    )
    txlog_upsert(spark, _df(spark, [(2, 10, "a2")]), a_root)
    slice_df = (
        spark.read.format("txtable")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .option("endingVersion", "1")
        .option("includePreimages", "true")
        .load(a_root)
    )
    fn(slice_df, 0)  # must NOT raise: first attempt loses, retry wins
    assert calls["n"] == 2
    a_now = read_txtable(spark, a_root).select("id", "k", "val")
    b_now = read_txtable(spark, b_root).select("id", "k", "val")
    assert _view_rows(spark, v_root) == _expected(a_now, b_now)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_op = st.tuples(
    st.sampled_from(["upsert_a", "upsert_b", "delete_a", "delete_b"]),
    st.integers(min_value=1, max_value=6),    # row id
    st.integers(min_value=10, max_value=13),  # join key (collisions + moves)
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=5))
def test_join_view_model_random_dml(spark, tmp_path_factory, ops):
    """Model check: after ANY short random DML history on both sides —
    inserts, value updates, join-key moves, deletes — one refresh from
    the cumulative preimage-complete change feeds makes the view equal
    a from-scratch rebuild."""
    tmp = tmp_path_factory.mktemp("jv_model")
    a_root, b_root, v_root = (
        str(tmp / "a"), str(tmp / "b"), str(tmp / "v"),
    )
    txlog_upsert(
        spark, _df(spark, [(1, 10, "a0"), (2, 11, "a0")]),
        a_root, key="id", num_buckets=4,
    )
    txlog_upsert(
        spark, _df(spark, [(1, 10, "b0"), (2, 12, "b0")]),
        b_root, key="id", num_buckets=4,
    )

    def viewify(df, side):
        return df.selectExpr("k", f"id AS {side}_id", f"val AS {side}_val")

    def snap(root):
        return read_txtable(spark, root).select("id", "k", "val")

    build_join_view(
        spark, v_root, viewify(snap(a_root), "a"), viewify(snap(b_root), "b"),
        on="k", a_id="a_id", b_id="b_id", num_buckets=4,
    )
    a_v = b_v = 0
    for i, (kind, rid, k) in enumerate(ops):
        root = a_root if kind.endswith("_a") else b_root
        if kind.startswith("upsert"):
            txlog_upsert(spark, _df(spark, [(rid, k, f"v{i}")]), root)
        else:
            # delete may match nothing: no version committed then
            txlog_delete(spark, root, where=f"id = {rid}")
        if kind.endswith("_a"):
            a_v = len(
                __import__("os").listdir(f"{a_root}/_commits")
            ) - 1
        else:
            b_v = len(
                __import__("os").listdir(f"{b_root}/_commits")
            ) - 1
    feeds = []
    if a_v > 0:
        feeds.append(
            txtable_changes(spark, a_root, 0, include_preimages=True)
        )
    if b_v > 0:
        feeds.append(
            txtable_changes(spark, b_root, 0, include_preimages=True)
        )
    if feeds:
        refresh_join_view(
            spark, v_root,
            viewify(snap(a_root), "a"), viewify(snap(b_root), "b"),
            dirty_join_keys("k", *feeds),
            on="k", a_id="a_id", b_id="b_id",
        )
    assert _view_rows(spark, v_root) == _expected(snap(a_root), snap(b_root))
