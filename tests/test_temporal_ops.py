"""Generalized as-of join (backward/forward/nearest/tolerance) and the
blocked interval-overlap join, pinned on literal hand-checkable frames;
value-level engine parity lives in the q130/q131 oracles."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators.asof import asof_join
from data_pipeline_demo_spark.operators.intervals import (
    interval_overlap_join,
)


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, 7, _t(10)), (2, 7, _t(12)), (3, 8, _t(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, _t(9)), (7, _t(10)), (7, _t(13)), (9, _t(1))],
        "user_id long, ts timestamp",
    )
    return left, right


def test_asof_backward_forward_nearest(spark, frames):
    left, right = frames

    def got(direction, **kw):
        return {
            r.event_id: r.asof_ts
            for r in asof_join(left, right, direction=direction, **kw).collect()
        }

    # backward: greatest right ts <= left ts (equal matches)
    assert got("backward") == {1: _t(10), 2: _t(10), 3: None}
    # forward: least right ts >= left ts
    assert got("forward") == {1: _t(10), 2: _t(13), 3: None}
    # nearest: event 2 is 2h from 10:00 and 1h from 13:00 -> forward
    assert got("nearest") == {1: _t(10), 2: _t(13), 3: None}
    # tolerance: the 1h-away match survives a 90min bound, not a 30min
    assert got("nearest", tolerance_seconds=5400)[2] == _t(13)
    assert got("nearest", tolerance_seconds=1800)[2] is None


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame(
        [(1, 5, _t(12))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, _t(11)), (5, _t(13))], "user_id long, ts timestamp"
    )
    out = asof_join(left, right, direction="nearest").collect()[0]
    assert out.asof_ts == _t(11)  # equidistant -> backward wins


def test_asof_right_value_payload(spark, frames):
    left, _ = frames
    right = spark.createDataFrame(
        [(7, _t(9), "early"), (7, _t(10), "ontime")],
        "user_id long, ts timestamp, label string",
    )
    out = {
        r.event_id: r.asof_label
        for r in asof_join(
            left, right, direction="backward", right_value="label"
        ).collect()
    }
    assert out[1] == "ontime" and out[2] == "ontime" and out[3] is None


def test_asof_bad_direction(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, direction="sideways")


def _iv(spark, rows, idc):
    return spark.createDataFrame(
        rows, f"{idc} long, start_ts timestamp, end_ts timestamp"
    )


def test_interval_overlap_literal_and_emit_once(spark):
    a = _iv(
        spark,
        [
            (1, _t(1), _t(5)),
            (2, _t(10), _t(11)),
            (3, _t(3), _t(20)),   # long interval spanning many buckets
        ],
        "id_a",
    )
    b = _iv(
        spark,
        [
            (10, _t(4), _t(6)),    # overlaps 1 and 3
            (11, _t(7), _t(8)),    # overlaps 3 only
            (12, _t(21), _t(22)),  # overlaps nothing
            (13, _t(5), _t(5)),    # point interval at 1's endpoint
        ],
        "id_b",
    )
    for unit in (600.0, 3600.0, 86400.0):  # results unit-invariant
        rows = interval_overlap_join(a, b, unit_seconds=unit).collect()
        pairs = [(r.id_a, r.id_b) for r in rows]
        assert len(pairs) == len(set(pairs)), unit  # emit exactly once
        assert set(pairs) == {
            (1, 10), (3, 10), (3, 11), (1, 13), (3, 13)
        }, unit
        span = {(r.id_a, r.id_b): (r.overlap_start, r.overlap_end) for r in rows}
        assert span[(1, 10)] == (_t(4), _t(5))
        assert span[(1, 13)] == (_t(5), _t(5))  # inclusive endpoint touch


def test_interval_overlap_malformed_rows_never_match(spark):
    a = _iv(spark, [(1, _t(5), _t(1)), (2, None, _t(3))], "id_a")
    b = _iv(spark, [(10, _t(0), _t(23))], "id_b")
    assert interval_overlap_join(a, b, unit_seconds=3600).count() == 0
    with pytest.raises(ValueError, match="unit_seconds"):
        interval_overlap_join(a, b, unit_seconds=0)


# --- CUSUM change-point detection ------------------------------------------


def _series(spark, vals, key="k"):
    return spark.createDataFrame(
        [(key, f"{i:04d}", float(v)) for i, v in enumerate(vals)],
        "k string, t string, v double",
    )


def test_cusum_detects_planted_shift_promptly(spark):
    """A clean +4σ level shift at index 50 must alarm within a few
    samples of the shift — and the first alarm's direction is 'up'."""
    from data_pipeline_demo_spark.operators.drift import cusum_changepoints

    import numpy as np

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [rng.normal(0, 1, 50), rng.normal(8, 1, 50)]
    )
    out = cusum_changepoints(
        _series(spark, vals), "k", "t", "v", k_sigmas=0.5, h_sigmas=5.0
    ).collect()
    ups = sorted(int(r.t) for r in out if r.direction == "up")
    # standardization uses the FULL-series mean (between the regimes),
    # so the effective post-shift z is ~+1/sample and s+ grows by
    # ~h/10 per step: detection lands ~10 samples after the shift
    assert ups and 50 <= ups[0] <= 62
    # never an 'up' alarm before the shift point
    assert all(i >= 50 for i in ups)


def test_cusum_constant_series_silent_and_zero_std_excluded(spark):
    from data_pipeline_demo_spark.operators.drift import cusum_changepoints

    # constant series: stddev 0 -> excluded entirely (no div-by-zero)
    out = cusum_changepoints(_series(spark, [5.0] * 40), "k", "t", "v")
    assert out.count() == 0
    # mild stationary noise never crosses h=5
    import numpy as np

    rng = np.random.default_rng(3)
    out2 = cusum_changepoints(
        _series(spark, rng.normal(0, 1, 200)), "k", "t", "v",
        k_sigmas=0.5, h_sigmas=5.0,
    )
    assert out2.count() == 0


def test_cusum_matches_numpy_reference_and_partition_invariant(spark):
    from data_pipeline_demo_spark.operators.drift import cusum_changepoints

    import numpy as np

    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [rng.normal(0, 1, 30), rng.normal(-6, 1, 30), rng.normal(0, 1, 30)]
    )
    df = _series(spark, vals)

    def reference(vals, k=0.5, h=5.0):
        z = (vals - vals.mean()) / vals.std()
        sp = sn = 0.0
        alarms = []
        for i, x in enumerate(z):
            sp = max(0.0, sp + x - k)
            sn = max(0.0, sn - x - k)
            if sp > h:
                alarms.append((i, "up"))
                sp = sn = 0.0
            elif sn > h:
                alarms.append((i, "down"))
                sp = sn = 0.0
        return alarms

    want = reference(vals)
    for reparted in (df, df.repartition(13)):
        got = sorted(
            (int(r.t), r.direction)
            for r in cusum_changepoints(
                reparted, "k", "t", "v", k_sigmas=0.5, h_sigmas=5.0
            ).collect()
        )
        assert got == sorted(want)
    # the multi-shift series surfaces BOTH directions
    dirs = {d for _, d in want}
    assert dirs == {"up", "down"}


# --- label propagation communities -----------------------------------------


def test_label_propagation_recovers_planted_communities(spark):
    """Two dense cliques joined by one bridge edge: LPA must give each
    clique one internal label and keep the two labels distinct; the
    result is deterministic (min-label tie-break, no RNG)."""
    from data_pipeline_demo_spark.operators.graph import label_propagation

    import itertools

    clique_a = list(itertools.combinations(range(1, 7), 2))
    clique_b = list(itertools.combinations(range(101, 107), 2))
    bridge = [(6, 101)]
    edges = spark.createDataFrame(
        clique_a + clique_b + bridge, "src long, dst long"
    )
    out1 = {r.node: r.label for r in label_propagation(edges, iters=5).collect()}
    out2 = {r.node: r.label for r in label_propagation(edges, iters=5).collect()}
    assert out1 == out2  # deterministic
    la = {out1[n] for n in range(1, 7)}
    lb = {out1[n] for n in range(101, 107)}
    assert len(la) == 1 and len(lb) == 1 and la != lb


def test_label_propagation_isolated_pairs(spark):
    from data_pipeline_demo_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (3, 4)], "src long, dst long"
    )
    out = {r.node: r.label for r in label_propagation(edges, iters=3).collect()}
    assert out[1] == out[2] and out[3] == out[4] and out[1] != out[3]


# --- WebDataset shard export -----------------------------------------------


def test_webdataset_shards_roundtrip_and_bounds(spark):
    """Every doc lands in exactly one shard exactly once; each shard is
    a valid tar any reader opens; payload per shard respects the
    boundary-straddle bound; member bytes round-trip exactly."""
    import io
    import tarfile

    from data_pipeline_demo_spark.operators.shards import export_webdataset

    docs = spark.createDataFrame(
        [(i, "x" * (50 + (i * 37) % 400)) for i in range(200)],
        "doc_id long, text string",
    )
    B = 2000
    out = export_webdataset(
        docs, shard_max_bytes=B, lanes=4
    ).collect()
    seen = {}
    for r in out:
        with tarfile.open(fileobj=io.BytesIO(bytes(r.tar))) as tar:
            members = tar.getmembers()
            assert len(members) == r.n_docs
            payload = 0
            for m in members:
                key = int(m.name.removesuffix(".txt"))
                data = tar.extractfile(m).read()
                assert key not in seen
                seen[key] = data
                payload += len(data)
        # fixed-boundary bound: B + straddling member - 1
        assert payload <= B + 449
    assert set(seen) == set(range(200))
    for i in range(200):
        assert seen[i] == ("x" * (50 + (i * 37) % 400)).encode()


def test_webdataset_deterministic_and_oversized_isolated(spark):
    import io
    import tarfile

    from data_pipeline_demo_spark.operators.shards import export_webdataset

    docs = spark.createDataFrame(
        [(1, "a" * 10), (2, "b" * 5000), (3, "c" * 10)],
        "doc_id long, text string",
    )
    a = sorted(
        (r.lane, r.shard_id, r.n_docs, bytes(r.tar))
        for r in export_webdataset(docs, shard_max_bytes=100, lanes=1).collect()
    )
    b = sorted(
        (r.lane, r.shard_id, r.n_docs, bytes(r.tar))
        for r in export_webdataset(docs, shard_max_bytes=100, lanes=1).collect()
    )
    assert a == b  # bit-identical shards (mtime pinned)
    # fixed-boundary contract: the oversized doc claims its own span
    # of blocks — the doc BEFORE it never shares its shard (only
    # trailing fill after its last byte may); payload bound holds
    for lane, shard, n, blob in a:
        with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
            members = {m.name: tar.extractfile(m).read() for m in tar.getmembers()}
        if "2.txt" in members:
            assert "1.txt" not in members
            assert sum(len(v) for v in members.values()) <= 100 + 5000 - 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="shard_max_bytes"):
        export_webdataset(docs, shard_max_bytes=0)


# --- WebDataset shard import ------------------------------------------------


def test_read_webdataset_inverts_export(spark):
    """parse(export(docs)) recovers every (key, payload) exactly once,
    bytes equal — the in-memory half of the delivery loop."""
    from pyspark.sql import functions as F

    from data_pipeline_demo_spark.operators.shards import (
        export_webdataset,
        read_webdataset,
    )

    rows = [(i, f"doc-{i}-" + "y" * (20 + (i * 13) % 300)) for i in range(150)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    members = read_webdataset(
        export_webdataset(docs, shard_max_bytes=1500, lanes=4)
    )
    got = {
        int(r.key): (r.ext, bytes(r.data), r.n_bytes)
        for r in members.collect()
    }
    assert set(got) == set(range(150))
    for i, text in rows:
        ext, data, n = got[i]
        assert ext == "txt" and data == text.encode() and n == len(data)
    # decoded text round-trips through the DataFrame surface too
    back = members.select(
        F.col("key").cast("long").alias("doc_id"),
        F.decode("data", "UTF-8").alias("text"),
    )
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_read_webdataset_multi_ext_samples(spark):
    """Members of one sample share the key (split at FIRST dot, the
    WebDataset convention); members_to_samples pivots them into one
    row per key with NULLs for absent extensions."""
    import io
    import tarfile

    from data_pipeline_demo_spark.operators.shards import (
        members_to_samples,
        read_webdataset,
    )

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name, data in [
            ("0001.txt", b"hello"),
            ("0001.meta.json", b'{"lang":"en"}'),
            ("0002.txt", b"world"),
            ("dir/0003.meta.json", b"{}"),  # basename rules
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    shards = spark.createDataFrame([(buf.getvalue(),)], "tar binary")
    members = read_webdataset(shards)
    got = {(r.key, r.ext): bytes(r.data) for r in members.collect()}
    assert got == {
        ("0001", "txt"): b"hello",
        ("0001", "meta.json"): b'{"lang":"en"}',
        ("0002", "txt"): b"world",
        ("0003", "meta.json"): b"{}",
    }
    samples = members_to_samples(members, exts=("txt", "meta.json")).collect()
    by_key = {r.key: r for r in samples}
    assert bytes(by_key["0001"]["txt"]) == b"hello"
    assert bytes(by_key["0001"]["meta.json"]) == b'{"lang":"en"}'
    assert by_key["0002"]["meta.json"] is None
    assert by_key["0003"]["txt"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="exts"):
        members_to_samples(members, exts=())


def test_load_webdataset_binaryfile_ingest(spark, tmp_path):
    """Shard FILES on disk re-ingest through the binaryFile source:
    write each exported blob as <lane>-<shard>.tar, load the directory,
    recover the corpus exactly (and the glob filter skips non-tar
    files)."""
    from data_pipeline_demo_spark.operators.shards import (
        export_webdataset,
        load_webdataset,
    )

    rows = [(i, f"payload-{i:04d}") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for r in export_webdataset(docs, shard_max_bytes=400, lanes=2).collect():
        (tmp_path / f"{r.lane:02d}-{r.shard_id:04d}.tar").write_bytes(
            bytes(r.tar)
        )
    (tmp_path / "README.md").write_text("not a shard")
    members = load_webdataset(spark, str(tmp_path))
    got = {int(r.key): bytes(r.data) for r in members.collect()}
    assert got == {i: t.encode() for i, t in rows}
