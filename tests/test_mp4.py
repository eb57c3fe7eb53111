"""Stdlib ISO-BMFF muxer/demuxer (operators/mp4codec.py) and the Spark
video tier built on it (operators/multimodal.py): round-trip parity
across every sample-table fork (stts runs, ctts presence, stss
presence, fixed vs per-sample stsz, stco vs co64, single vs multi
chunk), box-grammar edge cases (largesize, trailing garbage), loud
refusals, and the mapInPandas demux end-to-end."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_demo_spark.operators.mp4codec import (
    Mp4FormatError,
    demux_mp4,
    mux_mp4,
)


def _mk(i: int) -> dict:
    return {
        "payload": bytes([i % 251]) * (20 + (i * 7) % 13),
        "duration": (i % 3 + 1) * 100,
        "keyframe": i % 4 == 0,
        "ctts": (i % 2) * 50,
    }


def test_round_trip_full_sample_table():
    samples = [_mk(i) for i in range(11)]
    movie = demux_mp4(mux_mp4(samples, timescale=600, width=32, height=24))
    assert movie["timescale"] == 600
    assert (movie["width"], movie["height"]) == (32, 24)
    assert movie["codec"] == "mp4v"
    assert len(movie["samples"]) == 11
    dts = 0
    for i, (want, got) in enumerate(zip(samples, movie["samples"])):
        assert got["index"] == i
        assert got["payload"] == want["payload"]
        assert got["size"] == len(want["payload"])
        assert got["duration"] == want["duration"]
        assert got["dts"] == dts
        assert got["pts"] == dts + want["ctts"]
        assert got["keyframe"] == want["keyframe"]
        dts += want["duration"]


def test_defaults_forks_fixed_stsz_no_stss_no_ctts():
    # uniform sizes + all keyframes + zero ctts: the mux omits stss and
    # ctts and writes the fixed-size stsz form
    samples = [{"payload": b"x" * 16, "duration": 100} for _ in range(7)]
    blob = mux_mp4(samples, samples_per_chunk=2)
    assert b"stss" not in blob and b"ctts" not in blob
    movie = demux_mp4(blob)
    assert all(s["keyframe"] for s in movie["samples"])
    assert all(s["pts"] == s["dts"] for s in movie["samples"])
    assert [s["size"] for s in movie["samples"]] == [16] * 7


def test_co64_and_single_chunk_layouts():
    samples = [_mk(i) for i in range(5)]
    m64 = demux_mp4(mux_mp4(samples, use_co64=True))
    m1 = demux_mp4(mux_mp4(samples, samples_per_chunk=999))
    mN = demux_mp4(mux_mp4(samples, samples_per_chunk=1))
    for movie in (m64, m1, mN):
        assert [s["payload"] for s in movie["samples"]] == [
            s["payload"] for s in samples
        ]


def test_metadata_only_projection_skips_payload():
    movie = demux_mp4(mux_mp4([_mk(i) for i in range(4)]), with_payload=False)
    assert all("payload" not in s for s in movie["samples"])
    assert [s["size"] for s in movie["samples"]] == [
        20 + (i * 7) % 13 for i in range(4)
    ]


def test_largesize_box_header():
    # rewrap a valid movie's moov as a size==1 largesize box: the walker
    # must honor the 64-bit size field
    blob = mux_mp4([_mk(i) for i in range(3)])
    idx = blob.rindex(b"moov") - 4
    (size,) = struct.unpack_from(">I", blob, idx)
    moov = blob[idx : idx + size]
    rewrapped = (
        blob[:idx]
        + struct.pack(">I", 1)
        + b"moov"
        + struct.pack(">Q", size + 8)
        + moov[8:]
    )
    assert len(demux_mp4(rewrapped)["samples"]) == 3


@pytest.mark.parametrize(
    "corrupt",
    [
        b"",
        b"\x00\x00\x00\x08free",  # no moov at all
        b"\x00\x00\x00\xffftyp",  # box overruns its container
    ],
)
def test_refuses_garbage(corrupt):
    with pytest.raises(Mp4FormatError):
        demux_mp4(corrupt)


def test_refuses_truncated_movie():
    blob = mux_mp4([_mk(i) for i in range(3)])
    with pytest.raises(Mp4FormatError):
        demux_mp4(blob[: len(blob) - 10])


def test_refuses_empty_and_nonpositive_duration():
    with pytest.raises(Mp4FormatError):
        mux_mp4([])
    with pytest.raises(Mp4FormatError):
        mux_mp4([{"payload": b"x", "duration": 0}])


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.binary(min_size=0, max_size=40),
            st.integers(min_value=1, max_value=10_000),
            st.booleans(),
            st.integers(min_value=0, max_value=5_000),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=7),
    st.booleans(),
)
def test_round_trip_property(entries, spc, co64):
    samples = [
        {"payload": p, "duration": d, "keyframe": k, "ctts": c}
        for p, d, k, c in entries
    ]
    movie = demux_mp4(mux_mp4(samples, samples_per_chunk=spc, use_co64=co64))
    assert len(movie["samples"]) == len(samples)
    dts = 0
    for want, got in zip(samples, movie["samples"]):
        assert got["payload"] == want["payload"]
        assert got["duration"] == want["duration"]
        assert got["dts"] == dts and got["pts"] == dts + want["ctts"]
        assert got["keyframe"] == want["keyframe"]
        dts += want["duration"]


# --- Spark tier -----------------------------------------------------------


def test_demux_mp4_frames_e2e(spark):
    from data_pipeline_demo_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, 26), (2, 3), (3, 50)], "doc_id long, n_chars long"
    )
    video = multimodal.synthesize_video_mp4(docs)
    meta = {r["media_id"]: r["meta"] for r in video.collect()}
    assert meta[1]["content_type"] == "video/mp4"

    frames = multimodal.demux_mp4_frames(video).collect()
    # n_frames = n_chars % 24 + 1 → 3, 4, 3 frames
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r)
    assert {m: len(v) for m, v in per.items()} == {1: 3, 2: 4, 3: 3}
    for mid, rows in per.items():
        for r in sorted(rows, key=lambda r: r["frame_idx"]):
            i = r["frame_idx"]
            tag_mid, tag_idx = struct.unpack(
                ">qi", bytes(r["frame_bytes"])[:12]
            )
            assert (tag_mid, tag_idx) == (mid, i)
            assert len(bytes(r["frame_bytes"])) == 20 + (i * 7) % 13
            assert r["keyframe"] == (i % 4 == 0)
            assert r["duration"] == (i % 3 + 1) * 100


def test_demux_mp4_frames_keyframes_only_and_stride(spark):
    from data_pipeline_demo_spark.operators import multimodal

    docs = spark.createDataFrame([(9, 23)], "doc_id long, n_chars long")
    video = multimodal.synthesize_video_mp4(docs)  # 24 frames
    key = multimodal.demux_mp4_frames(video, keyframes_only=True).collect()
    assert sorted(r["frame_idx"] for r in key) == [0, 4, 8, 12, 16, 20]
    strided = multimodal.demux_mp4_frames(video, every_n=5).collect()
    assert sorted(r["frame_idx"] for r in strided) == [0, 5, 10, 15, 20]


def test_video_neardup_planted_pairs(spark):
    """Original↔variant pairs recovered at the arithmetically-known
    Jaccard; no cross-content pairs (frame hashes are injective)."""
    from data_pipeline_demo_spark.operators import multimodal
    from data_pipeline_demo_spark.operators.dedup import jaccard_join_on_sets

    docs = spark.createDataFrame(
        [(1, 23), (2, 11), (3, 2)], "doc_id long, n_chars long"
    )  # n_frames 24, 12, 3 → variants only for 1 and 2
    video = multimodal.synthesize_video_corpus_with_variants(docs)
    frames = multimodal.demux_mp4_frames(video)
    from pyspark.sql import functions as F

    sigs = frames.groupBy("media_id").agg(
        F.collect_set("frame_sha256").alias("sh")
    )
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
        for r in jaccard_join_on_sets(
            sigs, id_col="media_id", threshold=0.7
        ).collect()
    }
    # n=24: drops ceil(24/7)=4 → 20/24; n=12: drops 2 → 10/12
    assert got == {
        (1, 10_000_001): round(20 / 24, 6),
        (2, 10_000_002): round(10 / 12, 6),
    }


def test_demux_skips_non_video_and_mdia_less_traks():
    """A movie whose moov leads with a bare trak and an audio trak must
    still resolve the video track (the walk filters on hdlr 'vide')."""
    from data_pipeline_demo_spark.operators.mp4codec import _box, _full

    blob = mux_mp4([{"payload": b"abc", "duration": 100}])
    idx = blob.rindex(b"moov") - 4
    (size,) = struct.unpack_from(">I", blob, idx)
    moov_payload = blob[idx + 8 : idx + size]
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"soun" + b"\x00" * 12 + b"x\x00",
    )
    extra = _box(b"trak", b"") + _box(b"trak", _box(b"mdia", hdlr))
    out = demux_mp4(blob[:idx] + _box(b"moov", extra + moov_payload))
    assert [s["payload"] for s in out["samples"]] == [b"abc"]


def test_demux_refuses_stsc_not_covering_stco():
    from data_pipeline_demo_spark.operators.mp4codec import _full

    blob = mux_mp4([{"payload": b"abc", "duration": 100}])
    good = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    bad = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 2, 1, 1))
    assert good in blob
    with pytest.raises(Mp4FormatError):
        demux_mp4(blob.replace(good, bad))


def test_fuzz_exception_discipline_and_bounded_expansion():
    """Every truncation, byte flip, and garbage input either parses or
    raises Mp4FormatError — never a raw struct/Index error, and never a
    pathological expansion (a corrupted stts/ctts/stsc run count or
    fixed-stsz sample count used to materialize multi-GB lists before
    any cross-check; the whole sweep now runs in seconds)."""
    import random

    random.seed(42)
    samples = [
        {"payload": bytes([i]) * (10 + i % 7), "duration": (i % 3 + 1) * 100,
         "keyframe": i % 4 == 0, "ctts": (i % 2) * 50}
        for i in range(9)
    ]
    blob = mux_mp4(samples)

    def check(b):
        try:
            demux_mp4(b)
        except Mp4FormatError:
            pass

    for cut in range(0, len(blob), 7):
        check(blob[:cut])
    for _ in range(600):
        i = random.randrange(len(blob))
        b = bytearray(blob)
        b[i] = random.randrange(256)
        check(bytes(b))
    for _ in range(150):
        check(bytes(random.randrange(256)
                    for _ in range(random.randrange(0, 200))))
