"""Multimodal (image/audio/video) column plumbing (north-star surface).

Media are opaque ``binary`` payload columns + a typed metadata struct;
all per-item compute rides ``mapInPandas`` (Arrow-batched, pipelined,
no shuffle). The Spark-side contract — schema, batch shape, partition
behavior — is real and tested; the actual codec calls are STUBBED because
this container has no image/audio libraries:

- `decode_image` raises NotImplementedError (clearly marked seam: swap in
  PIL/torchvision in a real deployment).
- `fake_decode_meta` is a deterministic stand-in (parses dimensions we
  pack into the payload header) so the plumbing is testable end-to-end.

At 100 TB: payloads stay in columnar files next to their metadata;
``spark.sql.files.maxPartitionBytes`` sizes batches, and feature
extraction is a map-only stage that scales linearly with executors.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("content_type", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("sha256", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """REAL-CODEC SEAM — intentionally unimplemented in this container.

    A deployment replaces this with e.g. ``PIL.Image.open(io.BytesIO(
    payload))``; everything around it (batching, schema, partitioning)
    is already production-shaped.
    """
    raise NotImplementedError(
        "image codec not available in this environment; "
        "swap in PIL/torchvision via this seam"
    )


def fake_encode(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake payload: 12-byte header (id, w, h) + body."""
    return struct.pack(">qii", media_id, width, height) + b"\x00" * 64


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for the codec: read (w, h) from the header
    `fake_encode` wrote."""
    _, w, h = struct.unpack(">qii", payload[:16])
    return w, h


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Derive a media table from `documents` (deterministic fake payloads)
    so the multimodal path has distributed test data at any SF."""
    d = documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        (F.col("n_chars") % 1024 + 16).cast("int").alias("w"),
        (F.col("doc_id") % 768 + 16).cast("int").alias("h"),
    )

    @F.pandas_udf(T.BinaryType())
    def make_payload(mid: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        return pd.Series(
            [fake_encode(int(m), int(a), int(b)) for m, a, b in zip(mid, w, h)]
        )

    with_payload = d.withColumn("payload", make_payload("media_id", "w", "h"))
    return with_payload.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            F.lit("image/fake").alias("content_type"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.sha2("payload", 256).alias("sha256"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each partition arrives as an iterator of pandas
    DataFrames (bounded memory for huge payload columns); per-item work
    is plain Python over bytes — the codec seam. Hashing recomputed
    Python-side deliberately: it exercises the real payload bytes
    crossing the Arrow boundary intact.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [fake_decode_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Cap each image's longest side at ``max_dim``, preserving aspect
    ratio — the standard pre-training normalization pass.

    Same contract as `extract_features`: a map-only ``mapInPandas``
    stage over the payload column (no shuffle, memory bounded by Arrow
    batch size), output schema identical to the input media table so
    resize composes anywhere in a media pipeline. The pixel transform
    itself is the codec seam — here the deterministic fake codec
    re-encodes the new header dims; a deployment swaps in
    ``PIL.Image.resize`` at the same two call sites. Images already
    within bounds pass through byte-identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h = fake_decode_meta(p)
                scale = max_dim / max(w, h)
                if scale >= 1.0:
                    out = bytes(p)
                else:
                    nw = max(1, round(w * scale))
                    nh = max(1, round(h * scale))
                    out = fake_encode(int(mid), nw, nh)
                payloads.append(out)
                metas.append(
                    {
                        "content_type": "image/fake",
                        "n_bytes": len(out),
                        "sha256": hashlib.sha256(out).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-index plan: (media_id, frame_idx) rows for the frames a
    decoder would extract — the cheap metadata-only projection used to
    size a sampling job before paying for payload decode
    (`sample_frames` below does the actual byte extraction)."""
    n_frames = (F.col("meta.n_bytes") / 16).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return media.select("media_id", F.explode(idx).alias("frame_idx"))


# --- video: container of fixed-size frame records -------------------------

VIDEO_HEADER = ">qi"  # media_id, n_frames
FRAME_SIZE = 32

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def fake_encode_video(media_id: int, n_frames: int) -> bytes:
    """Deterministic fake video container: 12-byte header + n_frames
    fixed-size records (each carries its own (media_id, idx) tag). A real
    deployment swaps this + `_decode_frame` for an actual demuxer via the
    same seam pattern as `decode_image`."""
    header = struct.pack(VIDEO_HEADER, media_id, n_frames)
    frames = b"".join(
        struct.pack(">qi", media_id, i).ljust(FRAME_SIZE, bytes([i % 251]))
        for i in range(n_frames)
    )
    return header + frames


def _decode_frame(payload: bytes, idx: int) -> bytes:
    start = struct.calcsize(VIDEO_HEADER) + idx * FRAME_SIZE
    return payload[start : start + FRAME_SIZE]


def synthesize_video(documents: DataFrame) -> DataFrame:
    """Derive a video table from `documents`: deterministic multi-frame
    payloads with frame counts varying per item."""
    d = documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        (F.col("n_chars") % 24 + 1).cast("int").alias("n_frames"),
    )

    @F.pandas_udf(T.BinaryType())
    def make_video(mid: pd.Series, nf: pd.Series) -> pd.Series:
        return pd.Series(
            [fake_encode_video(int(m), int(n)) for m, n in zip(mid, nf)]
        )

    with_payload = d.withColumn("payload", make_video("media_id", "n_frames"))
    return with_payload.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            F.lit("video/fake").alias("content_type"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.sha2("payload", 256).alias("sha256"),
        ).alias("meta"),
        "n_frames",
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: mapInPandas demuxes every_n-th frame out of
    each binary payload into its own row (media_id, frame_idx,
    frame_bytes, frame_sha256).

    Scale shape: map-only over payload partitions — no shuffle; output
    rows are frame-sized, so downstream per-frame feature extraction
    (`extract_features`-style) pipelines without ever materializing whole
    videos in one task. The demux itself is the deterministic fake
    container format above; a real codec drops in at `_decode_frame`.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "frame_bytes": [], "frame_sha256": []
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                _, n_frames = struct.unpack(VIDEO_HEADER, raw[: struct.calcsize(VIDEO_HEADER)])
                for i in range(0, n_frames, every_n):
                    fb = _decode_frame(raw, i)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(fb)
                    out["frame_sha256"].append(hashlib.sha256(fb).hexdigest())
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)
