"""WebDataset shard export + import — the training-data delivery format.

Large-scale training jobs consume corpora as sequential TAR shards
(the public WebDataset convention: members named ``<key>.<ext>``,
readers stream shards whole), not as parquet row groups. This
operator materializes a document corpus into size-bounded ``.tar``
shard blobs, distributed end to end:

1. shard assignment is the sequence-packing shape
   (``operators/chunking.pack_token_stream``): documents hash into N
   independent LANES, each lane runs a running byte cumsum (one
   window per lane, never a global sort) and cuts a new shard
   whenever the running size would exceed ``shard_max_bytes``;
2. each shard's members then assemble into one in-memory TAR via
   ``applyInPandas`` (stdlib ``tarfile`` — spec-valid, any WebDataset
   reader accepts it), members ordered by key for determinism.

Scale shape: the shuffle carries (lane, shard) keys; shard blobs are
bounded by ``shard_max_bytes`` so no task materializes more than one
shard; lanes parallelize assembly across executors. Oversized single
documents get a shard of their own (never split, never dropped).

Reference scope: the reference's only export is a whole-file CSV
(`/root/reference/data_pipeline.py:559-570`); this is that surface as
the corpus-delivery format training infrastructure actually reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def export_webdataset(
    docs: DataFrame,
    shard_max_bytes: int = 1 << 20,
    lanes: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
    ext: str = "txt",
) -> DataFrame:
    """Pack ``docs`` into TAR shard blobs: one row per shard
    ``(lane, shard_id, n_docs, n_bytes, tar)`` where ``tar`` is a
    spec-valid tar archive of ``<key>.<ext>`` members (UTF-8 text).
    Every document lands in exactly one shard. Cut rule: fixed byte
    boundaries on the lane's running payload sum — a document is
    assigned to the shard its LAST byte falls in, so a shard's payload
    is at most ``shard_max_bytes`` plus the one boundary-straddling
    member (minus 1 byte); tar framing (512 B header/member + padding)
    comes on top. The closed form needs no sequential scan, keeps
    whole documents intact, and isolates oversized documents
    automatically (their span covers whole blocks)."""
    if shard_max_bytes <= 0:
        raise ValueError(f"shard_max_bytes must be positive: {shard_max_bytes}")
    sized = docs.select(
        F.col(key_col).cast("string").alias("__key"),
        F.col(text_col).alias("__text"),
        F.octet_length(text_col).cast("long").alias("__bytes"),
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(int(lanes))).alias("__lane"),
    ).filter(F.col("__text").isNotNull())
    w = Window.partitionBy("__lane").orderBy("__key")
    cum = sized.withColumn(
        "__cum", F.sum("__bytes").over(w)
    )
    # fixed-boundary cut (the pack_token_stream identity): the doc
    # whose last byte lands in block s belongs to shard s — one
    # closed-form expression over the running sum, no sequential scan
    B = int(shard_max_bytes)
    flagged = cum.withColumn(
        "__shard", F.floor((F.col("__cum") - 1) / F.lit(B)).cast("long")
    )

    import io
    import tarfile

    import pandas as pd

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__key", kind="mergesort")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for k, text in zip(pdf["__key"], pdf["__text"]):
                data = text.encode("utf-8")
                info = tarfile.TarInfo(name=f"{k}.{ext}")
                info.size = len(data)
                info.mtime = 0  # deterministic bytes
                tar.addfile(info, io.BytesIO(data))
        blob = buf.getvalue()
        return pd.DataFrame(
            {
                "lane": [int(key[0])],
                "shard_id": [int(key[1])],
                "n_docs": [len(pdf)],
                "n_bytes": [len(blob)],
                "tar": [blob],
            }
        )

    return flagged.groupBy("__lane", "__shard").applyInPandas(
        build,
        "lane long, shard_id long, n_docs long, n_bytes long, tar binary",
    )


_MEMBER_SCHEMA = "key string, ext string, data binary, n_bytes long"


def read_webdataset(shards: DataFrame, tar_col: str = "tar") -> DataFrame:
    """Inverse of :func:`export_webdataset`: parse TAR shard blobs into
    one row per member ``(key, ext, data, n_bytes)``. ``key``/``ext``
    follow the WebDataset convention — the basename splits at its FIRST
    dot, so ``0017.seq.txt`` → key ``0017``, ext ``seq.txt`` and all
    members of one training sample share a key. ``data`` stays
    ``binary``; decode per-extension at the call site
    (``F.decode(data, 'UTF-8')`` for text members).

    Scale shape: map-only ``mapInPandas`` over shard rows — each task
    parses whole bounded blobs (the export bounds them by
    ``shard_max_bytes``), no shuffle, no driver materialization. This
    is the read half of the corpus-delivery loop: training
    infrastructure streams shards sequentially; the engine re-ingests
    them the same way."""
    import io
    import os as _os
    import tarfile
    from collections.abc import Iterator

    import pandas as pd

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys: list[str] = []
            exts: list[str] = []
            blobs: list[bytes] = []
            sizes: list[int] = []
            for blob in pdf[tar_col]:
                if blob is None:
                    continue
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for info in tar:
                        if not info.isfile():
                            continue
                        base = _os.path.basename(info.name)
                        key, _, ext = base.partition(".")
                        fh = tar.extractfile(info)
                        data = fh.read() if fh is not None else b""
                        keys.append(key)
                        exts.append(ext)
                        blobs.append(data)
                        sizes.append(len(data))
            yield pd.DataFrame(
                {"key": keys, "ext": exts, "data": blobs, "n_bytes": sizes}
            )

    return shards.select(tar_col).mapInPandas(parse, _MEMBER_SCHEMA)


def members_to_samples(
    members: DataFrame, exts: tuple[str, ...] = ("txt",)
) -> DataFrame:
    """WebDataset SAMPLE grain: pivot the member rows of
    :func:`read_webdataset` into one row per key with one binary
    column per extension in ``exts`` (absent members are NULL). The
    pivot value list is explicit, so there is no discovery scan — one
    shuffle on ``key``."""
    if not exts:
        raise ValueError("exts must name at least one member extension")
    return (
        members.filter(F.col("ext").isin(list(exts)))
        .groupBy("key")
        .pivot("ext", list(exts))
        .agg(F.first("data"))
    )


def load_webdataset(
    spark, path: str, pattern: str = "*.tar"
) -> DataFrame:
    """Ingest WebDataset shard FILES from a directory (or glob) via
    Spark's built-in ``binaryFile`` source, then parse members with
    :func:`read_webdataset`. Each shard file becomes one binary row —
    shards are bounded by construction, so rows fit executor memory —
    and parsing is map-only. The ``binaryFile`` source distributes the
    file listing and reads across executors, the same ingest shape the
    multimodal operators use for opaque media blobs."""
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select(F.col("content").alias("tar"))
    )
    return read_webdataset(blobs)
