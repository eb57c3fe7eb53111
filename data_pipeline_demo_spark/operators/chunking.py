"""Document chunking for training-data pipelines: split each document
into fixed-size, optionally-overlapping chunks (context-window packing
prep, retrieval indexing grain — north-star LLM-ops surface; the
reference has no analog, its grain is whole CSV rows,
`/root/reference/data_pipeline.py:352-459`).

Both modes are pure codegen — `sequence` + `explode` + `substr`/`slice`
— so chunking is a map-only stage: no shuffle, no UDF, fan-out bounded
by ``ceil(len/stride)``, and Catalyst pushes the projection to the scan.
At 100 TB this is the shape you want: chunk counts derive arithmetically
from lengths (no second pass), and the explode keeps each output row's
lineage inside its input row's partition.

Chunk-count formula (identical integer arithmetic in the DataFrame code
and the DuckDB oracle): ``n = max(1, (len - overlap + stride - 1) DIV
stride)`` with ``stride = size - overlap``; the final chunk is clamped
to the document end, and every document — even an empty one — yields at
least one chunk so no row silently disappears.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _n_chunks(length_expr: str, size: int, overlap: int) -> F.Column:
    stride = size - overlap
    if stride <= 0:
        raise ValueError(f"size must exceed overlap, got {size} <= {overlap}")
    return F.greatest(
        F.lit(1),
        F.expr(f"({length_expr} - {overlap} + {stride - 1}) div {stride}"),
    )


def chunk_by_chars(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Character-window chunks: (id, chunk_id, chunk_start, chunk_text),
    chunk_start 1-based, windows of ``size`` chars every ``size -
    overlap`` chars."""
    stride = size - overlap
    n = _n_chunks(f"char_length({text_col})", size, overlap)
    c = docs.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), (n - 1).cast("int")))
    )
    start = (F.col("chunk_id") * stride + 1).cast("long")
    return c.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.alias("chunk_start"),
        F.col(text_col).substr(start, F.lit(size).cast("long")).alias("chunk_text"),
    )


def chunk_by_tokens(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 128,
    overlap: int = 16,
    sep: str = " ",
) -> DataFrame:
    """Token-window chunks over a ``sep``-delimited tokenization:
    (id, chunk_id, chunk_start, chunk_text) with chunk_start the 1-based
    index of the chunk's first token and chunk_text the tokens rejoined
    with ``sep``. Deterministic single-delimiter split (the BPE-ish
    regex tokenizer lives in `operators.textstats`; this grain is for
    packing, where exact round-trip matters more than linguistics)."""
    stride = size - overlap
    toks = F.split(F.col(text_col), re.escape(sep), -1)
    c = docs.withColumn("__toks", toks).withColumn(
        "chunk_id",
        F.explode(
            F.sequence(
                F.lit(0), (_n_chunks("size(__toks)", size, overlap) - 1).cast("int")
            )
        ),
    )
    start = (F.col("chunk_id") * stride + 1).cast("int")
    return c.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("chunk_start"),
        F.array_join(F.slice("__toks", start, F.lit(size)), sep).alias("chunk_text"),
    )


def pack_token_stream(
    docs: DataFrame,
    budget: int = 256,
    groups: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-sequence packing, concat-and-split style: documents are
    concatenated (in deterministic id order within ``groups`` parallel
    streams) and the token stream is cut at exact ``budget`` boundaries
    — the standard LLM pre-training packing where a document may span
    two adjacent packs and every pack except a stream's last is
    EXACTLY full. Output is one row per (document × pack) segment:
    ``(grp, pack_id, doc_id, seg_start, seg_len)`` with ``seg_start``
    the 0-based token offset inside the document.

    Scale shape: a single global stream would serialize on one
    cumulative-sum partition, so the stream is sharded into ``groups``
    independent packing lanes (``doc_id % groups``) — the window
    cumulative sum partitions by lane (state per lane = one running
    count), the boundary arithmetic is map-side integer math, and the
    pack fan-out explode stays inside the row's partition. Lanes trade
    at most one underfull tail pack each for full parallelism; at
    cluster scale ``groups`` ≈ executor slots. Every output is integer,
    so the DuckDB oracle comparison is exact.
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy("grp")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lens = docs.select(
        F.col(id_col),
        (F.col(id_col) % groups).alias("grp"),
        F.size(F.split(F.col(text_col), " ", -1)).cast("bigint").alias("tok_len"),
    )
    cum = lens.withColumn(
        "cum_excl", F.coalesce(F.sum("tok_len").over(w), F.lit(0).cast("bigint"))
    )
    # true integer division (Spark `div` / DuckDB `//`): exact at any
    # int64 stream position, unlike FLOOR over a double quotient which
    # loses unit precision past 2^53 tokens per lane
    first_pack = F.expr(f"cum_excl div {budget}").cast("bigint")
    last_pack = F.expr(f"(cum_excl + tok_len - 1) div {budget}").cast("bigint")
    seg = cum.withColumn(
        "pack_id", F.explode(F.sequence(first_pack, last_pack))
    )
    seg_start = F.greatest(
        F.col("pack_id") * budget - F.col("cum_excl"), F.lit(0).cast("bigint")
    )
    seg_end = F.least(
        (F.col("pack_id") + 1) * budget - F.col("cum_excl"), F.col("tok_len")
    )
    return seg.select(
        "grp",
        F.col("pack_id").cast("bigint").alias("pack_id"),
        F.col(id_col),
        seg_start.alias("seg_start"),
        (seg_end - seg_start).alias("seg_len"),
    )


def content_defined_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    boundary_hex_lt: str = "08",
    sep: str = " ",
) -> DataFrame:
    """Content-defined chunking (the FastCDC/rsync idea at token
    grain): a token STARTS a new chunk when an engine-neutral hash of
    the token falls under a threshold — ``substr(md5(tok), 1, 2) <
    boundary_hex_lt`` (default 8/256 → ~32-token expected chunks).
    Because boundaries depend only on LOCAL content, an insertion near
    a document's head shifts every fixed-window chunk but leaves all
    content-defined chunks after the next boundary IDENTICAL — the
    property that makes chunk-grain dedup robust to edits, and the
    reason CDC beats `chunk_by_tokens` for near-dup corpora
    (tests assert the realignment).

    Output: ``(id, chunk_id, n_tokens, chunk_text)`` with chunk_id the
    running boundary count — consecutive in document order, starting
    at 0 or 1 depending on whether the document opens on a boundary.

    Scale shape: tokenize + flag is map-only (md5 is a builtin,
    codegen'd); the running boundary count is a window cumulative sum
    PARTITIONED BY DOCUMENT (state bounded by one doc's tokens, never
    a global stream — the q101 lane discipline); reassembly groups by
    (doc, chunk) with an array_sort over in-chunk positions, exact and
    shuffle-local since the explode stays in the row's partition.
    MD5-thresholding is engine-portable (identical hex in Spark and
    DuckDB), so the whole operator oracle-checks value-for-value."""
    from pyspark.sql import Window

    import re as _re

    toks = F.split(F.col(text_col), _re.escape(sep), -1)
    pos = docs.select(
        F.col(id_col),
        F.posexplode(toks).alias("pos", "tok"),
    )
    flag = F.when(
        F.substring(F.md5(F.col("tok")), 1, 2) < boundary_hex_lt, 1
    ).otherwise(0)
    w = Window.partitionBy(id_col).orderBy("pos")
    cid = pos.withColumn("cid", F.sum(flag).over(w))
    return (
        cid.groupBy(id_col, "cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                sep,
            ).alias("chunk_text"),
        )
        .select(
            F.col(id_col),
            F.col("cid").cast("bigint").alias("chunk_id"),
            "n_tokens",
            "chunk_text",
        )
    )
