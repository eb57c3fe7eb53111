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
