"""Raw-text corpus ingest — the landing shape LLM pipelines receive.

Web-scale text corpora arrive as directories of plain ``.txt`` files in
two grains: one DOCUMENT per file (Project Gutenberg / crawl-dump
style) or one document per LINE (the pre-JSONL convention; JSONL itself
goes through ``sources/csv_ingest.read_json_with_quarantine``). Both
map onto Spark's built-in distributed ``text`` source — file listing,
splitting, and decoding all happen on executors; nothing here touches
the driver.

Reference scope: the reference ingests only CSV attachments
(`/root/reference/data_pipeline.py:163-180`); this is the same
landing-directory role for the raw-text corpora the LLM-ops side of
the engine curates.

Scale shape:

- ``grain="file"`` uses ``wholetext`` — one row per file, so files
  must individually fit in executor memory (the same contract as the
  multimodal ``binaryFile`` blobs); listing parallelizes, and at 100 TB
  the source shards by files-per-task via
  ``spark.sql.files.maxPartitionBytes``.
- ``grain="line"`` is fully splittable: large files split at line
  boundaries across tasks, the classic scan shape.
- ``to_documents`` adds the engine's document columns (stable
  content-addressed ``doc_id``, ``n_chars``) as pure codegen
  expressions — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(
    spark: SparkSession,
    path: str,
    grain: str = "file",
    glob: str = "*.txt",
    recursive: bool = False,
) -> DataFrame:
    """Read a landing directory of plain-text files.

    Returns ``(source_file, text)``: with ``grain="file"`` one row per
    file (``text`` is the whole decoded file), with ``grain="line"``
    one row per line (newlines stripped by the source, the standard
    line-record contract). ``glob`` filters file names;
    ``recursive=True`` descends subdirectories.
    """
    if grain not in ("file", "line"):
        raise ValueError(f"grain must be 'file' or 'line', got {grain!r}")
    reader = (
        spark.read.format("text")
        .option("wholetext", "true" if grain == "file" else "false")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    return reader.load(path).select(
        F.input_file_name().alias("source_file"),
        F.col("value").alias("text"),
    )


def to_documents(corpus: DataFrame, drop_empty: bool = True) -> DataFrame:
    """Annotate a ``(source_file, text)`` relation into the engine's
    document grain: ``(doc_id, source_file, text, n_chars)`` with a
    content-addressed 64-bit ``doc_id`` (xxhash64 of the text — stable
    across re-ingests and file moves, and exact-dedup-ready: identical
    payloads collide by construction, which
    ``operators/dedup.exact_dedup_docs`` then collapses). Pure codegen
    projection — no shuffle."""
    out = corpus.select(
        F.xxhash64(F.col("text")).alias("doc_id"),
        "source_file",
        "text",
        F.length("text").alias("n_chars"),
    )
    if drop_empty:
        out = out.filter(F.length(F.trim(F.col("text"))) > 0)
    return out
