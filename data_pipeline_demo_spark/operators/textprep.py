"""Text preparation primitives shared by dedup / text-analysis operators.

All pure built-in column expressions (codegen'd, no Python in the hot
path): tokenization, k-shingling, token hashing. These run per-row with
no shuffle — at 100 TB they scan-stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string> (documents.text is
    space-separated; extend with regexp_split for real corpora)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, r"\s+")


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles as array<string>.

    `transform(sequence(...))` keeps the whole computation in one
    codegen'd expression — no explode, no UDF. Documents shorter than k
    words yield a single shingle of the full text.
    """
    w = tokens(text)
    n = F.size(w)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(k)]
            ),
        )
    )


def shingle_hash_sets(
    df: "DataFrame", text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> "DataFrame":
    """Per-doc distinct 64-bit shingle hashes: (id, sh: array<long>).

    Never materializes shingle strings: tokens are xxhash64'd once per
    row, and each shingle hash mixes its k token hashes with one more
    xxhash64 — so a shingle costs 1 long-mix, not a string build.

    The *staged projections* are load-bearing: Spark evaluates a
    higher-order-function lambda's captured subtree once PER ELEMENT, so
    inlining split/transform into the element lambda is O(len²) per row
    (measured 13× slower at sf0.1). Keeping `__w`/`__hw` as real columns
    across select boundaries keeps it linear; Catalyst's CollapseProject
    leaves multiply-referenced non-trivial aliases alone.
    """
    w = df.select(
        F.col(id_col), F.split(F.col(text_col), r"\s+").alias("__w")
    )
    hw = w.select(
        F.col(id_col), F.transform("__w", lambda t: F.xxhash64(t)).alias("__hw")
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size("__hw") - k, F.lit(0)))
    # try_element_at, not element_at: ANSI mode (Spark 4 default) throws
    # INVALID_ARRAY_INDEX_IN_ELEMENT_AT for docs shorter than k tokens;
    # the try_ variant yields null, which xxhash64 skips — a short doc
    # hashes its available tokens (one whole-text shingle), matching the
    # string-shingle semantics for under-length docs.
    sh = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.xxhash64(
                *[F.try_element_at("__hw", (i + j + 1).cast("int")) for j in range(k)]
            ),
        )
    )
    return hw.select(F.col(id_col), sh.alias("sh"))
