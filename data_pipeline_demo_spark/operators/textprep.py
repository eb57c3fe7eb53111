"""Text preparation primitives shared by dedup / text-analysis operators.

All pure built-in column expressions (codegen'd, no Python in the hot
path): tokenization, k-shingling, token hashing. These run per-row with
no shuffle — at 100 TB they scan-stream.
"""

from __future__ import annotations

from pyspark.sql import Column
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


def hashed_shingles(text: Column | str, k: int = 3) -> Column:
    """Shingles → stable 64-bit hashes (xxhash64). MinHash operates on
    these, so signature computation never materializes long strings."""
    return F.transform(shingles(text, k), lambda s: F.xxhash64(s))
