"""Rank fusion for hybrid retrieval: combine independently-produced
ranked lists (lexical BM25, vector kNN, …) into one ranking without
score calibration.

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR'09 — public
method): ``rrf(d) = Σ_lists 1/(c + rank_list(d))`` with the standard
``c = 60``. RRF only consumes ranks, so BM25's unbounded scores and
cosine's [-1, 1] need no normalization against each other — which is
exactly why it is the default fusion in hybrid search stacks.

Scale shape: each input list is already top-k-sized (the expensive
corpus work happened upstream in the retrievers); fusion is a k-row
full-outer join per extra list plus one arithmetic column — driver-
and shuffle-cost negligible at any corpus size. Every rank is an
integer and each reciprocal is a single IEEE division, so fused scores
are engine-exact up to addition order; with two lists the sum is one
commutative addition and therefore bit-stable, and callers round
before ranking anyway.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Fuse ranked lists — each ``(id_col, rank_col)`` with rank 1-based
    — into ``(id_col, rrf, rk)``: RRF score rounded to 6 decimals, then
    top-``k`` re-ranked (ties break on the id). A document absent from
    a list simply contributes nothing for that list (the standard RRF
    convention), which the outer join's null → 0 encodes."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    parts = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col))).alias(f"r{i}"),
        )
        for i, df in enumerate(ranked)
    ]
    joined = reduce(lambda a, b: a.join(b, id_col, "full_outer"), parts)
    score = reduce(
        lambda a, b: a + b,
        [F.coalesce(F.col(f"r{i}"), F.lit(0.0)) for i in range(len(parts))],
    )
    agg = joined.select(F.col(id_col), F.round(score, 6).alias("rrf"))
    topk = agg.orderBy(F.col("rrf").desc(), F.col(id_col).asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return topk.select(
        F.col(id_col),
        "rrf",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )
