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


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    group_col: str = "query_id",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    rel_col: str = "rel",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98 — public method): greedily pick, ``k`` times, the
    candidate maximizing ``lam * rel(d) - (1 - lam) * max_{s in S}
    cos(d, s)`` over the already-selected set ``S`` — the standard
    diversification pass over a retriever's top pool, trading
    relevance against redundancy (``lam = 1`` reduces to relevance
    order; ``lam = 0`` to pure diversity).

    Input is one pool per ``group_col`` value: ``(group_col, id_col,
    vec_col, rel_col)`` — the POOL-sized output of an upstream
    retriever (BM25 / kNN / ANN / RRF), not a corpus. Returns
    ``(group_col, id_col, mmr, rk)`` with ``rk`` the 1-based selection
    order and ``mmr`` the score at selection time, rounded to 6
    decimals. Ties break on the id, so the ranking is deterministic.

    Scale shape: MMR is inherently sequential IN ``k`` but independent
    ACROSS queries — the Holt/CUSUM pattern: one ``applyInPandas``
    group per query over its pool-sized candidate set (k * pool cosine
    updates as numpy matmuls), parallel across queries, nothing ever
    all-pairs against the corpus. The expensive corpus work stays in
    the upstream retriever; this pass touches pool rows only.
    """
    import numpy as np
    import pandas as pd

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    out_schema = (
        f"{group_col} string, {id_col} string, mmr double, rk bigint"
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        V = np.asarray(pdf[vec_col].to_list(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: cos treated as 0
        U = V / norms[:, None]
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        chosen: list[int] = []
        scores: list[float] = []
        max_sim = np.zeros(n, dtype=np.float64)
        avail = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            mmr = lam * rel - (1.0 - lam) * max_sim
            mmr_masked = np.where(avail, mmr, -np.inf)
            best = int(np.argmax(mmr_masked))  # argmax -> lowest index
            chosen.append(best)                # on ties = smallest id
            scores.append(float(mmr_masked[best]))
            avail[best] = False
            max_sim = np.maximum(max_sim, U @ U[best])
        return pd.DataFrame(
            {
                group_col: pdf[group_col].iloc[0],
                id_col: pdf[id_col].iloc[chosen].astype(str).to_numpy(),
                "mmr": np.round(np.asarray(scores), 6),
                "rk": np.arange(1, len(chosen) + 1, dtype=np.int64),
            }
        )

    cast = candidates.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(id_col).cast("string").alias(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
        F.col(rel_col).cast("double").alias(rel_col),
    )
    return cast.groupBy(group_col).applyInPandas(pick, schema=out_schema)
