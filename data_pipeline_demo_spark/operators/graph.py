"""Iterative graph algorithms as DataFrame loops.

The engine's connected-components loop lives in ``operators/dedup.py``
(near-dup clustering); this module adds PageRank — the canonical
"iterate until the fixpoint" workload a SQL surface cannot express
(Spark's recursive CTE is UNION-ALL-only and row-capped; see
``plans/relational.py:q97_recursive_chain``) — implemented the way
Pregel-on-DataFrames is done in public practice (GraphX/GraphFrames
semantics re-expressed with joins + aggregations).

Scale shape per iteration: ONE shuffle of per-edge contributions keyed
by dst plus one broadcast of two scalars (dangling mass, node count).
Edge and rank relations partition by node id; ranks are node-sized,
never edge-sized, between iterations. Lineage is cut with
``localCheckpoint`` every few iterations so 10+ rounds don't build an
unbounded plan tree — the standard iterative-DataFrame discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Returns ``(node, rank)`` for every node appearing as a source or a
    destination; ranks sum to 1 (dangling-node mass is redistributed
    uniformly each round, the standard correction — without it the
    total mass leaks through sinks and ranks no longer form a
    distribution). Deduplicates edges first so parallel edges don't
    double-count contributions.

    Float determinism: per-dst contribution sums are order-dependent in
    the last ulps (as in any distributed PageRank), so this operator is
    validated by numpy parity and invariant tests rather than a SQL
    oracle; callers needing stable output round the ranks.
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # edge list annotated once with out-degree; reused every iteration
    ed = e.join(deg, "src").persist()
    ed.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iters):
        contribs = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        # dangling mass (rank held by nodes with no out-edges) stays
        # in-plane as a broadcast 1-row aggregate — no driver action in
        # the iteration hot loop
        dangling = ranks.join(
            deg, ranks.node == deg.src, "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling"))
        new_ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("dangling") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        ranks = new_ranks
    out = ranks
    nodes.unpersist()
    ed.unpersist()
    return out
