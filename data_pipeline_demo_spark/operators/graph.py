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


def label_propagation(
    edges: DataFrame,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007, the standard near-linear community algorithm; the
    GraphFrames ``labelPropagation`` surface): every node starts as its
    own label; each round it adopts the MOST FREQUENT label among its
    neighbors PLUS its own current label (the inclusive/self-vote
    variant — without it, synchronous updates oscillate on bipartite
    structures as small as one edge), ties breaking on the smallest
    label, so the result is a deterministic function of the graph —
    no RNG. Undirected: each input edge counts in both directions.
    Returns ``(node, label)`` after ``iters`` rounds.

    Scale shape (the PageRank loop's discipline): one round = one
    edge-keyed join against node-sized labels + one (node, label)
    count + one per-node arg-max window — every shuffle carries edges
    or node-label pairs, never anything quadratic; lineage is cut by
    ``localCheckpoint`` every 3 rounds. Synchronous updates oscillate
    on bipartite structures at large ``iters`` — the standard caveat;
    fixed small ``iters`` (the default) is the documented operating
    point, matching the public implementations."""
    from pyspark.sql.window import Window

    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    nodes = und.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label")).persist()
    labels.count()
    for i in range(int(iters)):
        nbr = und.join(
            labels.select(F.col("node").alias("b"), "label"), "b"
        ).select(F.col("a").alias("node"), "label")
        votes = nbr.unionByName(labels)  # self-vote stabilizes ties
        counted = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("n")
        )
        w = Window.partitionBy("node").orderBy(
            F.col("n").desc(), F.col("label").asc()
        )
        new_labels = (
            counted.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select("node", "label")
        )
        if (i + 1) % 3 == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels
    out = labels
    und.unpersist()
    return out


def bfs_distances(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 10,
    directed: bool = False,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Single-source BFS shortest-path distances (unweighted) — the
    hop-count primitive completing the graph family (CC, PageRank,
    triangles, LPA): ``(node, dist)`` for every node reachable from
    ``source`` within ``max_depth`` hops, distances exact integers.

    Frontier-based level-synchronous BFS, the standard Pregel shape as
    DataFrame ops: each round expands ONLY the newest frontier through
    the edge list (frontier × edges join), anti-joins nodes already
    settled (a node's first discovery IS its shortest distance — the
    BFS invariant), and stops early the round the frontier drains (a
    metadata-sized count on the frontier, bounded by new nodes, not
    the graph). Work per round is O(edges out of the frontier); total
    O(E + V) over the run — never re-expands settled nodes, unlike the
    naive transitive-closure join that re-derives every path each
    round. Lineage is cut every ``checkpoint_every`` rounds
    (localCheckpoint) exactly like :func:`pagerank`, or the plan tree
    doubles per iteration.

    Undirected by default (each edge traversable both ways); exact
    integer arithmetic end-to-end, so the result is oracle-checkable
    against a depth-bounded recursive CTE (q161).
    """
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    if not directed:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        e = e.distinct()
    e = e.persist()
    e.count()
    spark = edges.sparkSession
    settled = spark.createDataFrame(
        [(source, 0)], schema=e.select("u").withColumn("d", F.lit(0)).schema
    ).toDF("node", "dist")
    frontier = settled
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier.node == e.u)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(settled, "node", "left_anti")
            .withColumn("dist", F.lit(depth))
        )
        if (depth % checkpoint_every) == 0:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
        if nxt.isEmpty():  # frontier drained: every node settled
            break
        settled = settled.unionByName(nxt)
        frontier = nxt
    e.unpersist()
    return settled


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
    checkpoint_every: int = 3,
) -> DataFrame:
    """k-core decomposition membership (Seidman 1983): the maximal
    induced subgraph in which every node has degree >= ``k``, found by
    the standard peeling fixpoint — repeatedly delete nodes whose
    CURRENT degree is below ``k`` until none remain. Peeling order
    never changes the result (the k-core is unique), so the
    synchronous delete-all-underdegree-nodes round used here converges
    to the same subgraph as any sequential peel.

    Returns ``(node, core_degree)`` for every member, where
    ``core_degree`` is the node's degree WITHIN the k-core (>= k by
    construction). Undirected: edges are symmetrized and deduplicated
    first; self-loops are dropped (a self-loop inflates a node's
    degree without contributing a neighbor).

    Scale shape per round: one combinable degree count to node grain
    + one node-sized semi join filtering the adjacency — the victim
    set shrinks monotonically and is usually broadcast-sized after the
    first round (AQE decides). The adjacency relation partitions by
    node id throughout; lineage is cut every ``checkpoint_every``
    rounds (localCheckpoint), the same iterative-DataFrame discipline
    as :func:`pagerank` / :func:`bfs_distances`. Rounds are bounded by
    the graph's degeneracy ordering depth — tiny in practice (social
    graphs: tens) — with ``max_rounds`` as the loud backstop.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = adj.union(adj.select(F.col("v").alias("u"), F.col("u").alias("v")))
    adj = adj.distinct().persist()
    adj.count()
    for round_no in range(1, max_rounds + 1):
        deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("u").persist()
        pruned = (
            adj.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
        )
        if (round_no % checkpoint_every) == 0:
            pruned = pruned.localCheckpoint(eager=True)
        else:
            pruned = pruned.persist()
        # Fixpoint: no edge died this round <=> no node was under-degree.
        stable = pruned.count() == adj.count()
        adj.unpersist()
        keep.unpersist()
        adj = pruned
        if stable:
            break
    else:
        raise RuntimeError(
            f"kcore did not converge within {max_rounds} rounds"
        )
    out = adj.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )
    out = out.localCheckpoint(eager=True)
    adj.unpersist()
    return out
