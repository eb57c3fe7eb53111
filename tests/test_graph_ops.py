"""k-core decomposition (operators/graph.py:kcore): hand-graph truth,
sequential-peel parity on a random graph, degree invariant, and the
convergence/edge cases.  The q202 registration is rows-only (the
peeling fixpoint has no recursive-SQL twin), so these tests ARE the
correctness evidence."""

from __future__ import annotations

import random

import pytest

from data_pipeline_demo_spark.operators.graph import kcore


def _peel_python(edges, k):
    """Sequential reference peel: remove any one under-degree node at a
    time (order chosen adversarially by min id) — the k-core is unique,
    so any peel order must agree with the engine's synchronous rounds."""
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in sorted(adj):
            if len(adj[n]) < k:
                for p in adj.pop(n):
                    adj[p].discard(n)
                changed = True
                break
    return {n: len(ps) for n, ps in adj.items()}


def _run(spark, edges, k):
    df = spark.createDataFrame(edges, "u long, v long")
    return {
        r["node"]: r["core_degree"]
        for r in kcore(df, k=k, src="u", dst="v").collect()
    }


def test_kcore_hand_graph(spark):
    # K4 on {1,2,3,4} plus a tail 4-5-6 and an isolated edge 7-8.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(4, 5), (5, 6), (7, 8)]
    got = _run(spark, edges, 3)
    # Only the K4 survives peeling at k=3; every member keeps degree 3.
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=1 keeps everything (no isolated nodes in an edge list).
    got1 = _run(spark, edges, 1)
    assert set(got1) == set(range(1, 9))


def test_kcore_cascade_peel(spark):
    # A chain hung off a triangle: peeling must CASCADE (removing the
    # chain tip drops the next link below k, round after round).
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    got = _run(spark, edges, 2)
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_empty_core(spark):
    edges = [(1, 2), (2, 3), (3, 4)]  # path: max core is 1
    assert _run(spark, edges, 2) == {}


def test_kcore_matches_sequential_peel_random_graph(spark):
    rng = random.Random(42)
    edges = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(40), rng.randrange(40)) for _ in range(160)
            )
            if a != b
        }
    )
    for k in (2, 3, 4):
        assert _run(spark, edges, k) == _peel_python(edges, k)


def test_kcore_degree_invariant_and_selfloop_dup_tolerance(spark):
    # Duplicate and self-loop edges must not inflate degrees.
    edges = [(1, 2), (2, 1), (1, 1), (1, 2), (2, 3), (1, 3)]
    got = _run(spark, edges, 2)
    assert got == {1: 2, 2: 2, 3: 2}
    for deg in got.values():
        assert deg >= 2


def test_kcore_bad_k(spark):
    df = None
    with pytest.raises(ValueError):
        kcore(df, k=0)
