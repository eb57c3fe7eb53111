"""Targeted tests for the round-6 SQL-surface queries: LATERAL + LIMIT
(q96), WITH RECURSIVE (q97), SCD2 interval build (q98), BM25 retrieval
(q99), Python UDTF (q100), sequence packing (q101), RRF hybrid fusion
(q102). Value-level parity with DuckDB lives in the oracle gate; these
pin the operator semantics on literal frames where the expected output
is hand-checkable."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators.textstats import bm25_topk


def test_lateral_topn_per_group_bound_and_order(spark):
    spark.createDataFrame(
        [(1, "BUILDING"), (2, "BUILDING"), (3, "AUTOMOBILE")],
        "c_custkey long, c_mktsegment string",
    ).createOrReplaceTempView("customer")
    spark.createDataFrame(
        [
            (10, 1, 100.0),
            (11, 1, 300.0),
            (12, 1, 200.0),
            (13, 1, 50.0),
            (20, 2, 5.0),
        ],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).createOrReplaceTempView("orders")
    from data_pipeline_demo_spark.plans.relational import _LATERAL_TOPN_SQL

    rows = {
        (r.c_custkey, r.rk): (r.o_orderkey, r.o_totalprice)
        for r in spark.sql(_LATERAL_TOPN_SQL).collect()
    }
    # customer 1: top-3 of 4 orders by price desc; customer 2: its single
    # order; customer 3: filtered out by segment
    assert rows == {
        (1, 1): (11, 300.0),
        (1, 2): (12, 200.0),
        (1, 3): (10, 100.0),
        (2, 1): (20, 5.0),
    }


def test_recursive_chain_depth_and_root(spark):
    spark.createDataFrame(
        [(5,), (42,), (317,), (1234,)], "c_custkey long"
    ).createOrReplaceTempView("customer")
    from data_pipeline_demo_spark.plans.relational import _RECURSIVE_CHAIN_SQL

    rows = {
        r.c_custkey: (r.chain_len, r.root)
        for r in spark.sql(_RECURSIVE_CHAIN_SQL).collect()
    }
    # 5 is its own root (single digit, excluded); 42 -> 4; 317 -> 31 -> 3;
    # 1234 -> 123 -> 12 -> 1
    assert rows == {42: (1, 4), 317: (2, 3), 1234: (3, 1)}


def test_scd2_collapses_runs_and_stamps_intervals(spark, monkeypatch):
    t = [dt.datetime(2024, 1, 1, h) for h in range(5)]
    ev = spark.createDataFrame(
        [
            (1, t[0], 7, "A", 0.0, "{}"),
            (2, t[1], 7, "A", 0.0, "{}"),  # same state: collapsed
            (3, t[2], 7, "B", 0.0, "{}"),
            (4, t[3], 7, "A", 0.0, "{}"),  # A again: NEW version, not merged
            (5, t[0], 8, "X", 0.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import data_pipeline_demo_spark.plans.timeseries as ts_mod

    monkeypatch.setattr(ts_mod, "table", lambda s, d, n: ev)
    out = ts_mod.q98_scd2_intervals(spark, "ignored")
    rows = {
        (r.user_id, r.version): (
            r.event_type,
            r.valid_from,
            r.valid_to,
            r.is_current,
        )
        for r in out.collect()
    }
    assert rows == {
        (7, 1): ("A", t[0], t[2], False),
        (7, 2): ("B", t[2], t[3], False),
        (7, 3): ("A", t[3], None, True),
        (8, 1): ("X", t[0], None, True),
    }


def test_bm25_ranks_higher_tf_and_respects_k(spark):
    docs = spark.createDataFrame(
        [
            (1, "x x x y"),       # tf(x)=3
            (2, "x y z w"),       # tf(x)=1, same length
            (3, "y z w v"),       # no query term: never scored
            (4, "x x y y"),       # tf(x)=2
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["x"], k=2).collect()
    assert [r.doc_id for r in out] == [1, 4]
    assert [r.rk for r in out] == [1, 2]
    assert out[0].bm25 > out[1].bm25 > 0
    # equal doc lengths: score is monotone in tf, and k bounds the output
    assert len(out) == 2


def test_bm25_length_normalization(spark):
    # same tf, longer doc scores lower (b > 0 length penalty)
    docs = spark.createDataFrame(
        [(1, "x a"), (2, "x a a a a a a a")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.bm25 for r in bm25_topk(docs, ["x"], k=10).collect()}
    assert out[1] > out[2]


def test_udtf_tokenize_positions(spark, sf_dir):
    from data_pipeline_demo_spark.plans.udfs import q100_udtf_tokenize

    out = q100_udtf_tokenize(spark, sf_dir)
    first = (
        out.filter(F.col("pos") == 0)
        .select("doc_id")
        .distinct()
        .count()
    )
    docs = out.select("doc_id").distinct().count()
    assert docs > 0 and first == docs  # every doc emits a pos-0 token
    # positions are dense 0..n-1 per doc: max(pos)+1 == row count per doc
    bad = (
        out.groupBy("doc_id")
        .agg(F.max("pos").alias("mx"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("mx") + 1 != F.col("n"))
        .count()
    )
    assert bad == 0


def test_pack_token_stream_invariants(spark):
    from data_pipeline_demo_spark.operators.chunking import pack_token_stream

    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * n)) for i, n in enumerate([5, 9, 3, 12, 7, 2])],
        "doc_id long, text string",
    )
    out = pack_token_stream(docs, budget=8, groups=2).collect()
    # segments of one doc partition the doc exactly
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    lens = {0: 5, 1: 9, 2: 3, 3: 12, 4: 7, 5: 2}
    for d, segs in by_doc.items():
        segs.sort(key=lambda r: r.seg_start)
        assert segs[0].seg_start == 0
        assert sum(s.seg_len for s in segs) == lens[d]
        cur = 0
        for s in segs:
            assert s.seg_start == cur and s.seg_len > 0
            cur += s.seg_len
    # every pack except each lane's last is exactly full
    packs = {}
    for r in out:
        key = (r.grp, r.pack_id)
        packs[key] = packs.get(key, 0) + r.seg_len
    for grp in {g for g, _ in packs}:
        lane = sorted(p for g, p in packs if g == grp)
        for p in lane[:-1]:
            assert packs[(grp, p)] == 8, (grp, p, packs[(grp, p)])
        assert packs[(grp, lane[-1])] <= 8


def test_rrf_fuse_combines_and_handles_absentees(spark):
    from data_pipeline_demo_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(3, 1), (4, 2)], "doc_id long, rank long"
    )
    out = {r.doc_id: (r.rrf, r.rk) for r in rrf_fuse([a, b], k=10).collect()}
    # doc 3 appears in both lists -> highest fused score
    assert out[3][1] == 1
    assert set(out) == {1, 2, 3, 4}
    assert round(out[3][0], 6) == round(1 / 63 + 1 / 61, 6)
    assert round(out[4][0], 6) == round(1 / 62, 6)  # single-list absentee


def test_pack_token_stream_property(spark):
    """Property check across randomized doc-length profiles: segments
    always partition every doc, non-tail packs are always exactly full,
    and output is independent of input partitioning."""
    import random

    from data_pipeline_demo_spark.operators.chunking import pack_token_stream

    rng = random.Random(1234)
    for trial in range(3):
        lens = [rng.randint(1, 40) for _ in range(rng.randint(5, 30))]
        budget = rng.choice([7, 16, 64])
        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
            "doc_id long, text string",
        )
        out = pack_token_stream(docs, budget=budget, groups=3).collect()
        per_doc = {}
        packs = {}
        for r in out:
            per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.seg_len
            packs[(r.grp, r.pack_id)] = (
                packs.get((r.grp, r.pack_id), 0) + r.seg_len
            )
        assert per_doc == {i: n for i, n in enumerate(lens)}, (trial, budget)
        for grp in {g for g, _ in packs}:
            lane = sorted(p for g, p in packs if g == grp)
            assert all(packs[(grp, p)] == budget for p in lane[:-1])
            assert packs[(grp, lane[-1])] <= budget
        # repartitioned input yields the identical multiset of rows
        out2 = pack_token_stream(
            docs.repartition(7), budget=budget, groups=3
        ).collect()
        key = lambda r: (r.grp, r.pack_id, r.doc_id, r.seg_start, r.seg_len)
        assert sorted(map(key, out)) == sorted(map(key, out2))


def test_time_range_window_vs_bruteforce(spark):
    import datetime as dtm

    import data_pipeline_demo_spark.plans.windows_sort as ws

    rows = [
        (1, 10, dtm.datetime(2024, 1, 1), 100.0),
        (2, 10, dtm.datetime(2024, 1, 20), 50.0),
        (3, 10, dtm.datetime(2024, 2, 25), 25.0),   # >30d after both
        (4, 11, dtm.datetime(2024, 1, 15), 10.0),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_totalprice double",
    )
    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    mp.setattr(ws, "table", lambda s, d, n: df)
    try:
        got = {
            r.o_orderkey: (r.spend_30d, r.n_30d)
            for r in ws.q103_time_range_window(spark, "x").collect()
        }
    finally:
        mp.undo()
    assert got == {
        1: (100.0, 1),
        2: (150.0, 2),   # 19 days after order 1: included
        3: (25.0, 1),    # both priors outside 30 days
        4: (10.0, 1),
    }


def test_cohort_retention_counts(spark, monkeypatch):
    import datetime as dtm

    import data_pipeline_demo_spark.plans.timeseries as ts_mod

    mon1, mon2 = dtm.datetime(2024, 1, 1, 9), dtm.datetime(2024, 1, 8, 9)
    ev = spark.createDataFrame(
        [
            (1, mon1, 1, "a", 0.0, "{}"),
            (2, mon1, 2, "a", 0.0, "{}"),
            (3, mon2, 1, "a", 0.0, "{}"),   # user 1 retained week 1
            (4, mon2, 3, "a", 0.0, "{}"),   # user 3 new cohort week 2
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(ts_mod, "table", lambda s, d, n: ev)
    got = {
        (r.cohort_week.date().isoformat(), r.weeks_since): r.active_users
        for r in ts_mod.q105_cohort_retention(spark, "x").collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from data_pipeline_demo_spark.operators.graph import pagerank

    # small directed graph with a dangling node (3 has no out-edges)
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=15).collect()}

    n, d = 4, 0.85
    out = {0: [1, 2], 1: [2, 3], 2: [0], 3: []}
    r = np.full(n, 1.0 / n)
    for _ in range(15):
        nxt = np.full(n, (1 - d) / n)
        dangling = sum(r[u] for u in range(n) if not out[u])
        nxt += d * dangling / n
        for u, vs in out.items():
            for v in vs:
                nxt[v] += d * r[u] / len(vs)
        r = nxt
    for node in range(n):
        assert abs(got[node] - r[node]) < 1e-9, (node, got[node], r[node])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_partition_invariant(spark):
    from data_pipeline_demo_spark.operators.graph import pagerank

    edges = [(i, (i * 7 + 3) % 20) for i in range(20)] + [
        (i, (i + 1) % 20) for i in range(20)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r.node: round(r.rank, 9) for r in pagerank(df, iters=8).collect()}
    b = {
        r.node: round(r.rank, 9)
        for r in pagerank(df.repartition(13), iters=8).collect()
    }
    assert a == b


def test_variant_ops_matches_from_json(spark, sf_dir):
    from data_pipeline_demo_spark.plans.scalars import q106_variant_ops

    out = {r.event_type: (r.k_sum, r.n, r.n_bad) for r in
           q106_variant_ops(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ref = {
        r.event_type: (r.k_sum, r.n)
        for r in ev.select(
            "event_type",
            F.from_json("props", "k INT").getField("k").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("k_sum"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(out) == set(ref)
    for et, (k_sum, cnt) in ref.items():
        assert out[et][0] == k_sum and out[et][1] == cnt
        assert out[et][2] == cnt  # every corrupted (leading-brace) row is null


def test_psi_zero_for_identical_and_large_for_shifted(spark):
    from data_pipeline_demo_spark.operators.drift import psi

    same = spark.createDataFrame(
        [("g", float(v % 100)) for v in range(500)], "grp string, v double"
    )
    out = psi(same, same, "grp", "v", lo=0.0, hi=100.0, bins=10).collect()
    assert len(out) == 1 and out[0].psi == 0.0  # identical dists: PSI exactly 0
    shifted = spark.createDataFrame(
        [("g", float(v % 100) / 10 + 90) for v in range(500)],
        "grp string, v double",
    )
    out2 = psi(same, shifted, "grp", "v", lo=0.0, hi=100.0, bins=10).collect()
    assert out2[0].psi > 0.25  # mass moved to the top bin: action-level drift
    assert out2[0].n_ref == 500 and out2[0].n_cur == 500


def test_psi_clamps_out_of_range_rows(spark):
    from data_pipeline_demo_spark.operators.drift import psi

    ref = spark.createDataFrame(
        [("g", -5.0), ("g", 1000.0), ("g", 50.0)], "grp string, v double"
    )
    out = psi(ref, ref, "grp", "v", lo=0.0, hi=100.0, bins=10).collect()
    # nothing dropped: totals count every row including clamped ones
    assert out[0].n_ref == 3 and out[0].psi == 0.0


def test_kmv_exact_below_capacity_and_estimates_above(spark):
    from data_pipeline_demo_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    small = spark.createDataFrame(
        [("a", i % 40) for i in range(400)], "g string, item long"
    )
    sk = kmv_sketch(small, ["g"], "item", k=64)
    est = sk.select(kmv_estimate().alias("e")).first().e
    assert est == 40.0  # below capacity: exact
    big = spark.createDataFrame(
        [("a", i) for i in range(5000)], "g string, item long"
    )
    est2 = (
        kmv_sketch(big, ["g"], "item", k=256)
        .select(kmv_estimate().alias("e"))
        .first()
        .e
    )
    assert abs(est2 - 5000) / 5000 < 0.25  # KMV rse ~ 1/sqrt(k) ≈ 6%


def test_kmv_overlap_estimates(spark):
    from data_pipeline_demo_spark.operators.sketches import (
        kmv_overlap_estimates,
        kmv_sketch,
    )
    from pyspark.sql import functions as FF

    # A = 0..2999, B = 2000..4999 -> |A∪B|=5000, |A∩B|=1000, J=0.2
    rows = [("a", i) for i in range(3000)] + [
        ("b", i) for i in range(2000, 5000)
    ]
    df = spark.createDataFrame(rows, "g string, item long")
    sk = kmv_sketch(df, ["g"], "item", k=256)
    a = sk.filter(FF.col("g") == "a").select(
        FF.col("kmv").alias("kmv_a"), FF.col("n_kept").alias("n_a"), "k"
    )
    b = sk.filter(FF.col("g") == "b").select(
        FF.col("kmv").alias("kmv_b"), FF.col("n_kept").alias("n_b")
    )
    est = kmv_overlap_estimates(a.crossJoin(b)).first()
    assert abs(est.est_union - 5000) / 5000 < 0.25
    assert abs(est.jaccard_est - 0.2) < 0.1
    assert abs(est.est_intersection - 1000) / 1000 < 0.5
    # union of two below-capacity sketches is exact
    small = spark.createDataFrame(
        [("a", i) for i in range(30)] + [("b", i) for i in range(20, 50)],
        "g string, item long",
    )
    sk2 = kmv_sketch(small, ["g"], "item", k=256)
    a2 = sk2.filter(FF.col("g") == "a").select(
        FF.col("kmv").alias("kmv_a"), FF.col("n_kept").alias("n_a"), "k"
    )
    b2 = sk2.filter(FF.col("g") == "b").select(
        FF.col("kmv").alias("kmv_b"), FF.col("n_kept").alias("n_b")
    )
    e2 = kmv_overlap_estimates(a2.crossJoin(b2)).first()
    assert e2.est_union == 50.0 and abs(e2.est_intersection - 10) < 1e-9


def test_pit_join_attributes_state_at_time(spark, monkeypatch):
    import datetime as dtm

    import data_pipeline_demo_spark.plans.timeseries as ts_mod

    t = [dtm.datetime(2024, 3, 1, h) for h in range(6)]
    ev = spark.createDataFrame(
        [
            (1, t[0], 9, "view", 0.0, "{}"),
            (2, t[1], 9, "purchase", 0.0, "{}"),   # during 'view'
            (3, t[2], 9, "click", 0.0, "{}"),
            (4, t[3], 9, "purchase", 0.0, "{}"),   # during 'click'
            (5, t[4], 9, "purchase", 0.0, "{}"),   # still 'click' (current)
            (6, t[0], 10, "purchase", 0.0, "{}"),  # user with no context: null
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(ts_mod, "table", lambda s, d, n: ev)
    got = {
        r.event_id: r.context_state
        for r in ts_mod.q111_pit_join(spark, "x").collect()
    }
    assert got == {2: "view", 4: "click", 5: "click", 6: None}


def test_fuzzy_name_pairs_exact_neighborhood(spark):
    from data_pipeline_demo_spark.operators.dedup import fuzzy_name_pairs

    df = spark.createDataFrame(
        [
            (1, "widget"),
            (2, "widgte"),   # transposition = 2 edits
            (3, "widget"),   # identical -> dist 0
            (4, "wadget"),   # 1 substitution
            (5, "gadget"),   # 2 substitutions from widget
            (6, "sprocket"),  # far from everything
        ],
        "id long, name string",
    )
    out = fuzzy_name_pairs(df, "name", "id", max_distance=2).collect()
    got = {(r.name_a, r.name_b): (r.dist, r.n_a, r.n_b) for r in out}
    # vocabulary grain: "widget" occurs twice (ids 1, 3) -> n = 2
    assert got[("wadget", "widget")] == (1, 1, 2)
    assert got[("widget", "widgte")] == (2, 2, 1)
    assert got[("gadget", "widget")] == (2, 1, 2)
    assert not any("sprocket" in p for p in got)  # matches nothing
    assert all(v[0] <= 2 for v in got.values())


def test_mad_outliers_literal(spark, monkeypatch):
    import data_pipeline_demo_spark.plans.relational as rel

    # group g: cluster at 10 +/- 1 (MAD = 1, so the +/-1 points sit at
    # robust-z 0.6745 < 1.2), one far point at 100
    rows = [(i, None, 0, "g", float(v), "{}") for i, v in
            enumerate([9, 9, 9, 10, 10, 10, 10, 11, 11, 11, 100])]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(rel, "table", lambda s, d, n: ev)
    out = rel.q114_outliers_mad(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    assert r.med == 10.0 and r.mad == 1.0
    # only the far point exceeds the robust-z threshold
    assert r.n_outliers == 1 and r.n == 11


def test_radius_join_blocking_equals_bruteforce(spark):
    """Grid blocking loses no pair: compare against the all-pairs
    brute force on a point cloud engineered to straddle cell borders
    (including the antimeridian-free worst case of near-boundary
    latitudes)."""
    import itertools
    import math

    from data_pipeline_demo_spark.operators.spatial import (
        EARTH_RADIUS_KM,
        radius_join,
    )

    pts = [
        (1, 0.0, 0.0),
        (2, 0.0, 0.4),      # ~44 km east
        (3, 0.45, 0.0),     # ~50 km north (boundary-ish)
        (4, 59.9, 10.0),    # high-lat pair: lon degrees shrink
        (5, 59.9, 10.8),    # ~45 km from 4 at this latitude
        (6, -30.0, 100.0),  # isolated
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {(r.id_a, r.id_b): r.dist_km for r in radius_join(df, 50.0).collect()}

    def hav(a, b):
        (_, la1, lo1), (_, la2, lo2) = a, b
        dlat = math.radians(la2 - la1) / 2
        dlon = math.radians(lo2 - lo1) / 2
        x = (
            math.sin(dlat) ** 2
            + math.cos(math.radians(la1))
            * math.cos(math.radians(la2))
            * math.sin(dlon) ** 2
        )
        return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(x))

    want = {
        (a[0], b[0]): round(hav(a, b), 3)
        for a, b in itertools.combinations(pts, 2)
        if round(hav(a, b), 3) <= 50.0
    }
    assert got == want and (4, 5) in got and (1, 2) in got
    assert not any(6 in p for p in got)
    # emit-exactly-once: the join produces each pair once BY
    # CONSTRUCTION (B at its home cell only) — no dedup pass exists to
    # hide a double emission, so assert it directly on the raw rows
    rows = radius_join(df, 50.0).collect()
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_radius_join_out_of_bound_lat_raises(spark):
    """A point beyond max_abs_lat must FAIL the job (incomplete pair
    sets are the one unacceptable failure mode of a provably-complete
    blocked join), and the error must name the remedy."""
    from data_pipeline_demo_spark.operators.spatial import radius_join

    df = spark.createDataFrame(
        [(1, 61.5, 5.0), (2, 61.5, 5.1)], "id long, lat double, lon double"
    )
    with pytest.raises(Exception, match="max_abs_lat"):
        radius_join(df, 50.0, max_abs_lat=60.0).collect()
    # widening the bound (wider cells) makes the same data legal
    assert radius_join(df, 50.0, max_abs_lat=65.0).count() == 1
    # null latitude is data, not an error: stays unpaired, job succeeds
    dfn = spark.createDataFrame(
        [(1, None, 5.0), (2, 0.0, 5.0)], "id long, lat double, lon double"
    )
    assert radius_join(dfn, 50.0).count() == 0


def test_holt_forecast_linear_series_is_exact(spark):
    from data_pipeline_demo_spark.operators.forecast import holt_forecast

    # y_t = 10 + 5t: level/trend lock on exactly; forecast continues it
    rows = [("a", t, 10.0 + 5.0 * t) for t in range(8)]
    df = spark.createDataFrame(rows, "k string, b long, v double")
    out = {
        r.step: (r.forecast, r.level, r.trend)
        for r in holt_forecast(df, "k", "b", "v", horizon=3).collect()
    }
    last = 10.0 + 5.0 * 7
    for h in (1, 2, 3):
        f, level, trend = out[h]
        assert abs(trend - 5.0) < 1e-9
        assert abs(level - last) < 1e-9
        assert abs(f - (last + 5.0 * h)) < 1e-9


def test_holt_forecast_matches_numpy_fold(spark):
    import random

    from data_pipeline_demo_spark.operators.forecast import holt_forecast

    rng = random.Random(7)
    series = {k: [rng.uniform(0, 100) for _ in range(12)] for k in "xyz"}
    rows = [(k, t, v) for k, ys in series.items() for t, v in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, b long, v double")
    got = {
        (r.k, r.step): r.forecast
        for r in holt_forecast(
            df, "k", "b", "v", horizon=2, alpha=0.4, beta=0.2
        ).collect()
    }
    for k, ys in series.items():
        level, trend = ys[0], ys[1] - ys[0]
        for y in ys[1:]:
            prev = level
            level = 0.4 * y + 0.6 * (level + trend)
            trend = 0.2 * (level - prev) + 0.8 * trend
        for h in (1, 2):
            assert abs(got[(k, h)] - round(level + h * trend, 6)) < 1e-9


def test_holt_forecast_single_point_flat(spark):
    from data_pipeline_demo_spark.operators.forecast import holt_forecast

    df = spark.createDataFrame([("a", 0, 42.0)], "k string, b long, v double")
    out = holt_forecast(df, "k", "b", "v", horizon=2).collect()
    assert {(r.step, r.forecast, r.trend, r.n_obs) for r in out} == {
        (1, 42.0, 0.0, 1),
        (2, 42.0, 0.0, 1),
    }


def test_distributed_prefix_sums_exact_and_partition_invariant(spark):
    from data_pipeline_demo_spark.operators.sampling import (
        distributed_prefix_sums,
    )

    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50), rng.randint(-3, 9)) for i in range(4000)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    out = distributed_prefix_sums(
        df, ["k"], ["a", "b"], out_cols=["ca", "cb"]
    ).select("k", "ca", "cb").collect()
    got = {r.k: (r.ca, r.cb) for r in out}
    want, ra, rb = {}, 0, 0
    for k, a, b in sorted(rows):
        ra, rb = ra + a, rb + b
        want[k] = (ra, rb)
    assert got == want
    # repartitioning the input must not change any prefix value
    out2 = {
        r.k: (r.ca, r.cb)
        for r in distributed_prefix_sums(
            df.repartition(13), ["k"], ["a", "b"], out_cols=["ca", "cb"]
        ).select("k", "ca", "cb").collect()
    }
    assert out2 == want


def test_distributed_prefix_sums_grouped_matches_sql_window(spark):
    """partition_by= restarts the running sums per group and must be
    bit-identical to SUM() OVER (PARTITION BY grp ORDER BY ...) — the
    grouped cumulative form q195 rides — independent of the input
    partitioning, including groups smaller than the parallelism and a
    group that is entirely absent from some range partitions."""
    from data_pipeline_demo_spark.operators.sampling import (
        distributed_prefix_sums,
    )

    import random

    rng = random.Random(11)
    rows = [
        (i, ["x", "y", "z"][rng.randint(0, 2)] if i > 3 else "solo",
         rng.randint(-5, 50))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "k long, g string, a long").repartition(7)
    got = {
        (r.g, r.k): r.ca
        for r in distributed_prefix_sums(
            df, ["k"], ["a"], out_cols=["ca"], partition_by=["g"]
        ).collect()
    }
    df.createOrReplaceTempView("gps_in")
    want = {
        (r.g, r.k): r.ca
        for r in spark.sql(
            "SELECT g, k, SUM(a) OVER (PARTITION BY g ORDER BY k"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca"
            " FROM gps_in"
        ).collect()
    }
    assert got == want and len(got) == 3000


def test_exact_ntile_matches_sql_ntile(spark):
    """exact_ntile must reproduce SQL NTILE(k) bit-for-bit, including
    the uneven-bucket edge (n % k != 0) and n < k, independent of the
    input partitioning."""
    from data_pipeline_demo_spark.operators.sampling import exact_ntile

    import random

    rng = random.Random(3)
    for n, k in ((4003, 5), (100, 7), (3, 5), (1, 1), (17, 17)):
        rows = [(i, rng.randint(0, 40)) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v long").repartition(9)
        got = {
            r.id: r.bucket
            for r in exact_ntile(df, ["v", "id"], k).collect()
        }
        df.createOrReplaceTempView("ntile_in")
        want = {
            r.id: r.b
            for r in spark.sql(
                f"SELECT id, NTILE({k}) OVER (ORDER BY v, id) AS b"
                " FROM ntile_in"
            ).collect()
        }
        assert got == want, (n, k)


def test_global_row_index_dense_and_partition_invariant(spark):
    from data_pipeline_demo_spark.operators.sampling import global_row_index

    import random

    rng = random.Random(11)
    rows = [(i, rng.randint(0, 10**6)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = global_row_index(df, ["v", "id"]).select("id", "idx").collect()
    got = {r.id: r.idx for r in out}
    want = {
        rid: pos
        for pos, (rid, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    assert got == want  # dense 0..n-1, exactly the total-order ranks
    # partitioning of the input must not change the assignment
    out2 = {
        r.id: r.idx
        for r in global_row_index(df.repartition(17), ["v", "id"])
        .select("id", "idx")
        .collect()
    }
    assert out2 == got


def test_global_row_index_no_table_sized_single_partition(spark):
    """The only SinglePartition exchange in the plan feeds the
    partition-count tally (a ~numPartitions-row aggregate), never the
    table: the table-sized path goes through range partitioning."""
    from data_pipeline_demo_spark.operators.sampling import global_row_index

    df = spark.range(10000).selectExpr("id", "id % 97 AS v")
    plan = (
        global_row_index(df, ["v", "id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    # exactly ONE SinglePartition exchange — the tally window — and the
    # subtree it feeds from is an aggregate, not the table scan/sort
    assert plan.count("Exchange SinglePartition") == 1
    below = plan.split("Exchange SinglePartition", 1)[1]
    assert "HashAggregate" in below.split("Exchange", 1)[0]


def test_holt_winters_pure_seasonal_is_exact(spark):
    """A zero-sum pure-seasonal series (no trend) initializes exactly
    and stays exact through every update, so forecasts reproduce the
    season bit-for-bit."""
    from data_pipeline_demo_spark.operators.forecast import (
        holt_winters_forecast,
    )

    season = [3.0, -1.0, -2.0, 0.0]  # sums to zero
    ys = [10.0 + season[t % 4] for t in range(12)]
    df = spark.createDataFrame(
        [("k", t, y) for t, y in enumerate(ys)], "k string, b long, v double"
    )
    out = {
        r["step"]: r
        for r in holt_winters_forecast(
            df, "k", "b", "v", season_length=4, horizon=4
        ).collect()
    }
    for h in range(1, 5):
        assert out[h]["seasonal"] is True
        assert out[h]["forecast"] == round(10.0 + season[(12 + h - 1) % 4], 6)
        assert out[h]["trend"] == 0.0


def test_holt_winters_matches_numpy_fold(spark):
    import numpy as np

    from data_pipeline_demo_spark.operators.forecast import (
        holt_winters_forecast,
    )

    rng = np.random.RandomState(7)
    m, n = 5, 23
    ys = (
        50
        + 0.8 * np.arange(n)
        + np.tile(rng.randn(m) * 4, 5)[:n]
        + rng.randn(n)
    )
    df = spark.createDataFrame(
        [("k", t, float(y)) for t, y in enumerate(ys)],
        "k string, b long, v double",
    )
    a, b, g = 0.4, 0.2, 0.3
    got = {
        r["step"]: r["forecast"]
        for r in holt_winters_forecast(
            df, "k", "b", "v", season_length=m, horizon=3,
            alpha=a, beta=b, gamma=g,
        ).collect()
    }
    mean1, mean2 = ys[:m].mean(), ys[m : 2 * m].mean()
    level, trend = mean1, (mean2 - mean1) / m
    s = list(ys[:m] - mean1)
    for t in range(m, n):
        prev = level
        si = s[t % m]
        level = a * (ys[t] - si) + (1 - a) * (level + trend)
        trend = b * (level - prev) + (1 - b) * trend
        s[t % m] = g * (ys[t] - level) + (1 - g) * si
    for h in range(1, 4):
        want = round(level + h * trend + s[(n + h - 1) % m], 6)
        assert got[h] == want


def test_holt_winters_short_series_falls_back_to_holt(spark):
    from data_pipeline_demo_spark.operators.forecast import (
        holt_forecast,
        holt_winters_forecast,
    )

    df = spark.createDataFrame(
        [("k", t, float(2 * t)) for t in range(5)],
        "k string, b long, v double",
    )
    hw = {
        r["step"]: r
        for r in holt_winters_forecast(
            df, "k", "b", "v", season_length=4, horizon=2
        ).collect()
    }
    h = {
        r["step"]: r
        for r in holt_forecast(df, "k", "b", "v", horizon=2).collect()
    }
    for step in (1, 2):
        assert hw[step]["seasonal"] is False
        assert hw[step]["forecast"] == h[step]["forecast"]


def test_bfs_distances_hand_graph(spark):
    """Path 1-2-3-4 plus branch 2-5; distances from 1 are exact, and a
    node first reached at its shortest depth never updates again."""
    from data_pipeline_demo_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 5), (5, 3)], "src long, dst long"
    )
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, 1, max_depth=10).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 2}


def test_bfs_directed_vs_undirected(spark):
    from data_pipeline_demo_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    undirected = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, 1, max_depth=5).collect()
    }
    assert undirected == {1: 0, 2: 1, 3: 2}
    directed = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, 1, max_depth=5, directed=True).collect()
    }
    assert directed == {1: 0, 2: 1}  # 3→2 is not traversable from 2


def test_bfs_depth_cap_and_unreachable(spark):
    from data_pipeline_demo_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], "src long, dst long"
    )
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, 1, max_depth=2).collect()
    }
    # depth cap trims the tail; the disconnected component never appears
    assert got == {1: 0, 2: 1, 3: 2}
