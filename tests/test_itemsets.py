"""Apriori frequent itemsets (operators/itemsets.py): hand-computed
expectations, duplicate collapse, the basket-size guard, and the
map-only combination-generation plan shape."""

from data_pipeline_demo_spark.operators.itemsets import frequent_itemsets


def _fi(spark, rows, **kw):
    df = spark.createDataFrame(rows, "b string, i long")
    out = frequent_itemsets(df, "b", "i", **kw)
    return {(r["items"], r["k"]): r["support"] for r in out.collect()}


def test_hand_computed_pairs_and_triples(spark):
    rows = [
        ("A", 1), ("A", 2), ("A", 3),
        ("B", 1), ("B", 2),
        ("C", 1), ("C", 2), ("C", 3),
        ("D", 3), ("D", 4),
    ]
    got = _fi(spark, rows, min_support=2, max_size=3)
    assert got == {
        ("1,2", 2): 3,
        ("1,3", 2): 2,
        ("2,3", 2): 2,
        ("1,2,3", 3): 2,
    }


def test_duplicate_instances_collapse(spark):
    # the same item twice in one basket counts once
    rows = [("A", 1), ("A", 1), ("A", 2), ("B", 1), ("B", 2)]
    got = _fi(spark, rows, min_support=2, max_size=2)
    assert got == {("1,2", 2): 2}


def test_min_support_prunes_singletons_before_generation(spark):
    # item 9 appears once: no pair containing it can be frequent, and
    # Apriori never generates those candidates
    rows = [("A", 1), ("A", 2), ("A", 9), ("B", 1), ("B", 2)]
    got = _fi(spark, rows, min_support=2, max_size=2)
    assert got == {("1,2", 2): 2}


def test_max_basket_guard_drops_oversized(spark):
    rows = [("A", i) for i in range(1, 6)] + [("B", i) for i in range(1, 6)]
    # cap below basket size: nothing survives
    assert _fi(spark, rows, min_support=2, max_size=2, max_basket=4) == {}
    full = _fi(spark, rows, min_support=2, max_size=2, max_basket=64)
    assert len(full) == 10 and all(v == 2 for v in full.values())


def test_generation_is_map_only_no_instance_self_join(spark):
    df = spark.createDataFrame([("A", 1), ("A", 2)], "b string, i long")
    plan = frequent_itemsets(
        df, "b", "i", min_support=1
    )._jdf.queryExecution().executedPlan().toString()
    # exactly the broadcast of the frequent-singleton vocabulary; the
    # combination space never materializes through a shuffle join
    assert plan.count("SortMergeJoin") == 0
