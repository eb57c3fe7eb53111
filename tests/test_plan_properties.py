"""Physical-plan invariants for the headline queries — the scale
properties the code claims, asserted against `.explain` output so a
regression in plan shape fails CI even while results stay correct:

- filters reach the parquet scan (PushedFilters), projections prune
  the read schema;
- dimension joins broadcast (no fact shuffle);
- per-row queries contain no single-partition exchange;
- no row-at-a-time Python eval (BatchEvalPython) anywhere in the
  registered query surface.
"""

import pytest

import __spark_entry__ as e


def _plan(spark, sf_dir, name):
    df = e.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_filter_project")
    assert "PushedFilters: [" in plan
    # pushed filters are non-empty
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), plan[:1500]
    # projection pruning: lineitem has 16 columns; the read schema must
    # carry only what q02 selects/filters (well under half)
    read_schema = plan.split("ReadSchema: struct<", 1)[1].split(">", 1)[0]
    assert len(read_schema.split(",")) <= 8, read_schema


def test_dim_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q09_join_broadcast_dims")
    assert plan.count("BroadcastHashJoin") == 2  # nation + region dims
    # exactly ONE hash-partition exchange, and it belongs to the grouped
    # aggregation (keyed on group-by columns after map-side partials) —
    # the joins themselves never shuffle the fact side
    shuffles = [
        seg.split(",", 2)[:2]
        for seg in plan.split("Exchange hashpartitioning(")[1:]
    ]
    assert len(shuffles) == 1, plan[:2000]
    assert "r_name" in shuffles[0][0], shuffles


def test_scalar_queries_have_no_global_window(spark, sf_dir):
    # q27 computes a corpus total: it must arrive via a 1-row aggregate +
    # broadcast, never a single-partition exchange of the full table
    plan = _plan(spark, sf_dir, "q27_currency_cast")
    assert "Window" not in plan
    before_agg = plan.split("HashAggregate", 1)[0]
    assert "Exchange SinglePartition" not in before_agg


@pytest.mark.parametrize(
    "name",
    sorted(e.queries()),
)
def test_no_row_at_a_time_python(spark, sf_dir, name):
    """No registered query may fall back to row-at-a-time Python eval —
    Python appears only as ArrowEvalPython / FlatMapGroupsInPandas /
    MapInPandas (vectorized)."""
    plan = _plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan, name


def test_multi_join_plan_shape(spark, sf_dir):
    """q68 (TPC-H Q5 shape): the date filter reaches the orders scan,
    no join degrades to a nested loop (the same-nation predicate must
    ride the supplier equi-join as a residual), and every dim join is
    hash-based."""
    plan = _plan(spark, sf_dir, "q68_local_supplier_revenue")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the orders scan itself carries the date range (pushed, not a
    # post-scan filter): its FileScan line names o_orderdate >= 1996
    orders_scan = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "o_orderdate" in ln
    ]
    assert orders_scan, plan[:2000]
    assert any(">= 1996-01-01" in ln for ln in orders_scan), orders_scan


def test_weighted_sample_plans_take_ordered(spark):
    """weighted_sample_k's global top-k must plan as
    TakeOrderedAndProject (per-partition heaps + k-row driver merge),
    never a full global sort."""
    from data_pipeline_demo_spark.operators.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [(i, float(i % 7 + 1)) for i in range(1000)], "doc_id long, w double"
    )
    plan = (
        weighted_sample_k(df, 10, "w")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_correlated_subquery_decorrelates(spark, sf_dir):
    """q86's two correlated scalar subqueries + EXISTS must rewrite to
    aggregate-joins (one per-customer MAX, one semi join) — never a
    per-row subquery re-execution (no nested-loop join against the
    orders table, no InSubquery left in the physical plan)."""
    plan = _plan(spark, sf_dir, "q86_correlated_subquery")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan  # EXISTS became a semi join
    assert "max(o_totalprice" in plan  # scalar subqueries → one aggregate


def test_ks_ecdf_is_distributed(spark, sf_dir):
    """q200's running ECDF counts must NOT be an unpartitioned window
    over the distinct-value relation (cardinality ≈ row count for a
    continuous measure): the value-grain cumsum goes through range
    partitioning + per-partition windows, and every SinglePartition
    exchange in the plan feeds an aggregate (the ~numPartitions-row
    tally / the 1-row totals), never the table."""
    plan = _plan(spark, sf_dir, "q200_ks_test")
    assert "rangepartitioning" in plan.lower()
    # the table-grain cumulative window is partitioned (by __pid)
    assert "windowspecdefinition(__pid" in plan
    # no unpartitioned window over the value relation: every
    # SinglePartition subtree starts with an aggregate
    for seg in plan.split("Exchange SinglePartition")[1:]:
        below = seg.split("Exchange", 1)[0]
        assert "HashAggregate" in below, below[:800]


@pytest.mark.parametrize("name", ["q163_rfm_segments", "q179_woe_iv"])
def test_ntile_queries_have_no_unpartitioned_table_window(spark, sf_dir, name):
    """RFM quintiles / WOE deciles stamp buckets via exact_ntile, never
    an unpartitioned NTILE over the table: every windowspec is
    partitioned by __pid (the range-partition local rank) except
    windows over metadata-sized relations, and every SinglePartition
    exchange feeds an aggregate."""
    plan = _plan(spark, sf_dir, name)
    assert "ntile(" not in plan.lower().replace("exact_ntile", "")
    assert "rangepartitioning" in plan.lower()
    assert "windowspecdefinition(__pid" in plan
    for seg in plan.split("Exchange SinglePartition")[1:]:
        below = seg.split("Exchange", 1)[0]
        assert "HashAggregate" in below, below[:800]


def test_stratified_exact_k_single_window(spark, sf_dir):
    """q87: one window shuffle partitioned by the stratum, no global
    sort or single-partition exchange — and the rank filter pushes into
    a PARTIAL WindowGroupLimit below the exchange, so each map task
    ships at most k rows per stratum instead of its whole partition."""
    plan = _plan(spark, sf_dir, "q87_stratified_sample")
    assert "Exchange SinglePartition" not in plan
    assert plan.count("+- Window ") == 1
    before_exchange = plan.split("Exchange hashpartitioning", 1)[1]
    assert "WindowGroupLimit" in before_exchange  # map-side top-k prune


def test_stratified_exact_k_nested_prefix(spark):
    """rank ≤ j of a k-sample equals the j-sample — the property that
    makes the sample reusable at several sizes without resampling."""
    from data_pipeline_demo_spark.operators.sampling import (
        stratified_sample_exact_k,
    )

    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(300)],
        "doc_id long, lang string",
    )
    k10 = stratified_sample_exact_k(df, 10, "lang", "doc_id")
    k4 = stratified_sample_exact_k(df, 4, "lang", "doc_id")
    prefix = {
        (r["lang"], r["doc_id"])
        for r in k10.filter("sample_rank <= 4").collect()
    }
    direct = {(r["lang"], r["doc_id"]) for r in k4.collect()}
    assert prefix == direct and len(direct) == 12


def test_join_hints_switch_physical_strategy(spark, sf_dir):
    """Join-strategy control surface: the same logical join planned as
    broadcast-hash, shuffle-hash, and sort-merge purely via hints —
    the knob a 100 TB deployment turns when AQE's choice is wrong for
    a known workload."""
    from data_pipeline_demo_spark.sources.tables import table

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def plan(j):
        return j._jdf.queryExecution().executedPlan().toString()

    b = plan(li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey))
    assert "BroadcastHashJoin" in b
    sh = plan(li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey))
    assert "ShuffledHashJoin" in sh
    sm = plan(li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey))
    assert "SortMergeJoin" in sm
