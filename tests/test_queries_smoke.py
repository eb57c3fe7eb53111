"""Every registry query must run at sf0.001 and return a stable schema;
entry() must produce rows (the driver's t1 smoke, cheap local version —
full value checks live in tools/check_oracle.py)."""

import pytest

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    assert df.count() > 0


QUERY_NAMES = sorted(e.queries())


def test_oracle_keys_subset_of_queries():
    assert set(e.oracle_sql()) <= set(e.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_runs(spark, sf_dir, name):
    df = e.queries()[name](spark, sf_dir)
    cols = df.columns
    assert len(cols) == len(set(cols))
    # touches the execution path, not just analysis
    df.limit(5).collect()


# the full 238-query sweep above is slow-tier (r13: it aggregates >2 min
# of the driver's pytest budget); the DEFAULT tier keeps this gate
# smoke — the 50 registration-order queries the driver's correctness
# artifact attests — so a broken gate query still fails the fast run
@pytest.mark.parametrize("name", sorted(list(e.queries())[:50]))
def test_gate_query_runs(spark, sf_dir, name):
    df = e.queries()[name](spark, sf_dir)
    cols = df.columns
    assert len(cols) == len(set(cols))
    df.limit(5).collect()
