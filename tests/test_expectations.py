"""Declarative expectations (operators/expectations.py): the split is
exhaustive and lossless, violations name the exact failed rules, NULL
rule results fail conservatively, metrics agree with brute force, and
the cross-row operators (uniqueness, referential) find exactly the
offending rows. Plan shape: rule stamping adds no shuffle and no
Python."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators.expectations import (
    expect,
    expect_references,
    expect_unique,
    expectation_metrics,
    stamp_expectations,
)


def _df(spark):
    rows = [
        (1, 10.0, "A"),
        (2, -5.0, "A"),      # fails positive
        (3, 7.0, "Z"),       # fails domain
        (4, None, "B"),      # NULL comparison -> fails positive
        (5, -1.0, "Q"),      # fails both
        (6, 0.5, "B"),
    ]
    return spark.createDataFrame(rows, "id long, amount double, cat string")


def _rules():
    return {
        "positive": F.col("amount") > 0,
        "known_cat": "cat IN ('A','B','C')",  # SQL-string rules work too
    }


def test_split_is_exhaustive_and_names_failures(spark):
    df = _df(spark)
    good, bad = expect(df, _rules())
    assert {r.id for r in good.collect()} == {1, 6}
    got = {r.id: sorted(r._violations) for r in bad.collect()}
    assert got == {
        2: ["positive"],
        3: ["known_cat"],
        4: ["positive"],  # NULL amount: rule cannot pass
        5: ["known_cat", "positive"],
    }
    # lossless: every source row lands on exactly one side, good keeps
    # the original schema
    assert good.count() + bad.count() == df.count()
    assert good.columns == df.columns


def test_metrics_match_brute_force(spark):
    df = _df(spark)
    got = {
        r.rule: (r.n_rows, r.n_violations, r.violation_rate)
        for r in expectation_metrics(df, _rules()).collect()
    }
    assert got == {
        "positive": (6, 3, 0.5),
        "known_cat": (6, 2, round(2 / 6, 6)),
    }


def test_stamping_is_shuffle_and_python_free(spark):
    df = _df(spark)
    plan = (
        stamp_expectations(df, _rules())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bad_rule_names_refused(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="at least one"):
        expect(df, {})
    with pytest.raises(ValueError, match="bad rule name"):
        expect(df, {"": F.lit(True)})


def test_expect_unique_returns_offending_rows(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x"), (4, "z"), (5, "x")],
        "id long, k string",
    )
    dups = expect_unique(df, ["k"])
    assert {r.id for r in dups.collect()} == {1, 3, 5}
    assert expect_unique(df.filter("id IN (2, 4)"), ["k"]).count() == 0


def test_expect_references_finds_orphans_and_null_fk(spark):
    facts = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 20), (4, None)],
        "id long, fk int",
    )
    dim = spark.createDataFrame([(10,), (20,), (30,)], "k int")
    orphans = expect_references(facts, "fk", dim, "k")
    assert {r.id for r in orphans.collect()} == {2, 4}
    plan = orphans._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan  # dimension side broadcasts


def test_expect_references_null_in_dim_does_not_absolve_null_fk(spark):
    """Advisor round-8 low: a NULL in dim[dim_col] used to match NULL
    foreign keys through eqNullSafe and silently drop them from the
    violation set. NULL fks stay violations regardless of dim NULLs."""
    facts = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], "id long, fk int"
    )
    dim = spark.createDataFrame([(10,), (None,)], "k int")
    orphans = expect_references(facts, "fk", dim, "k")
    assert {r.id for r in orphans.collect()} == {2, 3}


def test_streaming_micro_batch_shape(spark, tmp_path):
    """The stamped split is map-only, so the same rules run unchanged
    inside a foreachBatch micro-batch — prove it on a real stream."""
    src = str(tmp_path / "in")
    df = _df(spark)
    df.write.parquet(src)
    seen = {}

    def sink(batch, bid):
        good, bad = expect(batch, _rules())
        seen["good"] = {r.id for r in good.collect()}
        seen["bad"] = {r.id for r in bad.collect()}

    q = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.awaitTermination(120)
    assert seen["good"] == {1, 6}
    assert seen["bad"] == {2, 3, 4, 5}


def test_stream_expectations_gate_exactly_once(spark, tmp_path):
    """The continuous gate (streaming/jobs.stream_expectations_gate):
    each micro-batch splits into the good txtable and the
    violations-carrying quarantine txtable under the shared txn
    watermark — new files flow on a second run, and a restart from the
    same checkpoint never double-writes either side."""
    from data_pipeline_demo_spark.sinks.txlog import (
        read_txtable,
        txtable_history,
    )
    from data_pipeline_demo_spark.streaming.jobs import (
        stream_expectations_gate,
    )

    src = str(tmp_path / "in")
    good_root = str(tmp_path / "good")
    bad_root = str(tmp_path / "bad")
    cp = str(tmp_path / "cp")
    schema = "id long, amount double, cat string"
    spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "A"), (3, 7.0, "Z")], schema
    ).write.parquet(src)

    def run():
        q = stream_expectations_gate(
            spark, src, schema, _rules(), "id", good_root, bad_root, cp,
            num_buckets=4,
        )
        q.awaitTermination(120)

    run()
    assert {r.id for r in read_txtable(spark, good_root).collect()} == {1}
    bad = {
        r.id: r._violations for r in read_txtable(spark, bad_root).collect()
    }
    assert bad == {2: "positive", 3: "known_cat"}

    # second landing file: only the new rows process
    spark.createDataFrame(
        [(4, 1.0, "B"), (5, -2.0, "Q")], schema
    ).write.mode("append").parquet(src)
    run()
    assert {r.id for r in read_txtable(spark, good_root).collect()} == {1, 4}
    bad = {
        r.id: r._violations for r in read_txtable(spark, bad_root).collect()
    }
    assert bad == {2: "positive", 3: "known_cat", 5: "known_cat,positive"}

    # drained restart: no new batch, no new commits on either table
    g_v = len(txtable_history(spark, good_root))
    b_v = len(txtable_history(spark, bad_root))
    run()
    assert len(txtable_history(spark, good_root)) == g_v
    assert len(txtable_history(spark, bad_root)) == b_v
