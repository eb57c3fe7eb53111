"""Hypertable rollup cascade: every tier re-aggregates the previous
tier's partials yet equals the direct aggregate of the raw table
bit-for-bit (decimal carry — the load-bearing design point)."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.functions.numeric import DECIMAL_T
from data_pipeline_demo_spark.operators import rollup
from data_pipeline_demo_spark.sources.tables import table


def _direct(events, level):
    return (
        events.groupBy(
            F.date_trunc(level, F.col("ts")).alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DECIMAL_T)).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def test_cascade_equals_direct_at_every_level(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    cascade = rollup.rollup_cascade(ev, levels=("minute", "hour", "day"))
    for level in ("minute", "hour", "day"):
        got = sorted(map(tuple, rollup.finalize(cascade[level]).collect()))
        want = sorted(map(tuple, rollup.finalize(_direct(ev, level)).collect()))
        assert got == want, f"cascade {level} != direct {level}"
    # tiers genuinely shrink (the 100 TB point of the cascade)
    sizes = {lv: cascade[lv].count() for lv in ("minute", "hour", "day")}
    assert sizes["minute"] > sizes["hour"] > sizes["day"]


def test_cascade_rejects_misordered_levels(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="fine-to-coarse"):
        rollup.rollup_cascade(ev, levels=("day", "hour"))
    with pytest.raises(ValueError, match="fine-to-coarse"):
        rollup.rollup_cascade(ev, levels=("hour", "hour"))


def test_refresh_cascade_incremental_equals_one_shot(spark, sf_dir, tmp_path):
    """A store refreshed in two arbitrary increments must equal the
    one-shot cascade over all events, bit-for-bit, at every tier."""
    ev = table(spark, sf_dir, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    base = str(tmp_path / "store")
    rollup.refresh_cascade(spark, first, base)
    rollup.refresh_cascade(spark, second, base)
    one_shot = rollup.rollup_cascade(ev)
    for lvl in ("minute", "hour", "day"):
        got = sorted(
            map(tuple, rollup.finalize(rollup.read_rollup(spark, base, lvl)).collect())
        )
        want = sorted(map(tuple, rollup.finalize(one_shot[lvl]).collect()))
        assert got == want, f"incremental {lvl} != one-shot"


def test_refresh_cascade_touches_only_affected_days(spark, sf_dir, tmp_path):
    """A single-day increment must leave every other day's partition
    files byte-identical in every tier."""
    import glob
    import hashlib
    import os

    ev = table(spark, sf_dir, "events")
    base = str(tmp_path / "store")
    rollup.refresh_cascade(spark, ev, base)

    def snapshot():
        out = {}
        for lvl in ("minute", "hour", "day"):
            for d in glob.glob(os.path.join(base, lvl, "p_date=*")):
                for p in glob.glob(os.path.join(d, "*.parquet")):
                    out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
        return out

    before = snapshot()
    inc = ev.filter(F.to_date("ts") == "2024-01-15")
    assert inc.count() > 0
    days = rollup.refresh_cascade(spark, inc, base)
    assert days == ["2024-01-15"]
    after = snapshot()
    unaffected_before = {p: h for p, h in before.items() if "p_date=2024-01-15" not in p}
    unaffected_after = {p: h for p, h in after.items() if "p_date=2024-01-15" not in p}
    assert unaffected_before == unaffected_after
    # and the affected day doubled its counts (events added twice)
    day15 = rollup.read_rollup(spark, base, "day").filter(
        F.to_date("bucket") == "2024-01-15"
    )
    n = day15.agg(F.sum("n_events")).collect()[0][0]
    assert n == 2 * inc.count()


def test_refresh_cascade_null_ts_and_empty_increment(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events")
    base = str(tmp_path / "store")
    # null event times are dropped explicitly, not lost in a phantom
    # partition; an all-null (effectively empty) increment is a no-op
    withnull = ev.limit(10).withColumn("ts", F.lit(None).cast("timestamp"))
    assert rollup.refresh_cascade(spark, withnull, base) == []
    days = rollup.refresh_cascade(spark, ev.limit(100), base)
    assert days  # real rows still build the store
    total = rollup.read_rollup(spark, base, "day").agg(F.sum("n_events")).collect()[0][0]
    assert total == 100


def test_gapfill_locf_hand_computed(spark):
    """3 observed buckets with a 2-hour hole: the spine densifies to 5
    rows, holes flag is_gap and carry the last earlier value; a second
    dim group with one row contributes exactly one spine row."""
    rows = [
        ("a", "2024-01-01 00:00:00", 1.0),
        ("a", "2024-01-01 03:00:00", 4.0),
        ("a", "2024-01-01 04:00:00", 5.0),
        ("b", "2024-01-01 10:00:00", 9.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, b string, bucket_sum double")
    df = df.withColumn("bucket", F.to_timestamp("b")).drop("b")
    out = rollup.gapfill_locf(df)
    got = sorted(
        (r["event_type"], r["bucket"].hour, r["is_gap"], r["bucket_sum_filled"])
        for r in out.collect()
    )
    assert got == [
        ("a", 0, False, 1.0),
        ("a", 1, True, 1.0),
        ("a", 2, True, 1.0),
        ("a", 3, False, 4.0),
        ("a", 4, False, 5.0),
        ("b", 10, False, 9.0),
    ]


def test_gapfill_multi_value_columns(spark):
    """Every value column fills independently; leading hole stays null."""
    rows = [
        ("a", "2024-01-01 01:00:00", None, 7.0),
        ("a", "2024-01-01 02:00:00", 3.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, b string, s double, c double"
    )
    df = df.withColumn("bucket", F.to_timestamp("b")).drop("b")
    out = rollup.gapfill_locf(df, value_cols=("s", "c"))
    got = {r["bucket"].hour: (r["is_gap"], r["s_filled"], r["c_filled"])
           for r in out.collect()}
    # hour 1 is PRESENT (is_gap false) even though its s value is null
    assert got[1] == (False, None, 7.0)
    assert got[2] == (False, 3.0, 7.0)
