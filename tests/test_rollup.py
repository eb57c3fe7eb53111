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


def test_refresh_cascade_from_txtable_cdc(spark, sf_dir, tmp_path):
    """CDC-driven invalidation maintenance: bootstrap build, then a
    commit batch containing an update (value change), a cross-day
    MOVE (ts change — preimage day must also refresh), an insert, and
    a whole-day delete. After refresh, every tier equals the one-shot
    cascade over the CURRENT table, and the deleted day's partition is
    gone."""
    from data_pipeline_demo_spark.sinks.txlog import (
        read_txtable,
        txlog_delete,
        txlog_upsert,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    ).limit(3000)
    root = str(tmp_path / "events_tx")
    store = str(tmp_path / "store")
    txlog_upsert(spark, ev, root, key="event_id", num_buckets=8)

    days0, v0 = rollup.refresh_cascade_from_txtable(spark, root, store)
    assert v0 == 0 and len(days0) > 0
    one_shot = rollup.rollup_cascade(read_txtable(spark, root))
    for lvl in ("minute", "hour", "day"):
        got = sorted(map(tuple, rollup.read_rollup(spark, store, lvl).collect()))
        want = sorted(map(tuple, one_shot[lvl].collect()))
        assert got == want, f"bootstrap {lvl} mismatch"

    # same-version refresh: no-op
    assert rollup.refresh_cascade_from_txtable(
        spark, root, store, since_version=v0
    ) == ([], v0)

    rows = read_txtable(spark, root).orderBy("event_id").limit(3).collect()
    a, b, c = rows
    all_days = sorted(
        str(r["d"]) for r in read_txtable(spark, root)
        .select(F.to_date("ts").alias("d")).distinct().collect()
    )
    doomed_day = all_days[0]
    batch = spark.createDataFrame(
        [
            # value update in place
            (a["event_id"], a["ts"], a["event_type"], a["value"] + 100.0),
            # cross-day move: ts shifted by 40 days
            (b["event_id"], b["ts"], b["event_type"], b["value"]),
            # fresh insert on b's original day
            (10**9, c["ts"], "view", 1.5),
        ],
        read_txtable(spark, root).schema,
    ).withColumn(
        "ts",
        F.when(F.col("event_id") == b["event_id"],
               F.col("ts") + F.expr("INTERVAL 40 DAYS")).otherwise(F.col("ts")),
    )
    txlog_upsert(spark, batch, root)
    txlog_delete(spark, root, where=f"to_date(ts) = '{doomed_day}'")

    days1, v1 = rollup.refresh_cascade_from_txtable(
        spark, root, store, since_version=v0
    )
    assert v1 > v0
    # the preimage day of the moved event and the doomed day both refresh
    assert str((b["ts"]).date()) in days1
    assert doomed_day in days1

    current = read_txtable(spark, root)
    one_shot = rollup.rollup_cascade(current)
    for lvl in ("minute", "hour", "day"):
        got = sorted(map(tuple, rollup.read_rollup(spark, store, lvl).collect()))
        want = sorted(map(tuple, one_shot[lvl].collect()))
        assert got == want, f"post-CDC {lvl} mismatch"
    import os
    assert not os.path.exists(
        os.path.join(store, "day", f"p_date={doomed_day}")
    )


def test_gapfill_interpolate_by_hand(spark):
    """Hand-computed linear fill: observations at hours 0 (v=10) and
    3 (v=40) interpolate hour 1 → 20, hour 2 → 30; observed rows keep
    their own value and is_gap=false."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0)
    rows = [
        ("a", t0, 10.0),
        ("a", t0 + dt.timedelta(hours=3), 40.0),
        ("b", t0, 5.0),  # single-observation group: no gaps at all
    ]
    agg = spark.createDataFrame(
        rows, "event_type string, bucket timestamp, bucket_sum double"
    )
    out = {
        (r["event_type"], r["bucket"].hour): (r["is_gap"], r["bucket_sum_interp"])
        for r in rollup.gapfill_interpolate(agg, step="1 hour").collect()
    }
    assert out[("a", 0)] == (False, 10.0)
    assert out[("a", 1)] == (True, 20.0)
    assert out[("a", 2)] == (True, 30.0)
    assert out[("a", 3)] == (False, 40.0)
    assert out[("b", 0)] == (False, 5.0)
    assert len(out) == 5
