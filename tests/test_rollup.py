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
