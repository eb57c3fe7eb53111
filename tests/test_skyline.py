"""Skyline (Pareto frontier) operator: exactness vs the O(n²) NOT
EXISTS dominance definition, tie handling, null exclusion, and the
map-only shape of the batch-local prefilter."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators.skyline import skyline_2d


def _brute_force(rows):
    """Reference skyline under (min x, max y) per the NOT EXISTS oracle."""
    pts = [(r.x, r.y, r.id) for r in rows if r.x is not None and r.y is not None]
    out = []
    for x, y, i in pts:
        dominated = any(
            dx <= x and dy >= y and (dx < x or dy > y) for dx, dy, _ in pts
        )
        if not dominated:
            out.append((x, y, i))
    return sorted(out)


def _check(spark, rows):
    df = spark.createDataFrame(rows, schema="x double, y double, id int")
    got = sorted(
        (r.x, r.y, r.id) for r in skyline_2d(df, "x", "y").collect()
    )
    assert got == _brute_force(rows)


def test_skyline_random_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    rows = [
        Row(x=float(rng.randint(0, 30)), y=float(rng.randint(0, 30)), id=i)
        for i in range(400)
    ]
    _check(spark, rows)


def test_skyline_ties_all_kept(spark):
    # Two identical frontier points: neither dominates the other.
    rows = [
        Row(x=1.0, y=10.0, id=1),
        Row(x=1.0, y=10.0, id=2),
        Row(x=2.0, y=5.0, id=3),   # dominated by (1,10)
        Row(x=0.5, y=3.0, id=4),   # frontier (cheapest x)
    ]
    got = sorted(r.id for r in skyline_2d(
        spark.createDataFrame(rows), "x", "y").collect())
    assert got == [1, 2, 4]


def test_skyline_nulls_excluded(spark):
    rows = [
        Row(x=None, y=99.0, id=1),
        Row(x=1.0, y=None, id=2),
        Row(x=1.0, y=1.0, id=3),
    ]
    df = spark.createDataFrame(rows, schema="x double, y double, id int")
    got = [r.id for r in skyline_2d(df, "x", "y").collect()]
    assert got == [3]


def test_skyline_single_chain(spark):
    # Strictly increasing x with strictly increasing y: all on frontier.
    rows = [Row(x=float(i), y=float(i), id=i) for i in range(20)]
    got = sorted(r.id for r in skyline_2d(
        spark.createDataFrame(rows), "x", "y").collect())
    assert got == list(range(20))

    # Strictly increasing x with strictly DECREASING y: only x=0 survives.
    rows = [Row(x=float(i), y=float(-i), id=i) for i in range(20)]
    got = [r.id for r in skyline_2d(
        spark.createDataFrame(rows), "x", "y").collect()]
    assert got == [0]


def test_skyline_prefilter_is_sound_across_partitions(spark):
    # Adversarial partitioning: frontier points scattered so that no
    # batch sees the whole frontier. The operator must still be exact.
    import random

    rng = random.Random(11)
    rows = [
        Row(x=float(i), y=float(1000 - i), id=i) for i in range(100)
    ] + [
        Row(x=float(rng.randint(0, 99)), y=float(rng.randint(0, 800)),
            id=1000 + i)
        for i in range(300)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows).repartition(16)
    got = sorted((r.x, r.y, r.id) for r in skyline_2d(df, "x", "y").collect())
    assert got == _brute_force(rows)


def test_skyline_on_part_table(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    sky = skyline_2d(part, "p_retailprice", "p_size")
    n = sky.count()
    assert n >= 1
    # Every returned row is undominated vs the full relation.
    dom = (
        sky.alias("p")
        .join(
            part.alias("d"),
            (F.col("d.p_retailprice") <= F.col("p.p_retailprice"))
            & (F.col("d.p_size") >= F.col("p.p_size"))
            & (
                (F.col("d.p_retailprice") < F.col("p.p_retailprice"))
                | (F.col("d.p_size") > F.col("p.p_size"))
            ),
            "left_semi",
        )
        .count()
    )
    assert dom == 0
