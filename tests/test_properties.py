"""Property-based tests (SURVEY.md §5.4, hypothesis): the cleaning spec
never throws and round-trips its own grammar; the upsert sink is
idempotent under re-delivery.

Each hypothesis example batches its inputs into ONE small DataFrame so a
property costs one Spark job, not one per string; example counts are
tuned to keep the file under ~a minute.
"""

import re
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipeline_demo_spark.functions.cleaning import (
    clean_money,
    parse_datetime_robust,
)
from data_pipeline_demo_spark.sinks.upsert import upsert_parquet

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# grammar of the reference's money feed: optional sign/$, thousands groups
money_strings = st.one_of(
    st.builds(
        lambda sign, dollar, whole, cents: f"{sign}{dollar}{whole}.{cents:02d}",
        st.sampled_from(["", "-"]),
        st.sampled_from(["", "$"]),
        st.integers(0, 10**9).map(lambda n: f"{n:,}"),
        st.integers(0, 99),
    ),
    st.sampled_from(["", "nan", "NaN", "none", "NULL", " "]),
)

garbage = st.text(max_size=20)


@given(st.lists(money_strings, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_clean_money_roundtrips_grammar(spark, raws):
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = [r["v"] for r in df.select(clean_money("raw").alias("v")).collect()]
    for raw, v in zip(raws, got):
        t = raw.strip()
        if t.lower() in ("", "nan", "none", "null"):
            assert v is None, (raw, v)
        else:
            assert v == float(re.sub(r"[$,]", "", t)), (raw, v)


@given(st.lists(garbage, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_cleaning_never_throws_on_garbage(spark, raws):
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    out = df.select(
        clean_money("raw").alias("m"),
        parse_datetime_robust("raw").alias("d"),
    ).collect()
    assert len(out) == len(raws)  # no exception is the property


@given(
    st.lists(
        st.datetimes(
            min_value=__import__("datetime").datetime(2000, 1, 1),
            max_value=__import__("datetime").datetime(2069, 12, 31, 23, 59),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_datetime_roundtrips_reference_formats(spark, dts):
    # render through the reference's primary day-first format, parse back
    raws = [d.strftime("%d/%m/%Y %H:%M") for d in dts]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = [r["d"] for r in df.select(parse_datetime_robust("raw").alias("d")).collect()]
    assert got == [d.date() for d in dts]


@given(
    st.dictionaries(
        st.integers(0, 50), st.floats(allow_nan=False, allow_infinity=False),
        min_size=1, max_size=20,
    ),
    st.dictionaries(
        st.integers(0, 50), st.floats(allow_nan=False, allow_infinity=False),
        min_size=1, max_size=20,
    ),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_upsert_idempotent_and_update_wins_property(spark, batch1, batch2):
    target = tempfile.mkdtemp(prefix="prop_upsert_") + "/t"
    try:
        b1 = spark.createDataFrame(list(batch1.items()), "id long, v double")
        b2 = spark.createDataFrame(list(batch2.items()), "id long, v double")
        upsert_parquet(spark, b1, target)
        n_once = upsert_parquet(spark, b1, target)  # re-delivery
        assert n_once == len(batch1)
        upsert_parquet(spark, b2, target)
        got = {r["id"]: r["v"] for r in spark.read.parquet(target).collect()}
        assert got == {**batch1, **batch2}  # update wins, inserts kept
    finally:
        shutil.rmtree(target.rsplit("/", 1)[0], ignore_errors=True)
