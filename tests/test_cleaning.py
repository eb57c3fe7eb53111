"""Unit tests for the reference-shaped cleaning spec (SURVEY.md §5.2):
currency cast incl. `$1,234.56`/negative/null/'nan', the reference's
datetime formats (data_pipeline.py:645-649) incl. unparseable → null,
abs normalization, blank-row diagnostic."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.functions.cleaning import (
    MONEY_COLS,
    clean_money,
    clean_transactions,
    parse_datetime_robust,
    qa_aggregates,
)


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("$1,234.56", 1234.56),
        ("-$12.00", -12.0),
        ("$-12.00", -12.0),
        ("12.5", 12.5),
        (" 99.90 ", 99.9),
        ("", None),
        ("nan", None),
        ("NaN", None),
        (None, None),
        ("garbage", None),
    ],
)
def test_clean_money(spark, raw, expected):
    out = (
        spark.createDataFrame([(raw,)], "v string")
        .select(clean_money("v").alias("r"))
        .collect()[0]["r"]
    )
    assert out == expected


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        # the reference's observed formats (data_pipeline.py:644-650)
        ("30/04/2025 19:36", dt.date(2025, 4, 30)),
        ("12/4/25 20:46", dt.date(2025, 4, 12)),
        ("9/4/25 9:56", dt.date(2025, 4, 9)),
        ("01/02/2024", dt.date(2024, 2, 1)),  # day-first
        ("7/3/2024", dt.date(2024, 3, 7)),
        ("nan", None),
        ("", None),
        ("not a date", None),
        (None, None),
    ],
)
def test_parse_datetime_robust(spark, raw, expected):
    out = (
        spark.createDataFrame([(raw,)], "v string")
        .select(parse_datetime_robust("v").alias("r"))
        .collect()[0]["r"]
    )
    assert out == expected


def test_clean_transactions_full_row(spark):
    cols = ["id", "TransactionDatetime", *MONEY_COLS]
    dirty = ["10001", "30/04/2025 19:36"] + ["$1,000.50"] * 11
    dirty[cols.index("MSF")] = "-$5.00"  # MSF must abs-normalize
    blank = ["10002", "nan"] + [""] * 11
    df = spark.createDataFrame(
        [tuple(dirty), tuple(blank)], ", ".join(f"{c} string" for c in cols)
    )
    out = clean_transactions(df).orderBy("id").collect()
    row = out[0]
    assert row["Amount"] == 1000.5
    assert row["MSF"] == 5.0  # abs applied (data_pipeline.py:406)
    assert row["TransactionDatetime"] == dt.date(2025, 4, 30)
    assert row["_all_money_null"] is False
    assert out[1]["_all_money_null"] is True  # blank-row diagnostic (P2)

    qa = qa_aggregates(clean_transactions(df)).collect()[0]
    assert qa["n_rows"] == 2
    assert qa["n_blank_rows"] == 1
    assert qa["checksum_total"] == 1000.5
    assert qa["n_dates_parsed"] == 1
    assert qa["date_min"] == dt.date(2025, 4, 30)


def test_clean_is_single_projection(spark):
    """The whole cleaning stage must collapse into the scan projection —
    no exchange, no extra stages (scale guarantee)."""
    cols = ["id", "TransactionDatetime", *MONEY_COLS]
    df = spark.createDataFrame(
        [tuple(["1", "1/1/2024"] + ["$1.00"] * 11)],
        ", ".join(f"{c} string" for c in cols),
    )
    plan = clean_transactions(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_normalize_text_unicode_fixtures(spark):
    """NFC composition, control strip, whitespace collapse — fixtures
    chosen so the pre-NFC forms are byte-DIFFERENT but canonically
    equal (the dedup-relevant case)."""
    import pyspark.sql.functions as F

    from data_pipeline_demo_spark.functions.cleaning import normalize_text

    nfd_cafe = "café"  # e + combining acute: NFD spelling
    rows = [
        (1, nfd_cafe),
        (2, "café"),  # precomposed: NFC spelling of the same word
        (3, "a\x07b\x00c"),  # BEL and NUL stripped, letters joined
        (4, "  lots\t\tof   space\n\n"),
        (5, None),
        (6, "Å"),  # ANGSTROM SIGN: NFC maps to U+00C5 (Å)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["t"]
        for r in df.select("id", normalize_text("text").alias("t")).collect()
    }
    assert got[1] == got[2] == "café"  # canonical equivalence unified
    assert got[3] == "abc"
    assert got[4] == "lots of space"
    assert got[5] is None
    assert got[6] == "\u00c5"

    # exact dedup now sees doc 1 and doc 2 as the same content
    n = (
        df.filter(F.col("text").isNotNull())
        .select(normalize_text("text").alias("t"))
        .distinct()
        .count()
    )
    assert n == 4
