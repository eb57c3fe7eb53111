"""Declarative cast-spec cleaning — the reference's ETL semantics as
reusable column expressions (SURVEY.md §2.1 F1-F7).

The reference cleans a dealer-transactions CSV imperatively
(`/root/reference/data_pipeline.py:352-459`); here the same semantics are
a declarative spec applied with ``withColumns`` so Catalyst folds the
whole cleaning stage into the scan projection (one codegen'd pass, no
intermediate materialization — at 100 TB cleaning is free with the read).

All fallible casts use ``try_``-functions (Spark 4 ANSI mode): bad input
→ null, never an aborted job; quarantine happens downstream (sinks).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The reference's 11 money columns (data_pipeline.py:372-375).
MONEY_COLS = (
    "Amount",
    "TotalAmount",
    "Surcharge",
    "MSF",
    "Tip",
    "Cashout",
    "Extras",
    "Levy",
    "ServiceFee",
    "TxnFee",
    "Rebate",
)

# Day-first formats the reference attempts (data_pipeline.py:644-650,
# deduplicated — the reference lists several twice).
DATETIME_FORMATS = (
    "dd/MM/yyyy HH:mm",
    "dd/MM/yy HH:mm",
    "d/M/yyyy H:mm",
    "d/M/yy H:mm",
    "dd/MM/yyyy",
    "d/M/yyyy",
)


def clean_money(c: Column | str) -> Column:
    """Currency string → double: strip $ and thousands separators, trim,
    treat ''/'nan' literals as null (F1+F7, data_pipeline.py:372-377,
    :638-641). `$1,234.56` → 1234.56, `-$12.00` → -12.0."""
    col = F.col(c) if isinstance(c, str) else c
    t = F.trim(col)
    return (
        F.when(F.lower(t).isin("", "nan", "none", "null"), F.lit(None))
        .otherwise(F.regexp_replace(t, r"[$,]", ""))
        .try_cast("double")
    )


def clean_money_decimal(
    c: Column | str, precision: int = 18, scale: int = 2
) -> Column:
    """Payments-grade variant of :func:`clean_money` (the SURVEY §1.3
    deferral, now implemented): identical strip/guard semantics, but
    the cast lands on ``DecimalType(precision, scale)`` — exact cent
    arithmetic with no binary-float drift, so sums of money columns
    are reproducible to the cent at any aggregation width (Spark
    widens sum(decimal(18,2)) to decimal(28,2) — still exact).

    ``float64`` (:func:`clean_money`) stays the default for reference
    parity (`/root/reference/data_pipeline.py:372-377` casts to float);
    this is the variant a payments deployment should pick. Values with
    more than ``scale`` fractional digits round half-up (Spark cast
    semantics); unparseable input → null, as everywhere else.
    """
    col = F.col(c) if isinstance(c, str) else c
    t = F.trim(col)
    return (
        F.when(F.lower(t).isin("", "nan", "none", "null"), F.lit(None))
        .otherwise(F.regexp_replace(t, r"[$,]", ""))
        .try_cast(f"decimal({precision},{scale})")
    )


def parse_datetime_robust(c: Column | str, formats: tuple[str, ...] = DATETIME_FORMATS) -> Column:
    """Multi-format day-first parse → DateType (F3+F4,
    data_pipeline.py:636-663). Always DateType; unparseable → null —
    deliberately NOT the reference's mixed str/Timestamp return.
    """
    col = F.col(c) if isinstance(c, str) else c
    t = F.trim(col)
    guarded = F.when(F.lower(t).isin("", "nan"), F.lit(None)).otherwise(t)
    attempts = [F.try_to_timestamp(guarded, F.lit(fmt)) for fmt in formats]
    return F.coalesce(*attempts).cast("date")


# Minimal entity map for the JVM fast path; '&amp;' is decoded LAST so
# double-escaped input ('&amp;lt;') never re-materializes markup.
HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_html(c: Column | str) -> Column:
    """S3: HTML body → plain text (`extract_inner_text`,
    /root/reference/data_pipeline.py:163-168) as pure JVM expressions:
    strip tags, decode the common entities, trim. Runs in whole-stage
    codegen — no Python in the scan.

    For bs4-level fidelity (script/style elision, full entity table)
    use ``html_to_text_udf`` below; this declarative form is the path
    that survives a 100 TB scan.
    """
    col = F.col(c) if isinstance(c, str) else c
    out = F.regexp_replace(col, r"<[^>]+>", "")
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(out)


def html_to_text_udf() -> Column:
    """Arrow-batched pandas_udf seam for high-fidelity HTML extraction.

    Uses the stdlib ``html.unescape`` (full entity table). The reference
    uses BeautifulSoup (`data_pipeline.py:166-168`); this container has
    no bs4, so the tag strip is the same regex as the JVM path — swap
    the body for ``BeautifulSoup(s, "html.parser").get_text("\\n")`` in
    a deployment with bs4 available.
    """
    import re as _re
    from html import unescape as _unescape

    @F.pandas_udf("string")
    def _extract(s: pd.Series) -> pd.Series:
        # \xa0 -> ' ' : html.unescape renders &nbsp; as U+00A0; the
        # engine normalizes to plain space (tokenizers downstream split
        # on ASCII whitespace), keeping both extraction paths identical.
        return s.map(
            lambda v: None
            if v is None
            else _unescape(_re.sub(r"<[^>]+>", "", v)).replace("\xa0", " ").strip()
        )

    return _extract


def abs_normalize(c: Column | str) -> Column:
    """Force-positive normalization (F2, data_pipeline.py:406): the
    reference's `apply(lambda x: abs(x) if x < 0 else x)` is just abs."""
    col = F.col(c) if isinstance(c, str) else c
    return F.abs(col)


def all_null_flag(cols: tuple[str, ...]) -> Column:
    """Blank-row diagnostic (P2, data_pipeline.py:383-398): true when
    every listed column is null."""
    from functools import reduce
    from operator import and_

    return reduce(and_, [F.col(c).isNull() for c in cols])


def clean_transactions(
    df: DataFrame,
    money_cols: tuple[str, ...] = MONEY_COLS,
    datetime_col: str = "TransactionDatetime",
    abs_cols: tuple[str, ...] = ("MSF",),
) -> DataFrame:
    """The reference's full transform stage (EP3, data_pipeline.py:352-459)
    as one declarative pass:

    money casts → robust date parse → abs normalization → blank-row flag.
    Input columns may be missing (partial feeds): only present columns are
    touched.
    """
    present = set(df.columns)
    updates: dict[str, Column] = {}
    for c in money_cols:
        if c in present:
            updates[c] = clean_money(c)
    for c in abs_cols:
        if c in present and c in money_cols:
            updates[c] = abs_normalize(clean_money(c))
    if datetime_col in present:
        updates[datetime_col] = parse_datetime_robust(datetime_col)
    out = df.withColumns(updates)
    flag_cols = tuple(c for c in money_cols if c in present)
    if flag_cols:
        out = out.withColumn("_all_money_null", all_null_flag(flag_cols))
    return out


def _qa_agg_exprs(df: DataFrame, checksum_col: str, date_col: str) -> list[Column]:
    from .numeric import exact_sum

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if "_all_money_null" in df.columns:
        aggs.append(
            F.sum(F.col("_all_money_null").cast("int")).cast("long").alias("n_blank_rows")
        )
    if checksum_col in df.columns:
        aggs.append(exact_sum(checksum_col).alias("checksum_total"))
    if date_col in df.columns:
        aggs += [
            F.count(date_col).alias("n_dates_parsed"),
            (F.count(F.lit(1)) - F.count(date_col)).alias("n_dates_null"),
            F.min(date_col).alias("date_min"),
            F.max(date_col).alias("date_max"),
        ]
    return aggs


def qa_aggregates(df: DataFrame, checksum_col: str = "TotalAmount", date_col: str = "TransactionDatetime") -> DataFrame:
    """The reference's inline QA (A1-A4, data_pipeline.py:397-402,
    :689-701) as one aggregate row: row count, blank count, checksum,
    null/non-null conversion counts, date range."""
    return df.agg(*_qa_agg_exprs(df, checksum_col, date_col))


def qa_aggregates_by(
    df: DataFrame,
    group_col: str,
    checksum_col: str = "TotalAmount",
    date_col: str = "TransactionDatetime",
) -> DataFrame:
    """Per-group QA (one row per source file in the batched ingest) —
    the same aggregate list keyed by ``group_col``, so N files cost one
    grouped pass instead of N single-row agg jobs."""
    return df.groupBy(group_col).agg(*_qa_agg_exprs(df, checksum_col, date_col))


_CTRL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def nfc_normalize_udf():
    """Arrow-batched Unicode NFC normalization (stdlib ``unicodedata``)
    — the canonical-composition step JVM expressions cannot express.
    Per-batch memoization: word-soup corpora re-normalize each distinct
    string once per batch, not per row."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        cache: dict = {}

        def one(x):
            if x is None:
                return None
            got = cache.get(x)
            if got is None:
                got = cache[x] = unicodedata.normalize("NFC", x)
            return got

        return s.map(one)

    return _nfc


def normalize_text(c: Column | str) -> Column:
    """Pretraining-grade text canonicalization: Unicode NFC (so visually
    identical strings hash/dedup identically — composed é vs e +
    combining accent), control-character strip (C0 minus \\t \\n \\r,
    plus DEL), whitespace collapse to single spaces, trim. NFC is the
    one Python step (Arrow-batched, memoized); everything after runs in
    whole-stage codegen. DuckDB mirrors it exactly via
    ``nfc_normalize`` + the same regexes (q82's oracle)."""
    col = F.col(c) if isinstance(c, str) else c
    out = nfc_normalize_udf()(col)
    out = F.regexp_replace(out, _CTRL_CLASS, "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)
