"""Scalar-function surface: the reference's ETL transforms (F1-F7) recast
as declarative column expressions, plus string/date/math/conditional/JSON
coverage (SURVEY.md §2.2).

The reference's core cleaning ops — currency strip+cast
(`/root/reference/data_pipeline.py:372-377`), literal-'nan' guard
(`:638-641`), multi-format day-first datetime parse (`:636-663`), abs
normalization (`:406`) — are exercised here on shared tables by
round-tripping: render a messy string deterministically in BOTH engines,
then clean it with the engine's cast expressions. Everything is built-in
(JVM, whole-stage codegen) — zero Python UDFs.

Spark 4 runs ANSI mode by default, so all fallible parses use the
``try_``-family functions (`try_to_date`, `try_cast`) — unparseable input
yields null, matching the reference's NaT semantics without its
type-inconsistency bug (SURVEY.md §2.1 F3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import strip_html
from ..functions.numeric import sql_sum
from ..sources.tables import table
from .registry import register


@register(
    "q27_currency_cast",
    oracle=f"""
    WITH messy AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN 'nan'
                  WHEN o_orderkey % 2 = 0
                    THEN '$' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
                  ELSE ' ' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || ' '
             END AS raw_price
      FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN LOWER(TRIM(raw_price)) IN ('nan', '')
                THEN NULL
                ELSE TRY_CAST(REGEXP_REPLACE(TRIM(raw_price), '[$,]', '', 'g') AS DOUBLE)
           END AS price,
           COUNT(*) OVER () AS n_total
    FROM messy
    """,
)
def q27_currency_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F7: money-string strip & cast with the literal-'nan' guard.

    The messy strings are synthesized identically in Spark and DuckDB
    (decimal-rendered price, some '$'-prefixed, some padded, some 'nan'),
    then cleaned by the engine's declarative cast expression:
    ``regexp_replace(trim(c), '[$,]', '').try_cast(double)``.
    """
    o = table(spark, sf_dir, "orders")
    rendered = F.col("o_totalprice").cast("decimal(18,2)").cast("string")
    messy = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("nan"))
        .when(F.col("o_orderkey") % 2 == 0, F.concat(F.lit("$"), rendered))
        .otherwise(F.concat(F.lit(" "), rendered, F.lit(" ")))
        .alias("raw_price"),
    )
    cleaned = F.when(
        F.lower(F.trim(F.col("raw_price"))).isin("nan", ""), F.lit(None)
    ).otherwise(
        F.regexp_replace(F.trim(F.col("raw_price")), r"[$,]", "").try_cast("double")
    )
    # n_total is a 1-row aggregate broadcast back onto every row — never
    # an empty-partition window, which would funnel the whole table
    # through a single task just to stamp a constant.
    totals = messy.agg(F.count(F.lit(1)).alias("n_total"))
    return messy.select("o_orderkey", cleaned.alias("price")).crossJoin(
        F.broadcast(totals)
    )


@register(
    "q28_robust_date_parse",
    oracle="""
    WITH messy AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0 THEN 'not a date'
                  WHEN o_orderkey % 2 = 0
                    THEN strftime(o_orderdate, '%d/%m/%Y %H:%M')
                  ELSE strftime(o_orderdate, '%d/%m/%y %H:%M')
             END AS raw_dt
      FROM messy_src
    ),
    -- DuckDB's %y uses the POSIX 1969 pivot (97 → 1997); Spark's 'yy' is
    -- base-2000 (97 → 2097). The oracle replays the branch explicitly and
    -- shifts pre-2000 results forward a century to match Spark.
    parsed AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0 THEN NULL
                  WHEN o_orderkey % 2 = 0 THEN try_strptime(raw_dt, '%d/%m/%Y %H:%M')
                  ELSE CASE
                    WHEN EXTRACT(YEAR FROM try_strptime(raw_dt, '%d/%m/%y %H:%M')) < 2000
                    THEN try_strptime(raw_dt, '%d/%m/%y %H:%M') + INTERVAL 100 YEAR
                    ELSE try_strptime(raw_dt, '%d/%m/%y %H:%M')
                  END
             END AS p
      FROM messy
    )
    SELECT o_orderkey, CAST(p AS DATE) AS order_date,
           EXTRACT(YEAR FROM p) AS order_year,
           EXTRACT(MONTH FROM p) AS order_month,
           EXTRACT(DAY FROM p) AS order_dom,
           EXTRACT(QUARTER FROM p) AS order_quarter,
           CAST(p AS DATE) + INTERVAL 30 DAY AS due_date,
           date_diff('day', CAST(p AS DATE), DATE '2002-01-01') AS days_to_2002,
           date_diff('month', CAST(p AS DATE), DATE '2002-01-01') AS months_to_2002,
           last_day(CAST(p AS DATE)) AS eom,
           CAST(date_trunc('month', p) AS DATE) AS month_start
    FROM parsed
    """.replace("messy_src", "orders"),
)
def q28_robust_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3+F4: multi-format day-first datetime parse → date truncation,
    plus the date-function surface (extract/add/diff/last_day/trunc —
    consolidated from the former q30 for the 50-entry gate) applied to
    the parsed timestamp; unparseable rows null-propagate through every
    derived column.

    Mirrors `convert_datetime_robust_main` (data_pipeline.py:636-663) as a
    single coalesce of format attempts — always DateType, unparseable →
    null (deliberately NOT replicating the reference's string-vs-Timestamp
    return-type bug, SURVEY.md §2.1 F3).
    """
    o = table(spark, sf_dir, "orders")
    messy = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 89 == 0, F.lit("not a date"))
        .when(
            F.col("o_orderkey") % 2 == 0,
            F.date_format("o_orderdate", "dd/MM/yyyy HH:mm"),
        )
        .otherwise(F.date_format("o_orderdate", "dd/MM/yy HH:mm"))
        .alias("raw_dt"),
    )
    parsed = F.coalesce(
        F.try_to_timestamp(F.col("raw_dt"), F.lit("dd/MM/yyyy HH:mm")),
        F.try_to_timestamp(F.col("raw_dt"), F.lit("dd/MM/yy HH:mm")),
    )
    od = parsed.cast("date")
    return messy.select(
        "o_orderkey",
        od.alias("order_date"),
        F.year(parsed).cast("long").alias("order_year"),
        F.month(parsed).cast("long").alias("order_month"),
        F.dayofmonth(parsed).cast("long").alias("order_dom"),
        F.quarter(parsed).cast("long").alias("order_quarter"),
        F.date_add(od, 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), od).cast("long").alias("days_to_2002"),
        F.months_between(
            F.date_trunc("month", F.lit("2002-01-01").cast("date")),
            F.date_trunc("month", od),
        ).cast("long").alias("months_to_2002"),
        F.last_day(od).alias("eom"),
        F.date_trunc("month", parsed).cast("date").alias("month_start"),
    )


@register(
    "q29_string_math_fns",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           LENGTH(c_name) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CONCAT_WS('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS tagged,
           REPLACE(c_name, '#', '-') AS name_dashed,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           STRPOS(c_name, '#') AS hash_pos,
           LEN(STRING_SPLIT(c_name, '#')) AS n_parts,
           TRIM(' ' || c_mktsegment || ' ') AS seg_trim,
           LEVENSHTEIN(c_mktsegment, 'MACHINERY') AS seg_edit_dist,
           TRANSLATE(c_name, '#0', '_O') AS name_translated,
           REVERSE(c_mktsegment) AS seg_reversed,
           REPEAT('ab', CAST(c_custkey % 3 AS INT)) AS ab_repeated,
           ABS(c_acctbal) AS abs_bal,
           ROUND(c_acctbal, 1) AS bal_round1,
           CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
           CAST(CEIL(c_acctbal) AS BIGINT) AS bal_ceil,
           SQRT(ABS(c_acctbal)) AS bal_sqrt,
           c_custkey % 10 AS key_mod,
           CAST(SIGN(c_acctbal) AS DOUBLE) AS bal_sign,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 1000 THEN 'low'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           GREATEST(c_acctbal, 0.0) AS bal_pos,
           LEAST(c_acctbal, 9999.0) AS bal_capped
    FROM customer
    """,
)
def q29_string_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + math/conditional scalar coverage in one scan over
    customer (consolidated from the former q29/q31 for the 50-entry
    gate). Includes F2's conditional abs (data_pipeline.py:406) —
    `abs`/`sign`/`greatest` replace the reference's row-at-a-time
    `apply(lambda)` with codegen'd expressions."""
    c = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string")).alias("tagged"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
        F.size(F.split("c_name", "#")).cast("long").alias("n_parts"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("MACHINERY")).cast("long").alias("seg_edit_dist"),
        F.translate(F.col("c_name"), "#0", "_O").alias("name_translated"),
        F.reverse(F.col("c_mktsegment")).alias("seg_reversed"),
        F.repeat(F.lit("ab"), (F.col("c_custkey") % 3).cast("int")).alias("ab_repeated"),
        F.abs(bal).alias("abs_bal"),
        F.round(bal, 1).alias("bal_round1"),
        F.floor(bal).alias("bal_floor"),
        F.ceil(bal).alias("bal_ceil"),
        F.sqrt(F.abs(bal)).alias("bal_sqrt"),
        (F.col("c_custkey") % 10).alias("key_mod"),
        F.signum(bal).alias("bal_sign"),
        F.when(bal < 0, "overdrawn").when(bal < 1000, "low").otherwise("high").alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias("seg_or_other"),
        F.greatest(bal, F.lit(0.0)).alias("bal_pos"),
        F.least(bal, F.lit(9999.0)).alias("bal_capped"),
    )


@register(
    "q32_json_ops",
    oracle="""
    SELECT 'agg' AS src,
           event_type AS s,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k,
           COUNT(*) AS n,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE) AS num
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
    GROUP BY event_type
    UNION ALL
    SELECT 'roundtrip' AS src,
           json_extract_string(doc, '$.status') AS s,
           CAST(json_extract_string(doc, '$.k') AS BIGINT) AS k,
           CAST(NULL AS BIGINT) AS n,
           CAST(json_extract_string(doc, '$.price') AS DOUBLE) AS num
    FROM (
      SELECT to_json(struct_pack(
               k := o_orderkey,
               price := o_totalprice,
               status := o_orderstatus
             )) AS doc
      FROM orders WHERE o_orderkey % 11 = 0
    )
    """,
)
def q32_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON surface in one registered query (the former
    q32 extract + q58 round-trip, consolidated for the 50-entry gate),
    unioned under a common (src, s, k, n, num) schema.

    Arm 'agg': typed extraction from events.props via from_json
    (schema'd, vectorized) — the engine's path for JSON props at scale;
    get_json_object is equivalent for one-off path access.

    Arm 'roundtrip': F6, JSON encoding with type coercion (the
    reference's NanHandlingEncoder, data_pipeline.py:491-497) → typed
    re-extraction. Each engine builds ITS OWN JSON (`to_json(struct())`
    vs `struct_pack`) — formatting differs, but both emit
    round-trip-safe doubles, so the typed values extracted back must
    agree exactly.
    """
    ev = table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    agg = (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("k2"),
            F.count(F.lit(1)).alias("n"),
            F.max("k").cast("double").alias("num"),
        )
        .select(
            F.lit("agg").alias("src"),
            F.col("event_type").alias("s"),
            F.col("k2").alias("k"),
            "n",
            "num",
        )
    )
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    parsed = F.from_json("doc", "k BIGINT, price DOUBLE, status STRING")
    roundtrip = o.select(doc.alias("doc")).select(
        F.lit("roundtrip").alias("src"),
        parsed.getField("status").alias("s"),
        parsed.getField("k").alias("k"),
        F.lit(None).cast("long").alias("n"),
        parsed.getField("price").alias("num"),
    )
    return agg.unionByName(roundtrip)


_DUCK_UNESCAPE = (
    "TRIM(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE("
    "REGEXP_REPLACE({x}, '<[^>]+>', '', 'g'),"
    " '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''),"
    " '&nbsp;', ' '), '&amp;', '&'))"
)


@register(
    "q53_html_extract",
    oracle=f"""
    WITH rendered AS (
      SELECT doc_id,
             '<html><body><h1>' || source || '</h1><p>'
               || REPLACE(text, 'the', '&amp;the&nbsp;')
               || '</p><br/></body></html>' AS raw_html
      FROM documents
    )
    SELECT doc_id,
           {_DUCK_UNESCAPE.format(x='raw_html')} AS body_text,
           LENGTH({_DUCK_UNESCAPE.format(x='raw_html')}) AS n_chars_text
    FROM rendered
    """,
)
def q53_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: HTML body text extraction (`extract_inner_text`,
    data_pipeline.py:133-137, :163-168). The messy HTML is synthesized
    identically in Spark and DuckDB (tags + entity-bearing text), then
    extracted by the engine's declarative strip: tag regex → entity
    decode → trim, all whole-stage codegen."""
    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("<html><body><h1>"),
        F.col("source"),
        F.lit("</h1><p>"),
        F.replace(F.col("text"), F.lit("the"), F.lit("&amp;the&nbsp;")),
        F.lit("</p><br/></body></html>"),
    )
    rendered = d.select("doc_id", raw.alias("raw_html"))
    return rendered.select(
        "doc_id",
        strip_html("raw_html").alias("body_text"),
        F.length(strip_html("raw_html")).cast("long").alias("n_chars_text"),
    )


@register(
    "q33_binary_ops",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS text_md5,
           substring(md5(text), 1, 8) AS md5_prefix
    FROM documents
    WHERE doc_id % 3 = 0
    """,
)
def q33_binary_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: utf-8 encode → byte length + content hash.
    The same pattern (binary payload + derived metadata columns) carries
    the multimodal image/audio columns (operators/multimodal.py)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    blob = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.length(blob).cast("long").alias("n_bytes"),
        F.md5(blob).alias("text_md5"),
        F.substring(F.md5(blob), 1, 8).alias("md5_prefix"),
    )


# --- q74: payments-grade DECIMAL money path (registered past the
# 50-entry gate in plans/approx.py; tools/check_oracle.py verifies) ---

Q74_ORACLE = """
WITH messy AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey % 97 = 0 THEN 'nan'
              WHEN o_orderkey % 3 = 0
                THEN '$' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
              ELSE ' ' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || ' '
         END AS raw_price
  FROM orders
), cleaned AS (
  SELECT o_orderpriority,
         CASE WHEN LOWER(TRIM(raw_price)) IN ('nan', '')
              THEN NULL
              ELSE TRY_CAST(REGEXP_REPLACE(TRIM(raw_price), '[$,]', '', 'g') AS DECIMAL(18,2))
         END AS price
  FROM messy
)
SELECT o_orderpriority,
       CAST(SUM(price) AS DOUBLE) AS total_amount,
       COUNT(price) AS n_priced,
       CAST(MIN(price) AS DOUBLE) AS min_price,
       CAST(MAX(price) AS DOUBLE) AS max_price
FROM cleaned
GROUP BY o_orderpriority
"""


def q74_decimal_money_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 payments-grade variant (SURVEY §1.3 deferral, implemented):
    the same messy money strings as q27, cleaned through
    ``clean_money_decimal`` onto ``DECIMAL(18,2)`` and aggregated at
    cent precision — sum/min/max are EXACT decimal arithmetic on both
    engines (Spark widens the sum to decimal(28,2), DuckDB to
    decimal(38,2); both are exact). The money outputs are final-cast to
    ``double`` AFTER the exact aggregation on both engines: the driver's
    value hash is type-sensitive (round-7 burn — identical values, red
    gate on DECIMAL output), and a single exact-decimal→double cast per
    aggregated cell is lossless for these magnitudes while keeping the
    summation itself order-independent.

    Scale shape: one codegen'd scan projection + a partial-aggregated
    groupBy on a 5-value key — the cleaning is free with the read, the
    shuffle carries 5 rows per partition.
    """
    from ..functions.cleaning import clean_money_decimal

    o = table(spark, sf_dir, "orders")
    rendered = F.col("o_totalprice").cast("decimal(18,2)").cast("string")
    messy = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("nan"))
        .when(F.col("o_orderkey") % 3 == 0, F.concat(F.lit("$"), rendered))
        .otherwise(F.concat(F.lit(" "), rendered, F.lit(" ")))
        .alias("raw_price"),
    )
    cleaned = messy.select(
        "o_orderpriority", clean_money_decimal("raw_price").alias("price")
    )
    return cleaned.groupBy("o_orderpriority").agg(
        F.sum("price").cast("double").alias("total_amount"),
        F.count("price").alias("n_priced"),
        F.min("price").cast("double").alias("min_price"),
        F.max("price").cast("double").alias("max_price"),
    )


_DUCK_VARIANT = """
    SELECT event_type,
           MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS k_min,
           MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS k_max,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
             AS k_sum,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN NOT json_valid('}' || COALESCE(props, ''))
                         THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bad
    FROM events
    GROUP BY event_type
"""


def q106_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: ``parse_json`` → binary variant →
    typed ``variant_get`` path extraction, plus ``try_parse_json``
    null-tolerance on deliberately corrupted JSON (leading brace;
    Spark's parser tolerates TRAILING junk after a complete value, so
    the corruption must precede it) —
    the open-schema semi-structured path that complements q32's
    schema'd ``from_json``. Variant parses once into a binary form and
    every path access is a cheap binary probe, the engine-grade answer
    to repeated ``get_json_object`` string re-parsing; the final
    projection carries only typed columns (variant never crosses the
    result boundary, so the oracle hash stays engine-neutral)."""
    ev = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    # NULL props count as corrupt on BOTH engines: without the
    # coalesce, Spark's concat propagates NULL (counted bad) while the
    # oracle's json_valid(NULL) CASE yields 0 — a latent cross-engine
    # divergence a data-gen change would expose (round-6 advisor
    # finding)
    bad = F.try_parse_json(
        F.concat(F.lit("}"), F.coalesce(F.col("props"), F.lit("")))
    )
    return ev.select("event_type", k.alias("k"), bad.alias("bad")).groupBy(
        "event_type"
    ).agg(
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.sum("k").cast("bigint").alias("k_sum"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("bad").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bad"),
    )
