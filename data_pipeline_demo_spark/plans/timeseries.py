"""Event-time operators over the `events` stream table (SURVEY.md §2.2).

These are the *batch-equivalent* forms of the engine's Structured
Streaming jobs (streaming/jobs.py) so every operator is oracle-checkable:
`F.window`/`F.session_window` produce identical results in batch and
streaming modes, which is exactly how Spark recommends validating
streaming logic. Watermark/late-data semantics are exercised in the
streaming tests; here the same aggregations run over the full history.

Scale: windowed aggs shuffle once on (window, key); session windows add a
per-key sort. Both stream at 100 TB given partitioning by key — no global
ordering is ever required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import exact_sum, sql_sum
from ..sources.tables import table
from .registry import register


@register(
    "q34_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_sum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q34_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window — identical code path to the streaming
    job (readStream → withWatermark → groupBy(window(...)))."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q35_sliding_window",
    oracle="""
    WITH buckets AS (
      -- a 30-min-slide / 1-hour-width window: each event lands in 2 slides
      SELECT user_id,
             time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP))
               - INTERVAL (30 * s.off) MINUTE AS window_start
      FROM events, (SELECT 0 AS off UNION ALL SELECT 1) s
    )
    SELECT window_start, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM buckets
    GROUP BY window_start
    """,
)
def q35_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h width, 30m slide): Spark expands each event into
    width/slide windows before the shuffle — the oracle replays that
    expansion with an explicit 2-row cross join."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("window.start").alias("window_start"), "n_events", "n_users")
    )


@register(
    "q36_session_window",
    oracle="""
    -- gaps-and-islands replay of session_window(ts, '30 minutes')
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_event,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sess_id
    """,
)
def q36_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) via the native
    session_window operator — the streaming-capable form of
    gaps-and-islands. session_window.end is exclusive (last event + gap),
    so last_event is aggregated explicitly for oracle parity."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "last_event", "n_events")
    )


@register(
    "q37_event_dedup",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n FROM (
      SELECT DISTINCT ON (user_id, event_type,
                          time_bucket(INTERVAL 1 MINUTE, CAST(ts AS TIMESTAMP)))
             user_id, event_type
      FROM events
      ORDER BY user_id, event_type,
               time_bucket(INTERVAL 1 MINUTE, CAST(ts AS TIMESTAMP))
    ) GROUP BY user_id, event_type
    """,
)
def q37_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup analog (dropDuplicatesWithinWatermark in streaming):
    collapse replays of the same (user, type) within a 1-minute bucket."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn("minute_bucket", F.date_trunc("minute", "ts"))
        .dropDuplicates(["user_id", "event_type", "minute_bucket"])
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q38_asof_join",
    oracle="""
    -- for each 'purchase', the user's most recent prior 'signup' or 'click'
    WITH purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS tts, value
      FROM events WHERE event_type IN ('signup', 'click')
    )
    SELECT p.event_id, p.user_id,
           (SELECT MAX(t.tts) FROM touches t
            WHERE t.user_id = p.user_id AND t.tts <= p.pts) AS last_touch_ts
    FROM purchases p
    """,
)
def q38_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (the reference lacks it; core time-series op): composed
    from a union + window max-so-far instead of a per-row subquery — one
    shuffle on user_id, linear scan, no O(n·m) probe. At 100 TB this is
    the canonical pattern: interleave both streams, carry state forward."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts")
    )
    touches = ev.filter(F.col("event_type").isin("signup", "click")).select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    # Interleave: touches sort before purchases at the same timestamp
    # (<= semantics). is_touch=1 rows carry their ts as touch_ts.
    merged = purchases.withColumn("is_purchase", F.lit(1)).unionByName(
        touches.withColumn("is_purchase", F.lit(0))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("pts"), F.col("is_purchase"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch_ts = F.when(F.col("is_purchase") == 0, F.col("pts"))
    return (
        merged.withColumn("last_touch_ts", F.max(touch_ts).over(w))
        .filter(F.col("is_purchase") == 1)
        .select("event_id", "user_id", "last_touch_ts")
    )


@register(
    "q39_event_funnel",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS t_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signed_up,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_purchase > t_signup
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM stages
    """,
)
def q39_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: conditional-min pivot per user then one global rollup —
    a single shuffle on user_id regardless of event volume."""
    ev = table(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_signup").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_signed_up"),
        F.sum(
            F.when(
                F.col("t_signup").isNotNull()
                & (F.col("t_purchase") > F.col("t_signup")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_converted"),
    )


# --------------------------------------------------------------------------
# Hypertable rollup cascade (north-star custom operator; operators/rollup.py)
# --------------------------------------------------------------------------
_DUCK_ROLLUP_DAY = f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n_events,
           {sql_sum('value')} AS sum_value,
           {sql_sum('value')} / COUNT(*) AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2
"""


@register("q65_rollup_cascade", oracle=_DUCK_ROLLUP_DAY)
def q65_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution continuous aggregate: minute→hour→day cascade
    where each tier re-aggregates the previous tier's decimal partials
    (the raw table is scanned ONCE). The day tier returned here equals
    the direct day aggregate bit-for-bit — decimal addition is
    associative — which is exactly what the oracle computes, so the
    cascade's exactness is itself oracle-checked."""
    from ..operators import rollup

    ev = table(spark, sf_dir, "events")
    cascade = rollup.rollup_cascade(ev)
    return rollup.finalize(cascade["day"])


# --------------------------------------------------------------------------
# Time-bucket gap-fill + LOCF (hypertable vocabulary; operators/rollup.py)
# --------------------------------------------------------------------------
_DUCK_GAPFILL = f"""
    WITH agg AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             {sql_sum('value')} AS bucket_sum
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM agg GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    )
    SELECT s.event_type, s.bucket,
           a.bucket IS NULL AS is_gap,
           last_value(a.bucket_sum IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS bucket_sum_filled
    FROM spine s LEFT JOIN agg a
      ON s.event_type = a.event_type AND s.bucket = a.bucket
"""


@register("q67_gapfill_locf", oracle=_DUCK_GAPFILL)
def q67_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly spine per event type with last-observation-carried-
    forward fill — `time_bucket_gapfill` + `locf`. The spine is generated
    distributed (sequence+explode per dim group); the fill is a per-group
    running window, never a global sort."""
    from ..operators import rollup

    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(exact_sum("value").alias("bucket_sum"))
    return rollup.gapfill_locf(agg, step="1 hour")


# --------------------------------------------------------------------------
# SCD Type-2 dimension build: collapse an event history into validity
# intervals (gaps-and-islands), the lakehouse pattern for "what was this
# entity's state at time T".
# --------------------------------------------------------------------------
_DUCK_SCD2 = """
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM marked
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           LEAD(ts) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q98_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from an append-only event history:
    per user, keep only rows where the tracked attribute actually
    changed (gaps-and-islands via LAG), then stamp each surviving state
    with a validity interval [valid_from, valid_to) via LEAD and an
    is_current flag — the standard slowly-changing-dimension shape a
    warehouse MERGE maintains, derived here in two window passes.

    Scale shape: both windows hash-partition by user_id only — per-user
    state is bounded by that user's change count, there is no global
    sort, and the two windows share one partitioning so Catalyst plans
    a single exchange. The total order (ts, event_id) makes the result
    deterministic under any parallelism; values are passed-through
    timestamps and strings, so the oracle hash-compare is exact.
    Registered past the driver cap in plans/approx.py (with oracle)."""
    return scd2_intervals(table(spark, sf_dir, "events"))


def scd2_intervals(ev: DataFrame) -> DataFrame:
    """The SCD2 build itself (shared by q98 and the point-in-time join
    q111): collapse per-user attribute runs via LAG, stamp
    [valid_from, valid_to) + version + is_current via LEAD/ROW_NUMBER."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy(*order)
    return changes.select(
        "user_id",
        "event_type",
        F.row_number().over(w2).cast("bigint").alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


_DUCK_COHORT = """
    WITH ua AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      FROM events
    ),
    coh AS (SELECT user_id, MIN(week) AS cohort_week FROM ua GROUP BY user_id)
    SELECT cohort_week,
           CAST(datediff('day', cohort_week, week) / 7 AS BIGINT)
             AS weeks_since,
           COUNT(DISTINCT ua.user_id) AS active_users
    FROM ua JOIN coh USING (user_id)
    GROUP BY 1, 2
"""


def q105_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the standard product-analytics rollup:
    users grouped by first-active week, activity counted per
    weeks-since-cohort offset. Three shuffles, all on user_id or the
    (cohort_week, weeks_since) cell grain: distinct user-weeks, the
    per-user MIN, and the final distinct-count — every intermediate is
    user- or cell-sized, never event-sized, and week arithmetic is
    integer-exact (aligned week starts differ by multiples of 7 days).
    Registered past the driver cap in plans/approx.py (with oracle)."""
    ev = table(spark, sf_dir, "events")
    ua = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort = ua.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ua.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("bigint")
            .alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


_DUCK_PIT = """
    WITH ctx AS (
      SELECT user_id, event_type, ts, event_id FROM events
      WHERE event_type <> 'purchase'
    ),
    marked AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM ctx
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM marked
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    dim AS (
      SELECT user_id, event_type AS context_state,
             ts AS valid_from,
             LEAD(ts) OVER w AS valid_to
      FROM changes
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p.event_id, p.user_id, p.ts, d.context_state
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN dim d
      ON d.user_id = p.user_id
     AND d.valid_from <= p.ts
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
"""


def q111_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against the SCD2 dimension: each
    purchase is attributed the user's context state — the last
    non-purchase activity run — valid AT the purchase timestamp
    ([valid_from, valid_to) containment). This is the lookup an SCD2
    dimension exists to serve ("what was this entity's state at T"),
    composed from the shared scd2_intervals build (q98) plus a
    half-open-interval join.

    Scale shape: the join is EQUALITY on user_id with the interval
    containment as a residual predicate — a plain hash join whose probe
    side is each user's interval list (bounded by that user's change
    count), not a cross product; intervals per user are disjoint by
    construction, so every purchase matches at most one row and the
    result is purchase-sized. Purchases before any context event keep
    a null state via the left join (no silent row loss)."""
    ev = table(spark, sf_dir, "events")
    dim = scd2_intervals(ev.filter(F.col("event_type") != "purchase")).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("context_state"),
        "valid_from",
        "valid_to",
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    cond = (
        (F.col("d_user") == F.col("user_id"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    )
    return purchases.join(dim, cond, "left").select(
        "event_id", "user_id", "ts", "context_state"
    )


_DUCK_ASOF_VARIANTS = """
    WITH purchases AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type IN ('signup', 'click')
    ),
    bw AS (
        SELECT p.event_id, p.user_id, p.ts, t.ts AS bw_ts
        FROM purchases p
        ASOF LEFT JOIN touches t
          ON p.user_id = t.user_id AND p.ts >= t.ts
    ),
    fw AS (
        SELECT p.event_id, t.ts AS fw_ts
        FROM purchases p
        ASOF LEFT JOIN touches t
          ON p.user_id = t.user_id AND p.ts <= t.ts
    )
    SELECT b.event_id, b.user_id, b.bw_ts, f.fw_ts,
           CASE
             WHEN b.bw_ts IS NULL THEN f.fw_ts
             WHEN f.fw_ts IS NULL THEN b.bw_ts
             WHEN (b.ts - b.bw_ts) <= (f.fw_ts - b.ts) THEN b.bw_ts
             ELSE f.fw_ts
           END AS nearest_ts
    FROM bw b JOIN fw f USING (event_id)
"""


def q130_asof_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL as-of join surface (operators/asof.py): backward,
    forward, and nearest temporal alignment of purchases against
    touch events, certified value-for-value against DuckDB's NATIVE
    ASOF JOIN in both directions (nearest composes from the two with
    the backward tie-break) — the pandas merge_asof / kdb aj surface
    as one union-interleave + two windows per direction, one shuffle
    on the key, never a range probe."""
    from ..operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    touches = ev.filter(
        F.col("event_type").isin("signup", "click")
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    bw = asof_join(purchases, touches, direction="backward").select(
        "event_id", "user_id", F.col("asof_ts").alias("bw_ts")
    )
    fw = asof_join(purchases, touches, direction="forward").select(
        F.col("event_id").alias("event_id_f"), F.col("asof_ts").alias("fw_ts")
    )
    nr = asof_join(purchases, touches, direction="nearest").select(
        F.col("event_id").alias("event_id_n"),
        F.col("asof_ts").alias("nearest_ts"),
    )
    return (
        bw.join(fw, bw.event_id == fw.event_id_f)
        .join(nr, bw.event_id == nr.event_id_n)
        .select("event_id", "user_id", "bw_ts", "fw_ts", "nearest_ts")
    )


_DUCK_INTERVAL_OVERLAP = """
    WITH iv AS (
        SELECT o_orderkey AS id,
               CAST(o_orderdate AS TIMESTAMP) AS start_ts,
               CAST(o_orderdate AS TIMESTAMP)
                 + INTERVAL (o_orderkey % 30) DAY AS end_ts
        FROM orders WHERE o_orderkey < 2500
    )
    SELECT a.id AS id_a, b.id AS id_b,
           GREATEST(a.start_ts, b.start_ts) AS overlap_start,
           LEAST(a.end_ts, b.end_ts) AS overlap_end
    FROM iv a JOIN iv b
      ON a.id < b.id
     AND a.start_ts <= b.end_ts
     AND b.start_ts <= a.end_ts
"""


def q131_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap self-join over order validity windows
    (operators/intervals.py) vs the all-pairs inequality-join oracle —
    certifies both the bucket blocking's completeness AND the
    emit-once-at-overlap-start trick (no dedup exchange) value-for-
    value. Unit = 30 days (the max interval length), so each interval
    stamps at most 2 buckets."""
    from ..operators.intervals import interval_overlap_join

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2500)
    iv = o.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderdate").cast("timestamp").alias("start_ts"),
        (
            F.col("o_orderdate").cast("timestamp")
            + F.make_dt_interval(days=(F.col("o_orderkey") % 30).cast("int"))
        ).alias("end_ts"),
    )
    a = iv.select(
        F.col("id").alias("id_a"), "start_ts", "end_ts"
    )
    b = iv.select(
        F.col("id").alias("id_b"), "start_ts", "end_ts"
    )
    return interval_overlap_join(
        a, b, unit_seconds=30 * 86400
    ).filter(F.col("id_a") < F.col("id_b"))


_FUNNEL_SEQ_SQL = """
    WITH s1 AS (
        SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
        GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
           CAST(CASE WHEN s3.t3 IS NOT NULL
                      AND s3.t3 <= s1.t1 + INTERVAL 7 DAY
                     THEN 1 ELSE 0 END AS BIGINT) AS converted_7d
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s2.user_id = s3.user_id
"""


def q132_funnel_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED multi-step funnel (signup → first click AFTER it →
    first purchase AFTER that, converted iff the chain closes within 7
    days) — the sequential-pattern query q39's unordered funnel can't
    express: each stage's timestamp must exceed the PREVIOUS stage's,
    so a purchase before the first post-signup click doesn't count.
    Identical SQL on both engines.

    Scale shape: three grouped MINs, each over the event scan filtered
    to one stage and semi-joined to user-sized prior-stage timestamps
    — every exchange is user-keyed and user-sized; Catalyst collapses
    the stage joins onto one user_id partitioning. The general K-step
    form is K chained user-sized joins, never a per-user sort or a
    pattern automaton over raw events."""
    for name in ("events",):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_FUNNEL_SEQ_SQL)


_DUCK_TWA = """
    WITH s AS (
        SELECT user_id, ts, value,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS nts,
               LEAD(value) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS nv
        FROM events
    ),
    seg AS (
        SELECT user_id,
               epoch(nts) - epoch(ts) AS dt,
               (value + nv) / 2 AS mv
        FROM s WHERE nts IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_seg,
           ROUND(SUM(mv * dt) / SUM(dt), 6) AS twa
    FROM seg
    GROUP BY user_id
    HAVING SUM(dt) > 0
"""


def q159_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of an irregularly-sampled value
    (TimescaleDB's ``time_weight('Linear')`` — trapezoidal
    integration): consecutive readings pair via LEAD over the
    event-time order (ties broken by event_id so both engines pair
    identically), each segment contributes mean(value_i, value_{i+1})
    × Δt, and the user's TWA is the weight-normalized sum. The naive
    plain AVG over-weights burst periods; this is the correct
    irregular-series mean a metrics platform serves.

    Scale shape: ONE window pass partitioned by user (no global sort),
    then a combinable per-user aggregate; durations come from
    timestamp→double epoch (identical on both engines, fractional
    seconds included). Zero-Δt segments carry zero weight by
    construction."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.col("ts").cast("double").alias("e"),
        "value",
        F.lead(F.col("ts").cast("double")).over(w).alias("ne"),
        F.lead("value").over(w).alias("nv"),
    ).filter(F.col("ne").isNotNull())
    seg = s.select(
        "user_id",
        (F.col("ne") - F.col("e")).alias("dt"),
        ((F.col("value") + F.col("nv")) / 2).alias("mv"),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_seg"),
            F.sum(F.col("mv") * F.col("dt")).alias("__num"),
            F.sum("dt").alias("__den"),
        )
        .filter(F.col("__den") > 0)
        .select(
            "user_id",
            "n_seg",
            F.round(F.col("__num") / F.col("__den"), 6).alias("twa"),
        )
    )


_DUCK_GAPFILL_INTERP = f"""
    WITH agg AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             {sql_sum('value')} AS bucket_sum
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM agg GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    ),
    marked AS (
      SELECT s.event_type, s.bucket,
             a.bucket IS NULL AS is_gap,
             CASE WHEN a.bucket IS NOT NULL
                  THEN epoch(s.bucket) END AS obs_t,
             CAST(a.bucket_sum AS DOUBLE) AS v
      FROM spine s LEFT JOIN agg a
        ON s.event_type = a.event_type AND s.bucket = a.bucket
    ),
    filled AS (
      SELECT event_type, bucket, is_gap,
             epoch(bucket) AS t,
             last_value(obs_t IGNORE NULLS) OVER wb AS t_prev,
             first_value(obs_t IGNORE NULLS) OVER wf AS t_next,
             last_value(v IGNORE NULLS) OVER wb AS v_prev,
             first_value(v IGNORE NULLS) OVER wf AS v_next
      FROM marked
      WINDOW
        wb AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wf AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket, is_gap,
           ROUND(v_prev + (v_next - v_prev)
                 * (CASE WHEN t_next = t_prev THEN 0.0
                         ELSE (t - t_prev) / (t_next - t_prev) END), 6)
               AS bucket_sum_interp
    FROM filled
"""


@register("q180_gapfill_interp", oracle=_DUCK_GAPFILL_INTERP)
def q180_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly spine with LINEAR interpolation across gaps —
    hypertable `interpolate()` beside q67's `locf()`: each absent
    bucket gets the time-weighted straight line between its nearest
    observations. The blend is straight-line double arithmetic over
    exact integer epoch seconds (no accumulation), rounded to 6 — the
    fill itself cannot drift across engines. Scale shape in
    operators/rollup.py:gapfill_interpolate (distributed spine, two
    per-group linear windows, one dim-grain shuffle)."""
    from ..operators import rollup

    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(exact_sum("value").alias("bucket_sum"))
    return rollup.gapfill_interpolate(agg, step="1 hour")


_DUCK_KAPLAN_MEIER = """
    WITH per_user AS (
      SELECT user_id,
             MIN(ts) AS first_ts,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                 AS purchase_ts,
             MAX(ts) AS last_ts
      FROM events
      GROUP BY user_id
    ),
    durations AS (
      SELECT DATEDIFF('day', first_ts,
                      COALESCE(purchase_ts, last_ts)) AS dur,
             CASE WHEN purchase_ts IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_user
    ),
    km AS (
      SELECT dur,
             SUM(ev) AS d,
             COUNT(*) - SUM(ev) AS c
      FROM durations
      GROUP BY dur
    ),
    risk AS (
      SELECT dur, d, c,
             SUM(d + c) OVER (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prior_gone,
             SUM(d + c) OVER () AS total
      FROM km
    ),
    terms AS (
      SELECT dur, d, c,
             total - COALESCE(prior_gone, 0) AS n_risk,
             CAST(ROUND(CASE WHEN d > 0
                             AND d < total - COALESCE(prior_gone, 0)
                      THEN ln(1.0 - CAST(d AS DOUBLE)
                              / (total - COALESCE(prior_gone, 0)))
                      ELSE 0.0 END, 10) AS DECIMAL(18,10)) AS logterm,
             CASE WHEN d = total - COALESCE(prior_gone, 0)
                  THEN 1 ELSE 0 END AS extinct
      FROM risk
    )
    SELECT CAST(dur AS BIGINT) AS duration_days,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           CASE WHEN MAX(extinct) OVER (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                THEN 0.0
                ELSE ROUND(exp(CAST(SUM(logterm) OVER (ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DOUBLE)), 6)
           END AS survival
    FROM terms
"""


@register("q181_kaplan_meier", oracle=_DUCK_KAPLAN_MEIER)
def q181_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over time-to-first-purchase per
    user, right-censored at the last observed event — the
    survival-analysis member of the experiment family (q121/q156/q157/
    q166): at each day t with d events among n at risk, S(t) multiplies
    by (1 - d/n).

    Determinism: the cumulative PRODUCT runs as exp(Σ log-terms) with
    each log term — a double ln of exact integer ratios — ROUNDED TO
    DECIMAL(18,10) before the cumulative sum, so the running product is
    an exact decimal accumulation in any evaluation order (the q179 IV
    convention applied to a window).

    Scale shape: one shuffle to user grain, then the KM table lives at
    distinct-duration grain (days — hundreds of rows at any corpus
    size), where the single-partition cumulative windows are free."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "purchase_ts"
        ),
        F.max("ts").alias("last_ts"),
    )
    durations = per_user.select(
        F.datediff(
            F.coalesce("purchase_ts", "last_ts"), F.col("first_ts")
        ).alias("dur"),
        F.when(F.col("purchase_ts").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    km = durations.groupBy("dur").agg(
        F.sum("ev").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).alias("c"),
    )
    w_prior = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy()
    risk = km.select(
        "dur",
        "d",
        "c",
        F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prior), F.lit(0)).alias(
            "prior_gone"
        ),
        F.sum(F.col("d") + F.col("c")).over(w_all).alias("total"),
    )
    n_risk = F.col("total") - F.col("prior_gone")
    logterm = (
        F.round(
            F.when(
                (F.col("d") > 0) & (F.col("d") < n_risk),
                F.log(F.lit(1.0) - F.col("d").cast("double") / n_risk),
            ).otherwise(F.lit(0.0)),
            10,
        )
    ).cast("decimal(18,10)")
    extinct = F.when(F.col("d") == n_risk, 1).otherwise(0)
    terms = risk.select(
        "dur",
        "d",
        "c",
        n_risk.alias("n_risk"),
        logterm.alias("logterm"),
        extinct.alias("extinct"),
    )
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # when the risk set empties (d = n at the last time), S drops to
    # exactly 0 — guarded (not ln(0)) on both engines
    return terms.select(
        F.col("dur").cast("bigint").alias("duration_days"),
        F.col("n_risk").cast("bigint").alias("n_at_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.col("c").cast("bigint").alias("n_censored"),
        F.when(F.max("extinct").over(w_cum) == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.sum("logterm").over(w_cum).cast("double")), 6)
        )
        .alias("survival"),
    )


_DUCK_ACF = """
    WITH daily AS (
      SELECT event_type,
             DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
             SUM(CAST(value AS DECIMAL(18,6))) AS x
      FROM events
      GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, g.lag, x,
             LAG(x, g.lag) OVER (
                 PARTITION BY event_type, g.lag ORDER BY day_idx
             ) AS x_lag
      FROM daily, UNNEST([1, 2, 3, 7]) AS g(lag)
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM daily
      GROUP BY event_type
    ),
    cross_sums AS (
      SELECT event_type, lag,
             COUNT(x_lag) AS m,
             CAST(SUM(CASE WHEN x_lag IS NOT NULL THEN x END)
                  AS DOUBLE) AS sa,
             CAST(SUM(CASE WHEN x_lag IS NOT NULL THEN x_lag END)
                  AS DOUBLE) AS sb,
             CAST(SUM(x * x_lag) AS DOUBLE) AS sab
      FROM lagged
      GROUP BY event_type, lag
    )
    SELECT c.event_type, CAST(c.lag AS BIGINT) AS lag,
           ROUND((c.sab - c.sa * c.sb / c.m)
                 / (s.sxx - s.sx * s.sx / s.n), 6) AS acf
    FROM cross_sums c JOIN stats s ON s.event_type = c.event_type
"""


@register("q182_autocorrelation", oracle=_DUCK_ACF)
def q182_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series autocorrelation at lags {1, 2, 3, 7} over the daily
    value series — the seasonality screen that tells a forecaster
    WHICH period to hand Holt-Winters (a weekly cycle surfaces as a
    lag-7 peak). Standard ACF estimator: lagged co-moments about the
    per-lag sample means, normalized by the series' total sum of
    squares.

    Determinism: daily sums, cross-products, and sums of squares all
    accumulate as EXACT decimals (the q165 regression convention —
    decimal × decimal products summed exactly, cast to double only for
    the final scalar closed form), so no summation order can move the
    estimate; ROUND(…, 6) seals the scalar arithmetic.

    Scale shape: one combinable daily aggregate, then the lag explode
    multiplies the DAILY relation (days × 4 rows — never the raw
    events) and each lag's window shares one (event_type, lag)
    partitioning; the final stats join is groups-sized. At 100 TB the
    events scan dominates and happens exactly once."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "day_idx"
        ),
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("x"))
    lags = [1, 2, 3, 7]
    lagged = daily.withColumn(
        "lag", F.explode(F.array(*[F.lit(k) for k in lags]))
    )
    w = Window.partitionBy("event_type", "lag").orderBy("day_idx")
    # LAG by a column offset isn't expressible; a per-lag branch picks
    # the right fixed offset — all four share ONE window partitioning
    lagged = lagged.withColumn(
        "x_lag",
        F.coalesce(
            *[
                F.when(F.col("lag") == k, F.lag("x", k).over(w))
                for k in lags
            ]
        ),
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    cross = lagged.groupBy("event_type", "lag").agg(
        F.count("x_lag").alias("m"),
        F.sum(F.when(F.col("x_lag").isNotNull(), F.col("x")))
        .cast("double")
        .alias("sa"),
        F.sum(F.when(F.col("x_lag").isNotNull(), F.col("x_lag")))
        .cast("double")
        .alias("sb"),
        F.sum(F.col("x") * F.col("x_lag")).cast("double").alias("sab"),
    )
    acf = (F.col("sab") - F.col("sa") * F.col("sb") / F.col("m")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    return cross.join(stats, "event_type").select(
        "event_type",
        F.col("lag").cast("bigint").alias("lag"),
        F.round(acf, 6).alias("acf"),
    )


_DUCK_DYNAMIC_SESSION = """
    -- gaps-and-islands replay of session_window with a PER-ROW gap
    WITH ordered AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             LAG(CAST(ts AS TIMESTAMP)) OVER (
                 PARTITION BY user_id, event_type ORDER BY ts
             ) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT user_id, event_type, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > (CASE WHEN event_type = 'error'
                                          THEN INTERVAL 10 MINUTE
                                          ELSE INTERVAL 30 MINUTE END)
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, event_type, ts,
             SUM(is_new) OVER (PARTITION BY user_id, event_type ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS sess_id
      FROM marked
    )
    SELECT user_id, event_type, MIN(ts) AS session_start,
           MAX(ts) AS last_event, COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, event_type, sess_id
"""


@register("q188_dynamic_session", oracle=_DUCK_DYNAMIC_SESSION)
def q188_dynamic_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC, per-row inactivity gap
    (`session_window(ts, CASE ...)`) — error bursts close after 10
    quiet minutes, everything else after 30: the gap policy lives in
    the data, the q36 upgrade the fixed-gap operator can't express.
    Same streaming-capable operator, same gaps-and-islands oracle
    with the gap CASE'd per row.

    Scale shape: identical to q36 — one shuffle to (user, type) grain,
    session merge in a single sorted pass per key."""
    ev = table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "error", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    return (
        ev.groupBy("user_id", "event_type", F.session_window("ts", gap))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id", "event_type", "session_start", "last_event", "n_events"
        )
    )


_DUCK_SEASONAL = """
    WITH daily AS (
      SELECT event_type,
             DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
             SUM(CAST(value AS DECIMAL(18,6))) AS total
      FROM events
      GROUP BY 1, 2
    ),
    trended AS (
      SELECT event_type, day_idx,
             CAST(total AS DOUBLE) AS total,
             CASE WHEN COUNT(*) OVER w = 7
                  THEN CAST(SUM(total) OVER w AS DOUBLE) / 7
             END AS trend
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT event_type, day_idx, total, trend,
             CAST(ROUND(total - trend, 6) AS DECIMAL(18,6)) AS detrended,
             day_idx % 7 AS dow
      FROM trended
    ),
    seasonal AS (
      SELECT event_type, dow,
             CAST(SUM(detrended) AS DOUBLE) / COUNT(detrended) AS s
      FROM det
      WHERE detrended IS NOT NULL
      GROUP BY event_type, dow
    )
    SELECT d.event_type, CAST(d.day_idx AS BIGINT) AS day_idx,
           ROUND(d.total, 6) AS total,
           ROUND(d.trend, 6) AS trend,
           ROUND(s.s, 6) AS seasonal,
           ROUND(d.total - d.trend - s.s, 6) AS resid
    FROM det d
    JOIN seasonal s
      ON s.event_type = d.event_type AND s.dow = d.dow
    WHERE d.trend IS NOT NULL
"""


@register("q191_seasonal_decompose", oracle=_DUCK_SEASONAL)
def q191_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (trend = 7-day
    centered moving average, seasonal = per-day-of-week mean of the
    detrended series, residual = the rest) — the explainable
    decomposition BEHIND Holt-Winters (q162) and the ACF screen
    (q182): it shows a series' weekly shape instead of just fitting
    it.

    Determinism: daily totals and the 7-day window sum are exact
    decimals (÷7 happens once, in double, per row); detrended values
    round to DECIMAL(18,6) BEFORE the day-of-week mean, so the
    seasonal means are exact decimal averages in any order — the q179
    convention.

    Scale shape: one shuffle to (type, day) grain; the centered MA is
    one per-type sorted pass; the seasonal relation is (types × 7)
    rows, broadcast back onto the daily relation."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "day_idx"
        ),
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("total"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(-3, 3)
    )
    trended = daily.select(
        "event_type",
        "day_idx",
        F.col("total").cast("double").alias("total"),
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.sum("total").over(w).cast("double") / 7,
        ).alias("trend"),
    )
    det = trended.select(
        "event_type",
        "day_idx",
        "total",
        "trend",
        F.round(F.col("total") - F.col("trend"), 6)
        .cast("decimal(18,6)")
        .alias("detrended"),
        (F.col("day_idx") % 7).alias("dow"),
    )
    seasonal = (
        det.filter(F.col("detrended").isNotNull())
        .groupBy("event_type", "dow")
        .agg(
            (
                F.sum("detrended").cast("double") / F.count("detrended")
            ).alias("s")
        )
    )
    return (
        det.join(F.broadcast(seasonal), ["event_type", "dow"])
        .filter(F.col("trend").isNotNull())
        .select(
            "event_type",
            F.col("day_idx").cast("bigint").alias("day_idx"),
            F.round("total", 6).alias("total"),
            F.round("trend", 6).alias("trend"),
            F.round("s", 6).alias("seasonal"),
            F.round(
                F.col("total") - F.col("trend") - F.col("s"), 6
            ).alias("resid"),
        )
    )


_DUCK_ATTRIBUTION = """
    WITH purchases AS (
      SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, event_id AS t_id, event_type AS channel,
             CAST(ts AS TIMESTAMP) AS t_ts
      FROM events WHERE event_type IN ('view', 'click')
    ),
    joined AS (
      SELECT p.p_id, t.channel, t.t_ts, t.t_id
      FROM purchases p
      JOIN touches t
        ON t.user_id = p.user_id
       AND t.t_ts < p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
    ),
    ranked AS (
      SELECT p_id, channel,
             ROW_NUMBER() OVER (
                 PARTITION BY p_id ORDER BY t_ts, t_id
             ) AS rn_first,
             ROW_NUMBER() OVER (
                 PARTITION BY p_id ORDER BY t_ts DESC, t_id DESC
             ) AS rn_last,
             COUNT(*) OVER (PARTITION BY p_id) AS n_touches
      FROM joined
    ),
    credit AS (
      SELECT channel,
             CASE WHEN rn_first = 1 THEN 1 ELSE 0 END AS first_credit,
             CASE WHEN rn_last = 1 THEN 1 ELSE 0 END AS last_credit,
             CAST(ROUND(1.0 / n_touches, 9) AS DECIMAL(18,9))
                 AS linear_credit
      FROM ranked
    )
    SELECT channel,
           CAST(SUM(first_credit) AS BIGINT) AS n_first,
           CAST(SUM(last_credit) AS BIGINT) AS n_last,
           ROUND(CAST(SUM(linear_credit) AS DOUBLE), 6) AS linear_total
    FROM credit
    GROUP BY channel
"""


@register("q190_attribution", oracle=_DUCK_ATTRIBUTION)
def q190_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution over the event stream:
    first-touch, last-touch, and linear credit per channel for every
    purchase's 7-day lookback window — the three standard models side
    by side, so channel teams see how much the answer depends on the
    model.

    Determinism: touch order is total ((ts, event_id), descending for
    last-touch); linear shares round to DECIMAL(18,9) per touch before
    the exact decimal channel sum (the q179 convention), so no double
    accumulation crosses engines.

    Scale shape: purchases and touches equi-join on user_id (per-user
    candidates bounded by activity), both window passes share the
    per-purchase partitioning, and the final rollup is channel-sized.
    At 100 TB the lookback filter prunes the join output before any
    window state builds."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("t_ts"),
    )
    joined = purchases.join(touches, "user_id").filter(
        (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    wf = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    wl = Window.partitionBy("p_id").orderBy(
        F.col("t_ts").desc(), F.col("t_id").desc()
    )
    wn = Window.partitionBy("p_id")
    ranked = joined.select(
        "p_id",
        "channel",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
        F.count(F.lit(1)).over(wn).alias("n_touches"),
    )
    credit = ranked.select(
        "channel",
        F.when(F.col("rn_first") == 1, 1).otherwise(0).alias("first_credit"),
        F.when(F.col("rn_last") == 1, 1).otherwise(0).alias("last_credit"),
        F.round(F.lit(1.0) / F.col("n_touches"), 9)
        .cast("decimal(18,9)")
        .alias("linear_credit"),
    )
    return credit.groupBy("channel").agg(
        F.sum("first_credit").cast("bigint").alias("n_first"),
        F.sum("last_credit").cast("bigint").alias("n_last"),
        F.round(F.sum("linear_credit").cast("double"), 6).alias(
            "linear_total"
        ),
    )


_DUCK_CHAINED_ROLLUP = """
    WITH fine AS (
      SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)) AS w5,
             event_type,
             COUNT(*) AS n_fine,
             SUM(CAST(value AS DECIMAL(18,6))) AS fine_sum
      FROM events
      GROUP BY 1, 2
    )
    SELECT time_bucket(INTERVAL 1 HOUR, w5) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(n_fine) AS BIGINT) AS n_events,
           CAST(SUM(fine_sum) AS DOUBLE) AS total_value
    FROM fine
    GROUP BY 1, 2
"""


@register("q198_chained_rollup", oracle=_DUCK_CHAINED_ROLLUP)
def q198_chained_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the chained-stateful streaming rollup
    (`streaming/jobs.py:chained_window_rollup`, run mode-agnostically
    on the batch events): 15-minute tumbling sums re-windowed through
    `window_time()` to hourly grain. Oracle-checking the batch form
    certifies the VALUES the streaming test then holds the stream to
    (subset + watermark completeness) — the two checks compose into
    end-to-end stream correctness."""
    from ..streaming import jobs

    ev = table(spark, sf_dir, "events")
    return jobs.chained_window_rollup(ev)


_DUCK_DEDUP_ROLLUP = """
    WITH dd AS (
      SELECT DISTINCT user_id, event_type,
             time_bucket(INTERVAL 1 MINUTE, CAST(ts AS TIMESTAMP)) AS b
      FROM events
    )
    SELECT time_bucket(INTERVAL 1 HOUR, b) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_unique
    FROM dd
    GROUP BY 1, 2
"""


@register("q199_dedup_rollup", oracle=_DUCK_DEDUP_ROLLUP)
def q199_dedup_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the dedup→window chained streaming query
    (`streaming/jobs.py:dedup_then_window`): exact (user, type,
    minute) dedup feeding hourly unique counts. CAUTION kept from the
    streaming twin: window start must derive from the DEDUPED bucket,
    which q's implementation guarantees by bucketing before windowing.

    (The hourly count here counts distinct (user, type, minute)
    triples — first-occurrence grain — matching the streaming dedup
    semantics exactly.)"""
    from ..streaming import jobs

    ev = table(spark, sf_dir, "events")
    return jobs.dedup_then_window(ev)


_SCD2_APPLY_SQL = """
    WITH e AS (
        SELECT user_id, event_type, event_id,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY event_id
               ) AS prev
        FROM events
    ),
    chg AS (
        SELECT user_id, event_type, event_id
        FROM e WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type, event_id AS valid_from,
           LEAD(event_id) OVER (
               PARTITION BY user_id ORDER BY event_id
           ) AS valid_to,
           CAST(LEAD(event_id) OVER (
               PARTITION BY user_id ORDER BY event_id
           ) IS NULL AS INT) AS is_current
    FROM chg
"""


@register("q204_scd2_apply", oracle=_SCD2_APPLY_SQL)
def q204_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY CHANGES ... STORED AS SCD TYPE 2 under the value-exact
    oracle (`sinks/cdc_apply.py:scd2_apply_changes` — the Delta Live
    Tables history-dimension surface): the events table becomes a CDC
    feed (key = user, sequence = event id, every event an upsert of
    the user's state), applied in THREE sequence-ordered batches with
    ``suppress_unchanged=True`` into a fresh history txtable, then
    read back. The oracle builds the same Type-2 intervals directly as
    gaps-and-islands SQL (LAG change detection + LEAD closure — the
    q98 shape), so a hash match certifies the incremental maintenance
    path — open-row closure across batch boundaries, no-op
    suppression, Bloom-pruned dirty-key reads, the synthetic version
    key — against the from-scratch batch build, value for value."""
    import tempfile

    from ..sinks.cdc_apply import SCD2_KEY, scd2_apply_changes
    from ..sinks.txlog import read_txtable

    root = tempfile.mkdtemp(prefix="q204-scd2-") + "/t"
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lit("upsert").alias("op"),
        F.col("event_id").alias("sequence"),
    )
    cuts = ev.agg(
        F.expr("percentile(sequence, 0.33)").alias("c1"),
        F.expr("percentile(sequence, 0.66)").alias("c2"),
    ).collect()[0]
    batches = [
        ev.filter(F.col("sequence") <= cuts["c1"]),
        ev.filter(
            (F.col("sequence") > cuts["c1"]) & (F.col("sequence") <= cuts["c2"])
        ),
        ev.filter(F.col("sequence") > cuts["c2"]),
    ]
    for i, b in enumerate(batches):
        scd2_apply_changes(
            spark,
            b,
            root,
            key="user_id",
            num_buckets=8,
            txn_app_id="q204",
            txn_version=i,
            suppress_unchanged=True,
        )
    return read_txtable(spark, root).select(
        "user_id",
        "event_type",
        "valid_from",
        "valid_to",
        F.col("is_current").cast("int").alias("is_current"),
    )


_SEQMINE_GAP_US = 1800 * 1_000_000

_SEQMINE_SQL = f"""
    WITH e AS (
      SELECT user_id AS u, event_type AS t,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts
      FROM events
    ),
    l1 AS (
      SELECT t AS pattern, CAST(1 AS INT) AS length,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS support
      FROM e GROUP BY t
    ),
    p2 AS (
      SELECT DISTINCT e1.u, e1.t AS ta, e2.t AS tb
      FROM e e1 JOIN e e2
        ON e1.u = e2.u AND e2.ts > e1.ts
       AND e2.ts - e1.ts <= {_SEQMINE_GAP_US}
    ),
    l2 AS (
      SELECT ta || '>' || tb AS pattern, CAST(2 AS INT) AS length,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM p2 GROUP BY ta, tb
    ),
    p3 AS (
      SELECT DISTINCT e1.u, e1.t AS ta, e2.t AS tb, e3.t AS tc
      FROM e e1
      JOIN e e2 ON e1.u = e2.u AND e2.ts > e1.ts
               AND e2.ts - e1.ts <= {_SEQMINE_GAP_US}
      JOIN e e3 ON e2.u = e3.u AND e3.ts > e2.ts
               AND e3.ts - e2.ts <= {_SEQMINE_GAP_US}
    ),
    l3 AS (
      SELECT ta || '>' || tb || '>' || tc AS pattern,
             CAST(3 AS INT) AS length, CAST(COUNT(*) AS BIGINT) AS support
      FROM p3 GROUP BY ta, tb, tc
    )
    SELECT pattern, length, support FROM l1
    UNION ALL SELECT pattern, length, support FROM l2
    UNION ALL SELECT pattern, length, support FROM l3
"""


@register("q208_seq_patterns", oracle=_SEQMINE_SQL)
def q208_seq_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-constrained sequential pattern mining (GSP with max-gap,
    Srikant & Agrawal 1996) over the event stream: every length-1/2/3
    event-type sequence a user performed with ≤30 min between
    consecutive steps, with distinct-user support. The DISCOVERY
    member of the sequence family — q132's funnel checks ONE fixed
    sequence, q173's transition matrix counts ADJACENT bigrams; this
    mines the whole ≤3-step lattice under a time constraint.

    Exactness: strict-order matching uses integer-microsecond RANGE
    frames (rangeBetween(…, -1)), so timestamp ties resolve exactly
    as the oracle's ``e2.ts > e1.ts`` self-joins.

    Scale shape (operators/seqmine.py): linear in events — one
    per-user sort feeding V + V² conditional running-max window
    columns (V = bounded type vocabulary), never the oracle's
    O(events³) self-join; then explode → distinct → count."""
    from ..operators.seqmine import gap_sequences

    return gap_sequences(
        table(spark, sf_dir, "events"),
        max_gap_s=1800,
        min_support=1,
        max_len=3,
    )


_REACH_SQL = """
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_d
      FROM events GROUP BY user_id
    ),
    newu AS (
      SELECT first_d AS d, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM f GROUP BY first_d
    ),
    dau AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT dau.d, dau.dau,
           CAST(COALESCE(newu.new_users, 0) AS BIGINT) AS new_users,
           CAST(SUM(COALESCE(newu.new_users, 0)) OVER (
               ORDER BY dau.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_reach
    FROM dau LEFT JOIN newu ON dau.d = newu.d
"""


@register("q210_cumulative_reach", oracle=_REACH_SQL)
def q210_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users + cumulative distinct reach — the RUNNING
    COUNT DISTINCT the growth dashboard needs, which a naive window
    can't express without re-deduplicating an ever-growing set.

    Exactness: all integers (counts and a running integer sum).

    Scale shape: running-distinct collapses to FIRST-SEEN — one
    groupBy(user) for min(date) (combinable), one groupBy(date), and
    the only total order is over the DAY grain (bounded by calendar
    days, not rows or users) — the same bound q195/q200 accept. DAU is
    a per-day distinct, partial-aggregated map-side. Never a growing
    window state."""
    e = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    first = e.groupBy("user_id").agg(F.min("d").alias("first_d"))
    newu = first.groupBy(F.col("first_d").alias("d")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    dau = e.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = dau.join(newu, "d", "left").select(
        "d",
        "dau",
        F.coalesce("new_users", F.lit(0)).alias("new_users"),
    )
    return joined.select(
        "d",
        "dau",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_reach"),
    )


_BACKTEST_SQL = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    j AS (
      SELECT a.event_type, a.d, a.n,
             b.n AS forecast
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.d = a.d - INTERVAL 7 DAY
      WHERE a.d > (SELECT MAX(d) FROM daily) - INTERVAL 10 DAY
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(ABS(CAST(n - forecast AS DOUBLE))
                     / ((CAST(n AS DOUBLE) + forecast) / 2)) * 100, 9)
               AS smape,
           CAST(SUM(ABS(n - forecast)) AS BIGINT) AS abs_err_total
    FROM j GROUP BY event_type
"""


@register("q213_forecast_backtest", oracle=_BACKTEST_SQL)
def q213_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling forecast backtest with the seasonal-naive baseline
    (forecast = the count 7 days earlier) scored by sMAPE over the
    last 10 days per event type — the EVALUATION half the forecasting
    family (q114 Holt, q163 Holt-Winters, q191 decomposition) needs:
    any model must beat this baseline to earn its complexity, and the
    baseline itself is exactly SQL-expressible so the harness is
    oracle-certified.

    Exactness: daily counts and the total absolute error are integers;
    each sMAPE term is the same IEEE sequence on both engines
    (abs-diff / midpoint on integer-derived doubles), and the ≤10-term
    mean is rounded to 9 dp, absorbing any summation-order ULP — a
    drift beyond that would fail the driver hash loudly.

    Scale shape: one combinable groupBy to the (type, day) grain;
    the 7-day-lag join and the scoring run on that bounded grain."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    max_d = daily.agg(F.max("d").alias("mx"))
    a = daily.alias("a")
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.date_add(F.col("d"), 7).alias("b_d"),
        F.col("n").alias("forecast"),
    )
    j = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b_type"))
            & (F.col("a.d") == F.col("b_d")),
        )
        .crossJoin(F.broadcast(max_d))
        .filter(F.col("a.d") > F.date_sub(F.col("mx"), 10))
    )
    term = F.abs((F.col("n") - F.col("forecast")).cast("double")) / (
        (F.col("n").cast("double") + F.col("forecast")) / 2
    )
    return j.groupBy("a.event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.avg(term) * 100, 9).alias("smape"),
        F.sum(F.abs(F.col("n") - F.col("forecast")))
        .cast("bigint")
        .alias("abs_err_total"),
    )
