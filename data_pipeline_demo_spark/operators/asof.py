"""Generalized as-of join: backward / forward / nearest, with optional
tolerance — the pandas ``merge_asof`` / kdb ``aj`` surface, composed
from union-interleave + windows instead of a per-row probe.

Shape (the 100 TB pattern for temporal alignment): both relations
interleave into ONE stream keyed by ``by``, a running window carries
the latest (backward) / next (forward) right-side row past each left
row — one shuffle on the key, linear scans, never an O(n·m) range
probe. The right row's payload rides inside a struct whose FIRST field
is the timestamp, so the window ``max``/``min`` picks the temporally
closest row and breaks exact-timestamp ties deterministically on the
payload.

The reference has no temporal logic at all (its datetimes collapse to
dates, `/root/reference/data_pipeline.py:666-707`); q38 ships the
backward special case — this operator is the full surface, q130
certifies backward AND forward against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_value: str | None = None,
) -> DataFrame:
    """For every ``left`` row: the ``right`` row with the greatest
    ``on`` ≤ left's (backward), the least ``on`` ≥ left's (forward),
    or whichever of those two is temporally closer (nearest; exact
    ties prefer backward — pandas ``merge_asof`` parity). Equal
    timestamps MATCH in both directions (inclusive, merge_asof
    default). ``tolerance_seconds`` nulls out matches further than
    the bound. Output: every left column + ``asof_ts`` (+
    ``asof_<right_value>`` when requested)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest: {direction}")
    payload = [right_value] if right_value else []
    lhs = left.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None)
        .cast(
            "struct<__rts:timestamp"
            + "".join(f",{c}:string" for c in payload)
            + ">"
        )
        .alias("__rrow"),
    )
    rhs = right.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lhs.schema["__lrow"].dataType.simpleString()).alias(
            "__lrow"
        ),
        F.struct(
            F.col(on).cast("timestamp").alias("__rts"),
            *[F.col(c).cast("string").alias(c) for c in payload],
        ).alias("__rrow"),
    )
    merged = lhs.unionByName(rhs)

    out_cols = []
    # backward: right rows at the same ts sort BEFORE the left row, so
    # the trailing frame includes them (inclusive <=)
    if direction in ("backward", "nearest"):
        wb = (
            Window.partitionBy("__by")
            .orderBy(F.col("__ts"), F.col("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = merged.withColumn("__bw", F.max("__rrow").over(wb))
        out_cols.append("__bw")
    # forward: at equal ts the left row sorts first, so the leading
    # frame includes same-ts right rows (inclusive >=)
    if direction in ("forward", "nearest"):
        wf = (
            Window.partitionBy("__by")
            .orderBy(F.col("__ts"), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        merged = merged.withColumn("__fw", F.min("__rrow").over(wf))
        out_cols.append("__fw")

    rows = merged.filter(F.col("__is_left") == 1)
    if direction == "backward":
        pick = F.col("__bw")
    elif direction == "forward":
        pick = F.col("__fw")
    else:
        lts = F.col("__ts").cast("timestamp")
        d_b = F.unix_micros(lts) - F.unix_micros(F.col("__bw.__rts"))
        d_f = F.unix_micros(F.col("__fw.__rts")) - F.unix_micros(lts)
        pick = (
            F.when(F.col("__bw").isNull(), F.col("__fw"))
            .when(F.col("__fw").isNull(), F.col("__bw"))
            .when(d_b <= d_f, F.col("__bw"))  # tie → backward
            .otherwise(F.col("__fw"))
        )
    rows = rows.withColumn("__pick", pick)
    if tolerance_seconds is not None:
        lts = F.col("__ts").cast("timestamp")
        dist = F.abs(
            F.unix_micros(lts) - F.unix_micros(F.col("__pick.__rts"))
        )
        rows = rows.withColumn(
            "__pick",
            F.when(
                dist <= F.lit(int(tolerance_seconds * 1_000_000)),
                F.col("__pick"),
            ),
        )
    sel = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    sel.append(F.col("__pick.__rts").alias("asof_ts"))
    if right_value:
        sel.append(F.col(f"__pick.{right_value}").alias(f"asof_{right_value}"))
    return rows.select(*sel)
