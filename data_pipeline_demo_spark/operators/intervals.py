"""Interval overlap join — blocked, never all-pairs.

The temporal member of the blocked-join family (grid cells for space,
shingle prefixes for text, bands for hashes): two interval relations
join on overlap (``a_start <= b_end AND b_start <= a_end``) by
stamping each interval onto the unit-width timeline buckets it spans
(map-only ``sequence`` + ``explode``) and equality-joining on the
bucket — candidate volume is bounded by per-bucket interval density,
never |A|·|B|.

Emit-exactly-once without a dedup exchange (the radius-join trick,
round-7): an overlapping pair shares EVERY bucket that contains
``max(a_start, b_start)`` — the overlap's first instant — and that
bucket is unique, so requiring ``bucket == floor(max(a_start,
b_start) / unit)`` emits each true pair exactly once and drops
nothing (the instant lies inside both intervals by the definition of
overlap).

Picking ``unit``: an interval stamps ``ceil(len/unit) + 1`` buckets,
so unit ≈ the typical interval length keeps the stamp ≤ 2 per row;
a far-too-small unit multiplies stamp rows, a far-too-large one
degrades toward per-bucket all-pairs. Both failure modes are
gradual — results stay exact at any unit.

Reference scope: no temporal logic exists in the reference; this is
the SQL-standard ``OVERLAPS`` workload (meeting conflicts, session
concurrency, validity-window reconciliation) at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    unit_seconds: float,
    a_id: str = "id_a",
    b_id: str = "id_b",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """All (a, b) pairs whose [start, end] intervals overlap
    (inclusive ends): ``(id_a, id_b, overlap_start, overlap_end)``.
    Both inputs carry ``start_col``/``end_col`` timestamps; rows with
    ``end < start`` or null bounds never match (malformed intervals
    are data, not errors)."""
    if unit_seconds <= 0:
        raise ValueError(f"unit_seconds must be positive: {unit_seconds}")
    unit_us = int(unit_seconds * 1_000_000)

    def stamped(df, idc):
        s = F.unix_micros(F.col(start_col).cast("timestamp"))
        e = F.unix_micros(F.col(end_col).cast("timestamp"))
        ok = df.filter(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (e >= s)
        )
        return ok.select(
            F.col(idc),
            s.alias("__s"),
            e.alias("__e"),
            F.explode(
                F.sequence(
                    F.floor(s / unit_us), F.floor(e / unit_us), F.lit(1)
                )
            ).alias("__bucket"),
        )

    sa = stamped(a, a_id).select(
        F.col(a_id), F.col("__s").alias("__sa"), F.col("__e").alias("__ea"),
        "__bucket",
    )
    sb = stamped(b, b_id).select(
        F.col(b_id), F.col("__s").alias("__sb"), F.col("__e").alias("__eb"),
        "__bucket",
    )
    ov_start = F.greatest(F.col("__sa"), F.col("__sb"))
    ov_end = F.least(F.col("__ea"), F.col("__eb"))
    return (
        sa.join(sb, "__bucket")
        # true overlap, and emit only in the overlap-start's bucket
        .filter(
            (ov_start <= ov_end)
            & (F.col("__bucket") == F.floor(ov_start / unit_us))
        )
        .select(
            a_id,
            b_id,
            F.timestamp_micros(ov_start).alias("overlap_start"),
            F.timestamp_micros(ov_end).alias("overlap_end"),
        )
    )
