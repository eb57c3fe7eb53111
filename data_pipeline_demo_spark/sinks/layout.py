"""Clustered table layout for data skipping (sort-on-write + Z-order).

Parquet readers prune at two levels below partition pruning: files and
row groups, both via footer min/max statistics. Those statistics only
help when the writer CLUSTERS rows so each file/row-group covers a
tight key range — an unsorted 100 TB table stores every key range in
every file, and a `WHERE key = x` scan reads all of it.

Two layouts, both one-shot maintenance jobs (the lakehouse OPTIMIZE
move — run after large appends, not per query):

- ``cluster_write``: range-repartition + sort by one (or a prefix of)
  key(s). Files become near-disjoint key ranges; a point/range filter
  touches O(1) of them. This is the single-dimension optimum.
- ``zorder_write``: interleave the bits of several rank-scaled keys
  into one Z-value and cluster by it. Each dimension's min/max stays
  locally tight in every file, so selective filters on ANY clustered
  column (not just the leading one) skip most files — the multi-column
  trade-off single-key sorting can't make.

Nothing here extends the reference's surface (it has no table layout
at all — one pandas frame); this is the 100 TB enabler for the scan
side of every registered query. ``tests/test_layout.py`` asserts the
skipping property from the parquet footers themselves: after
``cluster_write`` a point key maps to exactly one candidate file, and
after ``zorder_write`` a 2-D box query's candidate-file fraction is a
small multiple of the selectivity, where the unsorted baseline leaves
every file a candidate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Bits per dimension in the Z-value. 16 bits × up to 4 dims stays in
#: one signed 64-bit long with room to spare; finer resolution buys
#: nothing once files hold ~10^6 rows.
ZORDER_BITS = 16


#: Columnar formats whose writers persist per-file/per-stripe min-max
#: statistics, which is what the clustered layout exists to exploit.
#: Both are Spark built-ins with full filter pushdown.
_STATS_FORMATS = ("parquet", "orc")


def _checked_format(file_format: str) -> str:
    if file_format not in _STATS_FORMATS:
        raise ValueError(
            f"file_format must be one of {_STATS_FORMATS} (a stats-"
            f"bearing columnar format), got {file_format!r}"
        )
    return file_format


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int = 32,
    file_format: str = "parquet",
) -> None:
    """Rewrite ``df`` at ``path`` clustered by ``cluster_by``.

    ``repartitionByRange`` samples the key distribution, so output
    files are near-equal-sized contiguous key ranges regardless of
    skew; ``sortWithinPartitions`` tightens every row group inside each
    file. At scale ``num_files`` is sized so each file lands near the
    128-256 MB sweet spot. ``file_format`` picks the stats-bearing
    columnar container (parquet footers / ORC stripe statistics) — the
    layout property is format-independent.
    """
    (
        df.repartitionByRange(num_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode("overwrite")
        .format(_checked_format(file_format))
        .save(path)
    )


def zorder_numeric_image(df: DataFrame, c: str) -> Column:
    """Monotone NUMERIC image of a Z-order column: numerics pass
    through; date → days since epoch; timestamp (tz'd or NTZ) →
    microseconds since epoch. Min/max scaling only needs monotonicity,
    so any order-preserving numeric embedding Z-orders correctly —
    this is what lets ``zorder_by`` take event-time columns, the most
    common clustering key in practice (Delta's OPTIMIZE ZORDER
    accepts them for the same reason). Unsupported types raise a
    clear error instead of an analysis-time cast failure."""
    from pyspark.sql import types as T

    dt = df.schema[c].dataType
    col = F.col(c)
    if isinstance(dt, T.DateType):
        return F.unix_date(col).cast("double")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    if isinstance(dt, (T.NumericType, T.BooleanType)):
        return col.cast("double")
    raise ValueError(
        f"zorder_by column {c!r} has type {dt.simpleString()}, which has "
        "no monotone numeric image; supported: numeric, boolean, date, "
        "timestamp"
    )


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column linearly onto [0, 2^bits) as a long.

    Min/max scaling (not rank) keeps the transform a broadcast-sized
    metadata join instead of a global sort; Z-order locality only needs
    monotonicity, not uniformity.
    """
    span = F.when(hi != lo, hi - lo).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo) / span
    scaled = F.floor(frac * ((1 << bits) - 1))
    return F.greatest(F.lit(0), F.least(scaled, F.lit((1 << bits) - 1)))


def zorder_key(scaled: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` bits of each pre-scaled long, dim 0
    in the lowest positions — a pure codegen expression tree (no UDF)."""
    ndims = len(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, col in enumerate(scaled):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ndims + d))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    num_files: int = 32,
    bits: int = ZORDER_BITS,
    file_format: str = "parquet",
) -> None:
    """Rewrite ``df`` at ``path`` clustered by the Z-value of
    ``zorder_by``.

    Per-column min/max come from ONE aggregate row broadcast under a
    literal cross join (the q27 pattern — no global window, no second
    scan shuffle); the Z-value itself never leaves the plan: files are
    clustered by it, but the stored schema is unchanged.
    """
    imgs = {c: zorder_numeric_image(df, c) for c in zorder_by}
    stats = df.agg(
        *[F.min(imgs[c]).alias(f"__lo_{c}") for c in zorder_by],
        *[F.max(imgs[c]).alias(f"__hi_{c}") for c in zorder_by],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scale_to_bits(
            imgs[c], F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits
        )
        for c in zorder_by
    ]
    keyed = with_stats.withColumn("__z", zorder_key(scaled, bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__lo_{c}" for c in zorder_by], *[f"__hi_{c}" for c in zorder_by])
        .write.mode("overwrite")
        .format(_checked_format(file_format))
        .save(path)
    )
