"""Clustered-layout sink: data-skipping properties proved from parquet
footer statistics (the same min/max a scan's file/row-group pruning
uses), not from timings."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_pipeline_demo_spark.sinks import layout
from data_pipeline_demo_spark.sources.tables import table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def _file_stats(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per data file, from the footers."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def _candidates(stats: list[tuple], lo, hi) -> int:
    return sum(1 for mn, mx in stats if not (mx < lo or mn > hi))


def test_cluster_write_point_lookup_touches_one_file(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    dst = str(tmp_path / "clustered")
    layout.cluster_write(li, dst, ["l_orderkey"], num_files=16)

    stats = _file_stats(dst, "l_orderkey")
    assert len(stats) > 4, "clustering degenerated to a handful of files"

    # range partitioning → at most 2 files can contain any point key
    # (1 plus a boundary straddle); an unsorted layout leaves ~all of
    # them candidates.
    keys = [row.l_orderkey for row in li.select("l_orderkey").limit(50).collect()]
    worst = max(_candidates(stats, k, k) for k in keys)
    assert worst <= 2

    # row identity is preserved by the rewrite
    back = spark.read.parquet(dst)
    assert back.count() == li.count()
    assert (
        back.agg(F.sum("l_orderkey")).first()[0]
        == li.agg(F.sum("l_orderkey")).first()[0]
    )


def test_cluster_write_files_are_near_disjoint(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    dst = str(tmp_path / "clustered2")
    layout.cluster_write(li, dst, ["l_orderkey"], num_files=16)
    stats = sorted(_file_stats(dst, "l_orderkey"))
    overlaps = sum(
        1
        for (_, prev_max), (nxt_min, _) in zip(stats, stats[1:])
        if nxt_min < prev_max
    )
    assert overlaps == 0


def test_zorder_box_query_skips_most_files(spark, tmp_path):
    ev = table(spark, SF_DIR, "events")
    cols = ["user_id", "value"]
    dst = str(tmp_path / "zordered")
    unsorted_dst = str(tmp_path / "plain")
    layout.zorder_write(ev, dst, cols, num_files=16)
    # baseline: same file count, hash-scattered layout
    ev.repartition(16).write.mode("overwrite").parquet(unsorted_dst)

    bounds = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    u_lo, u_hi, v_lo, v_hi = bounds
    # a ~12.5% × 12.5% box in the two clustered dimensions
    u_span, v_span = (u_hi - u_lo) / 8, (v_hi - v_lo) / 8
    box = (u_lo + 3 * u_span, u_lo + 4 * u_span, v_lo + 3 * v_span, v_lo + 4 * v_span)

    def candidates(path: str) -> int:
        su = _file_stats(path, "user_id")
        sv = _file_stats(path, "value")
        return sum(
            1
            for (umn, umx), (vmn, vmx) in zip(su, sv)
            if not (umx < box[0] or umn > box[1])
            and not (vmx < box[2] or vmn > box[3])
        )

    plain = candidates(unsorted_dst)
    zord = candidates(dst)
    n_files = len(_file_stats(dst, "user_id"))
    assert plain >= n_files - 1, "hash layout should leave ~every file a candidate"
    assert zord <= n_files // 2, f"z-order skipped too little: {zord}/{n_files}"

    # layout change must not change the data
    assert spark.read.parquet(dst).count() == ev.count()
    assert sorted(spark.read.parquet(dst).columns) == sorted(ev.columns)


def test_zorder_key_interleaves_bits():
    # 2 dims, low bits: (x=1, y=0) -> 0b01; (x=0, y=1) -> 0b10;
    # (x=3, y=3) -> 0b1111
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 3), (2, 1)], "x long, y long"
    )
    z = layout.zorder_key([F.col("x"), F.col("y")], bits=4)
    got = [r.z for r in df.select(z.alias("z")).collect()]
    assert got == [0b01, 0b10, 0b1111, 0b0110]


def test_zorder_constant_column_is_safe(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id").alias("a"), F.lit(7).alias("b")
    )
    dst = str(tmp_path / "const")
    layout.zorder_write(df, dst, ["a", "b"], num_files=4)
    assert spark.read.parquet(dst).count() == 100


def test_zorder_accepts_date_and_timestamp_columns(spark, tmp_path):
    """zorder_by takes event-time columns (the most common clustering
    key): date and timestamp map onto a monotone numeric image before
    bit scaling. Proof from footers: a one-month box on the date
    dimension is a candidate in a minority of z-ordered files."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumn(
        "l_shipdate", F.col("l_shipdate").cast("date")
    )
    dst = str(tmp_path / "z_date")
    layout.zorder_write(li, dst, ["l_shipdate", "l_partkey"], num_files=16)
    stats = _file_stats(dst, "l_shipdate")
    assert len(stats) >= 8
    import datetime as dt

    lo, hi = dt.date(1994, 1, 1), dt.date(1994, 1, 31)
    # footer stats for date32 come back as date objects via pyarrow
    cand = sum(1 for mn, mx in stats if not (mx < lo or mn > hi))
    assert cand <= len(stats) // 2, (cand, len(stats))

    # timestamp (incl. NTZ as read from nanos parquet) works too
    ts = li.withColumn("ship_ts", F.col("l_shipdate").cast("timestamp"))
    dst2 = str(tmp_path / "z_ts")
    layout.zorder_write(ts, dst2, ["ship_ts", "l_partkey"], num_files=8)
    assert len(_file_stats(dst2, "l_partkey")) >= 4

    # unsupported type raises the documented error, not a cast failure
    import pytest

    with pytest.raises(ValueError, match="monotone numeric image"):
        layout.zorder_write(
            li.withColumn("s", F.lit("x")), str(tmp_path / "z_bad"), ["s"]
        )


def test_cluster_write_orc_same_skipping_property(spark, tmp_path):
    """The layout property is format-independent: clustered ORC files
    hold near-disjoint key ranges (proved by per-file min/max), the
    point lookup round-trips, and Spark's ORC scan pushes the filter."""
    import pytest

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    dst = str(tmp_path / "orc_clustered")
    layout.cluster_write(li, dst, ["l_orderkey"], num_files=8,
                         file_format="orc")
    files = sorted(glob.glob(os.path.join(dst, "*.orc")))
    assert len(files) >= 4
    ranges = []
    for f in files:
        one = spark.read.orc(f).agg(
            F.min("l_orderkey"), F.max("l_orderkey")
        ).first()
        ranges.append((one[0], one[1]))
    ranges.sort()
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert lo_a <= hi_a <= lo_b  # contiguous, non-interleaved ranges
    probe = li.limit(1).first()["l_orderkey"]
    back = spark.read.orc(dst).filter(F.col("l_orderkey") == probe)
    assert back.count() == li.filter(F.col("l_orderkey") == probe).count()
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey," in plan
    assert "Format: ORC" in plan

    with pytest.raises(ValueError, match="file_format"):
        layout.cluster_write(li, dst, ["l_orderkey"], file_format="csv")


def test_zorder_write_orc_roundtrip(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    dst = str(tmp_path / "orc_z")
    layout.zorder_write(ev, dst, ["user_id", "value"], num_files=8,
                        file_format="orc")
    back = spark.read.orc(dst)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
