"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}

Each query is executed to completion (count() over the result — forces
the full plan without driver-side materialization of wide rows). A short
warmup runs first so JVM/codegen startup isn't billed to the first query.

Per-query time is the MEDIAN of $SPARK_GRAFT_BENCH_RUNS (default 3)
back-to-back executions: a single-shot timing on a shared 32-core box
swings ±30% run-to-run (observed on bit-identical code between rounds 3
and 4), which is too coarse an instrument to falsify a 2× performance
criterion; the median of 3 bounds that noise at a ~30s cost at sf0.1.
Observed full-run total spread with medians: 9.165s vs 8.885s back to
back (~3%) — inside the <10% bar the round-4 judge set for the
instrument. The two shingle queries (q41/q42) showed the widest
median-of-3 spreads in round 5 (1.79s/0.62s). Measured cause (8
back-to-back full-scale runs): the FIRST full-scale run is a
consistent outlier (+1.4s / +0.6s) — one-time codegen + shuffle/page-
cache warmup the 64-doc warmup slice doesn't trigger — while runs 2-8
sit within ~0.3s. So those two queries take one UNTIMED full-scale
warmup run before their timed samples (WARMUP_RUNS), the standard
exclude-warmup benchmarking practice already applied session-wide by
the warmup block below.

Round 6 adds a "lakehouse" section (same JSON line, separate keys so
the headline total stays comparable across rounds): txlog MERGE of a
~10% update batch, the manifest-pruned CDC diff, and a
ZORDER-clustered predicate read — timed at sf0.1 over a scratch
txtable built from lineitem, medians + spreads like the headline set.

Round 8 adds machine-drift normalization: "noise_key" is a FROZEN
inline SQL probe (literal TPC-H-Q1-shaped scan-agg over the lineitem
parquet — no repo code in its path, so it can never change between
rounds), and "headline_normalized" rescales the headline total by
noise_ref/noise_key — the headline as it would read at calibration-day
machine speed. Round-7 showed identical headline code drifting
7.85→10.5s across runs; raw deltas under ~20% are machine noise, the
normalized value is the comparable one.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_demo_spark.plans import all_queries  # noqa: E402
from data_pipeline_demo_spark.session import get_spark  # noqa: E402

# Headline set: one per capability family — scan-heavy agg, fact-fact
# join, window, event-time session, exact near-dup join, MinHash path,
# vector search, text stats.
HEADLINE = (
    "q01_pricing_summary",
    "q04_join_inner",
    "q09_join_broadcast_dims",
    "q11_agg_stats",
    "q18_window_rank",
    "q26_union_all_multiset",
    "q34_tumbling_window",
    "q36_session_window",
    "q38_asof_join",
    "q41_jaccard_similarity_join",
    "q42_minhash_lsh_dedup",
    "q44_knn_bruteforce",
    "q46_text_stats",
    "q48_quality_score",
    "q51_word_count",
)

# round-5 spread outliers (judge directive #7): the first full-scale
# shingle run is a measured one-time outlier (codegen + cache warmup);
# exclude it with one untimed warmup run, then sample as usual
WARMUP_RUNS = {
    "q41_jaccard_similarity_join": 1,
    "q42_minhash_lsh_dedup": 1,
}


def _timed(fn, runs: int, setup=None, warmup_runs: int = 0) -> tuple[float, float]:
    for _ in range(warmup_runs):
        if setup is not None:
            setup()
        fn()  # untimed: one-time full-scale warmup outlier excluded
    samples = []
    for _ in range(runs):
        if setup is not None:
            setup()  # untimed per-run reset
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return (
        round(samples[len(samples) // 2], 3),
        round(samples[-1] - samples[0], 3),
    )


# --- machine-drift normalization (round-7 judge directive #7) --------------
# A FROZEN probe whose plan can never change with the repo: literal SQL
# over the lineitem parquet, inlined here so no operator edit, registry
# rotation, or session-conf change can touch it. Identical headline code
# benched 7.85s..10.5s across round-7 runs (uniform ~18% machine drift),
# making round-over-round deltas below ~20% unreadable; dividing the
# headline by this key's drift ratio restores comparability.
_NOISE_SQL = """
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sq, SUM(l_extendedprice) AS se,
           AVG(l_discount) AS ad, COUNT(*) AS n
    FROM parquet.`{path}`
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""
# Reference median of the noise key on the round-8 calibration run
# (sf0.1, local[32], idle box) — headline_normalized is
# headline_total * (NOISE_REF_SEC / noise_key), i.e. the headline as it
# would read at calibration-day machine speed.
NOISE_REF_SEC = 0.33


def bench_noise_key(spark, sf_dir: str, runs: int = 5) -> float:
    sql = _NOISE_SQL.format(path=os.path.join(sf_dir, "lineitem.parquet"))
    t, _ = _timed(lambda: spark.sql(sql).count(), runs, warmup_runs=1)
    return t


def bench_lakehouse(spark, sf_dir: str, runs: int):
    """Timed lakehouse-tier entries over a scratch txtable built (untimed)
    from sf lineitem: MERGE, CDC diff, ZORDER-clustered predicate read."""
    import shutil
    import tempfile
    from datetime import date

    from pyspark.sql import functions as F

    from data_pipeline_demo_spark.sinks.txlog import (
        compact_txtable,
        read_txtable,
        txlog_upsert,
        txtable_changes,
    )
    from data_pipeline_demo_spark.sources.tables import table

    tmp = tempfile.mkdtemp(prefix="bench-txtable-")
    root = os.path.join(tmp, "lineitem_tx")
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    try:
        li = table(spark, sf_dir, "lineitem")
        base = li.select(
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("li_id"),
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
            "l_shipdate",
        )
        # setup (untimed): initial full load with shipdate zone maps
        txlog_upsert(
            spark,
            base,
            root,
            key="li_id",
            num_buckets=32,
            stats_columns=["l_shipdate"],
        )
        updates = base.filter(F.col("l_orderkey") % 10 == 0).withColumn(
            "l_quantity", F.col("l_quantity") + F.lit(1.0)
        )
        updates = updates.persist()
        updates.count()  # isolate MERGE cost from update-batch compute
        # each run commits a fresh version; per-run cost is the steady-
        # state micro-batch MERGE (bucket-pruned rewrite of touched
        # buckets), the shape the streaming bridge pays per trigger
        timings["lh_merge_upsert"], spreads["lh_merge_upsert"] = _timed(
            lambda: txlog_upsert(spark, updates, root), runs
        )
        updates.unpersist()
        # fixed v0->v1 window so the number is comparable across rounds
        timings["lh_cdc_diff"], spreads["lh_cdc_diff"] = _timed(
            lambda: txtable_changes(spark, root, 0, 1).count(), runs
        )
        # point-delete strategies head-to-head: each run deletes a
        # FRESH ~0.1% key slice (slices never overlap, so every run
        # pays the same real work). merge-on-read writes only a
        # (file, row-position) sidecar — the 100 TB point-delete
        # shape; copy-on-write rewrites every touched bucket.
        from data_pipeline_demo_spark.sinks.txlog import txlog_delete

        # li_id = orderkey*8 + linenumber with linenumber in 1..7, so
        # li_id % 8 != 0: slice 0 (and any k ≡ 0 mod 8) would be EMPTY
        # and measure a no-op — start at 1
        slice_no = iter(k for k in range(1, 1000) if k % 8 != 0)

        def _del_slice(mode):
            k = next(slice_no)
            keys = base.filter(
                (F.col("li_id") % 1000 == k) & (F.col("l_orderkey") % 10 != 0)
            ).select("li_id")
            return lambda: txlog_delete(
                spark, root, keys=keys, mode=mode
            )

        timings["lh_mor_delete"], spreads["lh_mor_delete"] = _timed(
            lambda: _del_slice("merge-on-read")(), runs
        )
        timings["lh_cow_delete"], spreads["lh_cow_delete"] = _timed(
            lambda: _del_slice("copy-on-write")(), runs
        )
        # null-count manifest pruning: l_shipdate has zero nulls, so an
        # IS NULL probe prunes EVERY bucket from metadata alone —
        # versus the same logical probe as a full predicate scan
        timings["lh_isnull_pruned_probe"], spreads["lh_isnull_pruned_probe"] = _timed(
            lambda: read_txtable(
                spark, root, prune_is_null={"l_shipdate": True}
            ).count(),
            runs,
        )
        timings["lh_isnull_full_scan"], spreads["lh_isnull_full_scan"] = _timed(
            lambda: read_txtable(spark, root)
            .filter("l_shipdate IS NULL")
            .count(),
            runs,
        )
        # (the python-writer OVERWRITE below replaces the snapshot,
        # which drops the remaining vectors with the buckets they
        # covered — later entries see a DV-free table)
        # python writer path: snapshot overwrite of the full base
        # through the bucket-aligned write_txtable wrapper (vectorized
        # bucket split + parquet encode per task, python-side manifest
        # commit). Overwrite keeps repeated runs idempotent.
        from data_pipeline_demo_spark.sources.txtable_source import (
            register_txtable_source,
        )
        from data_pipeline_demo_spark.sources.txtable_writer import (
            write_txtable,
        )

        register_txtable_source(spark)
        # one untimed warmup: the session's FIRST DataSource write pays
        # ~4s of python-worker spin-up (driver plan worker + executor
        # workers + imports) that no steady-state write repays —
        # measured 4.9s cold vs 0.87s warm at sf0.01
        timings["lh_py_writer_overwrite"], spreads["lh_py_writer_overwrite"] = _timed(
            lambda: write_txtable(
                base, root, key="li_id", num_buckets=32, mode="overwrite"
            ),
            runs,
            warmup_runs=1,
        )
        # string-keyed python write (round-6 directive #1 done-criterion:
        # within ~2x of the int-keyed overwrite now that string hashing
        # is vectorized) — same rows, key cast to a doc-id-like string
        str_root = os.path.join(tmp, "lineitem_tx_str")
        str_base = base.withColumn(
            "li_id", F.concat(F.lit("li-"), F.col("li_id").cast("string"))
        )
        timings["lh_py_writer_string_key"], spreads["lh_py_writer_string_key"] = _timed(
            lambda: write_txtable(
                str_base, str_root, key="li_id", num_buckets=32,
                mode="overwrite",
            ),
            runs,
            warmup_runs=1,
        )
        # python format("txtable") READ path vs the JVM read_txtable
        # (round-6 directive #7): full snapshot scan, then a key point
        # lookup with planning-time pushdown pruning on vs off. Each
        # takes one untimed warmup: the session's FIRST python
        # DataSource read pays ~4s of plan+executor python-worker
        # spin-up (measured 4.7s cold vs 0.73s warm at sf0.01) that no
        # steady-state read repays — same treatment as the writer keys
        timings["lh_py_reader_scan"], spreads["lh_py_reader_scan"] = _timed(
            lambda: spark.read.format("txtable").load(root).count(),
            runs,
            warmup_runs=1,
        )
        timings["lh_jvm_reader_scan"], spreads["lh_jvm_reader_scan"] = _timed(
            lambda: read_txtable(spark, root).count(), runs
        )
        probe_key = base.limit(1).collect()[0]["li_id"]
        timings["lh_py_point_lookup"], spreads["lh_py_point_lookup"] = _timed(
            lambda: spark.read.format("txtable")
            .load(root)
            .filter(F.col("li_id") == probe_key)
            .count(),
            runs,
            warmup_runs=1,
        )
        timings["lh_py_point_nopushdown"], spreads["lh_py_point_nopushdown"] = _timed(
            lambda: spark.read.format("txtable")
            .option("pushdown", "false")
            .load(root)
            .filter(F.col("li_id") == probe_key)
            .count(),
            runs,
            warmup_runs=1,
        )
        # manifest bloom index: non-key point lookup with per-bucket
        # bloom pruning vs the same lookup as a plain filtered scan
        bloom_root = os.path.join(tmp, "lineitem_tx_bloom")
        keyed = base.withColumn(
            "part_tag", F.concat(F.lit("p-"), F.col("l_partkey").cast("string"))
        )
        # bloom_bits sized to the data: ~6k distinct part tags per
        # bucket at sf0.1 → 64Ki bits ≈ 10 bits/value ≈ 1% fpp (the
        # default 1024 would saturate and stop pruning)
        txlog_upsert(
            spark, keyed, bloom_root, key="li_id", num_buckets=32,
            bloom_columns=["part_tag"], bloom_bits=1 << 16,
        )
        # the bloom index's win case is ABSENT/rare values (existence
        # checks before ingest; dedup probes): a value in no bucket
        # prunes everything metadata-only, where the plain read scans
        # the whole table. (A PRESENT value's rows scatter across
        # buckets by the li_id bucketing, so most kept buckets are true
        # positives — bloom pruning rightly keeps them.)
        absent_tag = "p-definitely-not-present"
        # one untimed warmup: the first probe after the bloom-building
        # upsert pays that table's first manifest/footer reads
        # (measured 3.5s first-run spread at sf0.1, then stable)
        timings["lh_bloom_absent_probe"], spreads["lh_bloom_absent_probe"] = _timed(
            lambda: read_txtable(
                spark, bloom_root, bloom_eq={"part_tag": absent_tag}
            ).count(),
            runs,
            warmup_runs=1,
        )
        timings["lh_nobloom_absent_probe"], spreads["lh_nobloom_absent_probe"] = _timed(
            lambda: read_txtable(spark, bloom_root)
            .filter(F.col("part_tag") == absent_tag)
            .count(),
            runs,
        )
        # setup (untimed): OPTIMIZE ZORDER, then a 3-month box read —
        # manifest zone maps + parquet footer pruning on the clustered
        # layout do the skipping
        compact_txtable(spark, root, zorder_by=["l_shipdate", "l_partkey"])
        window = {"l_shipdate": (date(1994, 1, 1), date(1994, 3, 31))}
        timings["lh_zorder_pruned_read"], spreads["lh_zorder_pruned_read"] = _timed(
            lambda: read_txtable(spark, root, prune_between=window)
            .agg(F.sum("l_extendedprice"))
            .collect(),
            runs,
        )
        # hybrid STALE value-index lookup (round 8): index built at v0,
        # then ONE point-write makes it stale (a single li_id -> one
        # changed bucket). The hybrid path scans (index hits | changed)
        # buckets — an order's ≤7 lineitems + 1 — vs the full-scan
        # fallback's 32. This is the between-refreshes lookup shape a
        # minute-level-commit table serves constantly.
        from data_pipeline_demo_spark.sinks.value_index import (
            lookup_with_index,
            refresh_value_index,
        )

        ix_tab = os.path.join(tmp, "li_ixed")
        ix_root = os.path.join(tmp, "li_ix")
        tagged = base.withColumn(
            "order_tag",
            F.concat(F.lit("o-"), F.col("l_orderkey").cast("string")),
        )
        txlog_upsert(spark, tagged, ix_tab, key="li_id", num_buckets=32)
        refresh_value_index(spark, ix_tab, ix_root, "order_tag")
        one = tagged.orderBy("li_id").limit(1).collect()[0]
        touch = tagged.filter(F.col("li_id") == one["li_id"]).withColumn(
            "l_quantity", F.col("l_quantity") + F.lit(1.0)
        )
        txlog_upsert(spark, touch, ix_tab)  # index now one commit behind
        probe_tag = "o-" + str(
            tagged.filter(F.col("l_orderkey") != one["l_orderkey"])
            .orderBy(F.desc("li_id"))
            .limit(1)
            .collect()[0]["l_orderkey"]
        )
        # lookup semantics = materialize the matching rows (collect),
        # not count: a count() lets the full scan column-prune to the
        # filter column alone, which no real lookup gets to do.
        # At sf0.1 both paths are job-overhead-bound (~0.27s vs 0.28s
        # measured); the hybrid's read is ≤9/32 buckets + one index
        # bucket vs all 32, so the gap opens with table width × size.
        timings["lh_stale_hybrid_lookup"], spreads["lh_stale_hybrid_lookup"] = _timed(
            lambda: lookup_with_index(
                spark, ix_tab, ix_root, "order_tag", probe_tag
            ).collect(),
            runs,
            warmup_runs=1,
        )
        timings["lh_stale_full_scan"], spreads["lh_stale_full_scan"] = _timed(
            lambda: read_txtable(spark, ix_tab)
            .filter(F.col("order_tag") == probe_tag)
            .collect(),
            runs,
        )
        # the fresh-index point lookup (q95's shape) on the same table,
        # for the index-vs-scan headline: ≤7 buckets + 1 index bucket
        refresh_value_index(spark, ix_tab, ix_root, "order_tag")
        timings["lh_fresh_index_lookup"], spreads["lh_fresh_index_lookup"] = _timed(
            lambda: lookup_with_index(
                spark, ix_tab, ix_root, "order_tag", probe_tag,
                require_fresh=True,
            ).collect(),
            runs,
            warmup_runs=1,
        )
        # round-10 verbs: conditional MERGE (per-run cost = the touched-
        # bucket classify+rewrite; same fresh ~0.1% slice convention as
        # the delete pair so every run pays real work) and COPY INTO's
        # metadata-only skip decision over an already-loaded landing dir
        from data_pipeline_demo_spark.sinks.copy_into import copy_into
        from data_pipeline_demo_spark.sinks.merge import (
            MatchedClause,
            NotMatchedClause,
            txlog_merge,
        )

        cm_slice = iter(k for k in range(1, 1000) if k % 8 != 0)

        # Same-treatment raw pair (round-12 judge directive #4): this
        # key now measures EXACTLY the lh_merge_upsert shape — a
        # persisted, pre-counted ~10% batch, merge cost alone in the
        # timed path — so the two raw keys compare at face value
        # across rounds. (BENCH_r11's pair misread as a 2.7x
        # regression because the old conditional key paid a full-scan
        # 0.1% slice + dedup inside the timed path.) The batch is
        # pre-deduped untimed because conditional MERGE refuses
        # duplicate source keys (Delta parity); rows a run deletes
        # (quantity < 2) re-insert on the next run — steady-state
        # alternation over the same touched buckets.
        cond_batch = (
            base.filter(F.col("l_orderkey") % 10 == 0)
            .dropDuplicates(["li_id"])
            .persist()
        )
        cond_batch.count()

        def _cond_merge():
            return txlog_merge(
                spark,
                cond_batch,
                root,
                matched=[
                    MatchedClause(
                        "update",
                        condition="s.l_quantity > 25",
                        assignments={"l_quantity": "t.l_quantity + 1"},
                    ),
                    MatchedClause("delete", condition="s.l_quantity < 2"),
                ],
                not_matched=[NotMatchedClause()],
            )

        timings["lh_conditional_merge"], spreads["lh_conditional_merge"] = _timed(
            lambda: _cond_merge(), runs
        )
        cond_batch.unpersist()
        # Drift-proof conditional-merge cost ratio (round-11 open item:
        # the two raw keys live in distant bench sections, so their
        # cross-key ratio is spread-dominated run-to-run, 1.02-1.56).
        # Here plain upsert and conditional merge ALTERNATE on identical
        # fresh ~0.1% slices in one session — machine drift cancels and
        # the median ratio is the number to trust round-over-round.
        ratios = []
        for _ in range(3):
            k1, k2 = next(cm_slice), next(cm_slice)
            src_u = base.filter(F.col("li_id") % 1000 == k1).dropDuplicates(
                ["li_id"]
            )
            t0 = time.perf_counter()
            txlog_upsert(spark, src_u, root)
            t_up = time.perf_counter() - t0
            src_c = base.filter(F.col("li_id") % 1000 == k2).dropDuplicates(
                ["li_id"]
            )
            t0 = time.perf_counter()
            txlog_merge(
                spark,
                src_c,
                root,
                matched=[
                    MatchedClause(
                        "update",
                        condition="s.l_quantity > 25",
                        assignments={"l_quantity": "t.l_quantity + 1"},
                    ),
                    MatchedClause("delete", condition="s.l_quantity < 2"),
                ],
                not_matched=[NotMatchedClause()],
            )
            ratios.append((time.perf_counter() - t0) / max(t_up, 1e-9))
        timings["lh_cond_vs_upsert_x"] = round(sorted(ratios)[1], 3)
        land = os.path.join(tmp, "copy_landing")
        base.limit(50_000).coalesce(4).write.parquet(land)
        copy_tab = os.path.join(tmp, "copy_tx")
        txlog_upsert(
            spark, base.limit(1), copy_tab, key="li_id", num_buckets=32
        )
        copy_into(spark, copy_tab, land, "parquet")  # untimed: the load
        timings["lh_copy_skip_decision"], spreads["lh_copy_skip_decision"] = _timed(
            lambda: copy_into(spark, copy_tab, land, "parquet"), runs
        )
        # file-count stress (round-11 judge directive #6): a 1,000-file
        # landing dir — load once (listing + 1,000-file read + one
        # commit), then the skip decision, which must stay metadata-flat
        # (one listing + one sidecar-chain read, zero data IO)
        import pyarrow as pa
        import pyarrow.parquet as pq

        land1k = os.path.join(tmp, "copy_landing_1k")
        os.makedirs(land1k)
        for i in range(1000):
            pq.write_table(
                pa.table(
                    {
                        "li_id": pa.array([10_000_000 + i], pa.int64()),
                        "l_quantity": pa.array([float(i % 50)]),
                    }
                ),
                os.path.join(land1k, f"f{i:04d}.parquet"),
            )
        copy_1k_tab = os.path.join(tmp, "copy_tx_1k")
        txlog_upsert(
            spark, base.limit(1), copy_1k_tab, key="li_id", num_buckets=32
        )
        timings["lh_copy_1kfiles_load"], spreads["lh_copy_1kfiles_load"] = _timed(
            lambda: copy_into(spark, copy_1k_tab, land1k, "parquet"), 1
        )
        timings["lh_copy_1kfiles_skip"], spreads["lh_copy_1kfiles_skip"] = _timed(
            lambda: copy_into(spark, copy_1k_tab, land1k, "parquet"), runs
        )
        # manifest-shard commit flatness (round-12 judge directive #1):
        # single-bucket commit latency on a SHARDED table at 10x the
        # file count, over the same commit at 1x — ~1.0 means commit
        # metadata cost is flat in table file count (the unsharded
        # ratio at these sizes reads ~5-10x; tools/manifest_soak.py
        # has the full curve to 1M files)
        from data_pipeline_demo_spark.sinks.txlog import (
            _commit_manifest,
            _latest_manifest,
        )

        def _shard_commit_s(n_files: int) -> float:
            sroot = os.path.join(tmp, f"shardflat_{n_files}")
            buckets = {
                str(b): [
                    f"data/{b:04d}/{i:08d}-feedfacefeedface.parquet"
                    for i in range(max(1, n_files // 32))
                ]
                for b in range(32)
            }
            _commit_manifest(
                spark, sroot,
                {
                    "version": 0, "key": "li_id", "num_buckets": 32,
                    "buckets": buckets,
                    "row_counts": {b: 1 for b in buckets},
                    "app_txns": {}, "stats_columns": [],
                    "bucket_stats": {}, "bloom_columns": [],
                    "bucket_blooms": {}, "bloom_bits": 1024,
                    "manifest_sharding": {"groups": 32},
                    "operation": "BENCH",
                    "committed_at_ms": int(time.time() * 1000),
                },
            )
            prev = _latest_manifest(spark, sroot)
            nb = dict(prev["buckets"])
            nb["7"] = list(nb["7"]) + ["data/0007/new.parquet"]
            t0 = time.perf_counter()
            _commit_manifest(
                spark, sroot,
                {
                    "version": 1, "key": "li_id", "num_buckets": 32,
                    "buckets": nb,
                    "row_counts": dict(prev["row_counts"]),
                    "app_txns": {}, "stats_columns": [],
                    "bucket_stats": {}, "bloom_columns": [],
                    "bucket_blooms": {}, "bloom_bits": 1024,
                    "operation": "BENCH",
                    "committed_at_ms": int(time.time() * 1000),
                },
                prev=prev,
            )
            return time.perf_counter() - t0

        timings["lh_shard_commit_flat_x"] = round(
            _shard_commit_s(100_000) / max(_shard_commit_s(10_000), 1e-9), 3
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return timings, spreads


def bench_lakehouse_10x(spark, sf_dir: str, runs: int):
    """The pruning pairs at ~10x the bench SF (round-8 judge directive
    #4): every pruning pair won at sf0.1 EXCEPT the fresh value-index
    probe, which was parity — overhead-bound at 600k rows where probe
    fixed costs (manifest read, job launch) dominate the saved IO.
    SCALE.md's asymptotic claims get their first measured crossover
    here: lineitem replicated 10x (~6M rows at sf0.1) into a 64-bucket
    scratch txtable, then the five pruning pairs timed as ``_10x``
    keys — bloom absent-probe, IS NULL manifest pruning, Z-order box
    read, python-reader point pushdown, and the fresh + stale value-
    index lookups — each against its unpruned twin on the SAME table."""
    import shutil
    import tempfile
    from datetime import date

    from pyspark.sql import functions as F

    from data_pipeline_demo_spark.sinks.txlog import (
        compact_txtable,
        read_txtable,
        txlog_upsert,
    )
    from data_pipeline_demo_spark.sinks.value_index import (
        lookup_with_index,
        refresh_value_index,
    )
    from data_pipeline_demo_spark.sources.tables import table
    from data_pipeline_demo_spark.sources.txtable_source import (
        register_txtable_source,
    )

    tmp = tempfile.mkdtemp(prefix="bench-txtable10x-")
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    try:
        li = table(spark, sf_dir, "lineitem")
        # 10x replication with disjoint keys: rep spreads every copy to
        # a distinct li_id (and a distinct order_tag), so per-value row
        # counts keep the sf-scale shape while the table grows 10x
        base10 = (
            li.select(
                "l_orderkey",
                "l_linenumber",
                "l_partkey",
                "l_quantity",
                "l_extendedprice",
                "l_shipdate",
            )
            .withColumn(
                "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
            )
            .select(
                (
                    (F.col("l_orderkey") * 8 + F.col("l_linenumber")) * 10
                    + F.col("rep")
                ).alias("li_id"),
                (F.col("l_orderkey") * 10 + F.col("rep")).alias("okey10"),
                "l_partkey",
                "l_quantity",
                "l_extendedprice",
                "l_shipdate",
            )
        )
        root = os.path.join(tmp, "li10x")
        # setup (untimed): one build carries BOTH metadata tiers the
        # pairs probe — shipdate zone maps + a part_tag bloom — so the
        # five pairs share a single 10x table build
        keyed = base10.withColumn(
            "part_tag",
            F.concat(F.lit("p-"), F.col("l_partkey").cast("string")),
        ).withColumn(
            "order_tag", F.concat(F.lit("o-"), F.col("okey10").cast("string"))
        )
        txlog_upsert(
            spark,
            keyed,
            root,
            key="li_id",
            num_buckets=64,
            stats_columns=["l_shipdate"],
            bloom_columns=["part_tag"],
            bloom_bits=1 << 16,
        )
        # --- pair 1: bloom absent-probe vs plain filtered scan
        absent_tag = "p-definitely-not-present"
        timings["lh_bloom_absent_probe_10x"], spreads[
            "lh_bloom_absent_probe_10x"
        ] = _timed(
            lambda: read_txtable(
                spark, root, bloom_eq={"part_tag": absent_tag}
            ).count(),
            runs,
            warmup_runs=1,
        )
        timings["lh_nobloom_absent_probe_10x"], spreads[
            "lh_nobloom_absent_probe_10x"
        ] = _timed(
            lambda: read_txtable(spark, root)
            .filter(F.col("part_tag") == absent_tag)
            .count(),
            runs,
        )
        # --- pair 2: IS NULL manifest pruning vs full predicate scan
        timings["lh_isnull_pruned_probe_10x"], spreads[
            "lh_isnull_pruned_probe_10x"
        ] = _timed(
            lambda: read_txtable(
                spark, root, prune_is_null={"l_shipdate": True}
            ).count(),
            runs,
        )
        timings["lh_isnull_full_scan_10x"], spreads[
            "lh_isnull_full_scan_10x"
        ] = _timed(
            lambda: read_txtable(spark, root)
            .filter("l_shipdate IS NULL")
            .count(),
            runs,
        )
        # --- pair 3: python-reader point lookup, pushdown on vs off
        register_txtable_source(spark)
        probe_key = keyed.limit(1).collect()[0]["li_id"]
        timings["lh_py_point_lookup_10x"], spreads[
            "lh_py_point_lookup_10x"
        ] = _timed(
            lambda: spark.read.format("txtable")
            .load(root)
            .filter(F.col("li_id") == probe_key)
            .count(),
            runs,
            warmup_runs=1,
        )
        timings["lh_py_point_nopushdown_10x"], spreads[
            "lh_py_point_nopushdown_10x"
        ] = _timed(
            lambda: spark.read.format("txtable")
            .option("pushdown", "false")
            .load(root)
            .filter(F.col("li_id") == probe_key)
            .count(),
            runs,
            warmup_runs=1,
        )
        # --- pair 4 setup: value index on order_tag (built fresh), one
        # probe tag whose ≤7 rows live in few buckets
        ix_root = os.path.join(tmp, "li10x_ix")
        refresh_value_index(spark, root, ix_root, "order_tag")
        probe_tag = "o-" + str(
            keyed.orderBy(F.desc("li_id")).limit(1).collect()[0]["okey10"]
        )
        timings["lh_fresh_index_lookup_10x"], spreads[
            "lh_fresh_index_lookup_10x"
        ] = _timed(
            lambda: lookup_with_index(
                spark, root, ix_root, "order_tag", probe_tag,
                require_fresh=True,
            ).collect(),
            runs,
            warmup_runs=1,
        )
        timings["lh_index_full_scan_10x"], spreads[
            "lh_index_full_scan_10x"
        ] = _timed(
            lambda: read_txtable(spark, root)
            .filter(F.col("order_tag") == probe_tag)
            .collect(),
            runs,
        )
        # --- pair 5: the index goes ONE commit stale (a single-row
        # point write touches one bucket); hybrid lookup vs stale scan
        one = keyed.orderBy("li_id").limit(1).collect()[0]
        touch = keyed.filter(F.col("li_id") == one["li_id"]).withColumn(
            "l_quantity", F.col("l_quantity") + F.lit(1.0)
        )
        txlog_upsert(spark, touch, root)
        timings["lh_stale_hybrid_lookup_10x"], spreads[
            "lh_stale_hybrid_lookup_10x"
        ] = _timed(
            lambda: lookup_with_index(
                spark, root, ix_root, "order_tag", probe_tag
            ).collect(),
            runs,
            warmup_runs=1,
        )
        timings["lh_stale_full_scan_10x"], spreads[
            "lh_stale_full_scan_10x"
        ] = _timed(
            lambda: read_txtable(spark, root)
            .filter(F.col("order_tag") == probe_tag)
            .collect(),
            runs,
        )
        # --- pair 6: Z-order box read — manifest zone maps + footer
        # pruning on the clustered layout vs the same filter unhinted.
        # Setup (untimed): OPTIMIZE ZORDER rewrites every bucket. Last
        # because the rewrite drops the stale-pair's deletion vectors.
        compact_txtable(spark, root, zorder_by=["l_shipdate", "l_partkey"])
        window = {"l_shipdate": (date(1994, 1, 1), date(1994, 3, 31))}
        timings["lh_zorder_pruned_read_10x"], spreads[
            "lh_zorder_pruned_read_10x"
        ] = _timed(
            lambda: read_txtable(spark, root, prune_between=window)
            .agg(F.sum("l_extendedprice"))
            .collect(),
            runs,
        )
        timings["lh_zorder_unpruned_read_10x"], spreads[
            "lh_zorder_unpruned_read_10x"
        ] = _timed(
            lambda: read_txtable(spark, root)
            .filter(
                (F.col("l_shipdate") >= F.lit(date(1994, 1, 1)))
                & (F.col("l_shipdate") <= F.lit(date(1994, 3, 31)))
            )
            .agg(F.sum("l_extendedprice"))
            .collect(),
            runs,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return timings, spreads


def bench_streaming(spark, sf_dir: str):
    """Streaming latency instrument (round-9 judge stretch #8): every
    streaming proof so far was availableNow CORRECTNESS — no
    per-trigger latency/throughput number existed anywhere. Two
    representative jobs run at bench SF as an 8-trigger file stream
    (events split into 8 part files, maxFilesPerTrigger=1):

    - the foreachBatch txlog upsert bridge (one atomic snapshot commit
      per micro-batch — the reference's cron-shaped ingest, made
      transactional), and
    - the chained two-stateful-operator window rollup (fine tumbling →
      coarse re-window off the same watermark).

    Per-trigger wall times come from the engine's own progress events
    (StreamingQueryProgress.durationMs.triggerExecution), so the
    numbers are the scheduler's truth, not wall-clock bracketing.
    Reported per job: total wall seconds, trigger count, mean rows per
    trigger, mean and max per-trigger seconds."""
    import shutil
    import tempfile
    import time as _time

    from data_pipeline_demo_spark.sources.tables import table
    from data_pipeline_demo_spark.streaming.jobs import (
        chained_window_rollup,
        stream_upsert_writer,
    )

    timings: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="bench-stream-")
    try:
        land = tmp + "/landing"
        events = table(spark, sf_dir, "events")
        events.repartition(8).write.parquet(land)
        schema = events.schema

        def _run(mk_query, key_prefix: str):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(land)
            )
            t0 = _time.perf_counter()
            q = mk_query(stream)
            q.awaitTermination()
            total = _time.perf_counter() - t0
            progresses = [
                p
                for p in q.recentProgress
                if p["numInputRows"] > 0
            ]
            trig = [
                p["durationMs"].get("triggerExecution", 0) / 1000.0
                for p in progresses
            ]
            rows = [p["numInputRows"] for p in progresses]
            timings[f"{key_prefix}_total"] = round(total, 3)
            timings[f"{key_prefix}_triggers"] = len(progresses)
            timings[f"{key_prefix}_rows_per_trigger"] = (
                round(sum(rows) / max(len(rows), 1), 1)
            )
            timings[f"{key_prefix}_trigger_mean"] = round(
                sum(trig) / max(len(trig), 1), 3
            )
            timings[f"{key_prefix}_trigger_max"] = round(
                max(trig, default=0.0), 3
            )

        _run(
            lambda s: stream_upsert_writer(
                s,
                tmp + "/tx_target",
                key="event_id",
                checkpoint=tmp + "/ckpt_upsert",
                use_txlog=True,
                txn_app_id="bench-stream",
            )
            .trigger(availableNow=True)
            .start(),
            "st_txlog_upsert",
        )
        _run(
            lambda s: chained_window_rollup(s)
            .writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", tmp + "/ckpt_chained")
            .trigger(availableNow=True)
            .start(),
            "st_chained_window",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    queries, _ = all_queries()

    # warmup: touch every table family + JIT the common codepaths
    # (relational scan/agg, document text HOFs, embedding folds, event
    # windows) so the first heavy query isn't billed JVM/codegen
    # startup — the headline set itself is unchanged
    for w in (
        "q01_pricing_summary",    # lineitem scan + agg
        "q46_text_stats",         # documents + array/HOF codegen
        "q50_embedding_stats",    # embeddings + aggregate folds
        "q34_tumbling_window",    # events + window exprs
    ):
        queries[w](spark, sf_dir).count()
    # JIT the dedup/similarity operator shapes on a tiny slice, then
    # drop the warmup scratch so q41 still pays its full-corpus shingle
    # materialization honestly (only codegen/JIT is pre-warmed, never
    # data)
    from pyspark.sql import functions as F  # noqa: E402

    from data_pipeline_demo_spark.operators import dedup, similarity  # noqa: E402
    from data_pipeline_demo_spark.sources.tables import table  # noqa: E402

    tiny_docs = table(spark, sf_dir, "documents").limit(64)
    dedup.jaccard_similarity_join(tiny_docs, threshold=0.7).count()
    dedup.minhash_dedup_pairs(tiny_docs, threshold=0.7).count()
    dedup.clear_shingle_scratch()
    tiny_emb = table(spark, sf_dir, "embeddings").limit(64)
    # warm the tier q44 actually runs (certified fast path: BLAS scan +
    # rescore join + literal-DF assembly) AND the pure tier it may fall
    # back to — warming only one left the other's first run an outlier
    similarity.knn_exact_fast(
        tiny_emb,
        tiny_emb.limit(2).select(F.col("vec_id").alias("probe_id"), "embedding"),
    ).count()
    similarity.knn_exact(
        tiny_emb,
        tiny_emb.limit(2).select(F.col("vec_id").alias("probe_id"), "embedding"),
    ).count()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    # noise key sampled BEFORE and AFTER the headline loop: machine
    # contention is bursty (observed 16.8s vs 11.4s headline totals
    # back-to-back with a calm single-point noise read), so one sample
    # can miss the burst the headline paid — two bracketing samples
    # average over the window the headline actually ran in
    noise_before = bench_noise_key(spark, sf_dir)
    for name in HEADLINE:
        timings[name], spreads[name] = _timed(
            lambda name=name: queries[name](spark, sf_dir).count(),
            runs,
            # repeated runs must pay the same cost as the first: the
            # dedup family materializes a shingle-set scratch relation
            # keyed per corpus, which a rerun would otherwise reuse
            setup=dedup.clear_shingle_scratch,
            warmup_runs=WARMUP_RUNS.get(name, 0),
        )
    noise_after = bench_noise_key(spark, sf_dir)
    noise_key = round((noise_before + noise_after) / 2, 3)

    lh_timings, lh_spreads = bench_lakehouse(spark, sf_dir, runs)
    lh10_timings, lh10_spreads = bench_lakehouse_10x(spark, sf_dir, runs)
    st_timings = bench_streaming(spark, sf_dir)

    # round-6 surface additions, timed under separate keys so the
    # headline total stays comparable across rounds
    sf_timings: dict[str, float] = {}
    sf_spreads: dict[str, float] = {}
    for name in (
        "q99_bm25_topk",
        "q101_pack_sequences",
        "q103_time_range_window",
        "q105_cohort_retention",
        "q108_drift_psi",
        "q110_copurchase_lift",
        "q111_pit_join",
        "q113_fuzzy_match_join",
        "q115_radius_join",
    ):
        sf_timings[name], sf_spreads[name] = _timed(
            lambda name=name: queries[name](spark, sf_dir).count(), runs
        )

    # round-7 surface additions, same convention: TPC-H classics that
    # stress distinct plan shapes (deep join tree, correlated AVG,
    # disjunctive cross-side predicate), the as-of/interval temporal
    # joins, CDC application, and the new selection/tokenizer ops
    # q151/q152/q126 get one untimed warmup run each: their FIRST
    # full-scale run is a measured one-time outlier (q151 18.0s cold vs
    # 3.2s steady over 5 back-to-back sf0.1 runs — codegen of the
    # dim-wide k-means mean aggregate; q152 4.2 vs 1.9; q126 3.4 vs
    # 2.3), the same first-run codegen pattern q41/q42 showed in r5
    r7_warmups = {
        "q126_apply_changes": 1,
        "q151_semantic_dedup": 1,
        "q152_dsir_select": 1,
    }
    # measurement-honesty fix (r13, judge directive: VERDICT r12 item
    # 3): q151's semantic_dedup persists its assignments/pairs, and
    # Spark's CacheManager substituted run 1's cached relation into
    # runs 2-3 of the median — the old number was steady-state, not
    # cold. Every run now resets that scratch first (the same
    # treatment q41/q42's shingle scratch always had), so the r13
    # number is honestly cold; BENCH_r12's q151 was measured under the
    # old (cache-coupled) methodology.
    r7_setups = {"q151_semantic_dedup": similarity.clear_semantic_scratch}
    r7_timings: dict[str, float] = {}
    r7_spreads: dict[str, float] = {}
    for name in (
        "q141_tpch_q8",
        "q143_tpch_q17",
        "q145_tpch_q19",
        "q130_asof_variants",
        "q131_interval_overlap",
        "q126_apply_changes",
        "q150_mmr_rerank",
        "q151_semantic_dedup",
        "q152_dsir_select",
        "q153_unigram_token_freq",
    ):
        r7_timings[name], r7_spreads[name] = _timed(
            lambda name=name: queries[name](spark, sf_dir).count(),
            runs,
            setup=r7_setups.get(name),
            warmup_runs=r7_warmups.get(name, 0),
        )

    # late-round-7 additions: TPC-H completion (Q2's correlated
    # region-MIN), the curation/profile family (CDC chunking's
    # per-doc cumsum + reassembly is the heaviest text shape here),
    # and the blocked fraud screen. One untimed warmup each: first
    # sf0.1 runs measured 2-4x steady state (q167 9.2s cold vs 2.0s —
    # codegen of the decorrelated supply CTE; the same first-run
    # pattern as the r7_warmups set above)
    for name in (
        "q167_tpch_q2",
        "q172_zipf_profile",
        "q174_cdc_chunks",
        "q176_duplicate_payments",
    ):
        r7_timings[name], r7_spreads[name] = _timed(
            lambda name=name: queries[name](spark, sf_dir).count(),
            runs,
            warmup_runs=1,
        )

    headline_total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_runtime",
        "value": headline_total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": runs,
        # machine-drift instrument: noise_key is a frozen inline SQL
        # probe (never changes with the repo); headline_normalized is
        # the headline rescaled to calibration-day machine speed
        "noise_key": noise_key,
        "noise_samples": [noise_before, noise_after],
        "noise_ref": NOISE_REF_SEC,
        "headline_normalized": round(
            headline_total * NOISE_REF_SEC / noise_key, 3
        )
        if noise_key > 0
        else None,
        "spread_max_minus_min": spreads,
        "lakehouse": lh_timings,
        "lakehouse_spread": lh_spreads,
        "lakehouse_10x": lh10_timings,
        "lakehouse_10x_spread": lh10_spreads,
        "streaming": st_timings,
        "surface_r6": sf_timings,
        "surface_r6_spread": sf_spreads,
        "surface_r7": r7_timings,
        "surface_r7_spread": r7_spreads,
    }
    print(json.dumps(out))
    # The driver's artifact keeps only a TAIL of stdout; the full JSON
    # line above is long enough that truncation eats its leading keys
    # (BENCH_r07/r08 both recorded parsed:null and the judge had to
    # re-run a ~7-minute bench to learn the headline). Emit the
    # headline AGAIN as one final compact line — last bytes survive any
    # tail capture, and it is contract-complete on its own (metric /
    # value / unit / queries / sf) so a last-line json.loads also works.
    # Round-10 (r9 judge directive #3): the 2,000-char tail ate the
    # lakehouse_10x section of the big line in BENCH_r09, so the
    # 10×-scale pruning attestation lived only in SURVEY text. Carry
    # ALL six pruning pairs (12 _10x keys), the lakehouse headline
    # VERBS (the 1× pruning twins are covered by the pairs), and the
    # streaming latency keys in the summary line too. Size budget: the
    # whole line must stay under the 2,000-char tail, or its leading
    # bytes get eaten and the last-line json.loads fails — measured
    # ~1.7 KB with this key set.
    lh_headline = {
        k: v
        for k, v in lh_timings.items()
        if k
        in (
            "lh_merge_upsert",
            "lh_cdc_diff",
            "lh_cow_delete",
            "lh_mor_delete",
            "lh_zorder_pruned_read",
            "lh_py_reader_scan",
            "lh_jvm_reader_scan",
            # round-10 verbs: classify+rewrite conditional MERGE and
            # COPY INTO's metadata-only skip decision
            "lh_conditional_merge",
            # the interleaved same-slice ratio — the drift-proof form
            # of the conditional-merge/upsert comparison
            "lh_cond_vs_upsert_x",
            "lh_copy_skip_decision",
            # round-11 file-count stress: 1,000-file landing load and
            # its metadata-flat skip decision
            "lh_copy_1kfiles_load",
            "lh_copy_1kfiles_skip",
            # round-12: sharded-manifest commit at 10x files / 1x —
            # ~1.0 = commit metadata cost flat in table file count
            "lh_shard_commit_flat_x",
        )
    }
    summary = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": timings,
        "sf": sf,
        "noise_key": noise_key,
        "headline_normalized": out["headline_normalized"],
        "lakehouse": lh_headline,
        "lakehouse_10x": lh10_timings,
        "streaming": st_timings,
    }
    sys.stdout.flush()
    print(json.dumps(summary))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
