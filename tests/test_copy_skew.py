"""Hot-fingerprint skew stress for the copy-detection join (round-12
judge directive #5): plant a stopword-grade fingerprint present in 30%
of documents and prove (a) AQE's skew-join split ENGAGES in the
executed plan on the planted corpus and stays OFF on the uniform one,
(b) throughput does not collapse on the hot key — per-output-pair cost
stays within a small factor of the uniform corpus's."""

from __future__ import annotations

import re
import time

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators.winnow import copy_detection_pairs

_SKEW_CONF = {
    # production keeps Spark's defaults (256MB threshold, 1MB split
    # floor); the test corpus is KBs, so ALL THREE size knobs scale
    # down together to make the same machinery observable — the PLAN
    # PROPERTY is what's under test. The non-obvious third knob
    # (found by probing): coalescePartitions.minPartitionSize FLOORS
    # the skew-split chunk size, so with the default 1MB floor a KB-
    # scale hot partition is "one chunk" and never splits.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_conf(spark):
    old = {}
    for k, v in _SKEW_CONF.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _corpus(spark, n_docs: int, planted: bool):
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    uniform = docs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    (F.col("doc_id") * 17 + F.lit(i) * 7919) % 1_000_000
                    + 1000
                    for i in range(1)
                ]
            )
        ).alias("fp"),
    )
    if not planted:
        return uniform
    hot = docs.filter(F.col("doc_id") % 10 < 3).select(
        "doc_id", F.lit(777).alias("fp")
    )
    return uniform.unionByName(hot)


def _run(spark, fp, min_shared=1):
    pairs = copy_detection_pairs(fp, min_shared=min_shared)
    agg = pairs.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("shared").alias("s")
    )
    t0 = time.perf_counter()
    row = agg.collect()[0]
    dt = time.perf_counter() - t0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return row.n or 0, row.s or 0, dt, plan


def test_planted_hot_fp_engages_skew_split_and_bounded_cost(
    spark, skew_conf
):
    n_docs = 20000  # hot partition must clear the scaled thresholds
    n_hot = sum(1 for d in range(n_docs) if d % 10 < 3)  # 30% of docs
    pairs_p, shared_p, dt_p, plan_p = _run(
        spark, _corpus(spark, n_docs, planted=True)
    )
    pairs_u, shared_u, dt_u, plan_u = _run(
        spark, _corpus(spark, n_docs, planted=False)
    )
    # (a) the plan property: skew split engaged on the planted corpus
    assert re.search(r"SortMergeJoin\(skew=true\)", plan_p), plan_p[
        plan_p.find("SortMergeJoin") : plan_p.find("SortMergeJoin") + 120
    ]
    assert not re.search(r"skew=true", plan_u)
    # planted correctness: every hot-doc pair exists (the hot fp alone
    # witnesses C(n_hot, 2) pairs at min_shared=1)
    assert pairs_p >= n_hot * (n_hot - 1) // 2
    assert pairs_p > 100 * max(pairs_u, 1)  # the skew is real
    # (b) the cost bound: per-output-pair time on the hot corpus stays
    # within 5x the uniform corpus's (generous — bulk pair production
    # is usually CHEAPER per row; collapse would read 50-1000x)
    per_p = dt_p / max(shared_p, 1)
    per_u = dt_u / max(shared_u, 1)
    assert per_p <= 5 * per_u, (dt_p, shared_p, dt_u, shared_u)


def test_uniform_corpus_result_is_exact(spark, skew_conf):
    """Same-fp docs under the uniform generator: fp collisions happen
    iff 17*(a-b) ≡ 7919*(j-i) (mod 1e6); count pairs brute-force in
    python and compare (the skew configs must not change results)."""
    n = 400
    fps: dict[int, set] = {}
    for d in range(n):
        fps[d] = {(d * 17 + i * 7919) % 1_000_000 + 1000 for i in range(1)}
    expect = sum(
        1
        for a in range(n)
        for b in range(a + 1, n)
        if fps[a] & fps[b]
    )
    got = copy_detection_pairs(
        _corpus(spark, n, planted=False), min_shared=1
    ).count()
    assert got == expect
