"""Same-session interleaved A/B of ONE runtime SQL conf across the
headline set (round-13 judge directive #1: settle whether the
`spark.sql.adaptive.coalescePartitions.minPartitionSize` 128KB floor —
the one session-wide r12 change invisible in plan dumps — can explain
the driver's uniform ~2x BENCH_r12 regression).

AQE partition coalescing reads the conf at execution time, so one
SparkSession can run every headline query under BOTH values
back-to-back. Each pass alternates which value goes first per query, so
machine drift and cache effects hit both sides identically; a
systematic per-query ratio != 1 is a real conf effect, anything else is
box noise.

Run::

    python tools/ab_conf.py --conf spark.sql.adaptive.coalescePartitions.minPartitionSize \
        --a 131072 --b 1048576 [--passes 3] [--sf /root/testdata/sf0.1]

Output: one JSON line {conf, a, b, per_query: {name: {a: med, b: med,
ratio_b_over_a}}, total_a, total_b}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_demo_spark.operators import dedup  # noqa: E402
from data_pipeline_demo_spark.plans import all_queries  # noqa: E402
from data_pipeline_demo_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("ab-conf")
    queries, _ = all_queries()

    # same warmup family as bench.py so neither side pays JIT
    for w in ("q01_pricing_summary", "q46_text_stats", "q34_tumbling_window"):
        queries[w](spark, args.sf).count()
    from pyspark.sql import functions as F  # noqa: E402
    from data_pipeline_demo_spark.operators import similarity  # noqa: E402
    from data_pipeline_demo_spark.sources.tables import table  # noqa: E402

    tiny = table(spark, args.sf, "documents").limit(64)
    dedup.jaccard_similarity_join(tiny, threshold=0.7).count()
    dedup.minhash_dedup_pairs(tiny, threshold=0.7).count()
    dedup.clear_shingle_scratch()
    tiny_emb = table(spark, args.sf, "embeddings").limit(64)
    probes = tiny_emb.limit(2).select(F.col("vec_id").alias("probe_id"), "embedding")
    similarity.knn_exact_fast(tiny_emb, probes).count()
    similarity.knn_exact(tiny_emb, probes).count()
    # one untimed full-scale run for the two round-5 spread outliers
    for w in ("q41_jaccard_similarity_join", "q42_minhash_lsh_dedup"):
        queries[w](spark, args.sf).count()
        dedup.clear_shingle_scratch()

    samples: dict[str, dict[str, list[float]]] = {
        q: {"a": [], "b": []} for q in HEADLINE
    }

    def run_once(name: str, value: str) -> float:
        spark.conf.set(args.conf, value)
        dedup.clear_shingle_scratch()
        t0 = time.perf_counter()
        queries[name](spark, args.sf).count()
        return time.perf_counter() - t0

    for p in range(args.passes):
        order = ("a", "b") if p % 2 == 0 else ("b", "a")
        for name in HEADLINE:
            for side in order:
                v = args.a if side == "a" else args.b
                samples[name][side].append(run_once(name, v))

    per_query = {}
    tot_a = tot_b = 0.0
    for name in HEADLINE:
        ma = statistics.median(samples[name]["a"])
        mb = statistics.median(samples[name]["b"])
        tot_a += ma
        tot_b += mb
        per_query[name] = {
            "a": round(ma, 3),
            "b": round(mb, 3),
            "ratio_b_over_a": round(mb / ma, 3) if ma else None,
        }
    print(
        json.dumps(
            {
                "conf": args.conf,
                "a": args.a,
                "b": args.b,
                "passes": args.passes,
                "per_query": per_query,
                "total_a": round(tot_a, 3),
                "total_b": round(tot_b, 3),
                "total_ratio_b_over_a": round(tot_b / tot_a, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
