"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}

Each query is executed to completion (count() over the result — forces
the full plan without driver-side materialization of wide rows). A short
warmup runs first so JVM/codegen startup isn't billed to the first query.
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    queries, _ = all_queries()

    # warmup: touch every table + JIT the common codepaths
    queries["q01_pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
