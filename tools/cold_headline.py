"""Cold-JVM single-pass headline timing — the driver-instrument twin.

One process = one SparkSession = ONE timed run per headline query after
bench.py's exact warmup block (no medians): the same cold-JVM,
single-sample methodology the driver's BENCH/PERF artifacts use.
Used interleaved (A, B, A, B, ...) across processes by
`tools/ab_conf.py`'s cold mode companion loop in OPTIMIZATION_r13.md to
check a session-conf A/B on the driver's own instrument.

Run::

    SPARK_GRAFT_AQE_MIN_PARTITION_SIZE=1048576 python tools/cold_headline.py

Prints one JSON line {queries: {name: sec}, total}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_demo_spark.operators import dedup  # noqa: E402
from data_pipeline_demo_spark.plans import all_queries  # noqa: E402
from data_pipeline_demo_spark.session import get_spark  # noqa: E402
from bench import HEADLINE, WARMUP_RUNS  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cold-headline")
    queries, _ = all_queries()
    for w in (
        "q01_pricing_summary",
        "q46_text_stats",
        "q50_embedding_stats",
        "q34_tumbling_window",
    ):
        queries[w](spark, sf_dir).count()
    from pyspark.sql import functions as F  # noqa: E402

    from data_pipeline_demo_spark.operators import similarity  # noqa: E402
    from data_pipeline_demo_spark.sources.tables import table  # noqa: E402

    tiny_docs = table(spark, sf_dir, "documents").limit(64)
    dedup.jaccard_similarity_join(tiny_docs, threshold=0.7).count()
    dedup.minhash_dedup_pairs(tiny_docs, threshold=0.7).count()
    dedup.clear_shingle_scratch()
    tiny_emb = table(spark, sf_dir, "embeddings").limit(64)
    probes = tiny_emb.limit(2).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    similarity.knn_exact_fast(tiny_emb, probes).count()
    similarity.knn_exact(tiny_emb, probes).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        for _ in range(WARMUP_RUNS.get(name, 0)):
            dedup.clear_shingle_scratch()
            queries[name](spark, sf_dir).count()
        dedup.clear_shingle_scratch()
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "conf_probe": os.environ.get(
                    "SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "default-131072"
                ),
                "queries": timings,
                "total": round(sum(timings.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
