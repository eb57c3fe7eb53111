"""Capture .explain("formatted") for a set of registered queries into
plans/<round>/<name>_<suffix>.txt (optimization evidence; round dir
from $SPARK_GRAFT_PLANS_ROUND, default r13).

Usage: python tools/capture_plans.py <suffix> [name ...]
With no names, captures the bench headline + surface sets.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_demo_spark.plans import all_queries  # noqa: E402
from data_pipeline_demo_spark.session import get_spark  # noqa: E402

DEFAULT = (
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
    "q99_bm25_topk",
    "q101_pack_sequences",
    "q103_time_range_window",
    "q105_cohort_retention",
    "q108_drift_psi",
    "q110_copurchase_lift",
    "q111_pit_join",
    "q113_fuzzy_match_join",
    "q115_radius_join",
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
    "q167_tpch_q2",
    "q172_zipf_profile",
    "q174_cdc_chunks",
    "q176_duplicate_payments",
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(DEFAULT)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    queries, _ = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok")


if __name__ == "__main__":
    main()
