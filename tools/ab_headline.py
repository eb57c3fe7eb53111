"""Same-box interleaved A/B of the headline set: HEAD vs the round-6
tree (round-8 judge directive #3).

Judge-measured raw headline totals walked 7.85s (r6) -> 9.12s (r7) ->
10.11s (r8) while the 15 headline queries' code barely changed; the
noise probe that would attribute machine drift only exists from r8.
This tool settles it: the r6-era package (extracted from the r6-end
commit with its fully-relative imports, loaded under a renamed
top-level dir) and HEAD run in ONE python process, ONE SparkSession,
ONE box — each pass times every headline query under BOTH engines
back-to-back, alternating which engine goes first per pass so ordering
and cache effects cancel. Machine drift hits both sides of every pair
identically; any systematic per-query ratio != 1 is a REAL regression.

Setup (once)::

    git worktree list  # or: mkdir -p /tmp/r6pkg
    git archive <r6-end-commit> data_pipeline_demo_spark | tar -x -C /tmp/r6pkg/
    mv /tmp/r6pkg/data_pipeline_demo_spark /tmp/r6pkg/dpds_r6

Run::

    python tools/ab_headline.py [--sf /root/testdata/sf0.1] [--passes 3]

Output: one JSON line with per-query medians for both engines, the
ratio, and totals — plus a markdown parity table on stderr for SURVEY.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--r6-pkg", default="/tmp/r6pkg")
    args = ap.parse_args()

    sys.path.insert(0, args.r6_pkg)
    import dpds_r6.plans as r6plans  # noqa: E402
    from dpds_r6.operators import dedup as r6dedup  # noqa: E402

    from data_pipeline_demo_spark.operators import dedup as headdedup  # noqa: E402
    from data_pipeline_demo_spark.plans import all_queries  # noqa: E402
    from data_pipeline_demo_spark.session import get_spark  # noqa: E402

    head_q, _ = all_queries()
    r6_q, _ = r6plans.all_queries()
    spark = get_spark("ab-headline")

    engines = {
        "r6": (r6_q, r6dedup.clear_shingle_scratch),
        "head": (head_q, headdedup.clear_shingle_scratch),
    }

    def run_once(engine: str, name: str) -> float:
        qs, clear = engines[engine]
        clear()
        t0 = time.perf_counter()
        qs[name](spark, args.sf).count()
        return time.perf_counter() - t0

    # untimed warmup pass for BOTH engines: first-run codegen/cache
    # outliers (the bench's WARMUP_RUNS lesson) hit each engine once
    for eng in engines:
        for name in HEADLINE:
            run_once(eng, name)

    samples: dict[str, dict[str, list[float]]] = {
        e: {n: [] for n in HEADLINE} for e in engines
    }
    for p in range(args.passes):
        order = ("r6", "head") if p % 2 == 0 else ("head", "r6")
        for name in HEADLINE:
            for eng in order:
                samples[eng][name].append(run_once(eng, name))
        print(f"pass {p + 1}/{args.passes} done", file=sys.stderr)

    med = {
        e: {n: round(statistics.median(v), 3) for n, v in samples[e].items()}
        for e in engines
    }
    ratio = {
        n: round(med["head"][n] / med["r6"][n], 3) if med["r6"][n] > 0 else None
        for n in HEADLINE
    }
    out = {
        "metric": "ab_headline_r6_vs_head",
        "sf": args.sf,
        "passes": args.passes,
        "r6_total": round(sum(med["r6"].values()), 3),
        "head_total": round(sum(med["head"].values()), 3),
        "total_ratio": round(
            sum(med["head"].values()) / sum(med["r6"].values()), 3
        ),
        "per_query": {
            n: {"r6": med["r6"][n], "head": med["head"][n], "ratio": ratio[n]}
            for n in HEADLINE
        },
        "samples": samples,
    }
    print(json.dumps(out))
    print("| query | r6 (s) | head (s) | head/r6 |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for n in HEADLINE:
        print(
            f"| {n} | {med['r6'][n]:.3f} | {med['head'][n]:.3f} "
            f"| {ratio[n]:.2f} |",
            file=sys.stderr,
        )
    print(
        f"| **total** | {out['r6_total']:.3f} | {out['head_total']:.3f} "
        f"| {out['total_ratio']:.2f} |",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
