"""Same-box interleaved A/B of the headline set: HEAD vs a pinned
BASELINE tree (round-8 judge directive #3; label made self-describing
per round-11 directive #7 — the artifact previously hardcoded "r6"
whatever tree it actually compared).

Raw cross-session headline totals are ±30% machine-state sensitive;
this tool is the drift-proof signal: the baseline-era package
(extracted from its end-of-round commit with its fully-relative
imports, loaded under a renamed top-level dir) and HEAD run in ONE
python process, ONE SparkSession, ONE box — each pass times every
headline query under BOTH engines back-to-back, alternating which
engine goes first per pass so ordering and cache effects cancel.
Machine drift hits both sides of every pair identically; any
systematic per-query ratio != 1 is a REAL regression.

Setup (once)::

    mkdir -p /tmp/basepkg
    git archive <baseline-commit> data_pipeline_demo_spark | tar -x -C /tmp/basepkg/
    mv /tmp/basepkg/data_pipeline_demo_spark /tmp/basepkg/dpds_base
    git rev-parse --short <baseline-commit> > /tmp/basepkg/.baseline_commit

Run::

    python tools/ab_headline.py [--sf /root/testdata/sf0.1] [--passes 3] \
        [--base-pkg /tmp/basepkg] [--baseline-label r10]

Output: one JSON line with the baseline identity (label + commit),
per-query medians for both engines, the ratio, and totals — plus a
markdown parity table on stderr for SURVEY.
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
    ap.add_argument("--base-pkg", default="/tmp/basepkg")
    ap.add_argument(
        "--baseline-label",
        default=None,
        help="human label for the baseline tree (e.g. r10); defaults "
        "to the dir's .baseline_commit content or the dir name",
    )
    args = ap.parse_args()

    commit_file = os.path.join(args.base_pkg, ".baseline_commit")
    baseline_commit = None
    if os.path.exists(commit_file):
        baseline_commit = open(commit_file).read().strip()
    label = (
        args.baseline_label
        or baseline_commit
        or os.path.basename(args.base_pkg.rstrip("/"))
    )

    sys.path.insert(0, args.base_pkg)
    import dpds_base.plans as baseplans  # noqa: E402
    from dpds_base.operators import dedup as basededup  # noqa: E402

    from data_pipeline_demo_spark.operators import dedup as headdedup  # noqa: E402
    from data_pipeline_demo_spark.plans import all_queries  # noqa: E402
    from data_pipeline_demo_spark.session import get_spark  # noqa: E402

    head_q, _ = all_queries()
    base_q, _ = baseplans.all_queries()
    spark = get_spark("ab-headline")

    engines = {
        "base": (base_q, basededup.clear_shingle_scratch),
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
        order = ("base", "head") if p % 2 == 0 else ("head", "base")
        for name in HEADLINE:
            for eng in order:
                samples[eng][name].append(run_once(eng, name))
        print(f"pass {p + 1}/{args.passes} done", file=sys.stderr)

    med = {
        e: {n: round(statistics.median(v), 3) for n, v in samples[e].items()}
        for e in engines
    }
    ratio = {
        n: (
            round(med["head"][n] / med["base"][n], 3)
            if med["base"][n] > 0
            else None
        )
        for n in HEADLINE
    }
    out = {
        "metric": f"ab_headline_{label}_vs_head",
        "baseline": {"label": label, "commit": baseline_commit},
        "sf": args.sf,
        "passes": args.passes,
        "base_total": round(sum(med["base"].values()), 3),
        "head_total": round(sum(med["head"].values()), 3),
        "total_ratio": round(
            sum(med["head"].values()) / sum(med["base"].values()), 3
        ),
        "per_query": {
            n: {
                "base": med["base"][n],
                "head": med["head"][n],
                "ratio": ratio[n],
            }
            for n in HEADLINE
        },
        "samples": samples,
    }
    print(json.dumps(out))
    print(
        f"| query | {label} (s) | head (s) | head/{label} |",
        file=sys.stderr,
    )
    print("|---|---|---|---|", file=sys.stderr)
    for n in HEADLINE:
        print(
            f"| {n} | {med['base'][n]:.3f} | {med['head'][n]:.3f} "
            f"| {ratio[n]:.2f} |",
            file=sys.stderr,
        )
    print(
        f"| **total** | {out['base_total']:.3f} | {out['head_total']:.3f} "
        f"| {out['total_ratio']:.2f} |",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
