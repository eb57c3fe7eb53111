"""Whole-registry physical-plan audit: the 100x-scale red-flag sweep.

Round 7's judge found three scale-killer plans (unpartitioned windows
over table-grain relations) that were invisible to value-level checks
— every hash was green. This tool makes that audit mechanical: build
every registered query's executed plan at a small SF (plans are
SF-independent in shape) and flag

- ``unpartitioned_window``   a Window node with an empty partition
                             spec (WindowExec moves ALL rows to one
                             task) — unless the subtree below it is
                             aggregate-bounded (metadata-sized);
- ``single_partition_feed``  an Exchange SinglePartition whose subtree
                             does not start with an aggregate /
                             TakeOrderedAndProject / Limit — i.e. a
                             full relation serialized through one task;
- ``cartesian``              CartesianProduct or a non-equi
                             BroadcastNestedLoopJoin;
- ``row_python``             BatchEvalPython (row-at-a-time Python).

Exit code 1 iff any query raises a flag that is not in the allowlist
below. Usage::

    python tools/plan_audit.py [--sf /root/testdata/sf0.001] [query ...]

The allowlist documents the flags that are DESIGNED (each entry says
why); an undocumented flag is a regression.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Flags that are understood and accepted, with the reason they are not
# scale bugs. Keyed (query, flag).
ALLOWLIST: dict[tuple[str, str], str] = {
    ("q59_join_right_cross", "cartesian"):
        "deliberate CROSS JOIN surface demo over two dimension tables "
        "(region x nation, 125 rows) - the operator under test IS the "
        "cartesian product",
    ("q10_join_range", "cartesian"):
        "non-equi band join probes the SUPPLIER dimension as the "
        "broadcast side - dim-bounded, and fact-fact range joins have "
        "the binned operators (operators/intervals.py) as the scale "
        "path",
    ("q63_cosine_near_dup", "cartesian"):
        "the BRUTE-FORCE cosine baseline by contract (recall oracle "
        "for the ANN tiers); q45/q78/q89/q129 are the scale paths",
    ("q75_embedding_clusters", "cartesian"):
        "k-means assignment crossJoin broadcasts the k-row centroid "
        "relation (k<=64 by contract) - Lloyd's shape, not all-pairs",
    ("q76_semantic_decontam", "cartesian"):
        "broadcast side is the benchmark/eval embedding set (bounded "
        "by contract: eval suites are thousands of rows, the corpus "
        "side streams)",
    ("q151_semantic_dedup", "cartesian"):
        "SemDeDup's centroid-assignment crossJoins broadcast k-row "
        "centroid relations; the pair search itself is "
        "cluster-confined (never corpus all-pairs)",
    ("q205_bm25_indexed", "cartesian"):
        "broadcast side is the 1-row corpus-stats relation "
        "(n_docs/avgdl) read from the stats txtable",
    ("q212_hard_negatives", "cartesian"):
        "broadcast side is the 8-probe query-vector relation (pool "
        "bounded by contract); candidates are band-blocked before "
        "ranking",
}

AGG_MARKERS = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
)


def _window_nodes(plan: str) -> list[str]:
    """Window node lines (they carry the full spec on one line)."""
    return [
        ln for ln in plan.splitlines()
        if re.search(r"\bWindow(GroupLimit)? \[", ln)
    ]


def _is_unpartitioned_window_line(ln: str) -> bool:
    """A physical Window prints ``Window [exprs], [partSpec], [order]``;
    with no partitioning the middle bracket group is missing (only two
    top-level groups) or empty. WindowGroupLimit prints the partition
    spec first — same rule applies."""
    # strip the operator name / tree-drawing prefix
    body = ln.split("Window", 1)[1]
    body = body.split("[", 1)[1] if "[" in body else body
    # count top-level bracket groups after the operator
    groups, depth, cur = [], 1, []
    for ch in "[" + body:
        if ch == "[":
            depth += 1
            if depth == 2:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 1:
                groups.append("".join(cur))
                continue
        if depth >= 2:
            cur.append(ch)
    # drop the windowspecdefinition(...) expr group; the partition spec
    # group is the second-to-last when three groups print. With two
    # groups the second is EITHER the order spec (unpartitioned ordered
    # window — contains sort directions) OR the partition spec (window
    # with no ORDER BY — plain column list): only the former moves all
    # rows to one task.
    if len(groups) >= 3:
        return not groups[-2].strip()
    if len(groups) == 2:
        return bool(re.search(r"\b(ASC|DESC) NULLS", groups[-1]))
    return True


def _subtree_below(plan: str, marker: str, start: int) -> str:
    """Text from a marker to the next Exchange (roughly the subtree
    feeding it in explain output)."""
    seg = plan[start + len(marker):]
    nxt = seg.find("Exchange")
    return seg if nxt < 0 else seg[:nxt]


def audit_plan(plan: str) -> list[str]:
    flags = []
    for ln in _window_nodes(plan):
        if "WindowGroupLimit" in ln:
            continue
        if _is_unpartitioned_window_line(ln):
            # tolerate when the window's input is aggregate-bounded
            # (metadata-sized): explain prints children below the node
            idx = plan.find(ln)
            below = plan[idx + len(ln): idx + len(ln) + 2000]
            if not any(m in below for m in AGG_MARKERS):
                flags.append("unpartitioned_window")
    pos = 0
    while True:
        pos = plan.find("Exchange SinglePartition", pos)
        if pos < 0:
            break
        below = _subtree_below(plan, "Exchange SinglePartition", pos)
        if not any(m in below for m in AGG_MARKERS):
            flags.append("single_partition_feed")
        pos += 1
    if "CartesianProduct" in plan:
        flags.append("cartesian")
    # BroadcastNestedLoopJoin is benign when its broadcast side is
    # aggregate-bounded (the 1-row/k-row stats relation pattern). BNLJ
    # builds broadcast with IdentityBroadcastMode (hash joins use
    # HashedRelationBroadcastMode), so audit those exchanges' inputs.
    if re.search(r"BroadcastNestedLoopJoin Build\w+, (Inner|Cross)", plan):
        idents = list(re.finditer(r"BroadcastExchange IdentityBroadcastMode",
                                  plan))
        if not idents:
            flags.append("cartesian")
        for m in idents:
            side = plan[m.end(): m.end() + 1500]
            if not any(mark in side for mark in AGG_MARKERS):
                flags.append("cartesian")
                break
    if "BatchEvalPython" in plan:
        flags.append("row_python")
    return sorted(set(flags))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("plan-audit")
        .getOrCreate()
    )
    qs = entry.queries()
    names = args.queries or sorted(qs)
    report: dict[str, list[str]] = {}
    bad = 0
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered")
            continue
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - report, don't die
            report[name] = [f"error: {type(exc).__name__}: {exc}"[:200]]
            bad += 1
            print(f"ERR  {name}: {report[name][0]}")
            continue
        flags = [
            f for f in audit_plan(plan)
            if (name, f) not in ALLOWLIST
        ]
        if flags:
            report[name] = flags
            bad += 1
            print(f"FLAG {name}: {', '.join(flags)}")
    print(json.dumps({"audited": len(names), "flagged": bad,
                      "flags": report}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
