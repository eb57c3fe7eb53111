"""Gap-constrained sequential pattern mining (GSP with max-gap,
Srikant & Agrawal, EDBT 1996).

A length-k pattern ``t1 > t2 > ... > tk`` is supported by a user iff
the user's event stream contains events of those types in strict
timestamp order with each consecutive step at most ``max_gap``
apart. Support = number of distinct supporting users.

Scale shape — the naive plan is a k-way self-join of events per user
(O(events_per_user^k)); this operator is LINEAR in events instead:

1. One per-user sort (single shuffle) feeding RANGE-frame windows on
   integer microseconds — ``rangeBetween(unboundedPreceding, -1)`` so
   "strictly earlier" matches the SQL ``e1.ts < e2.ts`` semantics
   exactly, including timestamp ties.
2. For each type ``a`` in the (bounded, driver-collected) vocabulary:
   a conditional running max ``last_a`` = latest earlier a-event.
   An event of type ``b`` "extends" ``a`` iff ``t - last_a <= gap``
   (integer microsecond compare — no float time arithmetic).
3. A second window pass over the SAME sort marks ``last_{a>b}`` =
   latest earlier b-event that itself extended ``a``; a c-event
   within gap of that closes ``a > b > c``. Spark reuses the sort —
   the two Window nodes share one exchange.
4. Patterns are emitted as an exploded array per event, then
   ``distinct (user, pattern)`` → ``groupBy(pattern).count``.

The vocabulary drives V + V² window expressions, so the operator is
for BOUNDED type vocabularies (page/event taxonomies, not free
strings) — the same bound the event-transition-matrix operator
documents. Cost: one sort + V² codegen columns, never a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gap_sequences"]


def gap_sequences(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_s: int = 1800,
    min_support: int = 1,
    types: list[str] | None = None,
    max_len: int = 3,
) -> DataFrame:
    """Frequent gap-constrained sequences of length 1..max_len (≤3).

    Returns ``(pattern, length, support)`` where ``pattern`` is the
    ``>``-joined type sequence and ``support`` counts distinct users.
    """
    if max_len not in (1, 2, 3):
        raise ValueError("max_len must be 1, 2, or 3")
    if types is None:
        # Bounded vocabulary by contract (see module docstring).
        types = sorted(
            r[0]
            for r in events.select(type_col).distinct().collect()
            if r[0] is not None
        )

    u, ty = F.col(user_col), F.col(type_col)
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = int(max_gap_s) * 1_000_000

    # null event types carry no pattern semantics — and concat_ws
    # SKIPS null args, so an unfiltered null successor would collapse
    # 'a>NULL' into the bare pattern 'a', double-counting L1 support
    base = events.filter(
        ty.isNotNull() & u.isNotNull() & F.col(ts_col).isNotNull()
    ).select(u.alias("__u"), ty.alias("__ty"), t.alias("__t"))

    # L1: distinct users per type.
    l1 = (
        base.select("__u", "__ty")
        .distinct()
        .groupBy(F.col("__ty").alias("pattern"))
        .agg(F.count(F.lit(1)).alias("support"))
        .select("pattern", F.lit(1).alias("length"), "support")
    )
    out = l1
    if max_len >= 2:
        w = (
            Window.partitionBy("__u")
            .orderBy("__t")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        with_last = base.select(
            "__u",
            "__ty",
            "__t",
            *[
                F.max(F.when(F.col("__ty") == a, F.col("__t")))
                .over(w)
                .alias(f"__last_{i}")
                for i, a in enumerate(types)
            ],
        )
        # pred flag per a: current event extends a within gap.
        pred = {
            a: (F.col("__t") - F.col(f"__last_{i}")) <= gap
            for i, a in enumerate(types)
        }
        pat2 = F.filter(
            F.array(
                *[
                    F.when(
                        pred[a],
                        F.concat_ws(">", F.lit(a), F.col("__ty")),
                    )
                    for a in types
                ]
            ),
            lambda x: x.isNotNull(),
        )

        if max_len >= 3:
            # Second pass over the same sort: latest earlier b-event
            # that itself extended a.
            flagged = with_last.select(
                "*",
                *[
                    F.max(
                        F.when(
                            (F.col("__ty") == b) & pred[a], F.col("__t")
                        )
                    )
                    .over(w)
                    .alias(f"__lab_{i}_{j}")
                    for i, a in enumerate(types)
                    for j, b in enumerate(types)
                ],
            )
            pat3 = F.filter(
                F.array(
                    *[
                        F.when(
                            (F.col("__t") - F.col(f"__lab_{i}_{j}")) <= gap,
                            F.concat_ws(
                                ">", F.lit(a), F.lit(b), F.col("__ty")
                            ),
                        )
                        for i, a in enumerate(types)
                        for j, b in enumerate(types)
                    ]
                ),
                lambda x: x.isNotNull(),
            )
            emitted = flagged.select(
                "__u", F.explode(F.concat(pat2, pat3)).alias("pattern")
            )
        else:
            emitted = with_last.select(
                "__u", F.explode(pat2).alias("pattern")
            )

        lk = (
            emitted.distinct()
            .groupBy("pattern")
            .agg(F.count(F.lit(1)).alias("support"))
            .select(
                "pattern",
                F.size(F.split("pattern", ">")).alias("length"),
                "support",
            )
        )
        out = out.unionByName(lk)

    return out.filter(F.col("support") >= min_support)
