"""Skew mitigation for joins and aggregations (SURVEY.md §2.2 scale
notes; the brief's "salting for skew").

First line of defense is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) — it splits
oversized sort-merge partitions at runtime with no query change. Salting
is the explicit fallback for the cases AQE can't fix:

- broadcast is impossible (dim too big) AND one fact key dominates so a
  single (key) shuffle partition exceeds an executor even after AQE
  splits (splitting helps the fact side, but every split still joins the
  same dim rows);
- skewed ``groupBy`` with non-algebraic aggregates (``collect_list``
  etc.) where map-side combine can't shrink the hot key.

``salted_join`` keeps the join exact: fact rows scatter across
``num_salts`` sub-keys deterministically, the dim side replicates once
per salt, and the join key becomes (key, salt) — the hot key's rows now
land on ``num_salts`` shuffle partitions instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, num_salts: int = 8, salt_by: list[str] | None = None
) -> DataFrame:
    """Deterministic salt column in [0, num_salts): hash of ``salt_by``
    (default: all columns), never rand() — replays and retries must land
    rows on the same salt."""
    cols = salt_by or df.columns
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(num_salts))
    return df.withColumn("__salt", salt.cast("int"))


def replicate_per_salt(df: DataFrame, num_salts: int = 8) -> DataFrame:
    """Dim-side explode: one copy of every row per salt value."""
    salts = F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    return df.withColumn("__salt", salts)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
    num_salts: int = 8,
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Exact equi-join with the shuffle key widened to (key, salt).

    Cost model: dim-side volume ×num_salts (it re-shuffles replicated),
    in exchange for the fact side's hottest key spreading over
    ``num_salts`` partitions. Worth it when hot-key volume ≫ dim size;
    measure before reaching for it — AQE already handles moderate skew.

    ``how`` is restricted to fact-preserving joins (inner / left /
    left_semi / left_anti): the dim side is physically replicated
    ``num_salts`` times, so any dim-preserving join (right / full /
    cross) would emit each unmatched dim row once per salt, silently
    breaking the exact-join contract. Those shapes should salt the
    other side or use AQE skew handling instead.
    """
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi",
        "left_anti", "leftanti", "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"(inner/left/left_semi/left_anti), got how={how!r}: the "
            f"replicated dim side would duplicate unmatched dim rows."
        )
    keys = [on] if isinstance(on, str) else list(on)
    f = with_salt(fact, num_salts, salt_by)
    d = replicate_per_salt(dim, num_salts)
    return f.join(d, on=keys + ["__salt"], how=how).drop("__salt")
