"""Mergeable distinct-count sketches (Apache DataSketches HLL, built
into Spark 4 as ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``).

The 100 TB pattern this enables: COUNT(DISTINCT x) does not re-aggregate
— a month's distinct users is not the sum of 30 daily counts — so a
rollup hierarchy over raw data must either re-scan history per grain or
store the raw keys. Register-level HLL sketches ARE re-aggregatable:
store one small binary sketch per fine-grain group, union sketches (a
lossless register max at equal ``lg_k``) to any coarser grain, estimate
at read time. History is never re-scanned; incremental maintenance is a
union with the new batch's sketches.

All JVM-side datasketches expressions — no Python in the data path; the
union is combinable, so every groupBy here map-side partial-aggregates.

Reference scope note: the reference computes only whole-frame exact
counts (`/root/reference/data_pipeline.py:664-707`); this extends the
aggregation family to the approximate re-aggregatable tier the same way
``approx_count_distinct`` (q56) does, but with PERSISTENT, mergeable
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sketch_col: str = "sketch",
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per group over ``value_col`` — the fine-grain
    state a sketch rollup stores (a few KB per group at lg_k=12,
    independent of group cardinality)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k))).alias(sketch_col)
    )


def sketch_rollup(
    sketches: DataFrame,
    to_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grain: register-level
    union, lossless at equal lg_k — the estimate at the coarse grain is
    IDENTICAL to sketching the raw data directly (tested), but no raw
    data is touched."""
    return sketches.groupBy(*to_cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def sketch_merge_batches(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Incremental maintenance: fold a new batch's sketches into the
    stored ones (union per key). O(groups touched), never O(history);
    append-equals-rebuild is the tested invariant."""
    return (
        old.unionByName(new)
        .groupBy(*keys)
        .agg(F.hll_union_agg(sketch_col).alias(sketch_col))
    )


def estimate(
    sketches: DataFrame,
    sketch_col: str = "sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Read-time estimate; the sketch column is dropped."""
    return sketches.withColumn(
        out_col, F.hll_sketch_estimate(sketch_col)
    ).drop(sketch_col)


# --- mergeable heavy-hitters (Misra-Gries) sketches -----------------------
#
# The frequency analog of the HLL tier above: "top items + counts" does
# not re-aggregate either (a month's top URLs are not the union of 30
# daily top-10 lists — an item just under every daily cutoff can lead
# the month). Misra-Gries summaries ARE mergeable with a preserved
# error bound (Agarwal et al., "Mergeable Summaries", PODS 2012 —
# public result): keep at most k counters; when a compress drops mass,
# add the subtracted amount to the sketch's error bound `err`. The
# invariant carried everywhere:
#
#     stored_count <= true_count <= stored_count + err
#
# and any item with true_count > err is guaranteed PRESENT. Merging
# sums counters and error bounds, then re-compresses; the bound stays
# O(n/k) for the merged stream, so day sketches roll up to months and
# months to years without ever touching raw history.
#
# Distributed shape: per-partition partials via mapInPandas (exact
# batch value_counts folded into one MG state per group — the shuffle
# carries <= k items per (partition, group), never rows), then a
# grouped merge. Items are stringified for identity (document the cast
# at call sites); state is a JSON map column, portable to any store.


def _mg_compress(counts: dict, k: int) -> tuple[dict, int]:
    """Reduce to <= k counters; returns (counters, mass subtracted)."""
    if len(counts) <= k:
        return counts, 0
    cut = sorted(counts.values(), reverse=True)[k]
    out = {v: c - cut for v, c in counts.items() if c > cut}
    return out, cut


_HH_SCHEMA_SUFFIX = "items string, n bigint, err bigint"


def heavy_hitters_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """One MG sketch per group: ``(group_cols..., items, n, err)`` with
    ``items`` a JSON ``{item: stored_count}`` map of at most k entries,
    ``n`` the group's row count, ``err`` the max undercount. With fewer
    than k distinct values per group the sketch is EXACT (err = 0)."""
    import json as _json

    import pandas as pd

    gc = list(group_cols)
    src = df.select(
        *gc, F.col(value_col).cast("string").alias("__v")
    )
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name != "__v"
    )
    schema = f"{out_schema}, {_HH_SCHEMA_SUFFIX}"

    def partials(batches):
        state: dict = {}  # group key -> [counts dict, n, err]
        for pdf in batches:
            for key, grp in pdf.groupby(gc, dropna=False, sort=False):
                kt = key if isinstance(key, tuple) else (key,)
                st = state.setdefault(kt, [{}, 0, 0])
                vc = grp["__v"].value_counts(dropna=False)
                st[1] += int(vc.sum())
                for v, c in vc.items():
                    sv = "\x00null" if pd.isna(v) else str(v)
                    st[0][sv] = st[0].get(sv, 0) + int(c)
                st[0], cut = _mg_compress(st[0], k)
                st[2] += cut
        rows = [
            (*kt, _json.dumps(st[0], sort_keys=True), st[1], st[2])
            for kt, st in state.items()
        ]
        if rows:
            yield pd.DataFrame(rows, columns=gc + ["items", "n", "err"])

    partial = src.mapInPandas(partials, schema)
    return _hh_grouped_merge(partial, gc, k)


def _hh_grouped_merge(sketches: DataFrame, to_cols: list[str], k: int) -> DataFrame:
    import json as _json

    import pandas as pd

    gc = list(to_cols)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in sketches.schema.fields
        if f.name in gc
    )
    schema = f"{out_schema}, {_HH_SCHEMA_SUFFIX}"

    def merge(key, pdf):
        counts: dict = {}
        n = 0
        err = 0
        for _, row in pdf.iterrows():
            for v, c in _json.loads(row["items"]).items():
                counts[v] = counts.get(v, 0) + int(c)
            n += int(row["n"])
            err += int(row["err"])
        counts, cut = _mg_compress(counts, k)
        err += cut
        return pd.DataFrame(
            [(*key, _json.dumps(counts, sort_keys=True), n, err)],
            columns=gc + ["items", "n", "err"],
        )

    return sketches.groupBy(*gc).applyInPandas(merge, schema)


def heavy_hitters_rollup(
    sketches: DataFrame, to_cols: list[str], k: int = 64
) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grain — counter-map sum
    + error-bound sum + re-compress. The merged bound stays valid for
    the union stream (mergeable-summaries result); raw history is never
    re-read."""
    return _hh_grouped_merge(sketches, to_cols, k)


def heavy_hitters_estimate(
    sketches: DataFrame,
    min_share: float = 0.0,
) -> DataFrame:
    """Explode sketches to ``(group..., item, count_lo, count_hi,
    share_hi)`` rows — ``count_lo <= true <= count_hi`` — keeping items
    whose UPPER-bound share clears ``min_share`` (conservative: a true
    heavy hitter is never dropped)."""
    gc = [
        f.name
        for f in sketches.schema.fields
        if f.name not in ("items", "n", "err")
    ]
    kv = F.explode(
        F.from_json("items", "map<string,bigint>")
    ).alias("item", "count_lo")
    out = sketches.select(*gc, "n", "err", kv)
    return (
        out.select(
            *gc,
            "item",
            "count_lo",
            (F.col("count_lo") + F.col("err")).alias("count_hi"),
            ((F.col("count_lo") + F.col("err")) / F.col("n")).alias("share_hi"),
        )
        .filter(F.col("share_hi") >= min_share)
    )


# --- mergeable quantile sketches (MRL-style randomized compaction) --------
#
# The third classic mergeable summary (with HLL distinct counts and MG
# heavy hitters above): percentiles do not re-aggregate either — a
# month's p99 is not any combination of 30 daily p99s — so rollup
# hierarchies need a quantile SKETCH stored at the fine grain.
# Manku-Rajagopalan-Lindsay-shape sketch with randomized-offset
# compaction (the mergeable variant analyzed in Agarwal et al.,
# "Mergeable Summaries", PODS 2012; KLL 2016 refines capacities —
# public results): level h holds items of weight 2^h, at most k each;
# a full level sorts and promotes every other item (random parity) one
# level up. Rank estimates err by O(n·log(n/k)/k); the tests pin an
# empirical <=2% rank error at k=256 across distributions, merge
# orders, and rollups.
#
# Distributed shape mirrors the MG tier: per-partition partials via
# mapInPandas (each partial <= k·levels floats), grouped merge, JSON
# state column, estimate at read time.


def _kll_parity(level: int, items: list) -> int:
    """Deterministic pseudo-coin for compaction offset: replayable for
    identical input, varied across levels/contents (a fixed parity
    would bias every compaction the same way)."""
    h = hash((level, len(items), float(items[0]), float(items[-1])))
    return h & 1


def _kll_insert(levels: list, values, k: int) -> None:
    levels[0].extend(float(v) for v in values)
    _kll_compact(levels, k)


def _kll_compact(levels: list, k: int) -> None:
    h = 0
    while h < len(levels):
        if len(levels[h]) > k:
            buf = sorted(levels[h])
            off = _kll_parity(h, buf)
            promoted = buf[off::2]
            levels[h] = []
            if h + 1 == len(levels):
                levels.append([])
            levels[h + 1].extend(promoted)
        h += 1


def _kll_merge(a: list, b: list, k: int) -> list:
    out = [list(lvl) for lvl in a]
    while len(out) < len(b):
        out.append([])
    for h, lvl in enumerate(b):
        out[h].extend(lvl)
    _kll_compact(out, k)
    return out


def _kll_quantile(levels: list, n: int, q: float):
    """Weighted-rank quantile from the sketch: items carry weight 2^h."""
    pairs = [
        (v, 1 << h) for h, lvl in enumerate(levels) for v in lvl
    ]
    if not pairs:
        return None
    pairs.sort()
    target = q * n
    acc = 0
    for v, w in pairs:
        acc += w
        if acc >= target:
            return v
    return pairs[-1][0]


_QS_SCHEMA_SUFFIX = "levels string, n bigint"


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """One mergeable quantile sketch per group over a numeric column:
    ``(group_cols..., levels, n)`` with ``levels`` the JSON level
    buffers (<= k·log(n/k) floats total) and ``n`` the exact row count.
    Nulls are excluded (SQL aggregate semantics)."""
    import json as _json

    import pandas as pd

    gc = list(group_cols)
    src = df.select(*gc, F.col(value_col).cast("double").alias("__v"))
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name != "__v"
    )
    schema = f"{out_schema}, {_QS_SCHEMA_SUFFIX}"

    def partials(batches):
        state: dict = {}
        for pdf in batches:
            for key, grp in pdf.groupby(gc, dropna=False, sort=False):
                kt = key if isinstance(key, tuple) else (key,)
                st = state.setdefault(kt, [[[]], 0])
                vals = grp["__v"].dropna()
                _kll_insert(st[0], vals, k)
                st[1] += int(vals.size)
        rows = [
            (*kt, _json.dumps(st[0]), st[1]) for kt, st in state.items()
        ]
        if rows:
            yield pd.DataFrame(rows, columns=gc + ["levels", "n"])

    partial = src.mapInPandas(partials, schema)
    return _qs_grouped_merge(partial, gc, k)


def _qs_grouped_merge(sketches: DataFrame, to_cols: list[str], k: int) -> DataFrame:
    import json as _json

    import pandas as pd

    gc = list(to_cols)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in sketches.schema.fields
        if f.name in gc
    )
    schema = f"{out_schema}, {_QS_SCHEMA_SUFFIX}"

    def merge(key, pdf):
        levels: list = [[]]
        n = 0
        for _, row in pdf.iterrows():
            levels = _kll_merge(levels, _json.loads(row["levels"]), k)
            n += int(row["n"])
        return pd.DataFrame(
            [(*key, _json.dumps(levels), n)], columns=gc + ["levels", "n"]
        )

    return sketches.groupBy(*gc).applyInPandas(merge, schema)


def quantile_rollup(
    sketches: DataFrame, to_cols: list[str], k: int = 256
) -> DataFrame:
    """Re-aggregate stored quantile sketches to a coarser grain — level
    concatenation + re-compaction; the rank-error bound is preserved
    under merging (the mergeable-summaries result), raw history never
    re-read."""
    return _qs_grouped_merge(sketches, to_cols, k)


def quantile_estimate(
    sketches: DataFrame,
    probs: list[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Explode sketches to ``(group..., prob, value)`` estimates."""
    import json as _json

    import pandas as pd

    gc = [
        f.name
        for f in sketches.schema.fields
        if f.name not in ("levels", "n")
    ]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in sketches.schema.fields
        if f.name in gc
    )
    schema = f"{out_schema}, prob double, value double"
    plist = [float(p) for p in probs]

    def explode(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                levels = _json.loads(row["levels"])
                for p in plist:
                    rows.append(
                        (
                            *[row[c] for c in gc],
                            p,
                            _kll_quantile(levels, int(row["n"]), p),
                        )
                    )
            if rows:
                yield pd.DataFrame(rows, columns=gc + ["prob", "value"])

    return sketches.mapInPandas(explode, schema)


# --- KMV (k-minimum-values) theta sketches --------------------------------
#
# HLL unions losslessly but cannot INTERSECT; the KMV/theta family
# (Beyer et al. SIGMOD'07; Apache DataSketches theta) estimates distinct
# counts for unions AND intersections from the k smallest hash values of
# each set — the sample of the hash space doubles as a uniform sample of
# the set, so |A∩B| ≈ jaccard(sample) · |A∪B|. Sketch state is a sorted
# k-array of int64 hashes: mergeable (union = k smallest of the concat),
# bounded, storable in a txtable column like the HLL/MG/MRL trio.

_KMV_FULL = 2.0**64


def _kmv_pos(h):
    """Signed int64 hash → uniform position in (0, 1]."""
    return (h + F.lit(2.0**63) + F.lit(1.0)) / F.lit(_KMV_FULL)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct ``xxhash64``
    values of ``item_col`` as a sorted array, plus ``n_kept``. Below
    capacity the sketch IS the distinct hash set (estimates exact).

    Scale shape: distinct (group, hash) pairs shuffle once; the
    k-smallest selection is a per-group window with the rank filter
    Spark pushes below the exchange as a partial WindowGroupLimit —
    map tasks ship at most k hashes per group, never the raw items."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = df.select(
        *[F.col(c) for c in group_cols], F.xxhash64(F.col(item_col)).alias("h")
    ).distinct()
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.sort_array(F.collect_list("h")).alias("kmv"),
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        )
        .withColumn("k", F.lit(k).cast("bigint"))
    )


def kmv_estimate(col="kmv", n_kept="n_kept", k="k") -> F.Column:
    """Distinct-count estimate from a sketch row: exact ``n_kept`` below
    capacity, else the KMV estimator ``(k − 1) / pos(k-th smallest)``."""
    kth = F.try_element_at(F.col(col), F.col(k).cast("int"))
    return F.when(F.col(n_kept) < F.col(k), F.col(n_kept).cast("double")).otherwise(
        (F.col(k) - 1) / _kmv_pos(kth)
    )


def kmv_union(a="kmv_a", b="kmv_b", k="k") -> F.Column:
    """Union sketch: k smallest of the merged distinct hash arrays —
    exactly the sketch of A ∪ B, so unions re-aggregate losslessly."""
    return F.slice(
        F.array_sort(F.array_union(F.col(a), F.col(b))), 1, F.col(k).cast("int")
    )


def kmv_overlap_estimates(pairs: DataFrame) -> DataFrame:
    """Given rows carrying two sketches (``kmv_a``/``n_a``, ``kmv_b``/
    ``n_b``, shared ``k``), append union / intersection / jaccard
    estimates (theta-sketch set algebra):

    - ``est_union`` from the merged sketch;
    - ``jaccard_est`` = fraction of the union sketch's members present
      in BOTH input sketches (the union sketch is a uniform hash-space
      sample of A ∪ B);
    - ``est_intersection`` = jaccard_est · est_union.

    Pure array built-ins over k-sized state — no shuffle, no Python."""
    u = kmv_union()
    d = (
        pairs.withColumn("kmv_u", u)
        .withColumn("n_u", F.size("kmv_u").cast("bigint"))
        .withColumn(
            "est_union",
            F.when(
                (F.col("n_a") < F.col("k")) & (F.col("n_b") < F.col("k")),
                F.size(F.array_union("kmv_a", "kmv_b")).cast("double"),
            ).otherwise(
                (F.col("k") - 1)
                / _kmv_pos(F.try_element_at("kmv_u", F.col("k").cast("int")))
            ),
        )
    )
    both = F.size(
        F.array_intersect(
            F.array_intersect("kmv_u", "kmv_a"), F.col("kmv_b")
        )
    )
    return d.withColumn(
        "jaccard_est", both / F.col("n_u")
    ).withColumn("est_intersection", F.col("jaccard_est") * F.col("est_union"))


# --- Count-Min sketches (Cormode & Muthukrishnan 2005) ---------------------
#
# The per-item FREQUENCY estimator completing the mergeable family:
# HLL answers "how many distinct", MG answers "which items are heavy",
# KMV answers set algebra, MRL answers quantiles — Count-Min answers
# "how often did THIS item occur" for arbitrary probe items, including
# ones no top-k list retained. Guarantee (public result): estimates
# never undercount, and overcount ≤ εN with probability 1−δ at
# width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
#
# Spark-first shape — unlike the pandas-seamed MG state, Count-Min is
# PURE BUILT-INS end to end: the sketch is a sparse (depth, pos, cnt)
# relation per group built by one explode + one combinable groupBy-sum;
# rollups are counter-wise sums (exactly equal to direct coarse
# sketching — same property the HLL tier proves); estimates are a
# probe-sized join + min over depth. State is bounded by depth × width
# counters per group regardless of stream size.


def _cm_pos(value_col, j: int, width: int) -> F.Column:
    """Row j's counter position: pmod(xxhash64(value, j), width) — the
    depth index as a second hash input gives d independent hash
    functions from the one built-in."""
    return F.pmod(
        F.xxhash64(F.col(value_col).cast("string"), F.lit(j)), F.lit(width)
    ).cast("int")


def countmin_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """One Count-Min sketch per group as a SPARSE counter relation:
    ``(group_cols..., cm_depth, cm_pos, cm_cnt)`` — at most
    depth × width rows per group, fewer when the stream is small
    (absent counters are zero). Nulls count under their own hash like
    any value. One explode (map-only) + one combinable sum."""
    gc = list(group_cols)
    expanded = df.select(
        *gc,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("cm_depth"),
                        _cm_pos(value_col, j, width).alias("cm_pos"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__c"),
    ).select(*gc, "__c.cm_depth", "__c.cm_pos")
    return expanded.groupBy(*gc, "cm_depth", "cm_pos").agg(
        F.count(F.lit(1)).alias("cm_cnt")
    )


def countmin_rollup(sketches: DataFrame, to_cols: list[str]) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grain by counter-wise
    sum — BIT-EQUAL to sketching the coarse grain directly (positions
    depend only on the value, counts are additive), so day sketches
    roll to months without touching raw history and without widening
    the error bound beyond the merged stream's εN."""
    return sketches.groupBy(*to_cols, "cm_depth", "cm_pos").agg(
        F.sum("cm_cnt").alias("cm_cnt")
    )


def countmin_estimate(
    sketches: DataFrame,
    probes: DataFrame,
    group_cols: list[str],
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Frequency estimates for ``probes`` rows ``(group_cols...,
    value_col)``: ``est = min over depth of the probed counter``
    (absent counter = 0). Never undercounts; overcount ≤ εN with
    probability 1−δ. Cost: the probe relation expands ×depth and joins
    the sparse sketch on (group, depth, pos) — probe-sized, never
    sketch-scan-sized."""
    gc = list(group_cols)
    exp = probes.select(
        *gc,
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("cm_depth"),
                        _cm_pos(value_col, j, width).alias("cm_pos"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__c"),
    ).select(*gc, value_col, "__c.cm_depth", "__c.cm_pos")
    joined = exp.join(sketches, [*gc, "cm_depth", "cm_pos"], "left")
    return joined.groupBy(*gc, value_col).agg(
        F.min(F.coalesce(F.col("cm_cnt"), F.lit(0))).alias("est")
    )
