"""Frequent itemset mining (Apriori, level-wise) over basket-shaped
data — the market-basket generalization of the pairwise co-purchase
lift (`plans/relational.py:copurchase_lift`): which SETS of items
co-occur in at least ``min_support`` baskets, up to size 3.

Reference scope: the reference pipeline has no mining operators at all
(`/root/reference/data_pipeline.py` is row-level ETL); this implements
the classic Agrawal & Srikant 1994 structure Spark-first.

Scale design (the Apriori property is the whole point at 100 TB):
- **Level 1 prunes the universe.** One combinable groupBy counts item
  frequencies; only items frequent on their own can appear in any
  frequent pair/triple, so baskets are intersected with the frequent-
  item vocabulary BEFORE any combination is generated. On skewed
  catalogs this is the difference between Σ C(|basket|, k) over raw
  baskets and over pruned ones (long-tail items vanish here).
- **Combinations generate map-only, inside the row.** Baskets collapse
  to sorted distinct item arrays (one shuffle, combinable
  collect_set); pairs/triples emerge from nested array ``transform``s
  over each basket (JVM-side higher-order functions, zero Python) and
  explode straight into a combinable count. No self-join of the
  item-instance table: the shuffle volume is the number of GENERATED
  combinations, already support-prunable at the map side, not the
  join of two item-instance relations.
- **Candidate counts are combinable.** Each (itemset → count) groupBy
  does partial aggregation before the exchange; the HAVING filter
  runs post-shuffle on group-sized data.
- Oversized baskets (pathological |basket|) would generate C(n,3)
  combinations; ``max_basket`` caps them (dropped baskets are counted
  and reported by the caller if needed — standard practice, e.g.
  SPMF/Spark MLlib FPGrowth's transaction filtering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["frequent_itemsets"]


def frequent_itemsets(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
    max_size: int = 3,
    max_basket: int = 64,
) -> DataFrame:
    """Itemsets of size 2..``max_size`` (≤3) appearing in at least
    ``min_support`` distinct baskets. Input is item-instance grain
    (one row per basket×item occurrence; duplicates collapse).
    Returns ``items`` (comma-joined ascending item string — a
    grain-stable key for joins and differential checks), ``k`` (size),
    ``support`` (basket count), sorted nowhere (callers order).
    """
    if max_size not in (2, 3):
        raise ValueError("max_size must be 2 or 3")
    base = baskets.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()

    # level 1: frequent single items — the Apriori pruning vocabulary
    f1 = (
        base.groupBy("__i")
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(F.col("s") >= min_support)
        .select("__i")
    )

    # baskets as sorted distinct arrays of FREQUENT items only
    pruned = base.join(F.broadcast(f1), "__i")
    arrs = (
        pruned.groupBy("__b")
        .agg(F.array_sort(F.collect_set("__i")).alias("items"))
        .filter(
            (F.size("items") >= 2) & (F.size("items") <= max_basket)
        )
    )

    # pairs: i < j inside the basket array, generated JVM-side
    pair_expr = F.expr(
        """
        flatten(transform(items, (x, i) ->
            transform(slice(items, i + 2, size(items)), y ->
                concat(cast(x as string), ',', cast(y as string)))))
        """
    )
    out = (
        arrs.select(F.explode(pair_expr).alias("items"))
        .groupBy("items")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
        .select("items", F.lit(2).alias("k"), "support")
    )
    if max_size == 3:
        triple_expr = F.expr(
            """
            flatten(flatten(transform(items, (x, i) ->
                transform(slice(items, i + 2, size(items)), (y, j) ->
                    transform(slice(items, i + j + 3, size(items)), z ->
                        concat(cast(x as string), ',', cast(y as string),
                               ',', cast(z as string)))))))
            """
        )
        triples = (
            arrs.filter(F.size("items") >= 3)
            .select(F.explode(triple_expr).alias("items"))
            .groupBy("items")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= min_support)
            .select("items", F.lit(3).alias("k"), "support")
        )
        out = out.unionByName(triples)
    return out
