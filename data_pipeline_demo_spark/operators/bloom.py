"""Bloom-filter join pruning: shrink a shuffle with a KB-sized sketch.

A fact ⋉ dim semi-join at 100 TB shuffles the entire fact side on the
join key even when only a sliver of it matches. A Bloom filter built
over the dim keys is a few hundred KB at ~1% fpp, broadcasts to every
executor, and drops non-matching fact rows AT THE SCAN — the shuffle
then carries only survivors (matches + ≤fpp false positives). Spark's
optimizer injects the same idea as runtime row-level filtering when
statistics allow; this operator makes it an explicit, deterministic
primitive callers can apply to any join/aggregation input.

PySpark exposes no `bloom_filter_agg`/`might_contain`, so the filter
is built from relational primitives — which keeps every stage
JVM-side, shuffle-light, and driver-free:

- build: k hash positions per key (`xxhash64(key, seed) mod m`),
  packed into 64-bit words via `groupBy(word_idx).agg(bit_or(mask))` —
  a map-side-combinable aggregate producing ≤ m/64 rows (KBs);
- probe: k broadcast hash joins on word index + a bitwise AND per
  position — each join is against the same tiny word relation, so the
  probe side NEVER shuffles and no UDF runs.

Contract: `bloom_prune` returns a SUPERSET of the matching rows (Bloom
filters have no false negatives — a set bit is never cleared);
`bloom_semi_join` re-checks survivors with an exact semi-join,
returning exactly fact ⋉ dim while paying the shuffle only for the
pruned remainder. fpp ≈ (1 - e^(-k·n/m))^k: the defaults (m = 2^23,
k = 3) hold ~0.1% at n = 100k build keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _key64(cols: list[str]) -> Column:
    return F.xxhash64(*[F.col(c) for c in cols])


def _position(key: Column, seed: int, num_bits: int) -> Column:
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_bits))


def build_bloom_words(
    build: DataFrame,
    build_keys: list[str],
    num_bits: int = 1 << 23,
    num_hashes: int = 3,
) -> DataFrame:
    """The filter as a relation: (word_idx long, word long), one row per
    64-bit word with at least one set bit. Never collected — consumers
    broadcast-join it."""
    key = _key64(build_keys)
    positions = build.select(
        F.explode(
            F.array(*[_position(key, s, num_bits) for s in range(num_hashes)])
        ).alias("pos")
    )
    return (
        positions.select(
            F.shiftright("pos", 6).alias("word_idx"),
            # shiftleft's amount must be a literal in the DSL; the SQL
            # form takes an expression
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_prune(
    probe: DataFrame,
    build: DataFrame,
    probe_keys: list[str] | str,
    build_keys: list[str] | str | None = None,
    num_bits: int = 1 << 23,
    num_hashes: int = 3,
    words: DataFrame | None = None,
) -> DataFrame:
    """Keep probe rows whose key MIGHT appear in ``build`` (superset
    semantics: every true match survives; ≈fpp non-matches do too).

    Each of the ``num_hashes`` membership checks is a broadcast hash
    join against the word relation followed by a bitwise AND — the
    probe side streams through unshuffled. The word relation appears
    ``num_hashes`` times in the plan; AQE's stage reuse serves the
    identical inner shuffle once, and a caller pruning MANY probes
    against one build side should materialize ``build_bloom_words``
    to a table and pass it as ``words`` so the dim is scanned once
    ever."""
    pk = [probe_keys] if isinstance(probe_keys, str) else list(probe_keys)
    bk = build_keys or pk
    bk = [bk] if isinstance(bk, str) else list(bk)
    if words is None:
        words = build_bloom_words(build, bk, num_bits, num_hashes)

    key = _key64(pk)
    out = probe
    for s in range(num_hashes):
        w = words.select(
            F.col("word_idx").alias(f"__wi_{s}"), F.col("word").alias(f"__w_{s}")
        )
        out = (
            out.withColumn(f"__pos_{s}", _position(key, s, num_bits))
            .withColumn(f"__wi_{s}", F.shiftright(f"__pos_{s}", 6))
            .withColumn(
                f"__m_{s}",
                F.expr(f"shiftleft(1L, CAST(__pos_{s} % 64 AS INT))"),
            )
            .drop(f"__pos_{s}")
            .join(F.broadcast(w), f"__wi_{s}", "left")
            .filter(F.col(f"__w_{s}").bitwiseAND(F.col(f"__m_{s}")) != 0)
            .drop(f"__wi_{s}", f"__w_{s}", f"__m_{s}")
        )
    return out


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    num_bits: int = 1 << 23,
    num_hashes: int = 3,
) -> DataFrame:
    """Exact fact ⋉ dim: Bloom-prune the fact scan, then exact
    semi-join the survivors. Identical output to ``fact.join(dim, on,
    "left_semi")``; the shuffle moves only matches + ≤fpp noise."""
    keys = [on] if isinstance(on, str) else list(on)
    pruned = bloom_prune(fact, dim, keys, keys, num_bits, num_hashes)
    return pruned.join(dim.select(*keys).distinct(), keys, "left_semi")
