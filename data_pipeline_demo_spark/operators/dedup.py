"""Deduplication operators over document corpora (north-star surface).

Four tiers, trading exactness for scale:

1. **Exact** (`exact_dedup`): content-hash groupBy — one shuffle on the
   hash, no comparisons. The only correct choice for byte-identical dups.
2. **Exact n-gram Jaccard** (`jaccard_similarity_join`): inverted-index
   similarity join — explode shingles, join on shingle, count
   co-occurrences. Exact, but join fan-out is bounded by shingle document
   frequency; use after hot-shingle filtering at scale.
3. **MinHash + LSH banding** (`minhash_signatures`, `lsh_candidate_pairs`,
   `minhash_dedup_pairs`): the 100 TB path — O(n) signature pass, band
   bucketing turns all-pairs into per-bucket joins, exact verification
   only on candidates.
4. **SimHash** (`simhash`): 64-bit fingerprints; near-dups differ in few
   bits — bucket by rotated prefixes for Hamming-distance search.

The reference has no dedup beyond its per-file ledger probe
(`/root/reference/data_pipeline.py:213-238`); these operators are the
engine's generalization for training-data pipelines.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textprep import shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per identical text (md5 group).

    Hashing first means the shuffle moves 16-byte keys, not documents.
    """
    return (
        df.withColumn("__h", F.md5(F.encode(F.col(text_col), "utf-8")))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__h")
    )


def shingle_index(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Inverted index: one row per (doc, distinct shingle)."""
    return df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("shingle")
    )


def jaccard_similarity_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """EXACT shingle-Jaccard similarity self-join.

    inverted index ⋈ itself on shingle → per-pair intersection counts;
    |A∪B| = |A|+|B|−|A∩B| from per-doc sizes (broadcast — it's one long
    per doc). Returns (doc_a, doc_b, jaccard) for pairs ≥ threshold.

    Scale: fan-out concentrates on high-document-frequency shingles; for
    100 TB add a DF cap (drop shingles appearing in >0.1% of docs — they
    carry no discrimination) and/or switch to the MinHash path below.
    """
    idx = shingle_index(df, text_col, id_col, k)
    sizes = idx.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = idx.alias("a"), idx.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = F.broadcast(sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b")))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signatures as `num_hashes` columns in ONE aggregation pass.

    Hash family h_i(s) = xxhash64(i || s): the explode happens once and
    each h_i is a `min` aggregate — no ×num_hashes row blow-up, fully
    map-side combinable.
    """
    idx = shingle_index(df, text_col, id_col, k)
    mins = [
        F.min(F.xxhash64(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return idx.groupBy(id_col).agg(*mins)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 16,
) -> DataFrame:
    """Band the signature and self-join per band bucket.

    rows-per-band r = num_hashes/bands; P(candidate | jaccard j) =
    1-(1-j^r)^bands — with 16 bands × 2 rows, j=0.7 pairs are caught with
    p ≈ 1-5e-6. Bucket keys are hashes of the band slice, so the join is
    an equi-join Catalyst shuffles on (band, key): per-bucket work only.
    """
    r = num_hashes // bands
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * r + i}") for i in range(r)]).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = signatures.select(F.col(id_col), *band_cols)
    melted = banded.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("key"))
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = melted.alias("a"), melted.alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → EXACT
    Jaccard verification on candidates only. Output schema matches
    `jaccard_similarity_join` (its exact oracle) — at the planted-dup
    threshold the LSH recall is ≈1, so results coincide deterministically.
    """
    sigs = minhash_signatures(df, text_col, id_col, k, num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    idx = shingle_index(df, text_col, id_col, k)
    sh_arr = idx.groupBy(id_col).agg(F.collect_set("shingle").alias("sh"))
    a = sh_arr.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh_arr.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Bit j of the fingerprint is the sign of Σ_tokens (±1 by bit j of
    xxhash64(token)). Computed as `bits` conditional-sum aggregates in a
    single pass over the exploded distinct tokens.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), r"\s+"))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), j)) != 0, 1).otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(bits)
    ]
    voted = toks.groupBy(id_col).agg(*votes)
    fp = reduce(
        add,
        [
            F.when(F.col(f"v_{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
            for j in range(bits)
        ],
    )
    return voted.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 10,
    prefix_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Blocking: pairs are only compared when they share one of 64/prefix_bits
    rotated prefix blocks (pigeonhole: ≤ n_blocks-1 differing bits always
    collide on one block; higher distances probabilistically). 8-bit
    blocks guarantee recall to Hamming 7 — short-document SimHashes have
    soft bit margins, so distances up to ~10 matter; wider (16-bit) blocks
    shrink buckets at scale but only guarantee Hamming 3.
    """
    fps = simhash(df, text_col, id_col)
    blocks = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("blk"),
                    F.shiftrightunsigned(F.col("simhash"), i * prefix_bits)
                    .bitwiseAND(F.lit((1 << prefix_bits) - 1))
                    .alias("key"),
                )
                for i in range(64 // prefix_bits)
            ])
        ).alias("b"),
    ).select(F.col(id_col), "simhash", F.col("b.blk").alias("blk"), F.col("b.key").alias("key"))
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, ["blk", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
