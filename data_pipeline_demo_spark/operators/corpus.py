"""End-to-end training-corpus preparation: the north-star composition.

A user of the reference family prepares LLM training data in exactly
this order; each stage is one of the engine's tested operators, composed
into a single declarative chain (one logical plan up to the near-dup
pair join, which is the only iterative piece):

1. quality + language gate   — codegen scan-stream filters
2. PII scrub                 — codegen regex chain, text rewritten
3. exact dedup               — hash-first groupBy + semi-join (16-byte
                               shuffle keys; documents never shuffle)
4. near-dup canonicalization — MinHash-LSH candidates, exact verify,
                               connected components, keep-min-id
5. deterministic sample      — hash-threshold predicate, replay-safe
6. token count + packing     — sharded running-window pack assembly

Stage order is load-bearing: scrubbing BEFORE dedup lets documents that
differ only in PII collapse into one cluster; sampling AFTER dedup keeps
the sample a function of the deduplicated id space (stable across
re-runs); packing last so budgets see final token counts.

Scale: stages 1-3, 5-6 are scan-stream or bounded-shuffle; stage 4 is
the candidate-bounded LSH path (never all-pairs) plus a component
propagation whose iterations are bounded by cluster diameter —
typically 2-3 for near-dup graphs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, sampling, textstats

__all__ = [
    "CorpusConfig",
    "decontaminate",
    "decontaminate_semantic",
    "prepare_training_corpus",
    "refresh_training_corpus",
]


@dataclass(frozen=True)
class CorpusConfig:
    min_quality: float = 0.5
    langs: tuple[str, ...] = ("en",)
    # optional two-sided zlib-entropy band (Gopher-style): docs whose
    # compression ratio falls outside [lo, hi] are gated out — None
    # disables the check (default: behavior unchanged)
    compression_band: tuple[float, float] | None = None
    near_dup_threshold: float = 0.7
    sample_fraction: float = 1.0
    sample_salt: int = 0
    pack_budget: int = 2048
    num_shards: int = 1024


def _quality_gate(cfg: CorpusConfig, text_col: str):
    """The shared stage-1 gate (quality score + language + optional
    compression band) — ONE definition so the full run and the
    incremental refresh can never drift apart."""
    gate = (
        (textstats.quality_score(text_col) >= cfg.min_quality)
        & textstats.lang_id(text_col).isin(*cfg.langs)
    )
    if cfg.compression_band is not None:
        lo, hi = cfg.compression_band
        gate = gate & textstats.compression_ratio(text_col).between(lo, hi)
    return gate


def prepare_training_corpus(
    df: DataFrame,
    cfg: CorpusConfig = CorpusConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Run the 6-stage preparation chain; returns the packed corpus
    (input columns with ``text_col`` scrubbed, plus ``n_tokens``,
    ``pack_id``, ``pack_offset``)."""
    gated = df.filter(_quality_gate(cfg, text_col))
    scrubbed = gated.withColumn(text_col, textstats.scrub_pii(text_col))
    exact = dedup.exact_dedup_rows(scrubbed, text_col, id_col)
    pairs = dedup.minhash_dedup_pairs(
        exact, text_col, id_col, threshold=cfg.near_dup_threshold
    )
    canon = dedup.dedup_keep_canonical(exact, pairs, id_col)
    sampled = sampling.deterministic_sample(
        canon, cfg.sample_fraction, id_col, cfg.sample_salt
    )
    with_tokens = sampled.withColumn(
        "n_tokens", textstats.token_count(text_col)
    )
    return sampling.pack_sequences(
        with_tokens,
        "n_tokens",
        id_col,
        budget=cfg.pack_budget,
        num_shards=cfg.num_shards,
    )


def decontaminate(
    training: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    ``n``-token shingle with an evaluation set (the standard n-gram
    overlap rule; n=13 is the common published choice).

    Returns ``training`` plus a ``contaminated`` boolean — callers
    filter for the clean corpus or audit the flagged slice. Plan shape:
    both sides reduce to distinct 64-bit shingle hashes (no shingle
    strings ever materialize), the benchmark side is typically
    broadcast-sized after distinct, and the membership check is a
    semi-join from the training shingle index — O(corpus tokens +
    benchmark tokens), with only 8-byte keys on the shuffle. Docs
    shorter than ``n`` tokens produce no shingles and are never
    flagged.
    """
    bench_grams = (
        dedup._index_from_sets(
            dedup.shingle_hash_sets(
                benchmark.select(
                    F.lit(0).alias("__bid"), F.col(text_col)
                ),
                text_col,
                "__bid",
                n,
            ),
            "__bid",
        )
        .select("h")
        .distinct()
    )
    train_grams = dedup._index_from_sets(
        dedup.shingle_hash_sets(training, text_col, id_col, n), id_col
    )
    hit_ids = (
        train_grams.join(bench_grams, "h", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return training.join(hit_ids, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )


def refresh_training_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    index_path: str,
    cfg: CorpusConfig = CorpusConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    update_index: bool = True,
) -> DataFrame:
    """Incremental corpus maintenance: prepare a NEW document batch
    against an already-prepared ``corpus`` — O(batch + candidates)
    work, never a re-run over the corpus.

    Same stages as `prepare_training_corpus`, with the dedup stages
    split into cross (batch vs corpus, keep-old semantics: the corpus
    doc is always canonical) and within-batch:

    1. quality/lang gate + PII scrub on the batch only;
    2. exact dedup within the batch, then exact cross-dedup via a
       content-hash anti-join against the corpus;
    3. near-dup cross-check via `dedup.dedup_against_index` (the
       at-rest MinHash index — the corpus is NOT re-signed), then
       within-batch near-dup canonicalization on the remainder;
    4. deterministic sample with the SAME salt/fraction (membership
       stays a pure function of doc id across refreshes);
    5. token count + packing of the increment (pack ids are
       per-refresh — appends land in fresh shards).

    ``update_index=True`` appends the surviving docs' band keys so the
    next refresh dedups against them too.

    Caveat (inherent to incremental dedup): a batch doc linked to the
    corpus only TRANSITIVELY through another batch doc that itself gets
    dropped survives here, where a full re-run's connected components
    would drop it. Planted-copy clusters (all pairwise similar) behave
    identically — `tests/test_corpus.py` pins full ≡ old ∪ refresh on
    such data.
    """
    gated = new_docs.filter(_quality_gate(cfg, text_col))
    scrubbed = gated.withColumn(text_col, textstats.scrub_pii(text_col))
    batch = dedup.exact_dedup_rows(scrubbed, text_col, id_col)

    corpus_hashes = corpus.select(
        F.md5(F.encode(F.col(text_col), "utf-8")).alias("__h")
    ).distinct()
    batch = (
        batch.withColumn("__h", F.md5(F.encode(F.col(text_col), "utf-8")))
        .join(corpus_hashes, "__h", "left_anti")
        .drop("__h")
    )

    cross = dedup.dedup_against_index(
        batch, corpus, index_path, text_col, id_col,
        threshold=cfg.near_dup_threshold,
    ).select(F.col("doc_new").alias(id_col)).distinct()
    batch = batch.join(cross, id_col, "left_anti")

    pairs = dedup.minhash_dedup_pairs(
        batch, text_col, id_col, threshold=cfg.near_dup_threshold
    )
    canon = dedup.dedup_keep_canonical(batch, pairs, id_col)

    sampled = sampling.deterministic_sample(
        canon, cfg.sample_fraction, id_col, cfg.sample_salt
    )
    if update_index:
        dedup.minhash_index_append(sampled, index_path, text_col, id_col)
    with_tokens = sampled.withColumn("n_tokens", textstats.token_count(text_col))
    return sampling.pack_sequences(
        with_tokens,
        "n_tokens",
        id_col,
        budget=cfg.pack_budget,
        num_shards=cfg.num_shards,
    )


def decontaminate_semantic(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    complement of :func:`decontaminate`'s 13-token n-gram rule: drop
    every corpus row whose exact cosine to ANY benchmark vector
    reaches ``threshold``. Paraphrased or reformatted benchmark
    leakage that shares no 13-gram still collides in embedding space;
    running both rules is the standard two-layer decontamination.

    Shape: benchmark suites are small by nature (10³–10⁴ rows), so the
    benchmark side BROADCASTS (norms precomputed below the join
    boundary) and the corpus is ONE scan — no shuffle, no corpus²
    term; cost is O(|corpus| × |benchmark|) fused dot-products. For a
    benchmark too large to broadcast, run the LSH tier instead
    (`similarity.cosine_near_dup_lsh` over the tagged union). The
    cosine is decimal-exact (`similarity._dot_exact`), so the decision
    boundary is reproducible bit-for-bit across engines. Zero-norm
    vectors on either side never match (cosine undefined → corpus row
    kept). Returns the surviving corpus rows unchanged.
    """
    from .similarity import _dot_exact, l2_norm_exact

    bench = (
        benchmark.select(
            F.col(vec_col).alias("__bvec"),
            l2_norm_exact(F.col(vec_col)).alias("__bnorm"),
        ).filter(F.col("__bnorm") > 0)
    )
    flagged = (
        corpus.select(
            F.col(id_col),
            F.col(vec_col),
            l2_norm_exact(F.col(vec_col)).alias("__cnorm"),
        )
        .filter(F.col("__cnorm") > 0)
        .crossJoin(F.broadcast(bench))
        .filter(
            _dot_exact(F.col(vec_col), F.col("__bvec"))
            / (F.col("__cnorm") * F.col("__bnorm"))
            >= F.lit(threshold)
        )
        .select(id_col)
        .distinct()
    )
    return corpus.join(flagged, id_col, "left_anti")


def duplicate_spans(
    df: DataFrame,
    w: int = 16,
    min_dup: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Every w-token sliding window whose exact text occurs >= min_dup
    times corpus-wide (within- and cross-document occurrences both
    count) — the detection half of exact substring deduplication (Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"; C4's boilerplate-span removal is the same shape).

    Columns: id_col, span_start (token offset), span_end (inclusive).

    Scale: spans are grouped on xxhash64 of the span text, so the
    corpus-wide count shuffles 8-byte longs, never w-token strings
    (collision odds at 64 bits are negligible against any real corpus;
    the DuckDB oracle groups the strings themselves and agrees). The
    per-doc expansion is n_tokens - w + 1 rows — linear, map-side.
    """
    toks = df.select(
        id_col, F.split(F.trim(F.col(text_col)), r"\s+").alias("__t")
    ).where((F.col(text_col).isNotNull()) & (F.trim(F.col(text_col)) != ""))
    spans = (
        toks.where(F.size("__t") >= w)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__t") - w),
                    lambda i: F.struct(
                        i.alias("span_start"),
                        F.xxhash64(
                            F.array_join(F.slice("__t", i + 1, w), " ")
                        ).alias("__h"),
                    ),
                )
            ).alias("s"),
        )
        .select(id_col, "s.span_start", "s.__h")
    )
    dup = (
        spans.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= min_dup)
    )
    return spans.join(dup, "__h").select(
        id_col,
        "span_start",
        (F.col("span_start") + (w - 1)).alias("span_end"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    w: int = 16,
    min_dup: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring deduplication: cut every token covered by a
    duplicated w-token span (ALL occurrences — boilerplate semantics)
    and reassemble the survivors in order. Whitespace normalizes to
    single spaces; documents shorter than w tokens pass through
    untouched; a fully-boilerplate document survives as an empty
    string with its removal count (so the caller decides its fate).

    Columns: id_col, cleaned_text, n_tokens_removed.

    Entirely built-in operators — no Python in the data path:
    1. detection: :func:`duplicate_spans` (hash-grouped counts);
    2. interval merge: gaps-and-islands with two windows per doc
       (running max of span_end, island id by cumulative sum);
    3. cut: posexplode tokens, range-join against the merged islands
       per doc (bounded by islands-per-doc), keep non-matches;
    4. reassemble: order-preserving sort_array over (pos, token)
       structs — associative, no order-dependent aggregation.
    """
    from pyspark.sql import Window

    base = df.select(
        id_col,
        F.coalesce(
            F.split(F.trim(F.col(text_col)), r"\s+"), F.array()
        ).alias("__t"),
    ).withColumn(
        "__t", F.filter("__t", lambda t: t != "")
    )
    marked = duplicate_spans(df, w, min_dup, text_col, id_col)

    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("span_start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(id_col)
        .orderBy("span_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        marked.withColumn("__prev_max", F.max("span_end").over(w_prev))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev_max").isNull()
                | (F.col("span_start") > F.col("__prev_max")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("__island", F.sum("__new").over(w_cum))
        .groupBy(id_col, "__island")
        .agg(
            F.min("span_start").alias("__lo"),
            F.max("span_end").alias("__hi"),
        )
    )

    tokpos = base.select(
        id_col, F.posexplode_outer("__t").alias("__pos", "__tok")
    )
    cut = (
        tokpos.alias("tp")
        .join(
            islands.alias("iv"),
            (F.col(f"tp.{id_col}") == F.col(f"iv.{id_col}"))
            & (F.col("tp.__pos") >= F.col("iv.__lo"))
            & (F.col("tp.__pos") <= F.col("iv.__hi")),
            "left",
        )
        .select(
            F.col(f"tp.{id_col}").alias(id_col),
            "tp.__pos",
            "tp.__tok",
            F.col("iv.__lo").isNotNull().alias("__cut"),
        )
    )
    return (
        cut.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("__cut") & F.col("__tok").isNotNull(),
                                F.struct("__pos", "__tok"),
                            )
                        )
                    ),
                    lambda s: s["__tok"],
                ),
                " ",
            ).alias("cleaned_text"),
            F.sum(
                F.when(F.col("__cut") & F.col("__tok").isNotNull(), 1).otherwise(0)
            ).alias("n_tokens_removed"),
        )
    )
