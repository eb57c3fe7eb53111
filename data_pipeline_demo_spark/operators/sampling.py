"""Deterministic sampling, source mixing, and sequence packing —
dataset-assembly operators for training pipelines (north-star surface).

Everything keys on hashes of a stable id, never ``rand()``: a sample
must survive task retries, reruns, and engine upgrades identically, and
a train/holdout split must stay disjoint forever. The hash-threshold
trick (keep iff ``hash(id, salt) mod M < fraction·M``) gives exact,
order-independent, replayable selection with zero state — and is plain
SQL, so every operator here is oracle-checkable by construction.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_M = 1_000_000  # threshold resolution: fractions quantize to 1e-6


def _bucket(key: Column, salt: int) -> Column:
    return F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(_M))


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: int = 0
) -> DataFrame:
    """Keep a ``fraction`` of rows, chosen by hash threshold on
    ``key_col`` — deterministic, retry-safe, no shuffle: the predicate
    evaluates inside the scan stage (hash expressions aren't
    parquet-pushable, but nothing leaves the stage either). Different
    ``salt`` values draw independent samples."""
    return df.filter(_bucket(F.col(key_col), salt) < int(fraction * _M))


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Exactly-k sample without replacement, inclusion probability
    proportional to ``weight_col`` — Efraimidis–Spirakis A-Res, the
    standard distributed weighted reservoir: each row draws
    ``u ∈ (0,1]`` and ranks by ``u^(1/w)``; the global top-k by that
    key IS a weighted sample. Quality-score-proportional corpus
    selection in one pass.

    ``u`` comes from ``xxhash64(key, salt)``, not ``rand()`` — the
    draw is a pure function of (row identity, salt), so the sample
    survives retries/reruns identically and different salts give
    independent draws (same determinism contract as everything here).

    Scale shape: the rank key evaluates in the scan stage; the global
    top-k plans as TakeOrderedAndProject (per-partition heaps, k-row
    driver merge — never a full sort). Rows with non-positive or null
    weight are excluded (zero weight = never sampled).
    """
    # u in (0,1]: (bucket+1)/M over a fine modulus; +1 avoids ln(0)
    u = (_bucket(F.col(key_col), salt) + 1).cast("double") / F.lit(float(_M))
    # rank = u^(1/w), monotone in ln(u)/w — use the log form directly
    # (equal ordering, better conditioning for tiny weights)
    rank = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__wr", rank)
        .orderBy(F.col("__wr").desc(), F.col(key_col))
        .limit(k)
        .drop("__wr")
    )


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[object, float],
    stratum_col: str,
    key_col: str = "doc_id",
    salt: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum hash-threshold sampling — the source-mixing
    primitive (e.g. keep 100% of books, 10% of web). Strata absent from
    ``fractions`` keep ``default_fraction``. One scan-stage filter, no
    shuffle."""
    thresh = F.lit(int(default_fraction * _M))
    for value, frac in fractions.items():
        thresh = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(int(frac * _M))
        ).otherwise(thresh)
    return df.filter(_bucket(F.col(key_col), salt) < thresh)


def train_holdout_split(
    df: DataFrame, holdout_fraction: float, key_col: str = "doc_id", salt: int = 7
) -> tuple[DataFrame, DataFrame]:
    """(train, holdout): disjoint, covering, and stable — a row's side
    depends only on its key, so later increments of the same corpus
    never leak a holdout key into train."""
    cut = int(holdout_fraction * _M)
    b = _bucket(F.col(key_col), salt)
    return df.filter(b >= cut), df.filter(b < cut)


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
    num_shards: int = 1024,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign each document to a fixed-token-budget pack (the batch
    assembly step before training): documents are laid out in a
    deterministic order and a pack boundary falls every ``budget``
    tokens of running length — pack id = floor(exclusive-cumsum /
    budget). A pack's payload can overshoot the budget by at most its
    last document (the standard contiguous-packing trade; the trainer
    truncates or pads).

    Scale shape: a single global running sum would serialize on one
    partition, so documents are first sharded by key hash and packed
    WITHIN shards — each shard's window sorts independently, and pack
    ids are (shard, local pack) pairs flattened into one long. At 100 TB
    pick ``num_shards`` ≳ cluster parallelism; packing quality is
    unaffected (every shard still fills packs back-to-back).

    Returns the input plus ``pack_id`` and ``pack_offset`` (the doc's
    starting token offset inside its pack).
    """
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards)).alias("__shard")
    w = Window.partitionBy("__shard").orderBy(
        *[F.col(c) for c in order_cols], F.col(id_col)
    )
    cum_excl = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    local_pack = F.floor(cum_excl / F.lit(budget))
    return (
        df.withColumn("__shard", shard)
        .withColumn("__cum_excl", cum_excl)
        .withColumn(
            "pack_id",
            (F.col("__shard") * F.lit(2**40) + local_pack).cast("long"),
        )
        .withColumn(
            "pack_offset",
            (F.col("__cum_excl") - local_pack * F.lit(budget)).cast("long"),
        )
        .drop("__shard", "__cum_excl")
    )


def mixture_plan(
    df: DataFrame,
    targets: Mapping[object, float],
    domain_col: str,
    weight_col: str | None = None,
) -> dict[object, float]:
    """Solve per-domain sampling fractions that realize a target
    mixture (data-mixing layer above :func:`stratified_sample` — the
    DoReMi/Pile-style "fix domain shares, sample accordingly" step).

    ``targets`` are relative shares (renormalized here); availability
    per domain is measured as row count, or mass of ``weight_col``
    (e.g. token counts) when given. The plan keeps the mixture EXACT
    at the largest total the scarcest domain allows:
    ``T = min_d(avail_d / share_d)``, ``fraction_d = share_d·T /
    avail_d`` — the binding domain keeps fraction 1.0 and everything
    else downsamples to match. One metadata-sized grouped aggregate;
    domains absent from ``targets`` get fraction 0 (dropped); a target
    domain with NO data raises (the mixture is unrealizable, silently
    returning a skewed sample would be worse).
    """
    total = float(sum(targets.values()))
    if total <= 0:
        raise ValueError("targets must have positive total share")
    shares = {d: s / total for d, s in targets.items() if s > 0}
    measure = (
        F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    ).alias("__avail")
    avail = {
        r[domain_col]: float(r["__avail"] or 0)
        for r in df.groupBy(domain_col).agg(measure).collect()
        if r[domain_col] in shares
    }
    missing = [d for d in shares if avail.get(d, 0) <= 0]
    if missing:
        raise ValueError(
            f"mixture targets name domains with no available data: "
            f"{sorted(map(str, missing))}"
        )
    t_max = min(avail[d] / s for d, s in shares.items())
    return {d: min(1.0, s * t_max / avail[d]) for d, s in shares.items()}


def mixture_sample(
    df: DataFrame,
    targets: Mapping[object, float],
    domain_col: str,
    weight_col: str | None = None,
    key_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic mixture resampling: compute :func:`mixture_plan`
    and apply it as one hash-threshold scan filter
    (:func:`stratified_sample` semantics — replayable, retry-safe, no
    shuffle). With ``weight_col`` the plan balances mass (tokens)
    rather than rows; per-row hash selection then realizes each
    domain's fraction in expectation over rows, which preserves the
    target mass mixture when weights are identically distributed
    within a domain (document the caveat, don't hide it)."""
    plan = mixture_plan(df, targets, domain_col, weight_col)
    return stratified_sample(
        df, plan, domain_col, key_col=key_col, salt=salt, default_fraction=0.0
    )


def stratified_sample_exact_k(
    df: DataFrame,
    k: int,
    stratum_col: str,
    key_col: str = "doc_id",
) -> DataFrame:
    """Exactly-k-per-stratum sample (vs the fraction-based
    :func:`stratified_sample`): rows ranked inside each stratum by the
    md5 of their key — a deterministic, engine-portable shuffle order —
    and the first k kept, with ``sample_rank`` exposed so downstream
    stages can take nested prefixes (rank ≤ j for any j ≤ k is itself a
    valid smaller sample). One hash-partition window per stratum; the
    shuffle carries the corpus once, skew-bounded by the largest
    stratum (salt the stratum key first if one stratum dominates)."""
    from pyspark.sql import Window

    order = F.md5(F.encode(F.col(key_col).cast("string"), "utf-8"))
    w = Window.partitionBy(stratum_col).orderBy(order, key_col)
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def global_row_index(
    df: DataFrame, order_by: Sequence[str], index_col: str = "idx"
) -> DataFrame:
    """Stable 0-based GLOBAL row index in total ``order_by`` order —
    the "give every training example a global id" primitive — without
    the naive global window's single-partition sort (which serializes
    the whole table through one task; the plan-properties suite bans
    that shape for table-sized data).

    Two-pass distributed ranking (the classic zipWithIndex recipe
    re-expressed declaratively): range-repartition on the total order
    (range partition i holds strictly smaller keys than i+1), rank
    WITHIN each partition (per-partition window — parallel), then add
    each partition's exclusive prefix count, computed by a window over
    the PARTITION-COUNT-sized tally relation (metadata-sized: its
    single-partition exchange carries ~numPartitions rows, never the
    table) and broadcast back. ``order_by`` must be a total order
    (include a unique tiebreaker) or ranks at range boundaries are
    nondeterministic."""
    if not order_by:
        raise ValueError("order_by must name at least one column")
    cols = [F.col(c) for c in order_by]
    ranged = df.repartitionByRange(*cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    local = ranged.withColumn("__lrn", F.row_number().over(w))
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w2 = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w2), F.lit(0))
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            index_col,
            (F.col("__off") + F.col("__lrn") - 1).cast("bigint"),
        )
        .drop("__pid", "__lrn", "__off")
    )


def distributed_prefix_sums(
    df: DataFrame,
    order_by: Sequence[str],
    sum_cols: Sequence[str],
    out_cols: Sequence[str] | None = None,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Running (inclusive) prefix sums of ``sum_cols`` over a TOTAL
    ``order_by`` order — the distributed cumulative-sum primitive
    behind ECDFs / running totals — without the naive global window's
    single-partition sort (``Window.orderBy`` with no partition
    serializes the whole relation through one task; fine at 5 rows,
    a scale-killer at distinct-value cardinality ≈ row count).

    Same two-pass shape as :func:`global_row_index`: range-repartition
    on the total order, cumulative-sum WITHIN each partition (parallel
    per-partition windows), tally per-partition totals (a
    ~numPartitions-row relation — its single-partition exchange is
    metadata-sized, never the table), convert to exclusive prefix
    offsets, broadcast back, add. Sums of integer columns stay
    integer-exact regardless of the partitioning, so differential
    hashes are unaffected by parallelism.

    ``order_by`` must be a total order (no ties — pre-aggregate to the
    distinct-key grain or append a unique tiebreaker), else the ROWS
    cumulative frame is nondeterministic at range boundaries.

    ``partition_by`` (round 8) restarts the running sums per group —
    the GROUPED cumulative sum (``SUM ... OVER (PARTITION BY grp ORDER
    BY ...)``) whose naive window serializes each group through one
    task (a scale cliff when groups are few and table-grain, e.g. 3
    return flags over all of lineitem). The range partitioning spreads
    (group, order) jointly, per-partition windows nest the group under
    ``__pid``, and the offset tally/window stay (partitions × groups)-
    sized — metadata, never the table.
    """
    if not order_by:
        raise ValueError("order_by must name at least one column")
    if not sum_cols:
        raise ValueError("sum_cols must name at least one column")
    out_cols = list(out_cols) if out_cols is not None else list(sum_cols)
    if len(out_cols) != len(sum_cols):
        raise ValueError("out_cols must match sum_cols in length")
    partition_by = list(partition_by)
    cols = [F.col(c) for c in order_by]
    pcols = [F.col(c) for c in partition_by]
    ranged = df.repartitionByRange(*pcols, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__pid", *partition_by)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged
    for c in sum_cols:
        local = local.withColumn(f"__l_{c}", F.sum(c).over(w))
    tallies = ranged.groupBy("__pid", *partition_by).agg(
        *[F.sum(c).alias(f"__t_{c}") for c in sum_cols]
    )
    w2 = (
        Window.partitionBy(*partition_by)
        if partition_by
        else Window.partitionBy()
    ).orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = tallies.select(
        "__pid",
        *partition_by,
        *[
            F.coalesce(F.sum(f"__t_{c}").over(w2), F.lit(0)).alias(f"__o_{c}")
            for c in sum_cols
        ],
    )
    joined = local.join(F.broadcast(offsets), ["__pid", *partition_by])
    for c, out in zip(sum_cols, out_cols):
        joined = joined.withColumn(out, F.col(f"__l_{c}") + F.col(f"__o_{c}"))
    drop = ["__pid"] + [f"__l_{c}" for c in sum_cols] + [
        f"__o_{c}" for c in sum_cols
    ]
    return joined.drop(*drop)


def _idiv(a, b):
    """Exact nonnegative integer division as a Column: (a - a%b)/b —
    the numerator is exactly divisible, so the double division is exact
    for magnitudes < 2^53 (any realistic row count)."""
    return ((a - F.pmod(a, b)) / b).cast("bigint")


def exact_ntile(
    df: DataFrame, order_by: Sequence[str], k: int, out_col: str = "bucket"
) -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY order_by)`` — bit-identical
    bucket assignment to the SQL window function — WITHOUT its
    unpartitioned global sort: ranks come from
    :func:`global_row_index` (range repartition + per-partition
    windows + broadcast prefix offsets), the row count is a 1-row
    broadcast, and the rank→bucket map is the NTILE integer formula
    applied map-side (the first ``n % k`` buckets take
    ``n DIV k + 1`` rows, the rest ``n DIV k``).

    ``order_by`` must be a total order (include a unique tiebreaker),
    exactly as deterministic NTILE itself requires.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    idx = global_row_index(df, order_by, index_col="__ntile_rnk")
    tot = df.agg(F.count(F.lit(1)).cast("bigint").alias("__ntile_n"))
    r = F.col("__ntile_rnk") + F.lit(1)
    n = F.col("__ntile_n")
    q = _idiv(n, F.lit(k))
    rem = n - q * k
    big = (q + 1) * rem  # rows covered by the size-(q+1) buckets
    bucket = F.when(r <= big, _idiv(r + q, q + 1)).otherwise(
        rem + _idiv(r - big + q - 1, q)
    )
    return (
        idx.crossJoin(F.broadcast(tot))
        .withColumn(out_col, bucket.cast("int"))
        .drop("__ntile_rnk", "__ntile_n")
    )


# --- DSIR: data selection via importance resampling ------------------------


def _dsir_features(
    df: DataFrame, text_col: str, id_col: str, buckets: int
) -> DataFrame:
    """Hashed n-gram featurization for DSIR: lowercase word unigrams +
    bigrams, each hashed into ``buckets`` via xxhash64 — one map-only
    explode + one combinable (id, bucket) count. Returns
    ``(id_col, bucket, cnt)``."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"[^\p{L}\p{N}]+"),
        lambda t: t != "",
    )
    # zip_with pads the shorter side with nulls — mask those slots and
    # filter them, else the last token would emit a spurious pseudo-bigram
    grams = F.concat(
        toks,
        F.filter(
            F.zip_with(
                toks,
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b)),
            ),
            lambda g: g.isNotNull(),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(grams).alias("__g"))
        .select(
            F.col(id_col),
            F.pmod(F.xxhash64(F.col("__g")), F.lit(buckets)).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _dsir_log_probs(
    feats: DataFrame, buckets: int, alpha: float
) -> DataFrame:
    """Smoothed log bucket distribution from a featurized corpus:
    ``log p[b] = log(cnt_b + alpha) - log(total + alpha * buckets)``
    (add-alpha over the FULL bucket domain, so absent buckets carry
    ``log alpha - log(total + alpha * buckets)`` — the caller encodes
    that via coalesce at join time). Returns ``(bucket, lp, lp0)``
    where ``lp0`` is the absent-bucket log-prob constant replicated
    per row for join-side coalescing."""
    counts = feats.groupBy("bucket").agg(F.sum("cnt").alias("n_b"))
    total = counts.agg(F.sum("n_b").alias("n"))
    denom = F.log(F.col("n") + F.lit(alpha * buckets))
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        (F.log(F.col("n_b") + F.lit(alpha)) - denom).alias("lp"),
        (F.log(F.lit(alpha)) - denom).alias("lp0"),
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public method): score
    every ``raw`` document by how much more likely its hashed-n-gram
    features are under the ``target`` domain's bag-of-ngrams
    distribution than under the raw pool's own:
    ``log w(x) = sum_b cnt_b(x) * (log p_target[b] - log p_raw[b])``.
    Returns ``(id_col, log_weight)`` for every raw doc (docs with no
    tokens get log_weight 0 — indifferent). Both distributions use
    add-``alpha`` smoothing over the full bucket domain, so unseen
    buckets penalize rather than blow up.

    Scale shape: featurization is map-only explode + combinable count;
    both distributions collapse to <= ``buckets`` rows (broadcast-
    sized BY CONSTRUCTION — the hashing trick's point); the scoring
    join is doc-feature rows against those broadcasts, then one
    combinable per-doc sum. The target corpus is typically tiny
    (a quality benchmark / curated seed); the raw pool is the 100 TB
    side and is scanned exactly twice (its distribution, its scores).
    """
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    scored = _dsir_scores(raw, target, text_col, id_col, buckets, alpha)
    ids = raw.select(id_col).distinct()
    return ids.join(scored, id_col, "left").select(
        id_col, F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight")
    )


def _dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int,
    alpha: float,
) -> DataFrame:
    """SPARSE DSIR scores: ``(id_col, log_weight)`` for raw docs with at
    least one token (token-less docs are simply absent — callers decide
    the dense completion: :func:`dsir_importance_weights` left-joins the
    distinct id set to emit 0.0 rows, :func:`dsir_sample` coalesces at
    its existing raw join instead of paying a third raw scan + distinct
    exchange for ids it already has — r13)."""
    raw_feats = _dsir_features(raw, text_col, id_col, buckets)
    tgt_lp = _dsir_log_probs(
        _dsir_features(target, text_col, id_col, buckets), buckets, alpha
    ).select("bucket", F.col("lp").alias("__lpt"), F.col("lp0").alias("__lpt0"))
    raw_lp = _dsir_log_probs(raw_feats, buckets, alpha).select(
        "bucket", F.col("lp").alias("__lpr"), F.col("lp0").alias("__lpr0")
    )
    # absent-bucket constants are per-row copies; grab one of each for
    # the coalesce fallbacks via a 1-row broadcast
    consts = tgt_lp.limit(1).select("__lpt0").crossJoin(
        raw_lp.limit(1).select("__lpr0")
    )
    return (
        raw_feats.join(F.broadcast(tgt_lp.drop("__lpt0")), "bucket", "left")
        .join(F.broadcast(raw_lp.drop("__lpr0")), "bucket", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            F.col(id_col),
            (
                F.col("cnt")
                * (
                    F.coalesce(F.col("__lpt"), F.col("__lpt0"))
                    - F.coalesce(F.col("__lpr"), F.col("__lpr0"))
                )
            ).alias("__c"),
        )
        .groupBy(id_col)
        .agg(F.sum("__c").alias("log_weight"))
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    alpha: float = 1.0,
    salt: int = 0,
) -> DataFrame:
    """DSIR selection end to end: importance weights + Gumbel-top-k
    resampling — exactly ``k`` raw docs drawn without replacement with
    probability proportional to their importance weight (the paper's
    sampling step; Gumbel-max over ``log w + G`` is the standard
    log-space form of weighted sampling without replacement). The
    Gumbel draw derives from ``xxhash64(id, salt)``, not ``rand()`` —
    deterministic, retry-safe, independent across salts.

    Scale shape: weights per :func:`_dsir_scores` (the sparse form —
    token-less docs coalesce to weight 0.0 at the join below, saving
    the dense completion's third raw scan + id-distinct exchange, r13);
    the selection is one scan ranking by ``log_weight + gumbel``
    planned as TakeOrderedAndProject (per-partition heaps, k-row merge
    — never a global sort). Returns the selected raw rows with
    ``log_weight`` attached."""
    lw = _dsir_scores(raw, target, text_col, id_col, buckets, alpha)
    # u in (0,1) OPEN on both ends — u=1.0 would make the Gumbel +inf
    u = (_bucket(F.col(id_col), salt) + 1).cast("double") / F.lit(float(_M + 1))
    gumbel = -F.log(-F.log(u))
    return (
        # null-id rows never survived the old id-keyed inner join —
        # keep that contract explicitly now that the join is LEFT
        raw.filter(F.col(id_col).isNotNull())
        .join(lw, id_col, "left")
        .withColumn(
            "log_weight", F.coalesce(F.col("log_weight"), F.lit(0.0))
        )
        .withColumn("__gk", F.col("log_weight") + gumbel)
        .orderBy(F.col("__gk").desc(), F.col(id_col))
        .limit(k)
        .drop("__gk")
    )


def cap_per_group(
    df: DataFrame,
    cap: int,
    group_col: str,
    order_by: Sequence = (),
    rank_col: str = "rk",
) -> DataFrame:
    """Per-group cap with a CHOSEN keep order — the domain-cap curation
    step (keep at most N docs per source/domain, preferring the ones a
    quality criterion ranks highest), vs
    :func:`stratified_sample_exact_k`'s hash order (a random sample).
    ``order_by`` lists columns/Columns ranked first-kept-first; ties
    MUST be broken to a total order by the caller (append the key
    column) or the kept set is engine/partitioning-dependent.

    Scale shape: one hash-partition window per group; the ``rank <=
    cap`` filter pushes below the exchange as a per-partition
    WindowGroupLimit (each map task forwards at most ``cap`` rows per
    group it sees), so the shuffle carries O(groups × cap) candidates,
    not the corpus — the q87 exact-k plan shape, asserted in tests."""
    from pyspark.sql import Window

    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= cap)
    )


def fill_token_budget(
    df: DataFrame,
    budget: int,
    group_col: str,
    weight_col: str,
    key_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Fill a per-group WEIGHT budget (token budget per domain — "give
    me ≤ B tokens of each source, chosen fairly"): rows draw a
    deterministic hash order inside their group (the
    :func:`stratified_sample_exact_k` shuffle order, salted), then the
    group keeps the longest prefix whose cumulative weight stays within
    ``budget`` — PLUS the first overflowing row when the budget isn't
    exactly met (so every group with data always contributes something
    and realized mass lands within one document of the target; callers
    wanting the strict-under policy filter ``cum_weight <= budget``).

    Output adds ``sample_rank`` (the draw order) and ``cum_weight``
    (inclusive running mass) so downstream stages can re-cut to any
    SMALLER budget without resampling — nested-prefix reuse, the same
    property the exact-k sampler guarantees.

    Scale shape: one hash-partition window per group computes the
    running sum in draw order; the budget filter cannot push below the
    exchange (a row's fate depends on its predecessors' weights), so
    the shuffle carries each group once — at 100 TB pre-filter with
    :func:`stratified_sample` at ~1.2× the target fraction, then
    budget-cut the survivors (two scans, both bounded)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order = F.md5(
        F.concat_ws("\x1f", F.col(key_col).cast("string"), F.lit(str(salt)))
    )
    w = Window.partitionBy(group_col).orderBy(order, key_col)
    ranked = df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
    cum = ranked.withColumn(
        "cum_weight",
        F.sum(F.col(weight_col).cast("bigint")).over(
            Window.partitionBy(group_col)
            .orderBy("sample_rank")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    prev = F.col("cum_weight") - F.col(weight_col).cast("bigint")
    return cum.filter(prev < budget)
