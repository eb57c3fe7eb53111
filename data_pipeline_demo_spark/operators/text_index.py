"""Persisted inverted text index with CDC-driven maintenance — the
LEXICAL member of the engine's maintained-structure family (MinHash
index, join view, rollup cascade, value index, vector tiers).

``operators/textstats.py:bm25_topk`` scans the corpus per query; this
module trades one build pass for query cost proportional to the QUERY
TERMS' postings only:

- ``build_text_index``: postings txtable ``(term, doc, tf, dl)`` keyed
  by the synthetic ``term:doc`` row key with a manifest Bloom index on
  ``term`` — a query's terms Bloom-prune to the buckets that can hold
  them — plus a 1-row corpus-stats txtable ``(n_docs, sum_dl)`` so
  avgdl needs no corpus read at query time. Document length is
  DENORMALIZED onto each posting, so scoring never joins a docs table.
- ``bm25_query_indexed``: reads only the probed buckets, derives each
  term's document frequency from its own complete postings slice
  (pruning keeps every posting of a probed term), and reproduces
  ``bm25_topk``'s arithmetic step for step — same exact-integer
  inputs, same expression tree, same round-to-4 before ranking — so
  the indexed path is differentially testable against the scan path.
- ``text_index_refresh_from_txtable``: documents live in a txtable;
  the preimage-complete change feed drives the minimal mutation
  (the ``minhash_index_refresh_from_txtable`` contract): deleted /
  pre-update term keys bucket-pruned-delete, postimage postings MERGE
  in place, and the stats row adjusts by exact integer deltas —
  O(changed docs × their terms + touched buckets), never O(corpus) or
  O(index). Same consumer-watermark contract: persist the returned
  version, pass it back next call.

Tokenization is the engine's corpus convention (split on single
spaces), recorded in the index metadata sidecar and enforced on
refresh.

100 TB shape: postings shuffle once at build (corpus-sized, combinable
count); queries move |query terms| × postings-per-term rows; refresh
moves the changed documents' postings only. The known skew is a stop-
word term whose postings span many buckets — at that scale the
standard move is a df-cap (drop terms with df above a fraction of N —
they contribute ~zero idf anyway), left to the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.upsert import read_json_sidecar, write_json_sidecar

TEXT_INDEX_META = "_text_index_meta.json"
POSTINGS_KEY = "__posting_key"


def _postings_dir(root: str) -> str:
    return root.rstrip("/") + "/postings"


def _stats_dir(root: str) -> str:
    return root.rstrip("/") + "/stats"


def _posting_key(id_col: str) -> F.Column:
    # base64 the term so a token containing the separator cannot
    # collide two (term, doc) pairs onto one row key (injective: the
    # base64 alphabet excludes ':')
    return F.concat_ws(
        ":",
        F.base64(F.col("term").cast("binary")),
        F.col(id_col).cast("string"),
    ).alias(POSTINGS_KEY)


def _doc_postings(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, term, c, dl) — per-doc term frequencies with the doc
    length denormalized on. One explode + one combinable count."""
    base = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("toks")
    ).withColumn("dl", F.size("toks").cast("bigint"))
    return (
        base.select(F.col(id_col), "dl", F.explode("toks").alias("term"))
        .groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _doc_lens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("dl"),
    )


def build_text_index(
    spark: SparkSession,
    docs: DataFrame,
    index_root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
    table_version: int | None = None,
) -> int:
    """Build the index from a corpus snapshot; returns the posting-row
    count. ``table_version``: when ``docs`` came from a txtable
    snapshot, record its version as the refresh watermark seed."""
    from ..sinks.txlog import txlog_upsert

    postings = _doc_postings(docs, text_col, id_col).withColumn(
        POSTINGS_KEY, _posting_key(id_col)
    )
    n = txlog_upsert(
        spark,
        postings,
        _postings_dir(index_root),
        key=POSTINGS_KEY,
        num_buckets=num_buckets,
        bloom_columns=["term"],
    )
    lens = _doc_lens(docs, text_col, id_col)
    stats = lens.agg(
        F.lit(0).cast("bigint").alias("sid"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    txlog_upsert(
        spark, stats, _stats_dir(index_root), key="sid", num_buckets=1
    )
    write_json_sidecar(
        spark,
        index_root.rstrip("/") + "/" + TEXT_INDEX_META,
        {
            "text_col": text_col,
            "id_col": id_col,
            "num_buckets": num_buckets,
            "consumed_version": table_version,
        },
    )
    return n


def bm25_query_indexed(
    spark: SparkSession,
    index_root: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k off the persisted index — `bm25_topk`'s arithmetic
    reproduced over the Bloom-pruned postings slice (see module
    docstring). Returns ``(id, bm25, rk)`` with scores rounded to 4
    decimals before ranking, the scan path's determinism convention."""
    from pyspark.sql import Window

    from ..sinks.txlog import read_txtable

    meta = read_json_sidecar(
        spark, index_root.rstrip("/") + "/" + TEXT_INDEX_META
    )
    if meta is None:
        raise ValueError(
            f"no text index at {index_root}; build_text_index first"
        )
    id_col = meta["id_col"]
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms is empty")
    tf = (
        read_txtable(
            spark, _postings_dir(index_root), bloom_in={"term": terms}
        )
        .filter(F.col("term").isin(terms))
        .select(id_col, "term", "c", "dl")
    )
    stats = (
        read_txtable(spark, _stats_dir(index_root))
        .select("n_docs", (F.col("sum_dl") / F.col("n_docs")).alias("avgdl"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1p1 = k1 + 1.0
    omb = 1.0 - b
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfw = (F.col("c") * F.lit(k1p1)) / (
        F.col("c")
        + F.lit(k1) * (F.lit(omb) + F.lit(b) * (F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("sc", idf * tfw)
    )
    agg = scored.groupBy(id_col).agg(F.round(F.sum("sc"), 4).alias("bm25"))
    topk = agg.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    return topk.select(
        F.col(id_col),
        "bm25",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )


def apply_text_index_changes(
    spark: SparkSession,
    index_root: str,
    feed: DataFrame,
    txn_version: int | None = None,
) -> int:
    """Apply ONE preimage-complete change-feed slice to the index;
    returns the number of documents refreshed. The slice is safe to
    REDELIVER (foreachBatch crash recovery): posting deletes and
    MERGEs are idempotent by key, and the stats-delta commit — the one
    non-idempotent step — is guarded by the manifest txn watermark
    when ``txn_version`` is given (a replayed slice's delta is a
    log-level no-op).

    Delete-phase-first discipline (the ``apply_changes`` shape): stale
    term keys are removed before the postimage MERGE, so a crash
    between the commits replays cleanly.
    """
    from ..sinks.txlog import txlog_delete, txlog_upsert

    meta = read_json_sidecar(
        spark, index_root.rstrip("/") + "/" + TEXT_INDEX_META
    )
    if meta is None:
        raise ValueError(
            f"no text index at {index_root}; build_text_index first"
        )
    text_col, id_col = meta["text_col"], meta["id_col"]
    feed = feed.persist()
    try:
        old = feed.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        )
        new = feed.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        )
        n_docs_changed = (
            feed.filter(F.col("_change_type") != "update_preimage")
            .select(id_col)
            .distinct()
            .count()
        )
        if n_docs_changed == 0:
            return 0

        # exact integer deltas for the stats row, computed BEFORE any
        # index commit from the same feed
        old_l = _doc_lens(old, text_col, id_col)
        new_l = _doc_lens(new, text_col, id_col)
        deltas = old_l.agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("dn"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("ddl"),
        ).crossJoin(
            new_l.agg(
                F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("an"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("adl"),
            )
        ).collect()[0]

        # delete phase: every OLD term key of deleted/updated docs
        # (generated from the preimage text — no index scan)
        old_keys = (
            old.select(
                F.col(id_col),
                F.explode(
                    F.array_distinct(F.split(F.col(text_col), " "))
                ).alias("term"),
            )
            .select(_posting_key(id_col))
            .distinct()
        )
        if not old_keys.isEmpty():
            txlog_delete(spark, _postings_dir(index_root), keys=old_keys)

        # merge phase: postimage postings in place
        if not new.isEmpty():
            postings = _doc_postings(new, text_col, id_col).withColumn(
                POSTINGS_KEY, _posting_key(id_col)
            )
            txlog_upsert(spark, postings, _postings_dir(index_root))

        # stats adjust by the exact deltas; the watermark makes a
        # redelivered slice's (non-idempotent) delta a log-level no-op
        from ..sinks.txlog import _latest_manifest, read_txtable

        if txn_version is not None:
            sm = _latest_manifest(spark, _stats_dir(index_root))
            if (
                sm is not None
                and sm.get("app_txns", {}).get("text-index-stats", -1)
                >= txn_version
            ):
                return n_docs_changed
        cur = read_txtable(spark, _stats_dir(index_root)).collect()[0]
        stats = spark.createDataFrame(
            [
                (
                    0,
                    int(cur["n_docs"]) - int(deltas["dn"]) + int(deltas["an"]),
                    int(cur["sum_dl"])
                    - int(deltas["ddl"])
                    + int(deltas["adl"]),
                )
            ],
            "sid bigint, n_docs bigint, sum_dl bigint",
        )
        txlog_upsert(
            spark,
            stats,
            _stats_dir(index_root),
            txn_app_id="text-index-stats" if txn_version is not None else None,
            txn_version=txn_version,
        )
        return n_docs_changed
    finally:
        feed.unpersist()


def text_index_refresh_from_txtable(
    spark: SparkSession,
    index_root: str,
    table_root: str,
    since_version: int,
) -> tuple[int, int]:
    """Propagate the documents txtable's changes since
    ``since_version`` into the index (module docstring). Returns
    ``(docs_refreshed, consumed_version)`` — persist the version as
    the consumer watermark; a same-version call is a no-op."""
    from ..sinks.txlog import _latest_manifest, txtable_changes

    manifest = _latest_manifest(spark, table_root)
    if manifest is None:
        raise FileNotFoundError(f"no committed txtable at {table_root}")
    latest = manifest["version"]
    if since_version >= latest:
        return 0, latest
    feed = txtable_changes(
        spark, table_root, since_version, latest, include_preimages=True
    )
    n = apply_text_index_changes(
        spark, index_root, feed, txn_version=latest
    )
    return n, latest
