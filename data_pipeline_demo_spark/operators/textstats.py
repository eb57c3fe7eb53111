"""Text-analysis operators: token counting, quality scoring, language ID,
fingerprinting (north-star surface).

Everything is a built-in column expression (codegen, zero UDF): these run
as a streaming scan with no shuffle, so they cost one pass at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textprep import shingles, tokens

# Tiny per-language stopword lists for the n-gram/stopword-overlap
# language-ID heuristic. Deterministic and SQL-expressible — a real
# deployment swaps in larger lists (same operator shape).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "los", "de", "que", "es", "un"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
}

# A BPE-ish word/number/punctuation segmentation: runs of letters, runs of
# digits, or single non-space symbols — a regex shared verbatim with the
# DuckDB oracle.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(c, r"\s+")).cast("long")


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count via the shared segmentation regex."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN)).cast("long")


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Occurrences of `lang`'s stopwords among the tokens."""
    toks = tokens(text)
    words = LANG_STOPWORDS[lang]
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.when(t.isin(*words), 1).otherwise(0),
    ).cast("long")


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of stopword hits (ties → lexical
    order, no hits → 'unknown')."""
    scored = [(lang, stopword_hits(text, lang)) for lang in sorted(LANG_STOPWORDS)]
    best_score = F.greatest(*[s for _, s in scored])
    out = F.lit("unknown")
    # fold in reverse so earlier (lexically smaller) langs win ties
    for lang, score in reversed(scored):
        out = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(out)
    return out


def quality_features(text: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword quality signals (the classic
    pre-training quality filters), as named columns."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c).cast("long")
    n_tokens = token_count(c)
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]")).cast("long")
    n_stop = stopword_hits(c, "en")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (n_chars - (n_tokens - 1)) / n_tokens,
        "punct_ratio": n_punct / n_chars,
        "stopword_ratio": n_stop / n_tokens,
    }


def quality_score(text: Column | str) -> Column:
    """Composite [0,1]-ish quality score from the features — a fixed
    linear blend, deterministic double arithmetic."""
    f = quality_features(text)
    length_ok = F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 10000), 1.0).otherwise(0.3)
    return (
        0.4 * length_ok
        + 0.3 * (1.0 - F.least(f["punct_ratio"] * 5.0, F.lit(1.0)))
        + 0.3 * F.least(f["stopword_ratio"] * 3.0, F.lit(1.0))
    )


def doc_fingerprint(text: Column | str, k: int = 3) -> Column:
    """Content-defined fingerprint: the lexicographic min of the shingle
    md5s (a 1-hash MinHash — the rolling-window sketch used for fast
    near-dup prefilters), alongside exact md5 for identity."""
    return F.array_min(F.transform(shingles(text, k), lambda s: F.md5(F.encode(s, "utf-8"))))


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_flags(
    text: Column | str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_stop_hits: int = 2,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> dict[str, Column]:
    """The published Gopher document-quality rules (Rae et al. 2021,
    "Scaling Language Models", Appendix A) as per-doc 0/1 flag columns
    plus the conjunction ``gopher_keep``:

    - word count within [min_words, max_words]
    - mean word length within [min_mean_word_len, max_mean_word_len]
    - symbol-to-word ratio ('#' or '...') ≤ 0.1
    - ≥ 80% of words contain at least one alphabetic character
    - at least ``min_stop_hits`` DISTINCT stop-words from the 8-word list

    Exactness: every threshold is evaluated in INTEGER arithmetic
    (e.g. mean-word-length bounds become ``sum_len >= 3*n_words``),
    so the flags are bit-stable across engines — no float compares.

    Scale shape: one codegen expression tree per doc (split / filter /
    aggregate higher-order fns, all JVM-side) — scan-stream, no
    shuffle, no Python."""
    c = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    words = F.filter(F.split(c, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words).cast("long")
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast(
        "long"
    )
    n_sym = (
        F.regexp_count(c, F.lit("#")) + F.regexp_count(c, F.lit(r"\.\.\."))
    ).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(w) for w in stopwords]),
        )
    ).cast("long")

    def _b(cond) -> Column:
        return F.when(cond, 1).otherwise(0).cast("int")

    flags = {
        "n_words": n_words,
        "flag_word_count": _b(
            (n_words >= min_words) & (n_words <= max_words)
        ),
        "flag_mean_word_len": _b(
            (n_words > 0)
            & (sum_len >= min_mean_word_len * n_words)
            & (sum_len <= max_mean_word_len * n_words)
        ),
        "flag_symbol_ratio": _b(10 * n_sym <= n_words),
        "flag_alpha_words": _b(5 * n_alpha >= 4 * n_words),
        "flag_stopwords": _b(n_stop >= min_stop_hits),
    }
    keep = None
    for name, col in flags.items():
        if name == "n_words":
            continue
        keep = col if keep is None else keep * col
    flags["gopher_keep"] = keep.cast("int")
    return flags


# --- repetition signals (Gopher-style training-data filters) -------------


def dup_line_fraction(text: Column | str) -> Column:
    """Fraction of non-blank lines that are repeats of an earlier line —
    the classic boilerplate/repetition filter signal. Pure codegen
    expression (split/filter/array_distinct): scan-stream, no shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    lines = F.filter(F.split(c, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(lines)) / n
    )


def repetition_stats(df, text_col: str = "text", id_col: str = "doc_id", n: int = 2):
    """Per-doc top-n-gram concentration: what fraction of a document's
    word n-grams is its single most frequent n-gram? High values mark
    machine-generated/looping text (the Gopher repetition filters).

    Needs a true frequency mode, which no single column expression
    gives, so this is the explode → count → max shape: tokens are
    staged as a real column BEFORE the n-gram transform (a lambda
    re-evaluates captured expression subtrees per element), grams
    explode via explode_outer + null filter (InferFiltersFromGenerate
    would otherwise inline the whole gram expression into a synthesized
    size()>0 filter), and both aggregations shuffle on the doc id with
    map-side partial aggregation. Returns (id, n_grams,
    top_gram_count, top_ngram_fraction).
    """
    toks = df.select(F.col(id_col), tokens(text_col).alias("__w"))
    grams = (
        toks.select(
            id_col,
            F.explode_outer(
                F.transform(
                    F.sequence(
                        F.lit(0), F.greatest(F.size("__w") - n, F.lit(0))
                    ),
                    lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i + 1, n)),
                )
            ).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
    )
    counts = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("top_gram_count"),
        (F.max("c") / F.sum("c")).alias("top_ngram_fraction"),
    )


# --- PII scrubbing (training-data redaction) ------------------------------

# Order matters: cards before phones (a 16-digit card is also a long
# digit run), emails independent. Patterns are deliberately high-recall
# / moderate-precision — redaction favors false positives.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("CARD", r"\b(?:\d[ -]?){13,19}\b"),
    # the leading lookahead keeps ISO dates (4-2-2 digit shape) out of
    # the phone net — the one digit-run false positive worth excluding
    ("PHONE", r"(?<![\d-])(?!\d{4}-\d{2}-\d{2}(?!\d))\+?\d{1,3}[ -]?\(?\d{1,4}\)?(?:[ -]?\d{2,4}){2,3}(?![\d-])"),
)


def scrub_pii(text: Column | str, patterns=PII_PATTERNS) -> Column:
    """Redact PII spans to ``<TYPE>`` placeholders — the standard
    pre-training redaction pass. A chain of ``regexp_replace`` stays
    whole-stage-codegen (one scan, no shuffle, no UDF), which is the
    only shape that survives a 100 TB corpus pass. The reference's own
    domain (payments emails) is exactly where card/phone/email strings
    leak into free text; its pipeline prints them
    (data_pipeline.py:26-41) — this operator exists so ours never
    stores them."""
    c = F.col(text) if isinstance(text, str) else text
    for tag, pat in patterns:
        c = F.regexp_replace(c, pat, f"<{tag}>")
    return c


def pii_hits(text: Column | str, patterns=PII_PATTERNS) -> Column:
    """Per-doc count of redactable spans (QA signal for the scrub).
    Counts mirror the scrub exactly: each pattern counts against the
    text already scrubbed of earlier patterns, so a span never counts
    twice (a card number is also a long digit run a phone pattern
    would re-match)."""
    c = F.col(text) if isinstance(text, str) else text
    total = F.lit(0)
    for tag, pat in patterns:
        total = total + F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        c = F.regexp_replace(c, pat, f"<{tag}>")
    return total.cast("long")


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Per-document top-k TF-IDF-weighted terms: ``score = (term_count /
    doc_len) * (n_docs / doc_freq)`` — the classic weighting with the
    log dropped so every arithmetic step is a single correctly-rounded
    IEEE double op, making the result bit-comparable against a SQL
    oracle (ln() implementations differ across engines in the last ulp;
    ratios do not).

    Scale shape: one explode → two map-side-combinable aggregations
    (per doc-term, per term) → broadcast-joined corpus constant → one
    per-doc top-k window. The doc_freq relation is |vocabulary|-sized,
    far smaller than the corpus, and broadcasts; nothing shuffles the
    exploded token stream twice. Ties break on the term itself, so
    top-k is deterministic.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    per_doc_term = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    doc_len = per_doc_term.groupBy(id_col).agg(F.sum("c").alias("doc_len"))
    doc_freq = per_doc_term.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    n_docs = df.select(
        F.countDistinct(id_col).alias("n_docs")
    )
    scored = (
        per_doc_term.join(doc_len, id_col)
        .join(F.broadcast(doc_freq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("c") / F.col("doc_len"))
            * (F.col("n_docs") / F.col("doc_freq")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(
            id_col,
            "term",
            F.col("score").alias("tfidf"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def _char_bigrams(df: DataFrame, text_col: str, *keep: str) -> DataFrame:
    """(keep..., prefix_char, bigram) — one row per character position
    via sequence+explode+substring (the chunking pattern): map-only,
    no UDF, no shuffle."""
    return (
        df.filter(F.length(text_col) >= 2)
        .select(
            *keep,
            F.explode(
                F.sequence(F.lit(1), F.length(text_col) - 1)
            ).alias("__i"),
            F.col(text_col).alias("__t"),
        )
        .select(
            *keep,
            F.substring(F.col("__t"), F.col("__i"), 1).alias("c1"),
            F.substring(F.col("__t"), F.col("__i"), 2).alias("c12"),
        )
    )


def train_char_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-trained character-bigram language model:
    ``(c12, logp)`` with Laplace smoothing over the observed alphabet —
    the self-supervised backbone of a KenLM-style perplexity quality
    filter (CCNet/Gopher family) with no external model artifact.

    Two grouped counts over the exploded bigrams (map-side combinable);
    the result is alphabet²-sized — broadcastable by construction.
    ``logp = ln((count(c1c2)+1) / (count(c1·)+V))``.
    """
    grams = _char_bigrams(df, text_col)
    big = grams.groupBy("c1", "c12").agg(F.count(F.lit(1)).alias("n12"))
    pre = grams.groupBy("c1").agg(F.count(F.lit(1)).alias("n1"))
    vocab = grams.select(F.countDistinct("c1").alias("v"))
    return (
        big.join(pre, "c1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "c12",
            F.log((F.col("n12") + 1) / (F.col("n1") + F.col("v"))).alias(
                "logp"
            ),
            "v",
        )
    )


def perplexity_score(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bits-per-character of each document under a char-bigram LM —
    the perplexity quality signal: gibberish and boilerplate score
    high, fluent in-distribution text scores low; filter on a
    percentile of this column (CCNet keeps the low-perplexity head).

    One exploded scan joined to the BROADCAST LM table (alphabet²
    rows); bigrams the LM never saw take the global smoothing floor
    via the LM's minimum logp minus ln(2) — a deterministic
    pessimistic constant, not a per-prefix lookup, so the join stays
    single and broadcast. The floor itself stays IN-PLANE: a one-row
    aggregate broadcast-crossed onto the scored grams, so calling
    this function launches no driver job (the whole score is one
    lazily-planned DataFrame). Returns
    ``(id_col, n_chars_scored, bits_per_char)``.
    """
    ln2 = 0.6931471805599453
    floor = lm.agg((F.min("logp") - F.lit(ln2)).alias("__unseen_logp"))
    grams = _char_bigrams(df, text_col, id_col)
    scored = grams.join(
        F.broadcast(lm.select("c12", "logp")), "c12", "left"
    ).crossJoin(F.broadcast(floor))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chars_scored"),
            (
                -F.avg(F.coalesce(F.col("logp"), F.col("__unseen_logp"))) / ln2
            ).alias("bits_per_char"),
        )
    )


# --- word n-gram counting / n-gram language model -------------------------
#
# The corpus-statistics primitive under contamination checks, Kneser-Ney
# style LM estimation, and repeated-phrase quality filters: count word
# n-grams corpus-wide, then condition the final word on its (n-1)-word
# prefix. Plan shape: one map-only gram explode (higher-order transform
# over the token array — no UDF, no per-row Python), one grouped count
# (map-side combinable), one window sum for the prefix mass. At 100 TB
# the only shuffle is the (prefix, word) aggregation; min_count
# filtering happens post-aggregate so partial aggregation stays
# algebraic.


def _word_grams(
    df: DataFrame, n: int, text_col: str, *keep: str
) -> DataFrame:
    """Explode each doc into its word n-grams as (prefix, word): prefix
    = the first n-1 tokens space-joined, word = the n-th. Docs shorter
    than n tokens contribute nothing. Tokenization is the engine
    convention: split on single spaces (documents are pre-normalized;
    see normalize_text)."""
    toks = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.struct(
            F.concat_ws(
                " ", F.slice(toks, i + 1, n - 1)
            ).alias("prefix"),
            F.element_at(toks, (i + n).cast("int")).alias("word"),
        ),
    )
    return (
        df.filter(F.size(toks) >= n)
        .select(*keep, F.explode(grams).alias("g"))
        .select(*keep, "g.prefix", "g.word")
    )


def ngram_counts(
    df: DataFrame, n: int = 2, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus-wide n-gram frequencies: ``(ngram, c)``, pruned to
    ``c >= min_count`` AFTER aggregation (the standard count-threshold
    vocabulary cut)."""
    grams = _word_grams(df, n, text_col)
    ng = F.when(F.col("prefix") == "", F.col("word")).otherwise(
        F.concat_ws(" ", "prefix", "word")
    )
    return (
        grams.select(ng.alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
    )


def ngram_lm(
    df: DataFrame, n: int = 2, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Maximum-likelihood conditional n-gram model:
    ``(prefix, word, c, c_prefix, p)`` with ``p = c / c_prefix`` where
    ``c_prefix`` is the prefix's total continuation mass — so ``p``
    sums to exactly 1.0 over each prefix (a proper conditional
    distribution, unlike normalizing by the raw (n-1)-gram count,
    which over-counts prefixes ending a document). ``min_count``
    prunes rare continuations AFTER normalization, keeping ``p``
    estimates unbiased by the cut."""
    from pyspark.sql import Window

    counts = (
        _word_grams(df, n, text_col)
        .groupBy("prefix", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("prefix")
    return (
        counts.withColumn("c_prefix", F.sum("c").over(w))
        .withColumn("p", F.col("c") / F.col("c_prefix"))
        .filter(F.col("c") >= min_count)
    )


# --- compression-ratio quality signal -------------------------------------


def compression_ratio(text: Column | str) -> Column:
    """``len(zlib(text)) / len(text)`` in bytes — the classic two-sided
    entropy filter (used in Gopher/C4-style curation, public recipes):
    boilerplate and template spam compress far below natural prose,
    while random noise/binary-in-text refuses to compress. Natural
    text sits in a stable middle band; gate with
    ``between(lo, hi)``. Arrow-batched pandas UDF (zlib is C-speed; the
    per-doc call is the irreducible cost), null/empty → null."""
    import pandas as pd

    def ratio(s):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, 6)) / len(raw)

        return s.map(one)

    # hints would be PEP-563 strings here (module-level `from __future__
    # import annotations`) and unresolvable in this module's globals, so
    # the eval type is pinned via explicit annotations instead
    ratio.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(ratio, "double")(
        F.col(text) if isinstance(text, str) else text
    )


# --- BM25 keyword retrieval ------------------------------------------------


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k document retrieval for a fixed query-term set —
    the keyword-retrieval half of a retrieval pipeline (the vector half
    is operators/similarity.py), also the standard relevance filter a
    training-data curation pass runs against a topic's seed terms.

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))``
    with ``idf = ln(1 + (N − df + ½)/(df + ½))``.

    Scale shape: the exploded token stream is filtered to the query's
    terms BEFORE the first aggregation, so the per-(doc, term) shuffle
    carries only matching postings — the corpus-sized token stream
    never shuffles. Document lengths are a map-side ``size(split())``
    (no second explode), the df/idf relation is |query|-sized and
    broadcasts, the corpus stats (N, avgdl) are a 1-row broadcast, and
    the final top-k is one TakeOrdered over per-doc scores. Scores are
    rounded to 4 decimals BEFORE ranking so ranking and the oracle
    hash-compare are immune to last-ulp ln()/summation-order drift
    across engines; ties break on doc_id.
    """
    from pyspark.sql import Window

    k1p1 = k1 + 1.0
    omb = 1.0 - b
    base = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("toks")
    )
    lens = base.select(F.col(id_col), F.size("toks").cast("bigint").alias("dl"))
    # avgdl as one exact-integer sum / count division (NOT F.avg, whose
    # streaming-mean implementation need not bit-match other engines)
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        base.select(F.col(id_col), F.explode("toks").alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
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
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("sc", idf * tfw)
    )
    agg = scored.groupBy(id_col).agg(F.round(F.sum("sc"), 4).alias("bm25"))
    # top-k as TakeOrderedAndProject (O(k) heap per partition), NOT a
    # global row_number window (single-partition sort of every scored
    # doc); the rank window then runs over only the k survivors
    topk = agg.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    return topk.select(
        F.col(id_col),
        "bm25",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )


def doc_ngram_counts(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc word n-gram multiset: ``(id, gram, c)`` — the PER-DOC
    companion of the corpus-wide :func:`ngram_counts`. The gram list
    builds in ONE codegen'd transform over the token array (the
    `textprep.shingles` staging discipline — tokens materialize once as
    a real column so the element lambda never re-splits), then explode →
    count. Unlike `shingles` this keeps DUPLICATE grams: clipped-count
    metrics (ROUGE) need the multiset, not the set."""
    w = df.select(F.col(id_col), F.split(F.col(text_col), r"\s+").alias("__w"))
    idx = F.sequence(F.lit(0), F.size("__w") - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at("__w", (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return (
        w.filter(F.size("__w") >= n)
        .select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def rouge_n_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """ROUGE-N between candidate/reference pairs (Lin 2004): clipped
    n-gram overlap ``Σ_g min(c_a(g), c_b(g))`` with precision against
    the b side, recall against the a side, and F1 — the eval metric a
    curation pipeline runs over its own dedup/decontamination output
    (did the near-dup pass actually catch the overlapping pairs?).

    Output: ``(id_a, id_b, overlap, rouge_p, rouge_r, rouge_f1)``,
    ratios rounded to 6 (pure integer-count divisions — engine-portable
    bit-for-bit).

    Scale shape: n-gram counts build once per doc (explode → combinable
    count, never per-pair re-tokenization); the overlap join touches
    only grams SHARED by a pair (inner join on gram), so disjoint pairs
    cost nothing past the hash lookup; per-pair totals join back at
    pair grain. Everything shuffles on (doc, gram) / pair keys — no
    all-pairs blowup beyond the given candidate set."""
    cnt = doc_ngram_counts(docs, n=n, text_col=text_col, id_col=id_col)
    tot = cnt.groupBy(id_col).agg(F.sum("c").alias("t"))
    p = pairs.select(F.col(a_col), F.col(b_col))
    ov = (
        p.join(cnt.withColumnRenamed(id_col, a_col).withColumnRenamed("c", "ca"), a_col)
        .join(
            cnt.withColumnRenamed(id_col, b_col).withColumnRenamed("c", "cb"),
            [b_col, "gram"],
        )
        .groupBy(a_col, b_col)
        .agg(F.sum(F.least("ca", "cb")).alias("overlap"))
    )
    ta = tot.withColumnRenamed(id_col, a_col).withColumnRenamed("t", "ta")
    tb = tot.withColumnRenamed(id_col, b_col).withColumnRenamed("t", "tb")
    base = (
        p.join(ov, [a_col, b_col], "left")
        .join(ta, a_col)
        .join(tb, b_col)
        .withColumn("overlap", F.coalesce("overlap", F.lit(0)).cast("bigint"))
    )
    prec = F.col("overlap") / F.col("tb")
    rec = F.col("overlap") / F.col("ta")
    f1 = F.when(F.col("overlap") == 0, F.lit(0.0)).otherwise(
        2 * prec * rec / (prec + rec)
    )
    return base.select(
        F.col(a_col),
        F.col(b_col),
        "overlap",
        F.round(prec, 6).alias("rouge_p"),
        F.round(rec, 6).alias("rouge_r"),
        F.round(f1, 6).alias("rouge_f1"),
    )


def zipf_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ranks: int = 200,
) -> DataFrame:
    """One-row corpus vocabulary profile: vocabulary size, total token
    count, hapax-legomenon count, type-token ratio, and the Zipf slope
    (OLS of log10 freq on log10 rank over the top ``top_ranks`` ranks —
    natural corpora sit near −1; synthetic or templated text shows up
    flat). The standard corpus-health screen before training.

    Determinism: counts are exact integers; ranks come from ROW_NUMBER
    ordered (freq DESC, term ASC) — total order, engine-portable; the
    OLS moments cast each log10 term to DECIMAL(18,12) BEFORE summing
    (exact decimal accumulation, the q165 regression-as-aggregation
    convention) so no double-summation-order ulp can move the slope;
    the closed form then runs in scalar double arithmetic and rounds.

    Scale shape: term frequencies are one combinable count; the profile
    aggregates to ONE row with map-side partials; only the top-200
    ranks (TakeOrderedAndProject-sized) feed the regression. No
    driver-side loop, no window over the full vocabulary — the rank
    filter pushes as WindowGroupLimit."""
    from pyspark.sql import Window

    tf = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    stats = tf.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum("freq").cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax_count"),
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("term").asc())
    ranked = tf.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= top_ranks
    )
    dec = "decimal(18,12)"
    top = ranked.select(
        F.log10("rk").cast(dec).alias("x"), F.log10("freq").cast(dec).alias("y")
    )
    ols = top.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return stats.crossJoin(F.broadcast(ols)).select(
        "vocab_size",
        "total_tokens",
        "hapax_count",
        F.round(F.col("vocab_size") / F.col("total_tokens"), 6).alias("ttr"),
        F.round(slope, 6).alias("zipf_slope"),
    )


def lexicon_sentiment(
    docs: DataFrame,
    lexicon: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    expr_max_words: int = 64,
) -> DataFrame:
    """Lexicon-scored sentiment (the EDBT'16 "Sentiment Analysis on
    Twitter with Spark" shape — public method: integer word weights,
    document score = Σ weight × occurrences, label = sign):
    ``(id, sentiment_score bigint, sentiment string)``.

    Two physical strategies, switched on lexicon size:

    - ``len(lexicon) <= expr_max_words``: PURE EXPRESSION — one
      ``size(filter(tokens, t -> t = word))`` term per lexicon word,
      whole-stage-codegen, map-only, NO explode, NO shuffle (the plan
      you want inline in an ingest scan).
    - larger lexicons (AFINN-scale): explode + broadcast lexicon join
      + one grouped sum — the expression tree would be thousands of
      nodes, the join is the honest plan. A left join from the docs
      keeps zero-hit documents (score 0), matching the expression
      path exactly (equality is pytest-certified).

    Integer weights ⇒ integer scores ⇒ engine-exact hashes."""
    if not lexicon:
        raise ValueError("lexicon must map at least one word to a weight")
    toks = F.split(F.col(text_col), " ")
    if len(lexicon) <= int(expr_max_words):
        def _eq(word):
            # a 2-arg lambda would make F.filter bind the ELEMENT INDEX
            # to the second parameter — close over the word instead
            return lambda t: t == F.lit(word)

        score = None
        for word, w in sorted(lexicon.items()):
            term = F.lit(int(w)) * F.size(
                F.filter(toks, _eq(word))
            ).cast("long")
            score = term if score is None else score + term
        scored = docs.select(F.col(id_col), score.alias("sentiment_score"))
    else:
        spark = docs.sparkSession
        lex = spark.createDataFrame(
            [(k, int(v)) for k, v in sorted(lexicon.items())],
            "word string, w long",
        )
        hits = (
            docs.select(F.col(id_col), F.explode(toks).alias("word"))
            .join(F.broadcast(lex), "word")
            .groupBy(id_col)
            .agg(F.sum("w").alias("s"))
        )
        scored = docs.select(id_col).join(hits, id_col, "left").select(
            F.col(id_col),
            F.coalesce(F.col("s"), F.lit(0)).cast("long").alias(
                "sentiment_score"
            ),
        )
    return scored.select(
        id_col,
        "sentiment_score",
        F.when(F.col("sentiment_score") > 0, F.lit("positive"))
        .when(F.col("sentiment_score") < 0, F.lit("negative"))
        .otherwise(F.lit("neutral"))
        .alias("sentiment"),
    )


# --- PMI collocations --------------------------------------------------------


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Bigram collocations ranked by pointwise mutual information — the
    classic corpus-analysis pass (Church & Hanks 1990) that surfaces
    multiword terms ("machine learning", "new york") for vocabulary
    induction and tokenizer seeding.

    PMI(w1, w2) = ln( P(w1,w2) / (P(w1)·P(w2)) ) with the joint from
    bigram counts over N_bigrams and marginals from unigram counts
    over N_unigrams; computed as ONE ln of a double ratio and rounded
    to 6 decimals so the value is engine-replayable bit-for-bit (the
    ratio's integer inputs are exact; a final-ulp ln difference washes
    out in the rounding). ``min_count`` drops rare bigrams (PMI's
    known pathology: hapax pairs score highest).

    Scale: two grouped integer counts over the token stream (bigrams
    via one self-zip of the token array — map-only before the
    groupBy), one broadcast-joinable unigram relation (vocabulary-
    sized), top-k as TakeOrdered. No all-pairs anything; the token
    stream is scanned once."""
    toks = F.filter(
        F.split(F.col(text_col), " "), lambda t: F.length(t) > 0
    )
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    words = docs.select(F.explode(toks).alias("w"))
    uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n_uni = words.count()
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    n_big = pairs.count()
    scored = (
        big.filter(F.col("c12") >= min_count)
        .join(F.broadcast(uni.withColumnRenamed("c", "c1")), big.w1 == uni.w)
        .drop("w")
        .join(
            F.broadcast(
                uni.select(F.col("w").alias("w_"), F.col("c").alias("c2"))
            ),
            F.col("w2") == F.col("w_"),
        )
        .drop("w_")
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    (
                        F.col("c12").cast("double")
                        * F.lit(float(n_uni))
                        * F.lit(float(n_uni))
                    )
                    / (
                        F.lit(float(n_big))
                        * F.col("c1").cast("double")
                        * F.col("c2").cast("double")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1"), F.col("w2")
    ).limit(top_k)


# --- RAKE keyword extraction -------------------------------------------------

RAKE_STOPWORDS = (
    "the", "a", "an", "of", "and", "or", "to", "in", "on", "for",
    "with", "is", "are", "was", "be", "by", "as", "at", "this",
    "that", "it", "from",
)


def rake_keywords(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    max_phrase_len: int = 4,
    top_k: int = 15,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are the maximal stopword-free token runs; each word scores
    degree/frequency (degree = Σ length of phrases containing it,
    counted over phrase OCCURRENCES); a phrase scores the sum of its
    words' scores. Returns the corpus-level top-k phrase types with
    occurrence counts — the classic unsupervised keyword pass for
    corpus topic profiling.

    Everything is built-in array expressions: stopword marking is a
    ``transform`` to a '|' sentinel, phrase splitting one
    ``split(array_join(...))`` — no UDF; the shuffles are two grouped
    integer/double aggregates at word and phrase-type grain
    (vocabulary-sized), plus a TakeOrdered top-k. Phrases longer than
    ``max_phrase_len`` words drop (RAKE's hapax-run pathology — and a
    stopword-free document would otherwise become one giant phrase).
    Scores round to 6 decimals: the sum of ≤max_phrase_len doubles is
    engine-replayable under rounding."""
    toks = F.filter(
        F.split(F.col(text_col), " "), lambda t: F.length(t) > 0
    )
    marked = F.transform(
        toks,
        lambda t: F.when(t.isin(*stopwords), F.lit("|")).otherwise(t),
    )
    phrases = F.filter(
        F.transform(
            F.split(F.array_join(marked, " "), "\\|"),
            lambda p: F.trim(p),
        ),
        lambda p: p != "",
    )
    occ = docs.select(F.explode(phrases).alias("phrase")).filter(
        F.size(F.split("phrase", " ")) <= max_phrase_len
    )
    occ_words = occ.select(
        F.explode(F.split("phrase", " ")).alias("w"),
        F.size(F.split("phrase", " ")).alias("plen"),
    )
    wscore = occ_words.groupBy("w").agg(
        (
            F.sum("plen").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("wscore")
    )
    ptype = occ.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occ"))
    scored = (
        ptype.select(
            "phrase", "n_occ", F.explode(F.split("phrase", " ")).alias("w")
        )
        .join(F.broadcast(wscore), "w")
        .groupBy("phrase", "n_occ")
        .agg(F.round(F.sum("wscore"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("phrase")).limit(
        top_k
    )
